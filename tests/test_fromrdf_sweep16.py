"""Sweep-16 regression corpus (r04): from_rdf corner probes.

Three bug families fixed ([spec] JLD-API §10.5 Deserialize RDF as JSON-LD):

1. useNativeTypes conversion must validate the XSD lexical space —
   Python's int()/float() accept whitespace, '_' separators and
   'Infinity'/'nan', and xsd:boolean converts ONLY the lexicals
   'true'/'false' (spec text; '1'/'0' are valid xsd:boolean but are NOT
   converted — pyld-compatible). Valid-but-non-JSON doubles (INF/-INF/NaN)
   keep the typed string.
2. Every object reference to rdf:nil is a nil usage whose zero-iteration
   backwards walk yields {"@list": []} — direct property values, list
   members, and a malformed list node's rdf:rest; @type keeps the IRI.
3. Malformed/shared list chains stay node-shaped (usage count != 1, extra
   properties), matching the spec's well-formed-list-node conditions.

All pure-core, no Spark.
"""

import pytest

from rdflib_jsonld_spark.jsonld import keys
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
S = (IRI, EX + "s")
P = (IRI, EX + "p")
NIL = (IRI, keys.RDF_NIL)
FIRST = (IRI, keys.RDF_FIRST)
REST = (IRI, keys.RDF_REST)


def lit(lex, dt=None, lang=None):
    return (LIT, lex, dt, lang)


def val(quads, **kw):
    out = from_rdf(quads, use_native_types=True, **kw)
    return out[0][EX + "p"][0]


@pytest.mark.parametrize("lex,expect", [
    ("true", True),
    ("false", False),
    # valid xsd:boolean lexicals the spec does NOT convert
    ("1", None),
    ("0", None),
    # invalid lexicals must never coerce (were silently False)
    ("TRUE", None),
    (" true", None),
    ("banana", None),
])
def test_native_boolean(lex, expect):
    got = val([(None, S, P, lit(lex, XSD + "boolean"))])
    if expect is None:
        assert got == {"@value": lex, "@type": XSD + "boolean"}
    else:
        assert got == {"@value": expect}


@pytest.mark.parametrize("lex,expect", [
    ("5", 5), ("+5", 5), ("-05", -5),
    (" 5 ", None), ("1_0", None), ("5.0", None), ("0x10", None), ("", None),
])
def test_native_integer(lex, expect):
    got = val([(None, S, P, lit(lex, XSD + "integer"))])
    if expect is None:
        assert got == {"@value": lex, "@type": XSD + "integer"}
    else:
        assert got == {"@value": expect}


@pytest.mark.parametrize("lex,expect", [
    ("1e0", 1.0), ("-2.5E2", -250.0), (".5", 0.5), ("1.", 1.0),
    # invalid XSD lexicals Python float() accepts
    ("1_0.5", None), ("Infinity", None), ("inf", None), ("nan", None),
    (" 1.0", None), ("1d2", None),
    # valid xsd:double but no JSON number — keep typed string
    ("INF", None), ("-INF", None), ("NaN", None),
])
def test_native_double(lex, expect):
    got = val([(None, S, P, lit(lex, XSD + "double"))])
    if expect is None:
        assert got == {"@value": lex, "@type": XSD + "double"}
    else:
        assert got == {"@value": expect}


def test_nil_object_is_empty_list():
    assert val([(None, S, P, NIL)]) == {"@list": []}


def test_nil_list_member_is_empty_list():
    b = (BNODE, "b0")
    got = val([
        (None, S, P, b),
        (None, b, FIRST, NIL),
        (None, b, REST, NIL),
    ])
    assert got == {"@list": [{"@list": []}]}


def test_nil_as_type_stays_iri():
    out = from_rdf([(None, S, (IRI, keys.RDF_TYPE), NIL)])
    assert out == [{"@id": EX + "s", "@type": [keys.RDF_NIL]}]


def test_nil_subject_stays_node():
    out = from_rdf([(None, NIL, P, lit("x"))])
    assert out == [{"@id": keys.RDF_NIL, EX + "p": [{"@value": "x"}]}]


def test_malformed_list_node_keeps_shape_rest_becomes_empty_list():
    b = (BNODE, "b0")
    out = from_rdf([
        (None, S, P, b),
        (None, b, FIRST, lit("a")),
        (None, b, REST, NIL),
        (None, b, (IRI, keys.RDF_TYPE), (IRI, EX + "T")),
    ])
    bn = next(n for n in out if n["@id"] == "_:b0")
    assert bn["@type"] == [EX + "T"]
    assert bn[keys.RDF_FIRST] == [{"@value": "a"}]
    assert bn[keys.RDF_REST] == [{"@list": []}]


def test_shared_tail_breaks_both_chains():
    b1, b2, sh = (BNODE, "b1"), (BNODE, "b2"), (BNODE, "sh")
    out = from_rdf([
        (None, S, P, b1),
        (None, S, (IRI, EX + "q"), b2),
        (None, b1, FIRST, lit("a")), (None, b1, REST, sh),
        (None, b2, FIRST, lit("b")), (None, b2, REST, sh),
        (None, sh, FIRST, lit("z")), (None, sh, REST, NIL),
    ])
    ids = {n["@id"] for n in out}
    assert {"_:b1", "_:b2", "_:sh"} <= ids
    shn = next(n for n in out if n["@id"] == "_:sh")
    assert shn[keys.RDF_REST] == [{"@list": []}]


def test_empty_list_round_trip():
    doc = {"@id": EX + "s", EX + "p": {"@list": []}}
    quads = to_rdf(doc)
    assert quads == [(None, S, P, NIL)]
    back = from_rdf(quads)
    assert back == [{"@id": EX + "s", EX + "p": [{"@list": []}]}]
    assert isomorphic(to_rdf({"@graph": back}), quads)


class TestSweep31ListCorners:
    """Sweep 31 — list-reassembly corner probes, all verified
    spec-faithful ([spec] JLD-API §10.5 well-formed-list conditions +
    per-graph nil-usages walk). Pinned as regressions; no engine
    changes were needed."""

    S, P, Q, X = (IRI, EX + "s"), (IRI, EX + "p"), (IRI, EX + "q"), \
        (IRI, EX + "x")
    FIRST, REST = (IRI, keys.RDF_FIRST), (IRI, keys.RDF_REST)
    NIL = (IRI, keys.RDF_NIL)

    def _lit(self, v):
        return (LIT, v, keys.XSD_STRING, None)

    def _rt(self, quads):
        return isomorphic(quads, to_rdf(from_rdf(quads)))

    def test_cycle_stays_nodes_and_roundtrips(self):
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, (BNODE, "l1")),
                 (None, (BNODE, "l1"), self.FIRST, self._lit("b")),
                 (None, (BNODE, "l1"), self.REST, (BNODE, "l0"))]
        out = from_rdf(quads)
        assert not any("@list" in str(n) for n in out)
        assert self._rt(quads)

    def test_self_cycle_terminates(self):
        quads = [(None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, (BNODE, "l0"))]
        assert self._rt(quads)

    def test_shared_tail_keeps_all_nodes(self):
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, self.S, self.Q, (BNODE, "l1")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, (BNODE, "l2")),
                 (None, (BNODE, "l1"), self.FIRST, self._lit("b")),
                 (None, (BNODE, "l1"), self.REST, (BNODE, "l2")),
                 (None, (BNODE, "l2"), self.FIRST, self._lit("c")),
                 (None, (BNODE, "l2"), self.REST, self.NIL)]
        assert self._rt(quads)

    def test_two_firsts_not_converted(self):
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("b")),
                 (None, (BNODE, "l0"), self.REST, self.NIL)]
        out = from_rdf(quads)
        assert not any("@list" in k for n in out for k in n)
        assert self._rt(quads)

    def test_multi_ref_head_not_converted(self):
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, self.S, self.Q, (BNODE, "l0")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, self.NIL)]
        assert self._rt(quads)

    def test_typed_list_node_stays_node(self):
        # we keep rdf:type rdf:List chains node-shaped (stricter than
        # the spec's allowance; round trip stays lossless either way)
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, (BNODE, "l0"), (IRI, keys.RDF_TYPE),
                  (IRI, keys.RDF_NS + "List")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, self.NIL)]
        assert self._rt(quads)

    def test_cross_graph_chain_converts_per_graph(self):
        """Per-graph nil-usages walk ([spec] §10.5 loops per graph
        object): the default-graph chain converts to @list even when
        the SAME bnode carries a triple in another graph — the other
        graph keeps its node, and cross-graph bnode coreference is
        lost by the @list abstraction (spec-mandated lossiness)."""
        G = (IRI, EX + "g")
        quads = [(None, self.S, self.P, (BNODE, "l0")),
                 (None, (BNODE, "l0"), self.FIRST, self._lit("a")),
                 (None, (BNODE, "l0"), self.REST, self.NIL),
                 (G, (BNODE, "l0"), self.FIRST, self._lit("z"))]
        out = from_rdf(quads)
        top = next(n for n in out if n.get("@id") == EX + "s")
        assert top[EX + "p"] == [{"@list": [{"@value": "a"}]}]
        gnode = next(n for n in out if n.get("@id") == EX + "g")
        assert gnode["@graph"][0][keys.RDF_FIRST] == [{"@value": "z"}]
        assert not isomorphic(quads, to_rdf(out))  # documented loss
