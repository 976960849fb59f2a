"""Sweep-8 round-trip regression corpus (r04): compaction probes
(expand(compact(doc, ctx)) == expand(doc)) and from_rdf probes
(to_rdf(from_rdf(quads)) isomorphic to quads) over the corner families
the r04 sweep exercised. All pure-core, no Spark."""

import json

import pytest

from rdflib_jsonld_spark.jsonld.compact import compact
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.expansion import expand
from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf

EX = "http://example.org/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
V = {"@vocab": EX}

COMPACT_CASES = [
    ("index-container",
     {"@context": V, "@id": EX + "s", "p": [
         {"@id": EX + "a", "@index": "i1"},
         {"@id": EX + "b", "@index": "i2"}]},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@index"}}),
    ("language-map-direction-default",
     {"@context": {"@vocab": EX, "@direction": "rtl"},
      "p": [{"@value": "x", "@language": "en"}, {"@value": "y"}]},
     {"@vocab": EX, "@direction": "rtl",
      "p": {"@id": EX + "p", "@container": "@language"}}),
    ("reverse",
     {"@context": V, "@id": EX + "s",
      "@reverse": {"p": [{"@id": EX + "a"}, {"@id": EX + "b"}]}},
     {"@vocab": EX, "rp": {"@reverse": EX + "p"}}),
    ("list-of-lists",
     {"@context": V, "p": {"@list": [{"@list": [1, 2]}, 3]}},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@list"}}),
    ("graph-index-container",
     {"@context": {"@vocab": EX,
                   "p": {"@container": ["@graph", "@index"]}},
      "@id": EX + "s", "p": {"k1": {"q": "v1"}, "k2": {"q": "v2"}}},
     {"@vocab": EX, "p": {"@id": EX + "p",
                          "@container": ["@graph", "@index"]}}),
    ("type-map-none",
     {"@context": {"@vocab": EX, "p": {"@container": "@type"}},
      "p": {"T1": {"@id": EX + "a"}, "@none": {"@id": EX + "b"}}},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@type"}}),
    ("keyword-aliases",
     {"@context": V, "@id": EX + "s", "@type": EX + "T", "p": "v"},
     {"@vocab": EX, "id": "@id", "type": "@type"}),
    ("id-map-bnode-keys",
     {"@context": {"@vocab": EX, "p": {"@container": "@id"}},
      "p": {"_:x": {"q": "v"}}},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@id"}}),
    ("value-with-index",
     {"@context": V, "p": {"@value": 5, "@index": "z"}},
     {"@vocab": EX}),
    ("prefix-vs-exact-term",
     {"@context": V, EX + "ns/p": {"@id": EX + "ns/o"}},
     {"ns": EX + "ns/", "nsp": {"@id": EX + "ns/p", "@type": "@id"}}),
    ("scoped-context",
     {"@context": {"@vocab": EX}, "@type": EX + "T",
      "inner": {"@id": EX + "i"}},
     {"@vocab": EX, "T": {"@id": EX + "T",
                          "@context": {"inner": {"@id": EX + "inner",
                                                 "@type": "@id"}}}}),
    ("nest-not-invented",
     {"@context": V, "@id": EX + "s", "p": "v"},
     {"@vocab": EX, "meta": "@nest"}),
    ("direction-mismatch-language-map",
     {"@context": V, "p": [{"@value": "x", "@language": "en",
                            "@direction": "ltr"}]},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@language"}}),
    ("set-container",
     {"@context": V, "p": "lone"},
     {"@vocab": EX, "p": {"@id": EX + "p", "@container": "@set"}}),
    ("json-literal",
     {"@context": {"@vocab": EX,
                   "p": {"@id": EX + "p", "@type": "@json"}},
      "p": {"k": [1, "a"]}},
     {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json"}}),
    # sweep 12: @json × container — step 13.6 beats container unfolding
    # on re-expansion, so compaction must only use a @json term for one
    # whole-value literal (bare or alone in its list)
    ("json-list-container",
     {"@context": {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json",
                                       "@container": "@list"}},
      "p": [{"b": 1, "a": 2}, [3, 4]]},
     {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json",
                          "@container": "@list"}}),
    ("json-index-container-no-map",
     {"@context": {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json",
                                       "@container": "@index"}},
      "p": {"k": [1, 2]}},
     {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json",
                          "@container": "@index"}}),
    ("json-multi-literals-fall-back",
     {"@context": {"@vocab": EX},
      EX + "p": [{"@value": 1, "@type": "@json"},
                 {"@value": 2, "@type": "@json"}]},
     {"@vocab": EX, "p": {"@id": EX + "p", "@type": "@json"}}),
]


@pytest.mark.parametrize("name,doc,cctx",
                         COMPACT_CASES, ids=[c[0] for c in COMPACT_CASES])
def test_compact_roundtrip(name, doc, cctx):
    e1 = expand(doc)
    e2 = expand(compact(doc, cctx))
    assert json.dumps(e1, sort_keys=True) == json.dumps(e2, sort_keys=True)


def _i(v):
    return (IRI, v)


def _b(v):
    return (BNODE, v)


FROMRDF_CASES = [
    ("shared-list-head", [
        (None, _i(EX + "s"), _i(EX + "p"), _b("l1")),
        (None, _i(EX + "s"), _i(EX + "q"), _b("l1")),
        (None, _b("l1"), _i(RDF + "first"),
         (LIT, "1", XSD + "integer", None)),
        (None, _b("l1"), _i(RDF + "rest"), _i(RDF + "nil"))], {}),
    ("list-node-extra-property", [
        (None, _i(EX + "s"), _i(EX + "p"), _b("l1")),
        (None, _b("l1"), _i(RDF + "first"),
         (LIT, "1", XSD + "integer", None)),
        (None, _b("l1"), _i(RDF + "rest"), _i(RDF + "nil")),
        (None, _b("l1"), _i(EX + "extra"),
         (LIT, "x", XSD + "string", None))], {}),
    ("cyclic-list", [
        (None, _i(EX + "s"), _i(EX + "p"), _b("l1")),
        (None, _b("l1"), _i(RDF + "first"),
         (LIT, "1", XSD + "integer", None)),
        (None, _b("l1"), _i(RDF + "rest"), _b("l2")),
        (None, _b("l2"), _i(RDF + "first"),
         (LIT, "2", XSD + "integer", None)),
        (None, _b("l2"), _i(RDF + "rest"), _b("l1"))], {}),
    ("nil-as-subject", [
        (None, _i(RDF + "nil"), _i(EX + "p"),
         (LIT, "v", XSD + "string", None)),
        (None, _i(EX + "s"), _i(EX + "p"), _i(RDF + "nil"))], {}),
    ("native-types-incl-invalid-lexical", [
        (None, _i(EX + "s"), _i(EX + "d"),
         (LIT, "2.5E0", XSD + "double", None)),
        (None, _i(EX + "s"), _i(EX + "i"),
         (LIT, "42", XSD + "integer", None)),
        (None, _i(EX + "s"), _i(EX + "b"),
         (LIT, "true", XSD + "boolean", None)),
        (None, _i(EX + "s"), _i(EX + "bad"),
         (LIT, "not-a-num", XSD + "integer", None))],
     {"use_native_types": True}),
    ("json-literal", [
        (None, _i(EX + "s"), _i(EX + "j"),
         (LIT, '{"a":[2.5,1],"b":null}', RDF + "JSON", None))],
     {"use_native_types": True}),
    ("graph-name-also-subject", [
        (_i(EX + "g"), _i(EX + "s"), _i(EX + "p"),
         (LIT, "v", XSD + "string", None)),
        (None, _i(EX + "g"), _i(EX + "about"),
         (LIT, "meta", XSD + "string", None))], {}),
    ("bnode-graph-name", [
        (_b("g0"), _i(EX + "s"), _i(EX + "p"),
         (LIT, "v", XSD + "string", None))], {}),
    ("rdf-type-to-bnode", [
        (None, _i(EX + "s"), _i(RDF + "type"), _b("t0")),
        (None, _b("t0"), _i(EX + "p"),
         (LIT, "v", XSD + "string", None))], {}),
]


@pytest.mark.parametrize("name,quads,kw",
                         FROMRDF_CASES, ids=[c[0] for c in FROMRDF_CASES])
def test_fromrdf_roundtrip(name, quads, kw):
    doc = from_rdf(quads, **kw)
    assert isomorphic(to_rdf(doc), quads), json.dumps(doc)[:300]


def test_i18n_roundtrip():
    quads = [(None, _i(EX + "s"), _i(EX + "p"),
              (LIT, "x", "https://www.w3.org/ns/i18n#en_rtl", None))]
    doc = from_rdf(quads, rdf_direction="i18n-datatype")
    assert isomorphic(to_rdf(doc, rdf_direction="i18n-datatype"), quads)
