"""rdfDirection="compound-literal" — the second JSON-LD 1.1 direction
mode ([spec] JLD-API §10.6 step 12 serialize / §10.5 deserialize):
direction-carrying strings reify as a fresh bnode with rdf:value /
rdf:language / rdf:direction; deserialization collapses any blank-node
subject carrying rdf:direction back into a @value map and removes the
node."""

import pytest

from rdflib_jsonld_spark.jsonld import keys
from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf

E = "http://e/"
RDF = keys.RDF_NS
XS = "http://www.w3.org/2001/XMLSchema#string"


def test_value_object_reifies():
    doc = {"@id": E + "s", E + "p": [
        {"@value": "x", "@language": "AR", "@direction": "rtl"},
        {"@value": "y", "@direction": "ltr"}]}
    q = to_rdf(doc, rdf_direction="compound-literal")
    by_pred = {}
    for g, s, p, o in q:
        by_pred.setdefault(p[1], []).append((g, s, o))
    assert len(by_pred[E + "p"]) == 2
    bn_x = next(o for g, s, o in by_pred[E + "p"] if o == (BNODE, "b0"))
    # language lowercased, value/direction as xsd:string literals
    assert (None, (BNODE, "b0"), (LIT, "x", XS, None)) in \
        [(g, s, o) for g, s, o in by_pred[RDF + "value"]]
    assert [(o[1], o[2]) for g, s, o in by_pred[RDF + "language"]] == \
        [("ar", XS)]
    assert sorted(o[1] for g, s, o in by_pred[RDF + "direction"]) == \
        ["ltr", "rtl"]


def test_default_direction_context_reifies():
    doc = {"@context": {"@direction": "rtl", "@language": "he",
                        "@vocab": E}, "p": "shalom"}
    q = to_rdf(doc, rdf_direction="compound-literal")
    preds = {p[1] for g, s, p, o in q}
    assert preds == {RDF + "direction", RDF + "language", RDF + "value",
                     E + "p"}


def test_compound_quads_land_in_parent_graph():
    doc = {"@id": E + "g", "@graph": [
        {"@id": E + "s",
         E + "p": {"@value": "x", "@direction": "rtl"}}]}
    q = to_rdf(doc, rdf_direction="compound-literal")
    graphs = {t[0] for t in q}
    assert graphs == {(IRI, E + "g")}


def test_round_trip():
    doc = {"@id": E + "s", E + "p": [
        {"@value": "x", "@language": "ar", "@direction": "rtl"},
        {"@value": "y", "@direction": "ltr"},
        {"@value": "plain"}]}
    q = to_rdf(doc, rdf_direction="compound-literal")
    back = from_rdf(q, rdf_direction="compound-literal")
    assert back == [{"@id": E + "s", E + "p": [
        {"@value": "x", "@language": "ar", "@direction": "rtl"},
        {"@value": "y", "@direction": "ltr"},
        {"@value": "plain"}]}]


def test_from_rdf_without_mode_keeps_nodes():
    q = to_rdf({"@id": E + "s",
                E + "p": {"@value": "x", "@direction": "rtl"}},
               rdf_direction="compound-literal")
    back = from_rdf(q)  # mode off: reified node stays a node
    ids = {n["@id"] for n in back}
    assert "_:b0" in ids


def test_language_map_compound():
    doc = {"@context": {"@vocab": E, "@direction": "rtl",
                        "p": {"@container": "@language"}},
           "p": {"ar": "x"}}
    q = to_rdf(doc, rdf_direction="compound-literal")
    preds = sorted(p[1] for g, s, p, o in q)
    assert RDF + "direction" in preds and RDF + "language" in preds


def test_list_member_compound_same_chain():
    doc = {"@id": E + "s", E + "p": {"@list": [
        {"@value": "x", "@direction": "rtl"}]}}
    q = to_rdf(doc, rdf_direction="compound-literal")
    # rdf:first points at the compound bnode; round-trips inside @list
    back = from_rdf(q, rdf_direction="compound-literal")
    assert back == [{"@id": E + "s", E + "p": [
        {"@list": [{"@value": "x", "@direction": "rtl"}]}]}]


def test_bad_mode_still_raises():
    with pytest.raises(ValueError):
        to_rdf({}, rdf_direction="compound")
    with pytest.raises(ValueError):
        from_rdf([], rdf_direction="compound")


def test_bnode_with_extra_properties_stays_a_node():
    """ADVICE r04: a bnode that merely CARRIES rdf:direction among
    other properties must deserialize as a NODE (no triples dropped),
    not collapse into a @value map."""
    q = [
        (None, (BNODE, "n0"), (IRI, RDF + "direction"), (LIT, "rtl", XS, None)),
        (None, (BNODE, "n0"), (IRI, RDF + "value"), (LIT, "x", XS, None)),
        (None, (BNODE, "n0"), (IRI, E + "other"), (LIT, "kept", XS, None)),
        (None, (IRI, E + "s"), (IRI, E + "p"), (BNODE, "n0")),
    ]
    out = from_rdf(q, rdf_direction="compound-literal")
    nodes = {n.get("@id"): n for n in out}
    ref = nodes[E + "s"][E + "p"][0]
    assert ref == {"@id": "_:n0"}
    bn = nodes["_:n0"]
    assert bn[E + "other"] == [{"@value": "kept"}]
    assert RDF + "direction" in bn and RDF + "value" in bn


def test_bnode_with_duplicate_value_stays_a_node():
    """Duplicate rdf:value slots disqualify — no arbitrary-first pick."""
    q = [
        (None, (BNODE, "n0"), (IRI, RDF + "direction"), (LIT, "rtl", XS, None)),
        (None, (BNODE, "n0"), (IRI, RDF + "value"), (LIT, "x", XS, None)),
        (None, (BNODE, "n0"), (IRI, RDF + "value"), (LIT, "y", XS, None)),
        (None, (IRI, E + "s"), (IRI, E + "p"), (BNODE, "n0")),
    ]
    out = from_rdf(q, rdf_direction="compound-literal")
    nodes = {n.get("@id"): n for n in out}
    bn = nodes["_:n0"]
    assert sorted(v["@value"] for v in bn[RDF + "value"]) == ["x", "y"]


def test_bnode_with_nonliteral_slot_stays_a_node():
    """A non-literal rdf:value disqualifies the compound shape."""
    q = [
        (None, (BNODE, "n0"), (IRI, RDF + "direction"), (LIT, "rtl", XS, None)),
        (None, (BNODE, "n0"), (IRI, RDF + "value"), (IRI, E + "iri")),
        (None, (IRI, E + "s"), (IRI, E + "p"), (BNODE, "n0")),
    ]
    out = from_rdf(q, rdf_direction="compound-literal")
    nodes = {n.get("@id"): n for n in out}
    assert "_:n0" in nodes
