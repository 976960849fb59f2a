"""Compaction: per-value term selection and @graph container folding
(the r03 sweep-5 compaction fixes; [spec] JLD-API §6.1 steps 12.8.7-9)."""

from rdflib_jsonld_spark.jsonld import to_rdf
from rdflib_jsonld_spark.jsonld.compact import compact
from rdflib_jsonld_spark.jsonld.compare import isomorphic

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _roundtrip(doc, ctx):
    c = compact(doc, ctx, expanded=True)
    assert isomorphic(to_rdf(doc), to_rdf(c)), c
    return {k: v for k, v in c.items() if k != "@context"}


def test_per_value_term_selection():
    doc = {"@id": "http://e/s",
           "http://e/p": [{"@value": "5", "@type": XSD_INT},
                          {"@value": "plain"}]}
    ctx = {"pint": {"@id": "http://e/p", "@type": XSD_INT},
           "pplain": "http://e/p"}
    out = _roundtrip(doc, ctx)
    assert out == {"@id": "http://e/s", "pint": "5", "pplain": "plain"}


def test_simple_graph_container_folds_wrapper():
    doc = {"@id": "http://e/s",
           "http://e/g": [{"@graph": [
               {"@id": "http://e/n", "http://e/q": [{"@value": "v"}]}]}]}
    ctx = {"g": {"@id": "http://e/g", "@container": "@graph"},
           "q": "http://e/q"}
    out = _roundtrip(doc, ctx)
    assert out == {"@id": "http://e/s",
                   "g": {"@id": "http://e/n", "q": "v"}}


def test_graph_id_map_with_none_key():
    doc = {"@id": "http://e/s",
           "http://e/g": [
               {"@id": "http://e/g1", "@graph": [
                   {"@id": "http://e/n", "http://e/q": [{"@value": "v"}]}]},
               {"@graph": [
                   {"@id": "http://e/m", "http://e/q": [{"@value": "w"}]}]}]}
    ctx = {"g": {"@id": "http://e/g", "@container": ["@graph", "@id"]},
           "q": "http://e/q"}
    out = _roundtrip(doc, ctx)
    assert out["g"] == {"http://e/g1": {"@id": "http://e/n", "q": "v"},
                        "@none": {"@id": "http://e/m", "q": "w"}}


def test_graph_index_map():
    doc = {"@id": "http://e/s",
           "http://e/g": [{"@index": "i1", "@graph": [
               {"@id": "http://e/n", "http://e/q": [{"@value": "v"}]}]}]}
    ctx = {"g": {"@id": "http://e/g", "@container": ["@graph", "@index"]},
           "q": "http://e/q"}
    out = _roundtrip(doc, ctx)
    assert out["g"] == {"i1": {"@id": "http://e/n", "q": "v"}}


def test_graph_object_with_id_under_simple_container_keeps_wrapper():
    doc = {"@id": "http://e/s",
           "http://e/g": [{"@id": "http://e/g1", "@graph": [
               {"@id": "http://e/n", "http://e/q": [{"@value": "v"}]}]}]}
    ctx = {"g": {"@id": "http://e/g", "@container": "@graph"},
           "q": "http://e/q"}
    out = _roundtrip(doc, ctx)
    assert "@graph" in out["g"] and out["g"]["@id"] == "http://e/g1"
