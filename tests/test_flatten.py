"""Flattening algorithm tests ([spec] JLD-API §5.2-5.3; SURVEY.md §5.1:
the reference's suite ran `flatten` cases).

Layer 1: semantic oracle over the whole golden corpus —
``to_rdf(flatten(doc)) ≅ to_rdf(doc)`` up to bnode relabeling.
Layer 2: shape goldens — labeled nodes, merged subjects, node references,
named-graph wrappers, deterministic ``_:bN`` labels.
"""

import json
from pathlib import Path

import pytest

from rdflib_jsonld_spark.jsonld import to_rdf
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.flatten import flatten
from rdflib_jsonld_spark.jsonld import nquads

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tordf"
FIXTURES = [p for p in sorted(FIXTURE_DIR.glob("*.json"))
            if "expect_error" not in json.loads(p.read_text())
            # no_roundtrip: spec-correct but not base-stable (e.g.
            # @base:null keeps relative IRIs that re-resolve differently
            # once the expanded form loses the original context)
            and not json.loads(p.read_text()).get("no_roundtrip")]


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_flatten_preserves_graph(path):
    case = json.loads(path.read_text())
    opts = case.get("options", {})
    base = opts.get("base")
    direct = to_rdf(case["input"], base=base, registry=case.get("registry"),
                    generalized_rdf=opts.get("generalized_rdf", False),
                    allow_lists_of_lists=opts.get("allow_lists_of_lists", True))
    flat = flatten(case["input"], base=base, registry=case.get("registry"))
    via_flat = to_rdf(flat, base=base,
                      generalized_rdf=opts.get("generalized_rdf", False),
                      allow_lists_of_lists=opts.get(
                          "allow_lists_of_lists", True))
    assert isomorphic(direct, via_flat), (
        f"{path.stem}:\nDIRECT:\n{nquads.serialize(direct)}\n"
        f"VIA FLATTEN:\n{nquads.serialize(via_flat)}\n"
        f"FLAT:\n{json.dumps(flat, indent=1)}"
    )


def test_nested_nodes_become_references():
    doc = {
        "@context": {"ex": "http://example.org/ns#",
                     "knows": {"@id": "ex:knows", "@type": "@id"}},
        "@id": "ex:a",
        "http://example.org/ns#knows": {
            "@id": "http://example.org/ns#b",
            "http://example.org/ns#name": "Bob"},
    }
    flat = flatten(doc)
    ids = [n["@id"] for n in flat]
    assert ids == ["http://example.org/ns#a", "http://example.org/ns#b"]
    a, b = flat
    assert a["http://example.org/ns#knows"] == [
        {"@id": "http://example.org/ns#b"}]
    assert b["http://example.org/ns#name"] == [{"@value": "Bob"}]


def test_same_subject_merges_across_document():
    doc = [
        {"@id": "http://e/a", "http://e/p": [{"@value": "x"}]},
        {"@id": "http://e/a", "http://e/q": [{"@value": "y"}]},
    ]
    flat = flatten(doc)
    assert len(flat) == 1
    assert set(flat[0]) == {"@id", "http://e/p", "http://e/q"}


def test_anonymous_nodes_get_deterministic_labels():
    doc = {"http://e/p": [{"http://e/q": [{"@value": "x"}]}]}
    flat = flatten(doc)
    assert [n["@id"] for n in flat] == ["_:b0", "_:b1"]
    assert flat[0]["http://e/p"] == [{"@id": "_:b1"}]
    # existing bnode labels are RE-issued, not passed through
    doc2 = {"@id": "_:zzz", "http://e/p": [{"@value": "x"}]}
    assert flatten(doc2)[0]["@id"] == "_:b0"


def test_named_graph_wrapper_node():
    doc = {"@id": "http://e/g1",
           "@graph": [{"@id": "http://e/a",
                       "http://e/p": [{"@value": "x"}]}]}
    flat = flatten(doc)
    assert len(flat) == 1
    wrapper = flat[0]
    assert wrapper["@id"] == "http://e/g1"
    assert wrapper["@graph"] == [
        {"@id": "http://e/a", "http://e/p": [{"@value": "x"}]}]


def test_duplicate_values_dedup():
    doc = {"@id": "http://e/a",
           "http://e/p": [{"@value": "x"}, {"@value": "x"},
                          {"@id": "http://e/b"}, {"@id": "http://e/b"}]}
    flat = flatten(doc)
    assert flat[0]["http://e/p"] == [{"@value": "x"}, {"@id": "http://e/b"}]


def test_reverse_edges_materialized_forward():
    doc = {"@id": "http://e/a",
           "@reverse": {"http://e/childOf": [{"@id": "http://e/b"}]}}
    flat = flatten(doc, expanded=False)
    by_id = {n["@id"]: n for n in flat}
    assert by_id["http://e/b"]["http://e/childOf"] == [{"@id": "http://e/a"}]


def test_flatten_output_sorted_and_idempotent():
    case = json.loads((FIXTURE_DIR / "0043-multigraph-same-subject.json")
                      .read_text())
    flat = flatten(case["input"], base=case.get("options", {}).get("base"))
    assert [n["@id"] for n in flat] == sorted(n["@id"] for n in flat)
    again = flatten(flat, expanded=True)
    assert isomorphic(to_rdf(flat), to_rdf(again))


def test_flatten_with_context_compacts_under_graph():
    """[spec] JLD-API §5.2: flatten(input, context) returns a compacted
    map with the nodes under @graph."""
    ctx = {"ex": "http://e/", "p": "ex:p", "knows": {"@id": "ex:knows",
                                                     "@type": "@id"}}
    doc = {"@context": ctx, "@id": "ex:a", "p": "x",
           "knows": {"@id": "ex:b", "p": "y"}}
    out = flatten(doc, compact_context=ctx)
    assert out["@context"] == ctx
    nodes = out["@graph"]
    assert [n["@id"] for n in nodes] == ["ex:a", "ex:b"]
    assert nodes[0]["knows"] == ["ex:b"]
    assert nodes[1]["p"] == ["y"]
    # graph is unchanged
    assert isomorphic(to_rdf(doc), to_rdf(out))
