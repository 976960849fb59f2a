"""Document-level Expansion algorithm tests (SURVEY.md §5.1: the reference's
suite ran `expand` cases — [v0.5.0] test/test_testsuite.py).

Two layers:
1. Semantic oracle over the ENTIRE golden corpus: expansion must preserve
   the emitted graph — ``to_rdf(expand(doc)) ≅ to_rdf(doc)`` (bnode-iso).
   This reuses every tordf fixture as an expansion test for free.
2. Hand-authored expanded-form goldens for the shape-level invariants the
   graph oracle can't see (arrays-everywhere, value-object wrapping,
   @index preservation, container unfolding) per [spec] JLD-API §5.1.
"""

import json
from pathlib import Path

import pytest

from rdflib_jsonld_spark.jsonld import to_rdf
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.expansion import expand
from rdflib_jsonld_spark.jsonld import nquads

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tordf"
FIXTURES = [p for p in sorted(FIXTURE_DIR.glob("*.json"))
            if "expect_error" not in json.loads(p.read_text())
            # no_roundtrip: spec-correct but not base-stable (e.g.
            # @base:null keeps relative IRIs that re-resolve differently
            # once the expanded form loses the original context)
            and not json.loads(p.read_text()).get("no_roundtrip")]


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_expand_preserves_graph(path):
    case = json.loads(path.read_text())
    opts = case.get("options", {})
    base = opts.get("base")
    registry = case.get("registry")
    rd = opts.get("rdf_direction")
    direct = to_rdf(case["input"], base=base, registry=registry,
                    generalized_rdf=opts.get("generalized_rdf", False),
                    allow_lists_of_lists=opts.get("allow_lists_of_lists", True),
                    rdf_direction=rd)
    expanded = expand(case["input"], base=base, registry=registry)
    via_expanded = to_rdf(expanded, base=base,
                          generalized_rdf=opts.get("generalized_rdf", False),
                          allow_lists_of_lists=opts.get(
                              "allow_lists_of_lists", True),
                          rdf_direction=rd)
    assert isomorphic(direct, via_expanded), (
        f"{path.stem}:\nDIRECT:\n{nquads.serialize(direct)}\n"
        f"VIA EXPAND:\n{nquads.serialize(via_expanded)}\n"
        f"EXPANDED:\n{json.dumps(expanded, indent=1)}"
    )


# ---------------------------------------------------------------------------
# shape-level goldens ([spec] JLD-API §5.1 examples, hand-authored)
# ---------------------------------------------------------------------------

CTX = {
    "ex": "http://example.org/ns#",
    "name": "ex:name",
    "age": {"@id": "ex:age", "@type": "http://www.w3.org/2001/XMLSchema#integer"},
    "knows": {"@id": "ex:knows", "@type": "@id"},
    "label": {"@id": "ex:label", "@container": "@language"},
    "items": {"@id": "ex:items", "@container": "@list"},
    "tags": {"@id": "ex:tags", "@container": "@index"},
}


def test_scalar_becomes_value_object_array():
    doc = {"@context": CTX, "@id": "ex:a", "name": "Alice"}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#name": [{"@value": "Alice"}],
    }]


def test_type_coercion_surfaces_in_value_object():
    doc = {"@context": CTX, "@id": "ex:a", "age": 7}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#age": [{
            "@value": 7,
            "@type": "http://www.w3.org/2001/XMLSchema#integer"}],
    }]


def test_id_coercion_makes_node_reference():
    doc = {"@context": CTX, "@id": "ex:a", "knows": "ex:b"}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#knows": [{"@id": "http://example.org/ns#b"}],
    }]


def test_language_map_unfolds_sorted():
    doc = {"@context": CTX, "@id": "ex:a",
           "label": {"en": "cat", "de": ["Katze"]}}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#label": [
            {"@value": "Katze", "@language": "de"},
            {"@value": "cat", "@language": "en"},
        ],
    }]


def test_list_container_becomes_explicit_list():
    doc = {"@context": CTX, "@id": "ex:a", "items": ["x", "y"]}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#items": [{
            "@list": [{"@value": "x"}, {"@value": "y"}]}],
    }]


def test_index_map_preserves_index():
    doc = {"@context": CTX, "@id": "ex:a",
           "tags": {"t1": "x", "t2": "y"}}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#tags": [
            {"@value": "x", "@index": "t1"},
            {"@value": "y", "@index": "t2"},
        ],
    }]


def test_default_language_applies():
    doc = {"@context": {"@vocab": "http://example.org/ns#",
                        "@language": "en"},
           "title": "Homepage"}
    assert expand(doc) == [{
        "http://example.org/ns#title": [
            {"@value": "Homepage", "@language": "en"}],
    }]


def test_top_level_graph_unwraps():
    doc = {"@context": CTX,
           "@graph": [{"@id": "ex:a", "name": "A"},
                      {"@id": "ex:b", "name": "B"}]}
    out = expand(doc)
    assert [n["@id"] for n in out] == [
        "http://example.org/ns#a", "http://example.org/ns#b"]


def test_free_floating_scalar_and_null_dropped():
    assert expand("just a string") == []
    assert expand(None) == []
    assert expand({"@context": CTX, "@id": "ex:a", "name": None}) == []


def test_set_unwraps_and_arrays_flatten():
    doc = {"@context": CTX, "@id": "ex:a",
           "name": {"@set": ["x", ["y", "z"]]}}
    assert expand(doc) == [{
        "@id": "http://example.org/ns#a",
        "http://example.org/ns#name": [
            {"@value": "x"}, {"@value": "y"}, {"@value": "z"}],
    }]


def test_expansion_is_idempotent():
    for path in FIXTURES:
        case = json.loads(path.read_text())
        opts = case.get("options", {})
        once = expand(case["input"], base=opts.get("base"),
                      registry=case.get("registry"))
        twice = expand(once, base=opts.get("base"))
        assert to_rdf(once) is not None
        direct = to_rdf(once, base=opts.get("base"))
        again = to_rdf(twice, base=opts.get("base"))
        assert isomorphic(direct, again), path.stem


def test_array_scoped_context_propagate_matches_dict_form():
    """ADVICE r02: a scoped context expressed as an ARRAY containing
    {"@propagate": false} must behave exactly like the dict form — the
    non-propagation revert may not be silently skipped."""
    EX = "http://example.org/"

    def doc(scoped):
        return {"@context": {"ex": EX,
                             "p": {"@id": EX + "p", "@context": scoped}},
                "@id": "ex:a",
                "p": {"@id": "ex:b", "name": "direct",
                      "ex:q": {"@id": "ex:c", "name": "nested"}}}

    for scoped_dict, scoped_arr in [
            ({"@propagate": False, "name": EX + "name"},
             [{"@propagate": False, "name": EX + "name"}]),
            ({"name": EX + "name"}, [{"name": EX + "name"}])]:
        assert expand(doc(scoped_dict)) == expand(doc(scoped_arr))
    # and the non-propagating form actually reverts: the scoped "name"
    # term is undefined (no @vocab) inside nested node objects → dropped
    e = expand(doc([{"@propagate": False, "name": EX + "name"}]))
    nested = e[0][EX + "p"][0][EX + "q"][0]
    assert EX + "name" not in nested


def test_empty_nested_map_is_not_a_subject_reference():
    """ADVICE r02: {} must not take the subject-reference exemption from
    the previous-context revert (it has no @id). Sweep 9: an empty node
    object under a real property is KEPT (a blank node), matching the
    to_rdf walk — step 19's drop applies only free-floating."""
    EX = "http://example.org/"
    doc = {"@context": {"ex": EX,
                        "T": {"@id": EX + "T",
                              "@context": {"name": EX + "name"}}},
           "@id": "ex:a", "@type": "T", "ex:q": {}}
    assert expand(doc) == [{"@id": EX + "a",
                            "@type": [EX + "T"],
                            EX + "q": [{}]}]
