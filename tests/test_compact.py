"""Document-level Compaction tests ([spec] JLD-API §6; SURVEY.md §5.1:
the reference's suite ran `compact` cases, [v0.5.0] test/test_compaction.py).

Semantic oracle over the whole golden corpus, with two contexts per case:
- the EMPTY context (exercises value compaction + array collapse alone);
- the fixture's own @context (the realistic round trip).
Both must satisfy ``to_rdf(compact(doc, C), C) ≅ to_rdf(doc)``.
"""

import json
from pathlib import Path

import pytest

from rdflib_jsonld_spark.jsonld import to_rdf
from rdflib_jsonld_spark.jsonld.compact import compact
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld import nquads

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tordf"
FIXTURES = [p for p in sorted(FIXTURE_DIR.glob("*.json"))
            if "expect_error" not in json.loads(p.read_text())
            # no_roundtrip: spec-correct but not base-stable (e.g.
            # @base:null keeps relative IRIs that re-resolve differently
            # once the expanded form loses the original context)
            and not json.loads(p.read_text()).get("no_roundtrip")]


def _direct(case):
    opts = case.get("options", {})
    return to_rdf(case["input"], base=opts.get("base"),
                  registry=case.get("registry"),
                  generalized_rdf=opts.get("generalized_rdf", False),
                  allow_lists_of_lists=opts.get("allow_lists_of_lists", True))


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_compact_empty_context_roundtrip(path):
    case = json.loads(path.read_text())
    opts = case.get("options", {})
    base = opts.get("base")
    direct = _direct(case)
    compacted = compact(case["input"], None, base=base,
                        registry=case.get("registry"))
    back = to_rdf(compacted, base=base,
                  generalized_rdf=opts.get("generalized_rdf", False),
                  allow_lists_of_lists=opts.get("allow_lists_of_lists", True))
    assert isomorphic(direct, back), (
        f"{path.stem}:\nDIRECT:\n{nquads.serialize(direct)}\n"
        f"BACK:\n{nquads.serialize(back)}\n"
        f"COMPACTED:\n{json.dumps(compacted, indent=1)}"
    )


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_compact_own_context_roundtrip(path):
    case = json.loads(path.read_text())
    inp = case["input"]
    ctx_data = inp.get("@context") if isinstance(inp, dict) else None
    if ctx_data is None:
        pytest.skip("fixture has no @context")
    opts = case.get("options", {})
    base = opts.get("base")
    direct = _direct(case)
    compacted = compact(inp, ctx_data, base=base,
                        registry=case.get("registry"))
    back = to_rdf(compacted, base=base, registry=case.get("registry"),
                  generalized_rdf=opts.get("generalized_rdf", False),
                  allow_lists_of_lists=opts.get("allow_lists_of_lists", True))
    assert isomorphic(direct, back), (
        f"{path.stem}:\nDIRECT:\n{nquads.serialize(direct)}\n"
        f"BACK:\n{nquads.serialize(back)}\n"
        f"COMPACTED:\n{json.dumps(compacted, indent=1)}"
    )


# ---------------------------------------------------------------------------
# shape goldens
# ---------------------------------------------------------------------------

def test_direction_free_value_stays_wrapped_under_default_direction():
    """r02 review regression: a direction-FREE {'@value': 'x'} must not
    compact to a bare string under a context with default @direction —
    re-expansion would inject the direction (the 'bare only if
    re-expansion adds nothing back' invariant)."""
    ctx = {"p": "http://ex.org/p", "@direction": "rtl"}
    doc = [{"http://ex.org/p": [{"@value": "x"}]}]
    out = compact(doc, ctx)
    assert out["p"] == {"@value": "x"}, out
    # and the quad-level round trip holds
    from rdflib_jsonld_spark.jsonld import to_rdf
    from rdflib_jsonld_spark.jsonld.compare import isomorphic
    assert isomorphic(to_rdf(doc), to_rdf(out))


def test_readme_doctest_compaction():
    """[checkout] README.md:68-77 — the vocab+language compaction example."""
    doc = {"@context": {"dcterms": "http://purl.org/dc/terms/"},
           "@id": "http://example.org/about",
           "dcterms:title": {"@value": "Someone's Homepage",
                             "@language": "en"}}
    ctx = {"@vocab": "http://purl.org/dc/terms/", "@language": "en"}
    assert compact(doc, ctx) == {
        "@context": ctx,
        "@id": "http://example.org/about",
        "title": "Someone's Homepage",
    }


def test_term_selection_prefers_matching_container():
    ctx = {"ex": "http://e/", "plain": "ex:p",
           "listy": {"@id": "ex:p", "@container": "@list"}}
    doc = [{"@id": "http://e/a",
            "http://e/p": [{"@list": [{"@value": "x"}, {"@value": "y"}]}]}]
    out = compact(doc, ctx, expanded=True)
    assert out["listy"] == ["x", "y"]
    doc2 = [{"@id": "http://e/a", "http://e/p": [{"@value": "z"}]}]
    assert compact(doc2, ctx, expanded=True)["plain"] == "z"


def test_language_map_reconstruction():
    ctx = {"label": {"@id": "http://e/label", "@container": "@language"}}
    doc = [{"@id": "http://e/a",
            "http://e/label": [{"@value": "cat", "@language": "en"},
                               {"@value": "Katze", "@language": "de"}]}]
    out = compact(doc, ctx, expanded=True)
    assert out["label"] == {"en": "cat", "de": "Katze"}


def test_index_map_reconstruction():
    ctx = {"tags": {"@id": "http://e/tags", "@container": "@index"}}
    doc = [{"@id": "http://e/a",
            "http://e/tags": [{"@value": "x", "@index": "t1"},
                              {"@value": "y", "@index": "t2"}]}]
    out = compact(doc, ctx, expanded=True)
    assert out["tags"] == {"t1": "x", "t2": "y"}


def test_id_coercion_compacts_node_refs_to_strings():
    ctx = {"ex": "http://e/", "knows": {"@id": "ex:knows", "@type": "@id"}}
    doc = [{"@id": "http://e/a", "http://e/knows": [{"@id": "http://e/b"}]}]
    out = compact(doc, ctx, expanded=True)
    assert out["knows"] == "ex:b"
    assert out["@id"] == "ex:a"  # CURIE via prefix, no @vocab in @id position


def test_type_coercion_strips_value_objects():
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    ctx = {"age": {"@id": "http://e/age", "@type": xsd_int}}
    doc = [{"@id": "http://e/a",
            "http://e/age": [{"@value": 7, "@type": xsd_int}]}]
    assert compact(doc, ctx, expanded=True)["age"] == 7


def test_keyword_aliases_honored():
    ctx = {"id": "@id", "type": "@type", "ex": "http://e/"}
    doc = [{"@id": "http://e/a", "@type": ["http://e/T"]}]
    out = compact(doc, ctx, expanded=True)
    assert out == {"@context": ctx, "id": "ex:a", "type": "ex:T"}


def test_reverse_term_lifts_reverse_map():
    ctx = {"childOf": {"@reverse": "http://e/parentOf"}}
    doc = [{"@id": "http://e/a",
            "@reverse": {"http://e/parentOf": [{"@id": "http://e/b"}]}}]
    out = compact(doc, ctx, expanded=True)
    assert out["childOf"] == {"@id": "http://e/b"}


def test_multiple_top_level_nodes_under_graph():
    doc = [{"@id": "http://e/a", "http://e/p": [{"@value": "x"}]},
           {"@id": "http://e/b", "http://e/p": [{"@value": "y"}]}]
    out = compact(doc, None, expanded=True)
    assert set(out) == {"@graph"}
    assert [n["@id"] for n in out["@graph"]] == ["http://e/a", "http://e/b"]


# -- sweep 6e: @none keys in container maps ([spec] §6.1 12.8.6/12.8.8-9) --

def _cx(ctx, doc):
    from rdflib_jsonld_spark.jsonld.expansion import expand
    out = compact(expand(doc), ctx)
    out.pop("@context", None)
    return out


def test_language_map_none_key():
    """Entries without @language key under @none instead of escaping
    the map to the raw-IRI fallback (sweep 6e)."""
    out = _cx({"p": {"@id": "http://e/p", "@container": "@language"}},
              {"@id": "http://e/a",
               "http://e/p": [{"@value": "hallo", "@language": "de"},
                              {"@value": "plain"}]})
    assert out == {"@id": "http://e/a",
                   "p": {"de": "hallo", "@none": "plain"}}


def test_index_map_none_key():
    out = _cx({"p": {"@id": "http://e/p", "@container": "@index"}},
              {"@id": "http://e/a",
               "http://e/p": [{"@value": "a", "@index": "i1"},
                              {"@value": "b"}]})
    assert out == {"@id": "http://e/a", "p": {"i1": "a", "@none": "b"}}


def test_id_map_none_key():
    out = _cx({"p": {"@id": "http://e/p", "@container": "@id"},
               "q": "http://e/q"},
              {"@id": "http://e/a",
               "http://e/p": [{"@id": "http://e/n1", "http://e/q": "x"},
                              {"http://e/q": "y"}]})
    assert out == {"@id": "http://e/a",
                   "p": {"http://e/n1": {"q": "x"}, "@none": {"q": "y"}}}


def test_type_map_none_key():
    out = _cx({"p": {"@id": "http://e/p", "@container": "@type"},
               "q": "http://e/q"},
              {"@id": "http://e/a",
               "http://e/p": [{"@id": "http://e/n1",
                               "@type": "http://e/T", "http://e/q": "x"},
                              {"@id": "http://e/n2", "http://e/q": "y"}]})
    assert out == {"@id": "http://e/a",
                   "p": {"http://e/T": {"@id": "http://e/n1", "q": "x"},
                         "@none": {"@id": "http://e/n2", "q": "y"}}}


def test_typed_value_never_enters_language_map():
    """A typed value under a language-container term must fall back to
    the explicit form — a map entry would lose the datatype."""
    out = _cx({"p": {"@id": "http://e/p", "@container": "@language"}},
              {"@id": "http://e/a",
               "http://e/p": [{"@value": "5",
                               "@type": "http://www.w3.org/2001/"
                                        "XMLSchema#integer"}]})
    assert out["http://e/p"] == {
        "@value": "5",
        "@type": "http://www.w3.org/2001/XMLSchema#integer"}


def test_mismatched_direction_never_enters_language_map():
    """An item whose @direction differs from the context default cannot
    live in a language map (entries re-expand WITH the default)."""
    out = _cx({"p": {"@id": "http://e/p", "@container": "@language"},
               "@direction": "rtl"},
              {"@id": "http://e/a",
               "http://e/p": [{"@value": "x", "@language": "en",
                               "@direction": "ltr"}]})
    assert out["http://e/p"] == {"@value": "x", "@language": "en",
                                 "@direction": "ltr"}


class TestSweep33ScopedCompaction:
    """Sweep 33 — compaction applies scoped contexts ([spec] JLD-API
    §6.1 steps 2/5/9): before this sweep compaction ignored property-
    and type-scoped contexts entirely, so scoped terms never won term
    selection (round trips held, but shapes diverged from conformant
    processors)."""

    EX = "http://ex/"

    def _c(self, expanded, ctx):
        return compact(expanded, ctx, expanded=True)

    def test_type_scoped_term_wins_selection(self):
        ctx = {"@vocab": self.EX,
               "T": {"@id": self.EX + "T",
                     "@context": {"items": {"@id": self.EX + "i",
                                            "@container": "@list"}}}}
        expanded = [{"@id": self.EX + "a", "@type": [self.EX + "T"],
                     self.EX + "i": [{"@list": [{"@value": 1},
                                                {"@value": 2}]}]}]
        out = self._c(expanded, ctx)
        assert out["items"] == [1, 2]
        assert isomorphic(to_rdf(expanded), to_rdf(out))

    def test_property_scoped_term_wins_selection(self):
        ctx = {"@vocab": self.EX,
               "branch": {"@id": self.EX + "branch",
                          "@context": {"deep": self.EX + "deep_p"}}}
        expanded = [{"@id": self.EX + "a",
                     self.EX + "branch": [
                         {"@id": self.EX + "b",
                          self.EX + "deep_p": [{"@value": "x"}]}]}]
        out = self._c(expanded, ctx)
        assert out["branch"]["deep"] == "x"
        assert isomorphic(to_rdf(expanded), to_rdf(out))

    def test_property_scope_propagates_to_grandchild(self):
        ctx = {"@vocab": self.EX,
               "branch": {"@id": self.EX + "branch",
                          "@context": {"deep": self.EX + "deep_p"}}}
        expanded = [{"@id": self.EX + "a",
                     self.EX + "branch": [
                         {"@id": self.EX + "b",
                          self.EX + "branch": [
                              {"@id": self.EX + "c",
                               self.EX + "deep_p": [{"@value": "y"}]}]}]}]
        out = self._c(expanded, ctx)
        assert out["branch"]["branch"]["deep"] == "y"

    def test_type_scope_does_not_reach_untyped_child(self):
        ctx = {"@vocab": self.EX, "knows": {"@id": self.EX + "knows"},
               "T": {"@id": self.EX + "T",
                     "@context": {"nick": self.EX + "secret"}}}
        expanded = [{"@id": self.EX + "a", "@type": [self.EX + "T"],
                     self.EX + "secret": [{"@value": "me"}],
                     self.EX + "knows": [
                         {"@id": self.EX + "b",
                          self.EX + "secret": [{"@value": "you"}]}]}]
        out = self._c(expanded, ctx)
        assert out["nick"] == "me"
        # untyped child reverts: the scoped term must NOT be chosen
        assert out["knows"]["secret"] == "you"
        assert "nick" not in out["knows"]
        assert isomorphic(to_rdf(expanded), to_rdf(out))

    def test_type_scope_reaches_container_map_entries(self):
        ctx = {"@vocab": self.EX,
               "byid": {"@id": self.EX + "byid", "@container": "@id"},
               "T": {"@id": self.EX + "T",
                     "@context": {"nick": self.EX + "secret"}}}
        expanded = [{"@id": self.EX + "a", "@type": [self.EX + "T"],
                     self.EX + "byid": [
                         {"@id": self.EX + "k",
                          self.EX + "secret": [{"@value": "kept"}]}]}]
        out = self._c(expanded, ctx)
        assert out["byid"][self.EX + "k"]["nick"] == "kept"
        assert isomorphic(to_rdf(expanded), to_rdf(out))


class TestSweep35CompactArraysFalse:
    """Sweep 35 — found by a 2000-example compact fuzz through
    flatten's compact_arrays=False path: wrappers that MUST collapse
    (or split) regardless of compactArrays because the array shape is
    semantic, not cosmetic."""

    EX = "http://ex/"

    def test_json_single_value_collapses_without_compact_arrays(self):
        ctx = {"jv": {"@id": self.EX + "jv", "@type": "@json"}}
        expanded = [{"@id": self.EX + "a",
                     self.EX + "jv": [{"@value": [], "@type": "@json"}]}]
        out = compact(expanded, ctx, expanded=True, compact_arrays=False)
        # [[]] would re-expand as ONE literal '[[]]' (step 13.6)
        node = out["@graph"][0] if "@graph" in out else out
        assert node["jv"] == []
        assert isomorphic(to_rdf(expanded), to_rdf(out))

    def test_two_lists_never_share_a_list_container_key(self):
        ctx = {"items": {"@id": self.EX + "i", "@container": "@list"}}
        expanded = [{"@id": self.EX + "a",
                     self.EX + "i": [{"@list": [{"@value": 1}]},
                                     {"@list": [{"@value": 2},
                                                {"@value": 3}]}]}]
        out = compact(expanded, ctx, expanded=True)
        node = out["@graph"][0] if "@graph" in out else out
        # falls back to the IRI key with explicit @list wrappers
        assert self.EX + "i" in node
        assert {"@list": [1]} in node[self.EX + "i"]
        assert isomorphic(to_rdf(expanded), to_rdf(out))

    def test_single_list_still_folds_into_container(self):
        ctx = {"items": {"@id": self.EX + "i", "@container": "@list"}}
        expanded = [{"@id": self.EX + "a",
                     self.EX + "i": [{"@list": [{"@value": 1},
                                                {"@value": 2}]}]}]
        out = compact(expanded, ctx, expanded=True)
        node = out["@graph"][0] if "@graph" in out else out
        assert node["items"] == [1, 2]
