"""JSON-LD 1.1 Framing (jsonld/frame.py) — pure core.

The library/book/chapter document is the framing spec's own running
example ([spec] json-ld11-framing §1); expected shapes hand-derived."""

import pytest

from rdflib_jsonld_spark.jsonld.frame import frame

EX = "http://example.org/"

LIBRARY = {
    "@context": {"@vocab": EX},
    "@graph": [
        {"@id": f"{EX}library", "@type": "Library",
         "contains": {"@id": f"{EX}library/the-republic"}},
        {"@id": f"{EX}library/the-republic", "@type": "Book",
         "creator": "Plato", "title": "The Republic",
         "contains": {"@id": f"{EX}library/the-republic#introduction"}},
        {"@id": f"{EX}library/the-republic#introduction",
         "@type": "Chapter", "title": "The Introduction",
         "description": "An introductory chapter on The Republic."},
    ],
}

CTX = {"@vocab": EX}


def test_library_nested_embed():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Library",
                          "contains": {"@type": "Book",
                                       "contains": {"@type": "Chapter"}}},
                compact_output=False)
    lib, = out
    assert lib["@id"] == f"{EX}library"
    book, = lib[f"{EX}contains"]
    assert book["@type"] == [f"{EX}Book"]
    assert book[f"{EX}creator"] == [{"@value": "Plato"}]
    chapter, = book[f"{EX}contains"]
    assert chapter["@type"] == [f"{EX}Chapter"]
    assert chapter[f"{EX}title"] == [{"@value": "The Introduction"}]


def test_library_compacted_output():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Library"})
    assert out["@context"] == CTX
    node, = out["@graph"]
    assert node["@type"] == "Library"
    # default @embed "@once": the chain embeds through contains
    assert node["contains"]["contains"]["title"] == "The Introduction"


def test_type_match_selects_only_that_type():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Book"},
                compact_output=False)
    ids = [n["@id"] for n in out]
    assert ids == [f"{EX}library/the-republic"]


def test_id_match():
    out = frame(LIBRARY,
                {"@context": CTX, "@id": f"{EX}library/the-republic"},
                compact_output=False)
    node, = out
    assert node[f"{EX}title"] == [{"@value": "The Republic"}]


def test_embed_never_keeps_references():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Library",
                          "@embed": "@never"}, compact_output=False)
    lib, = out
    assert lib[f"{EX}contains"] == [{"@id": f"{EX}library/the-republic"}]


def test_embed_once_second_reference_stays_ref():
    doc = {
        "@context": {"@vocab": EX},
        "@graph": [
            {"@id": f"{EX}a", "@type": "T", "p": {"@id": f"{EX}shared"}},
            {"@id": f"{EX}b", "@type": "T", "p": {"@id": f"{EX}shared"}},
            {"@id": f"{EX}shared", "q": "v"},
        ],
    }
    out = frame(doc, {"@context": CTX, "@type": "T"},
                compact_output=False)
    a, b = out
    embedded = [n[f"{EX}p"][0] for n in (a, b)]
    full = [e for e in embedded if f"{EX}q" in e]
    refs = [e for e in embedded if set(e) == {"@id"}]
    assert len(full) == 1 and len(refs) == 1
    # @always embeds everywhere
    out2 = frame(doc, {"@context": CTX, "@type": "T",
                       "@embed": "@always"}, compact_output=False)
    assert all(f"{EX}q" in n[f"{EX}p"][0] for n in out2)


def test_explicit_restricts_properties():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Book",
                          "@explicit": True, "title": {}},
                compact_output=False)
    book, = out
    assert f"{EX}title" in book
    assert f"{EX}creator" not in book and f"{EX}contains" not in book


def test_default_fills_missing_property():
    out = frame(LIBRARY, {"@context": CTX, "@type": "Chapter",
                          "isbn": {"@default": "unknown"}},
                compact_output=False)
    chapter, = out
    assert chapter[f"{EX}isbn"] == [{"@value": "unknown"}]
    out2 = frame(LIBRARY, {"@context": CTX, "@type": "Chapter",
                           "@omitDefault": True,
                           "isbn": {"@default": "unknown"}},
                 compact_output=False)
    assert f"{EX}isbn" not in out2[0]


def test_require_all_and_property_presence():
    fr = {"@context": CTX, "title": {}, "creator": {}}
    # default (any-property): Chapter matches via title
    any_ids = {n["@id"] for n in frame(LIBRARY, fr,
                                       compact_output=False)}
    assert f"{EX}library/the-republic#introduction" in any_ids
    # requireAll: only the Book has BOTH title and creator
    all_ids = {n["@id"] for n in frame(LIBRARY,
                                       {**fr, "@requireAll": True},
                                       compact_output=False)}
    assert all_ids == {f"{EX}library/the-republic"}


def test_match_none_type():
    doc = {"@context": {"@vocab": EX},
           "@graph": [{"@id": f"{EX}x", "@type": "T", "p": "1"},
                      {"@id": f"{EX}y", "p": "2"}]}
    out = frame(doc, {"@context": CTX, "@type": []},
                compact_output=False)
    assert [n["@id"] for n in out] == [f"{EX}y"]


def test_value_pattern_match():
    out = frame(LIBRARY, {"@context": CTX,
                          "creator": {"@value": "Plato"}},
                compact_output=False)
    node, = out
    assert node["@id"] == f"{EX}library/the-republic"
    assert frame(LIBRARY, {"@context": CTX,
                           "creator": {"@value": "Homer"}},
                 compact_output=False) == []


def test_cycle_protection():
    doc = {"@context": {"@vocab": EX},
           "@graph": [{"@id": f"{EX}a", "@type": "T",
                       "p": {"@id": f"{EX}b"}},
                      {"@id": f"{EX}b", "p": {"@id": f"{EX}a"}}]}
    out = frame(doc, {"@context": CTX, "@type": "T",
                      "@embed": "@always"}, compact_output=False)
    a, = out
    b = a[f"{EX}p"][0]
    assert b[f"{EX}p"] == [{"@id": f"{EX}a"}]   # back-ref, not loop


def test_bad_embed_mode():
    from rdflib_jsonld_spark.jsonld.errors import InvalidEmbedValue
    with pytest.raises(InvalidEmbedValue, match="@embed"):
        frame(LIBRARY, {"@context": CTX, "@embed": "@sometimes"})


def test_type_match_suffices_without_property(spark=None):
    """requireAll=false: a node matching on @type frames even when a
    default-less frame property is absent ([spec] §3.2 step 2.5 — the
    r03 sweep-6 fix)."""
    from rdflib_jsonld_spark.jsonld.frame import frame
    doc = {"@graph": [
        {"@id": "http://e/a", "@type": "http://e/T",
         "http://e/child": {"@id": "http://e/b"}},
        {"@id": "http://e/b", "@type": "http://e/U",
         "http://e/name": "bee"}]}
    out = frame(doc, {"@type": "http://e/T", "@omitDefault": True,
                      "http://e/missing": {}})
    assert [n["@id"] for n in out["@graph"]] == ["http://e/a"]
    assert "http://e/missing" not in out["@graph"][0]
    # requireAll=true still demands the property
    strict = frame(doc, {"@type": "http://e/T", "@requireAll": True,
                         "http://e/missing": {}})
    assert strict["@graph"] == []


# ---------------------------------------------------------------------------
# Named-graph-scoped framing ([spec] Framing §4.3)
# ---------------------------------------------------------------------------

DATASET = {
    "@context": {"@vocab": EX},
    "@graph": [
        {"@id": f"{EX}graphs/g1",
         "@graph": [
             {"@id": f"{EX}alice", "@type": "Person", "name": "Alice",
              "knows": {"@id": f"{EX}carol"}},
             {"@id": f"{EX}bob", "@type": "Person", "name": "Bob"},
         ]},
        {"@id": f"{EX}graphs/g2",
         "@graph": [
             {"@id": f"{EX}carol", "@type": "Person", "name": "Carol"},
             {"@id": f"{EX}w1", "@type": "Widget", "name": "Gear"},
         ]},
        {"@id": f"{EX}dave", "@type": "Person", "name": "Dave"},
    ],
}


def test_graph_frame_selects_named_graph():
    out = frame(DATASET, {"@context": CTX, "@id": f"{EX}graphs/g1",
                          "@graph": [{"@type": "Person"}]},
                compact_output=False)
    g, = out
    assert g["@id"] == f"{EX}graphs/g1"
    names = {n["@id"] for n in g["@graph"]}
    # only g1's nodes; default-graph dave and g2's carol absent
    assert names == {f"{EX}alice", f"{EX}bob"}


def test_graph_frame_does_not_embed_across_graphs():
    out = frame(DATASET, {"@context": CTX, "@id": f"{EX}graphs/g1",
                          "@graph": [{"@type": "Person"}]},
                compact_output=False)
    g, = out
    alice = next(n for n in g["@graph"] if n["@id"] == f"{EX}alice")
    # carol lives in g2: the reference must stay a bare node reference
    assert alice[f"{EX}knows"] == [{"@id": f"{EX}carol"}]


def test_graph_frame_wildcard_frames_every_named_graph():
    out = frame(DATASET, {"@context": CTX,
                          "@graph": [{"@type": "Person"}]},
                compact_output=False)
    assert [g["@id"] for g in out] == [f"{EX}graphs/g1",
                                       f"{EX}graphs/g2"]
    by_g = {g["@id"]: {n["@id"] for n in g["@graph"]} for g in out}
    assert by_g[f"{EX}graphs/g1"] == {f"{EX}alice", f"{EX}bob"}
    # g2: only carol matches @type Person — the Widget is filtered
    assert by_g[f"{EX}graphs/g2"] == {f"{EX}carol"}


def test_graph_frame_inner_flags_and_compaction():
    out = frame(DATASET, {"@context": CTX, "@id": f"{EX}graphs/g1",
                          "@graph": [{"@type": "Person",
                                      "@explicit": True,
                                      "name": {}}]})
    # compaction lifts the single graph node to the top level
    assert out["@id"] == f"{EX}graphs/g1"
    nodes = out["@graph"]
    nodes = nodes if isinstance(nodes, list) else [nodes]
    assert {n["@id"] for n in nodes} == {f"{EX}alice", f"{EX}bob"}
    for n in nodes:
        assert "name" in n
        assert "knows" not in n  # @explicit inside the graph frame


def test_graph_frame_match_none_id_yields_empty():
    out = frame(DATASET, {"@context": CTX, "@id": [],
                          "@graph": [{"@type": "Person"}]},
                compact_output=False)
    assert out == []


# --- sweep 15: hand-adjudicated framing corners ------------------------------

CTX15 = {"@vocab": "http://e/"}
LIB15 = {"@context": CTX15, "@graph": [
    {"@id": "http://x/lib", "@type": "Library", "name": "L",
     "contains": {"@id": "http://x/book"}},
    {"@id": "http://x/book", "@type": "Book", "title": "T1",
     "author": {"@id": "http://x/al"}},
    {"@id": "http://x/al", "@type": "Person", "name": "Al", "age": 9},
]}


class TestSweep15Corners:
    def test_omit_default_per_property_flag(self):
        data = {"@context": CTX15, "@graph": [
            {"@id": "http://x/book", "@type": "Book", "title": "T1"}]}
        # property-level @omitDefault true suppresses the fill
        # (sweep 15 bug: the flag was read at node level only)
        out = frame(data, {"@context": CTX15, "@type": "Book",
                           "author": {"@default": "anon",
                                      "@omitDefault": True}})
        assert "author" not in out["@graph"][0]
        # node-level omit, property overrides back to filling
        out = frame(data, {"@context": CTX15, "@type": "Book",
                           "@omitDefault": True,
                           "author": {"@default": "anon",
                                      "@omitDefault": False}})
        assert out["@graph"][0]["author"] == "anon"
        # node-level omit inherited when the property stays silent
        out = frame(data, {"@context": CTX15, "@type": "Book",
                           "@omitDefault": True,
                           "author": {"@default": "anon"}})
        assert "author" not in out["@graph"][0]

    def test_nested_frame_shapes_embedded_node(self):
        out = frame(LIB15, {"@context": CTX15, "@type": "Library",
                            "contains": {"@explicit": True, "title": {}}})
        book = out["@graph"][0]["contains"]
        assert book["title"] == "T1" and "author" not in book

    def test_type_wildcard_and_match_none(self):
        data = {"@context": CTX15, "@graph": [
            {"@id": "http://x/t", "@type": "T", "p": 1},
            {"@id": "http://x/u", "p": 2}]}
        out = frame(data, {"@context": CTX15, "@type": []})
        assert [n["@id"] for n in out["@graph"]] == ["http://x/u"]
        out = frame(data, {"@context": CTX15, "@type": {}})
        assert [n["@id"] for n in out["@graph"]] == ["http://x/t"]

    def test_value_pattern_language_and_wildcard(self):
        data = {"@context": CTX15, "@graph": [
            {"@id": "http://x/a", "lbl": {"@value": "x",
                                          "@language": "en"}},
            {"@id": "http://x/b", "lbl": {"@value": "x",
                                          "@language": "fr"}}]}
        out = frame(data, {"@context": CTX15,
                           "lbl": {"@value": "x", "@language": "en"}})
        assert [n["@id"] for n in out["@graph"]] == ["http://x/a"]
        out = frame(data, {"@context": CTX15,
                           "lbl": {"@value": {}, "@language": "fr"}})
        assert [n["@id"] for n in out["@graph"]] == ["http://x/b"]

    def test_embed_never_inherits_into_properties(self):
        out = frame(LIB15, {"@context": CTX15, "@type": "Library",
                            "@embed": "@never", "contains": {}})
        assert out["@graph"][0]["contains"] == {"@id": "http://x/book"}

    def test_embed_once_shared_node(self):
        data = {"@context": CTX15, "@graph": [
            {"@id": "http://x/a", "@type": "T", "p": {"@id": "http://x/c"}},
            {"@id": "http://x/b", "@type": "T", "p": {"@id": "http://x/c"}},
            {"@id": "http://x/c", "v": 1}]}
        out = frame(data, {"@context": CTX15, "@type": "T"})
        embeds = [n["p"] for n in out["@graph"]]
        assert {json_shape(e) for e in embeds} == {"full", "ref"}
        out = frame(data, {"@context": CTX15, "@type": "T",
                           "@embed": "@always"})
        assert all(json_shape(n["p"]) == "full" for n in out["@graph"])

    def test_numeric_value_pattern(self):
        out = frame(LIB15, {"@context": CTX15, "age": {"@value": 9}})
        assert [n["@id"] for n in out["@graph"]] == ["http://x/al"]


def json_shape(node) -> str:
    return "ref" if set(node) == {"@id"} else "full"


class TestSweep28Corners:
    """Sweep 28 — framing deep probe ([spec] json-ld11-framing):
    boolean @embed aliases (§4.2), @default @null/JSON-null (§3.1),
    value patterns inside @list (§3.2), @reverse framing (§3.1)."""

    DOC = {
        "@context": CTX,
        "@graph": [
            {"@id": f"{EX}a", "@type": "T", "name": "A",
             "knows": {"@id": f"{EX}b"}},
            {"@id": f"{EX}b", "@type": "T", "name": "B",
             "likes": {"@id": f"{EX}a"}},
        ],
    }

    def test_boolean_embed_true_is_once(self):
        out = frame(self.DOC, {"@context": CTX, "@type": "T",
                               "@embed": True})
        shapes = {json_shape(n["knows"]) if "knows" in n
                  else json_shape(n["likes"]) for n in out["@graph"]}
        # @once: first reference embeds, already-embedded stays a ref
        assert "full" in shapes

    def test_boolean_embed_false_is_never(self):
        out = frame(self.DOC, {"@context": CTX, "@type": "T",
                               "@embed": False})
        for n in out["@graph"]:
            ref = n.get("knows") or n.get("likes")
            assert json_shape(ref) == "ref"

    def test_embed_link_still_invalid(self):
        from rdflib_jsonld_spark.jsonld.errors import InvalidEmbedValue
        with pytest.raises(InvalidEmbedValue):
            frame(self.DOC, {"@context": CTX, "@embed": "@link"})

    @pytest.mark.parametrize("dv", [None, "@null"])
    def test_default_null_emits_json_null(self, dv):
        out = frame(self.DOC, {"@context": CTX, "@id": f"{EX}a",
                               "missing": {"@default": dv}})
        assert out["@graph"][0]["missing"] is None

    def test_default_null_expanded_output(self):
        out = frame(self.DOC, {"@context": CTX, "@id": f"{EX}a",
                               "missing": {"@default": "@null"}},
                    compact_output=False)
        assert out[0][f"{EX}missing"] == [None]

    def test_value_pattern_matches_inside_list(self):
        doc = {"@context": {"@vocab": EX,
                            "tags": {"@container": "@list"}},
               "@graph": [
                   {"@id": f"{EX}x", "tags": ["red", "blue"]},
                   {"@id": f"{EX}y", "tags": ["green"]}]}
        fr = {"@context": {"@vocab": EX,
                           "tags": {"@container": "@list"}},
              "tags": {"@value": "red"}}
        out = frame(doc, fr)
        assert [n["@id"] for n in out["@graph"]] == [f"{EX}x"]

    def test_reverse_framing_embeds_referrers(self):
        fr = {"@context": CTX, "@id": f"{EX}a",
              "@reverse": {"likes": {"@embed": "@never"}}}
        out = frame(self.DOC, fr)
        node = out["@graph"][0]
        assert node["@reverse"]["likes"] == {"@id": f"{EX}b"}

    def test_reverse_framing_full_embed_and_subframe(self):
        doc = {"@context": CTX, "@graph": [
            {"@id": f"{EX}root", "@type": "R"},
            {"@id": f"{EX}c1", "parent": {"@id": f"{EX}root"},
             "name": "c1", "extra": 1},
            {"@id": f"{EX}c2", "parent": {"@id": f"{EX}root"},
             "name": "c2"}]}
        fr = {"@context": CTX, "@type": "R",
              "@reverse": {"parent": {"@explicit": True, "name": {}}}}
        out = frame(doc, fr)
        kids = out["@graph"][0]["@reverse"]["parent"]
        assert sorted(k["name"] for k in kids) == ["c1", "c2"]
        assert all("extra" not in k for k in kids)

    def test_reverse_framing_sees_list_references(self):
        doc = {"@context": {"@vocab": EX,
                            "members": {"@container": "@list"}},
               "@graph": [
                   {"@id": f"{EX}g", "members": [{"@id": f"{EX}m"}]},
                   {"@id": f"{EX}m", "@type": "M"}]}
        fr = {"@context": {"@vocab": EX}, "@type": "M",
              "@reverse": {"members": {"@embed": "@never"}}}
        out = frame(doc, fr)
        assert out["@graph"][0]["@reverse"]["members"] == \
            {"@id": f"{EX}g"}
