"""Sweep 22: IRI-compaction candidate guards ([spec] JSON-LD 1.1 API
§6.3 IRI Compaction steps 19-20, §5.2 IRI Expansion step 6.2).

Bug class found: ``shrink_iri``/``_compact_id`` emitted candidate
spellings that RE-EXPAND TO A DIFFERENT IRI — graph-changing output.
Eight probes failed before the fix:

- a @vocab-relative suffix that is a defined term mapping elsewhere,
  contains a colon (re-expands down the CURIE/absolute-IRI path), or
  spells a keyword;
- a CURIE whose full spelling is a defined term mapping elsewhere
  (term definitions shadow prefix resolution on re-expansion), or
  whose suffix begins with ``//`` (step 6.2 returns the spelling
  verbatim as an IRI) — in property/@type position and @id position;
- the longest-prefix CURIE being rejected must fall back to a
  shorter prefix, not to the absolute IRI.

Oracle: ``expand(compact(doc, ctx)) == expand(doc)`` — compaction may
change the spelling of a document, never its graph.
"""

import json

import pytest

from rdflib_jsonld_spark.jsonld.compact import compact
from rdflib_jsonld_spark.jsonld.expansion import expand

CASES = [
    ("vocab_suffix_term_collision",
     {"@context": {"@vocab": "http://v/"}, "http://v/name": "x"},
     {"@vocab": "http://v/", "name": "http://other/x"}),
    ("vocab_suffix_colon",
     {"http://v/a:b": "x"}, {"@vocab": "http://v/"}),
    ("vocab_suffix_keyword",
     {"http://v/@type": "v"}, {"@vocab": "http://v/"}),
    ("curie_term_collision",
     {"http://a/x": "v"},
     {"p": {"@id": "http://a/", "@prefix": True},
      "p:x": "http://b/y"}),
    ("curie_suffix_slashes",
     {"http://a//weird": "v"},
     {"p": {"@id": "http://a", "@prefix": True}}),
    ("id_curie_term_collision",
     {"@id": "http://a/x", "http://q/p": "v"},
     {"p": {"@id": "http://a/", "@prefix": True},
      "p:x": "http://b/y"}),
    ("id_curie_suffix_slashes",
     {"@id": "http://a//weird", "http://q/p": "v"},
     {"p": {"@id": "http://a", "@prefix": True}}),
    ("type_vocab_collision",
     {"@type": "http://v/T", "http://q/p": "v"},
     {"@vocab": "http://v/", "T": "http://other/T"}),
    ("type_coerced_term_spelling",
     {"@type": "http://v/T", "http://q/p": "v"},
     {"t": {"@id": "http://v/T", "@type": "@id"}}),
    ("curie_fallback_shorter_prefix",
     {"http://a/b/x": "v"},
     {"long": {"@id": "http://a/b/", "@prefix": True},
      "long:x": "http://elsewhere/",
      "a": {"@id": "http://a/", "@prefix": True}}),
    ("plain_vocab", {"http://v/name": "x"}, {"@vocab": "http://v/"}),
    ("plain_curie",
     {"http://a/x": "v"}, {"p": {"@id": "http://a/", "@prefix": True}}),
    ("same_iri_term_still_usable",
     {"http://v/name": "x"},
     {"@vocab": "http://v/", "name": "http://v/name"}),
]


@pytest.mark.parametrize("name,doc,cctx", CASES,
                         ids=[c[0] for c in CASES])
def test_compact_roundtrips_graph(name, doc, cctx):
    compacted = compact(doc, cctx)
    assert expand(compacted) == expand(doc), json.dumps(compacted)


@pytest.mark.parametrize("container", [["@graph", "@id"],
                                       ["@graph", "@index"], ["@graph"]])
@pytest.mark.parametrize("extra", [{}, {"@id": "http://g"},
                                   {"@index": "i"},
                                   {"@id": "http://g", "@index": "i"}])
def test_graph_map_entries_never_drop_structure(container, extra):
    """Sweep 22b: a [@graph,@id] map entry carrying @index silently lost
    it, and a [@graph,@index] entry carrying @id lost the graph NAME
    (RDF-level change). Entries with extra structure now fall through
    to the explicit graph-object wrapper."""
    doc = {"http://v/p": {"@graph": [{"http://v/q": "v"}], **extra}}
    cctx = {"@vocab": "http://v/",
            "p": {"@id": "http://v/p", "@container": container}}
    compacted = compact(doc, cctx)
    assert expand(compacted) == expand(doc), json.dumps(compacted)


def test_rejected_candidates_fall_back_correctly():
    # colliding vocab suffix → the CURIE (if any) or absolute IRI wins
    c = compact({"http://v/name": "x"},
                {"@vocab": "http://v/", "name": "http://other/x"})
    assert "http://v/name" in c
    # colliding longest-prefix CURIE → the shorter prefix's CURIE wins
    c = compact({"http://a/b/x": "v"},
                {"long": {"@id": "http://a/b/", "@prefix": True},
                 "long:x": "http://elsewhere/",
                 "a": {"@id": "http://a/", "@prefix": True}})
    assert "a:b/x" in c
