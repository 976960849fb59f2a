"""JSON-LD-star document syntax (VERDICT r04 #6): @annotation and
embedded-@id nodes through BOTH engines (expansion.py + tordf.py), the
from-RDF re-nesting direction, and compaction. [spec] JSON-LD-star
draft (json-ld-star CG report) — no reference counterpart (the checkout
predates RDF-star). Goldens 0204-0209 pin the N-Quads shapes; these
tests pin engine coherence, round trips, and the error surface."""

import pytest

from rdflib_jsonld_spark.jsonld import keys, to_rdf
from rdflib_jsonld_spark.jsonld.compact import compact
from rdflib_jsonld_spark.jsonld.errors import (InvalidAnnotation,
                                               InvalidEmbeddedNode)
from rdflib_jsonld_spark.jsonld.expansion import expand
from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
from rdflib_jsonld_spark.jsonld.tordf import IRI, LIT, QT

EX = "http://ex/"
CTX = {"ex": EX, "knows": {"@id": EX + "knows"},
       "certainty": EX + "certainty"}

ANNOT_DOC = {"@context": {"ex": EX}, "@id": "ex:a",
             "ex:knows": {"@id": "ex:b",
                          "@annotation": {"ex:certainty": "high"}}}


def test_annotation_asserts_base_and_quoted():
    quads = to_rdf(ANNOT_DOC)
    base = (None, (IRI, EX + "a"), (IRI, EX + "knows"), (IRI, EX + "b"))
    qt = (None, (QT, (base[1], base[2], base[3])),
          (IRI, EX + "certainty"),
          (LIT, "high", keys.XSD_STRING, None))
    assert sorted(map(repr, quads)) == sorted(map(repr, [base, qt]))


def test_expansion_keeps_annotation_and_both_engines_agree():
    exp = expand(ANNOT_DOC)
    assert exp[0][EX + "knows"][0][keys.ANNOTATION] == [
        {EX + "certainty": [{"@value": "high"}]}]
    assert sorted(map(repr, to_rdf(exp))) == \
        sorted(map(repr, to_rdf(ANNOT_DOC)))


def test_nested_annotation_and_value_object():
    doc = {"@context": {"ex": EX}, "@id": "ex:a",
           "ex:age": {"@value": "30",
                      "@annotation": {
                          "ex:src": {"@id": "ex:doc",
                                     "@annotation": {"ex:page": "3"}}}}}
    quads = to_rdf(doc)
    kinds = sorted(q[1][0] for q in quads)
    assert kinds == ["iri", "qt", "qt"]
    assert sorted(map(repr, to_rdf(expand(doc)))) == \
        sorted(map(repr, quads))
    # deepest subject is a nested quoted triple
    nested = [q for q in quads if q[1][0] == QT and q[1][1][0][0] == QT]
    assert len(nested) == 1 and nested[0][2] == (IRI, EX + "page")


def test_embedded_id_not_asserted():
    doc = {"@context": {"ex": EX},
           "@id": {"@id": "ex:a", "ex:p": {"@id": "ex:o"}},
           "ex:c": "z"}
    quads = to_rdf(doc)
    assert len(quads) == 1
    g, s, p, o = quads[0]
    assert s == (QT, ((IRI, EX + "a"), (IRI, EX + "p"), (IRI, EX + "o")))
    assert sorted(map(repr, to_rdf(expand(doc)))) == \
        sorted(map(repr, quads))


def test_embedded_id_with_type_property():
    doc = {"@context": {"ex": EX},
           "@id": {"@id": "ex:a", "@type": "ex:T"}, "ex:c": "z"}
    [q] = to_rdf(doc)
    assert q[1] == (QT, ((IRI, EX + "a"), (IRI, keys.RDF_TYPE),
                         (IRI, EX + "T")))


def test_from_rdf_renests_annotation():
    quads = to_rdf(ANNOT_DOC)
    back = from_rdf(quads)
    assert sorted(map(repr, to_rdf(back))) == sorted(map(repr, quads))
    node = next(n for n in back if n["@id"] == EX + "a")
    ann = node[EX + "knows"][0][keys.ANNOTATION]
    assert ann == [{EX + "certainty": [{"@value": "high"}]}]


def test_from_rdf_unasserted_base_keeps_embedded_id():
    qt = (QT, ((IRI, EX + "a"), (IRI, EX + "p"), (IRI, EX + "o")))
    quads = [(None, qt, (IRI, EX + "c"), (LIT, "z", keys.XSD_STRING,
                                          None))]
    back = from_rdf(quads)
    assert back[0]["@id"] == {"@id": EX + "a",
                              EX + "p": [{"@id": EX + "o"}]}
    assert sorted(map(repr, to_rdf(back))) == sorted(map(repr, quads))


def test_compaction_roundtrips_annotation_and_embedded():
    doc = {"@context": CTX, "@id": "ex:a",
           "knows": {"@id": "ex:b", "@annotation": {"certainty": "c1"}}}
    comp = compact(doc, CTX)
    assert comp["knows"]["@annotation"] == {"certainty": "c1"}
    assert expand(comp) == expand(doc)
    doc2 = {"@context": CTX,
            "@id": {"@id": "ex:a", "knows": {"@id": "ex:b"}},
            "certainty": "c2"}
    comp2 = compact(doc2, CTX)
    assert expand(comp2) == expand(doc2)


def test_from_rdf_with_context_compacts_annotation():
    quads = to_rdf({"@context": CTX, "@id": "ex:a",
                    "knows": {"@id": "ex:b",
                              "@annotation": {"certainty": "c"}}})
    back = from_rdf(quads, context_data=CTX)
    assert sorted(map(repr, to_rdf(back))) == sorted(map(repr, quads))


@pytest.mark.parametrize("bad,err", [
    ({"@id": "http://x/a", "@annotation": {"http://x/p": "v"}},
     InvalidAnnotation),                                  # top-level
    ({"@context": {"ex": EX}, "@id": "ex:a",
      "ex:p": {"@list": [{"@id": "ex:b",
                          "@annotation": {"ex:q": "v"}}]}},
     InvalidAnnotation),                                  # inside @list
    ({"@context": {"ex": EX}, "@id": "ex:a",
      "ex:p": {"@id": "ex:b", "@annotation": {"@id": "ex:c"}}},
     InvalidAnnotation),                                  # @id inside
    ({"@context": {"ex": EX}, "@id": "ex:a",
      "@reverse": {"ex:p": {"@id": "ex:b",
                            "@annotation": {"ex:q": "v"}}}},
     InvalidAnnotation),                                  # reverse
    ({"@context": {"ex": EX}, "@id": "ex:a",
      "@included": [{"@id": "ex:b", "ex:p": "v",
                     "@annotation": {"ex:q": "v"}}]},
     InvalidAnnotation),                                  # @included
    ({"@context": {"ex": EX}, "@id": {"@id": "ex:a"}, "ex:c": "z"},
     InvalidEmbeddedNode),                                # no property
    ({"@context": {"ex": EX},
      "@id": {"@id": "ex:a", "ex:p": "x", "ex:q": "y"}, "ex:c": "z"},
     InvalidEmbeddedNode),                                # two props
    ({"@context": {"ex": EX},
      "@id": {"@id": "ex:a", "ex:p": ["x", "y"]}, "ex:c": "z"},
     InvalidEmbeddedNode),                                # two values
    ({"@context": {"ex": EX},
      "@id": {"@id": "ex:a",
              "ex:p": {"@id": "ex:o",
                       "@annotation": {"ex:q": "v"}}}, "ex:c": "z"},
     InvalidAnnotation),  # annotation nested inside embedded value
], ids=["toplevel", "in-list", "id-inside", "reverse", "included",
        "no-prop", "two-props", "two-values", "ann-in-embedded"])
def test_error_surface_both_engines(bad, err):
    from rdflib_jsonld_spark.jsonld.errors import JsonLdError
    with pytest.raises(JsonLdError):
        expand(bad)
    with pytest.raises(JsonLdError):
        to_rdf(bad)
    # and at least one engine raises the SPECIFIC class
    raised = []
    for fn in (expand, to_rdf):
        try:
            fn(bad)
        except JsonLdError as e:
            raised.append(type(e))
    assert any(issubclass(r, err) for r in raised), raised


def test_framing_embeds_annotated_reference():
    """r05 sweep (framing × star): an @annotation on a reference rides
    the edge — it must neither block embedding of the referenced node
    nor be lost."""
    from rdflib_jsonld_spark.jsonld.frame import frame
    doc = {"@context": {"ex": EX}, "@graph": [
        {"@id": "ex:a", "@type": "ex:T",
         "ex:knows": {"@id": "ex:b",
                      "@annotation": {"ex:certainty": "high"}}},
        {"@id": "ex:b", "@type": "ex:U", "ex:name": "B"}]}
    out = frame(doc, {"@context": {"ex": EX}, "@type": "ex:T"})
    [node] = out["@graph"]
    knows = node["ex:knows"]
    assert knows["ex:name"] == "B"                    # embedded
    assert knows["@annotation"] == {"ex:certainty": "high"}  # kept


def test_framing_keeps_embedded_id_subject():
    from rdflib_jsonld_spark.jsonld.frame import frame
    doc = {"@context": {"ex": EX}, "@graph": [
        {"@id": {"@id": "ex:a", "ex:p": {"@id": "ex:o"}},
         "@type": "ex:T", "ex:c": "z"}]}
    out = frame(doc, {"@context": {"ex": EX}, "@type": "ex:T"})
    [node] = out["@graph"]
    assert node["@id"] == {"@id": "ex:a", "ex:p": {"@id": "ex:o"}}
    assert node["ex:c"] == "z"


def test_graph_container_annotation_errors_both_engines():
    """r05 sweep: a @graph-container value carrying @annotation has no
    base triple — both engines must raise (expansion silently accepted
    before)."""
    bad = {"@context": {"ex": EX,
                        "p": {"@id": EX + "p", "@container": "@graph"}},
           "@id": "ex:a",
           "p": {"@id": "ex:b", "@annotation": {"ex:c": "v"}}}
    for fn in (expand, to_rdf):
        with pytest.raises(InvalidAnnotation):
            fn(bad)
    # graph-keyed maps ([@graph, @index]) too
    bad2 = {"@context": {"ex": EX,
                         "p": {"@id": EX + "p",
                               "@container": ["@graph", "@index"]}},
            "@id": "ex:a",
            "p": {"k": {"@id": "ex:b", "@annotation": {"ex:c": "v"}}}}
    for fn in (expand, to_rdf):
        with pytest.raises(InvalidAnnotation):
            fn(bad2)


def test_nest_inside_annotation_agrees():
    """r05 sweep: @nest inside an annotation object merges into the
    quoted-triple subject in BOTH engines (the tordf fake-@id nest
    trick used to raise InvalidIdValue on qt subjects)."""
    doc = {"@context": {"ex": EX}, "@id": "ex:a",
           "ex:p": {"@id": "ex:b",
                    "@annotation": {"@nest": {"ex:c": "v"}}}}
    q1 = sorted(map(repr, to_rdf(doc)))
    q2 = sorted(map(repr, to_rdf(expand(doc))))
    assert q1 == q2
    assert any("'qt'" in q and "ex/c" in q for q in q1)


def test_annotation_through_containers_agree():
    """@annotation survives @set wrapping and @id/@index container
    unfolding identically in both engines."""
    docs = [
        {"@context": {"ex": EX}, "@id": "ex:a",
         "ex:p": {"@set": [{"@id": "ex:b",
                            "@annotation": {"ex:c": "v"}}]}},
        {"@context": {"ex": EX,
                      "p": {"@id": EX + "p", "@container": "@id"}},
         "@id": "ex:a", "p": {"ex:b": {"@annotation": {"ex:c": "v"}}}},
        {"@context": {"ex": EX,
                      "p": {"@id": EX + "p", "@container": "@index"}},
         "@id": "ex:a",
         "p": {"k": {"@id": "ex:b", "@annotation": {"ex:c": "v"}}}},
    ]
    for doc in docs:
        q1 = sorted(map(repr, to_rdf(doc)))
        q2 = sorted(map(repr, to_rdf(expand(doc))))
        assert q1 == q2, doc
        assert any("'qt'" in q for q in q1), doc


def test_from_rdf_star_graph_scoping():
    """r05 sweep: annotation quads attach only when the base triple is
    asserted in the SAME graph; a cross-graph base stays an
    embedded-@id node; duplicate annotation predicates merge values.
    All three shapes round-trip."""
    G = (IRI, EX + "g1")
    base = ((IRI, EX + "a"), (IRI, EX + "p"), (IRI, EX + "b"))
    xs = keys.XSD_STRING

    same = [(G, *base),
            (G, (QT, base), (IRI, EX + "c"), (LIT, "v", xs, None))]
    back = from_rdf(same)
    inner = back[0]["@graph"][0][EX + "p"][0]
    assert inner[keys.ANNOTATION] == [{EX + "c": [{"@value": "v"}]}]
    assert sorted(map(repr, to_rdf(back))) == sorted(map(repr, same))

    cross = [(None, *base),
             (G, (QT, base), (IRI, EX + "c"), (LIT, "v", xs, None))]
    back2 = from_rdf(cross)
    gnode = next(n for n in back2 if n["@id"] == EX + "g1")
    assert isinstance(gnode["@graph"][0]["@id"], dict)  # embedded, no attach
    assert sorted(map(repr, to_rdf(back2))) == sorted(map(repr, cross))

    multi = [(None, *base),
             (None, (QT, base), (IRI, EX + "c"), (LIT, "v", xs, None)),
             (None, (QT, base), (IRI, EX + "c"), (LIT, "w", xs, None))]
    back3 = from_rdf(multi)
    ann = back3[0][EX + "p"][0][keys.ANNOTATION]
    assert ann == [{EX + "c": [{"@value": "v"}, {"@value": "w"}]}]
    assert sorted(map(repr, to_rdf(back3))) == sorted(map(repr, multi))


class TestSweep29FramingStar:
    """Sweep 29 — framing × star interaction probes, pinned: annotated
    edges survive embedding / @explicit / value objects, framed output
    stays to_rdf-coherent with the source, and quoted-triple
    embedded-@id nodes frame as regular top-level nodes."""

    VOCAB = {"@vocab": EX}
    DOC = {"@context": VOCAB, "@graph": [
        {"@id": EX + "a", "@type": "Person", "name": "A",
         "knows": {"@id": EX + "b", "@annotation": {"since": 2020}}},
        {"@id": EX + "b", "@type": "Person", "name": "B"},
    ]}

    def _frame(self, doc, fr, **kw):
        from rdflib_jsonld_spark.jsonld.frame import frame
        return frame(doc, fr, **kw)

    def test_annotation_survives_embedding(self):
        out = self._frame(self.DOC, {"@context": self.VOCAB,
                                     "@type": "Person"})
        a = next(n for n in out["@graph"] if n["@id"] == EX + "a")
        assert a["knows"]["@annotation"] == {"since": 2020}
        assert a["knows"]["name"] == "B"          # still embedded

    def test_annotation_survives_explicit(self):
        out = self._frame(self.DOC, {"@context": self.VOCAB,
                                     "@id": EX + "a",
                                     "@explicit": True, "knows": {}})
        node = out["@graph"][0]
        assert node["knows"]["@annotation"] == {"since": 2020}
        assert "name" not in node

    def test_annotated_value_object_passthrough(self):
        doc = {"@context": self.VOCAB, "@graph": [
            {"@id": EX + "a",
             "name": {"@value": "A",
                      "@annotation": {"certainty": 0.9}}}]}
        out = self._frame(doc, {"@context": self.VOCAB,
                                "@id": EX + "a"})
        assert out["@graph"][0]["name"] == {
            "@value": "A", "@annotation": {"certainty": 0.9}}

    def test_expanded_output_expands_annotation_keys(self):
        out = self._frame(self.DOC, {"@context": self.VOCAB,
                                     "@type": "Person"},
                          compact_output=False)
        a = next(n for n in out if n["@id"] == EX + "a")
        ann = a[EX + "knows"][0]["@annotation"]
        assert ann == [{EX + "since": [{"@value": 2020}]}]

    def test_framed_output_tordf_coherent(self):
        src = sorted(map(repr, to_rdf(self.DOC)))
        out = self._frame(self.DOC, {"@context": self.VOCAB,
                                     "@type": "Person"})
        framed = sorted(set(map(repr, to_rdf(out))))
        assert src == framed

    def test_property_pattern_matches_annotated_ref(self):
        out = self._frame(self.DOC, {"@context": self.VOCAB,
                                     "knows": {"@id": EX + "b"}})
        assert [n["@id"] for n in out["@graph"]] == [EX + "a"]

    def test_embedded_id_node_frames_and_roundtrips(self):
        doc = {"@context": self.VOCAB, "@graph": [
            {"@id": {"@id": EX + "a", "knows": {"@id": EX + "b"}},
             "certainty": 0.9},
            {"@id": EX + "a", "knows": {"@id": EX + "b"}},
        ]}
        out = self._frame(doc, {"@context": self.VOCAB})
        subs = [n["@id"] for n in out["@graph"]]
        assert any(isinstance(s, dict) for s in subs)
        src = sorted(map(repr, to_rdf(doc)))
        framed = sorted(set(map(repr, to_rdf(out))))
        assert src == framed


class TestSweep35QtObjects:
    """Sweep 35 (random-quads fuzz): quoted triples in OBJECT position
    leaked their raw term tuple into the document ({"@id": (kind,...)}
    and even @type entries) instead of building embedded-@id nodes."""

    A, B, C = (IRI, EX + "a"), (IRI, EX + "b"), (IRI, EX + "c")

    def _rt(self, quads):
        from rdflib_jsonld_spark.jsonld.compare import isomorphic
        return isomorphic(quads, to_rdf(from_rdf(quads)))

    def test_qt_object_roundtrips(self):
        q = [(None, self.A, self.B, self.C),
             (None, self.A, self.B, (QT, (self.A, self.B, self.C)))]
        back = from_rdf(q)
        emb = back[0][EX + "b"][1]["@id"]
        assert isinstance(emb, dict) and emb["@id"] == EX + "a"
        assert self._rt(q)

    def test_qt_object_nested_roundtrips(self):
        q = [(None, self.A, self.B,
              (QT, ((QT, (self.A, self.B, self.C)), self.B, self.C)))]
        assert self._rt(q)

    def test_qt_object_of_rdf_type_stays_property(self):
        RDF_TYPE = (IRI, keys.RDF_TYPE)
        q = [(None, self.A, RDF_TYPE,
              (QT, (self.A, self.B, self.C)))]
        back = from_rdf(q)
        assert "@type" not in back[0]
        assert keys.RDF_TYPE in back[0]
        assert self._rt(q)

    def test_qt_inside_embedded_id_property_position(self):
        # << a b <<a b c>> >> used as a SUBJECT (embedded id whose
        # property value is itself a quoted triple)
        q = [(None, (QT, (self.A, self.B,
                          (QT, (self.A, self.B, self.C)))),
              self.B, self.C)]
        assert self._rt(q)
