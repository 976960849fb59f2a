"""RDFC-1.0 canonicalization (jsonld/canonicalize.py): label
determinism, isomorphism⇔hash-equality (differential vs
jsonld/compare.isomorphic), N-degree tie-breaking, poison guard."""

import random

import pytest

from rdflib_jsonld_spark.jsonld.canonicalize import (
    canonical_hash, canonical_nquads, canonicalize)
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf

EX = "http://example.org/"


def iri(v):
    return (IRI, EX + v)


def bn(v):
    return (BNODE, v)


def lit(v):
    return (LIT, v, "http://www.w3.org/2001/XMLSchema#string", None)


def relabel(quads, mapping):
    def r(t):
        if t is not None and t[0] == BNODE:
            return (BNODE, mapping[t[1]])
        return t
    return [tuple(r(t) for t in q) for q in quads]


def test_ground_quads_pass_through():
    quads = [(None, iri("s"), iri("p"), lit("v"))]
    assert canonicalize(quads) == quads
    assert canonical_nquads(quads) == \
        f'<{EX}s> <{EX}p> "v" .\n'


def test_labeling_invariance_simple():
    quads = [(None, bn("x"), iri("p"), lit("1")),
             (None, bn("x"), iri("q"), bn("y")),
             (None, bn("y"), iri("p"), lit("2"))]
    other = relabel(quads, {"x": "n7", "y": "n3"})
    random.Random(0).shuffle(other)
    assert canonical_hash(quads) == canonical_hash(other)
    labels = {t[1] for q in canonicalize(quads) for t in q
              if t is not None and t[0] == BNODE}
    assert labels == {"c14n0", "c14n1"}


def test_non_isomorphic_differ():
    a = [(None, bn("x"), iri("p"), lit("1"))]
    b = [(None, bn("x"), iri("p"), lit("2"))]
    assert canonical_hash(a) != canonical_hash(b)


def test_symmetric_cycle_needs_n_degree():
    # _:x <p> _:y . _:y <p> _:x . + distinguishing leaf on one side
    quads = [(None, bn("x"), iri("p"), bn("y")),
             (None, bn("y"), iri("p"), bn("x")),
             (None, bn("x"), iri("leaf"), lit("L"))]
    other = relabel(quads, {"x": "b", "y": "a"})
    assert canonical_hash(quads) == canonical_hash(other)
    # fully symmetric cycle (no leaf): still deterministic
    sym = quads[:2]
    sym2 = relabel(sym, {"x": "q", "y": "p"})
    assert canonical_hash(sym) == canonical_hash(sym2)


def test_named_graph_bnode_position():
    quads = [((BNODE, "g"), bn("s"), iri("p"), lit("v"))]
    other = relabel(quads, {"g": "h", "s": "t"})
    assert canonical_hash(quads) == canonical_hash(other)
    assert "_:c14n" in canonical_nquads(quads)


def test_differential_vs_isomorphic_random_graphs():
    rng = random.Random(42)
    graphs = []
    for gi in range(12):
        n_b = rng.randint(1, 4)
        quads = []
        for _ in range(rng.randint(2, 6)):
            s = bn(f"b{rng.randrange(n_b)}") if rng.random() < 0.7 \
                else iri(f"s{rng.randrange(3)}")
            o = bn(f"b{rng.randrange(n_b)}") if rng.random() < 0.5 \
                else lit(str(rng.randrange(3)))
            quads.append((None, s, iri(f"p{rng.randrange(2)}"), o))
        graphs.append(list(dict.fromkeys(quads)))
    for i, a in enumerate(graphs):
        for b in graphs[i:]:
            # shuffle + relabel b
            names = sorted({t[1] for q in b for t in q
                            if t is not None and t[0] == BNODE})
            mapping = {n: f"z{j + 17}" for j, n in enumerate(
                rng.sample(names, len(names)))}
            b2 = relabel(b, mapping)
            rng.shuffle(b2)
            same_hash = canonical_hash(a) == canonical_hash(b2)
            assert same_hash == isomorphic(a, b2), (a, b2)


def test_to_rdf_anonymous_node_order_invariance():
    d1 = {"@context": {"@vocab": EX},
          "@graph": [{"p": [{"q": "1"}, {"q": "2"}]}]}
    d2 = {"@context": {"@vocab": EX},
          "@graph": [{"p": [{"q": "2"}, {"q": "1"}]}]}
    assert canonical_hash(to_rdf(d1)) == canonical_hash(to_rdf(d2))


def test_poison_guard():
    # complete bipartite-ish blob of indistinguishable bnodes
    quads = []
    for i in range(30):
        quads.append((None, bn(f"a{i}"), iri("p"),
                      bn(f"a{(i + 1) % 30}")))
    with pytest.raises(ValueError, match="blank nodes share"):
        canonical_hash(quads)
    assert canonical_hash(quads, max_degree_nodes=40)  # opt-in works


def test_isomorphic_rejects_wl_confusable_pair():
    """Two 3-cycles vs one 6-cycle of bnodes — the classic pair plain WL
    color refinement cannot distinguish; the branching checker must
    (false-positive guard for the conformance oracle itself)."""
    from rdflib_jsonld_spark.jsonld.compare import isomorphic
    from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI
    P = (IRI, "http://e/p")

    def cyc(labels):
        return [(None, (BNODE, labels[i]), P,
                 (BNODE, labels[(i + 1) % len(labels)]))
                for i in range(len(labels))]

    two3 = cyc(["a0", "a1", "a2"]) + cyc(["b0", "b1", "b2"])
    one6 = cyc(["c0", "c1", "c2", "c3", "c4", "c5"])
    assert not isomorphic(two3, one6)
    assert isomorphic(one6, cyc(["z3", "z4", "z5", "z0", "z1", "z2"]))


def test_isomorphic_bnode_graph_name_wiring():
    """A graph named by its own subject bnode differs from one named by
    an unrelated bnode."""
    from rdflib_jsonld_spark.jsonld.compare import isomorphic
    from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI
    P = (IRI, "http://e/p")
    X = (IRI, "http://e/x")
    g_self = [((BNODE, "g"), (BNODE, "g"), P, X)]
    assert isomorphic(g_self, [((BNODE, "h"), (BNODE, "h"), P, X)])
    assert not isomorphic(g_self, [((BNODE, "g"), (BNODE, "o"), P, X)])


class TestSweep29StarCanonicalization:
    """Sweep 29: RDF-star quoted triples through RDFC-1.0-style
    canonicalization and WL isomorphism. Before this sweep, QT terms
    raised a bare ValueError in canonicalize (silently dropping star
    blocks in docops.canonical_hash_stage's error guard) and compare.py
    baked QT-internal bnode labels in as repr constants. Triple terms
    now serialize as N-Triples 1.2 ``<<( s p o )>>`` and their bnodes
    participate in hashing, refinement, and relabeling."""

    def _star(self, l1, l2):
        from rdflib_jsonld_spark.jsonld.tordf import QT
        base = (bn(l1), iri("p"), bn(l2))
        return [(None, *base),
                (None, (QT, base), iri("c"), lit("v")),
                (None, bn(l2), iri("q"), lit("x"))]

    def test_star_iso_hash_equal(self):
        a, b = self._star("x1", "y1"), self._star("m9", "n3")
        assert canonical_hash(a) == canonical_hash(b)
        assert isomorphic(a, b)

    def test_star_non_iso_differs(self):
        from rdflib_jsonld_spark.jsonld.tordf import QT
        a = self._star("x1", "y1")
        c = [(None, bn("x1"), iri("p"), bn("y1")),
             (None, (QT, (bn("y1"), iri("p"), bn("x1"))),
              iri("c"), lit("v")),
             (None, bn("y1"), iri("q"), lit("x"))]
        assert canonical_hash(a) != canonical_hash(c)
        assert not isomorphic(a, c)

    def test_qt_only_bnode_relabeled(self):
        from rdflib_jsonld_spark.jsonld.tordf import QT
        o1 = [(None, (QT, (bn("w"), iri("p"), iri("o"))),
               iri("c"), lit("v"))]
        o2 = [(None, (QT, (bn("k7"), iri("p"), iri("o"))),
               iri("c"), lit("v"))]
        assert canonical_hash(o1) == canonical_hash(o2)
        assert isomorphic(o1, o2)
        nq = canonical_nquads(o1)
        assert "_:c14n0" in nq and "_:w" not in nq
        assert nq.startswith("<<( ")

    def test_nested_qt_serialization(self):
        from rdflib_jsonld_spark.jsonld.tordf import QT
        inner = (bn("z"), iri("p"), iri("o"))
        quads = [(None, (QT, ((QT, inner), iri("p2"), iri("o2"))),
                  iri("c"), lit("v")),
                 (None, bn("z"), iri("q"), lit("k"))]
        nq = canonical_nquads(quads)
        assert "<<( <<( _:c14n0" in nq
        assert canonical_hash(quads) == canonical_hash(
            [(q[0], q[1], q[2], q[3]) for q in quads])

    def test_annotated_doc_canonical_hash_stable(self):
        doc = {"@context": {"@vocab": EX}, "@id": EX + "a",
               "knows": {"@id": EX + "b",
                         "@annotation": {"since": 2020}}}
        h1 = canonical_hash(to_rdf(doc))
        h2 = canonical_hash(list(reversed(to_rdf(doc))))
        assert h1 == h2
