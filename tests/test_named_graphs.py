"""Named-graph / dataset behavior — parity with the reference's
test/test_named_graphs.py (SURVEY.md §5.1 layout)."""

from rdflib_jsonld_spark.jsonld import from_rdf, to_rdf
from rdflib_jsonld_spark.jsonld.compare import isomorphic
from rdflib_jsonld_spark.jsonld.tordf import IRI

EX = "http://example.org/"


def _graphs(quads):
    return {q[0] for q in quads}


def test_default_vs_named_graph_partition():
    doc = {"@context": {"ex": EX},
           "@id": f"{EX}g1", "ex:label": "outer",
           "@graph": [{"@id": "ex:s", "ex:p": "inner"}]}
    quads = to_rdf(doc)
    by_graph = {}
    for q in quads:
        by_graph.setdefault(q[0], []).append(q)
    assert None in by_graph and (IRI, f"{EX}g1") in by_graph
    (outer,) = by_graph[None]
    assert outer[3] == ("lit", "outer",
                        "http://www.w3.org/2001/XMLSchema#string", None)
    (inner,) = by_graph[(IRI, f"{EX}g1")]
    assert inner[1] == (IRI, f"{EX}s")


def test_bnode_graph_names():
    doc = {"@context": {"ex": EX},
           "@graph": [{"@id": "ex:s", "ex:p": "v"}],
           "ex:about": "anonymous graph"}
    # node has properties AND @graph but no @id → bnode-named graph
    quads = to_rdf(doc)
    graph_names = {g for g in _graphs(quads) if g is not None}
    assert len(graph_names) == 1
    (g,) = graph_names
    assert g[0] == "bnode"


def test_same_triple_in_two_graphs_distinct():
    doc = [{"@context": {"ex": EX}, "@id": f"{EX}g1",
            "@graph": [{"@id": "ex:s", "ex:p": "v"}]},
           {"@context": {"ex": EX}, "@id": f"{EX}g2",
            "@graph": [{"@id": "ex:s", "ex:p": "v"}]}]
    quads = to_rdf(doc)
    assert len(quads) == 2 and len(set(quads)) == 2


def test_nested_graphs_roundtrip():
    doc = {"@context": {"ex": EX},
           "@id": f"{EX}g", "ex:meta": "m",
           "@graph": [
               {"@id": "ex:a", "ex:p": {"@id": "ex:b"}},
               {"@id": "ex:b", "ex:q": [1, 2]},
           ]}
    quads = to_rdf(doc)
    tree = from_rdf(quads)
    assert isomorphic(to_rdf(tree), quads)
