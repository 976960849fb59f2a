"""SPARQL SELECT modifiers + aggregation layer (operators/solutions.py)."""

import pytest

from rdflib_jsonld_spark.operators.bgp import match_bgp
from rdflib_jsonld_spark.operators.expand import QUAD_SCHEMA
from rdflib_jsonld_spark.operators.solutions import (
    select_solutions, sparql_select)


def _quads(spark, rows):
    full = [(None, s, s.startswith("_:"), p, k, o, None, None, "c", 0)
            for s, p, o, k in rows]
    return spark.createDataFrame(full, schema=QUAD_SCHEMA)


@pytest.fixture(scope="module")
def graph(spark):
    # 3 people, 5 knows-edges, ages; a owns multiplicities via two names
    return _quads(spark, [
        ("e:a", "e:knows", "e:b", "iri"),
        ("e:a", "e:knows", "e:c", "iri"),
        ("e:b", "e:knows", "e:c", "iri"),
        ("e:b", "e:knows", "e:a", "iri"),
        ("e:c", "e:knows", "e:a", "iri"),
        ("e:a", "e:age", "30", "literal"),
        ("e:b", "e:age", "40", "literal"),
        ("e:c", "e:age", "50", "literal"),
    ]).cache()


def test_group_count_order_limit(spark, graph):
    sol = match_bgp(graph, [("?x", "e:knows", "?y")], distinct=False)
    out = select_solutions(
        sol, group_by=["?x"],
        aggregates=[("count", "?y", "n"), ("sample", "?y", "one"),
                    ("group_concat", "?y", "all")],
        order_by=["desc(n)", "?x"])
    rows = out.collect()
    assert [(r.x, r.n) for r in rows] == [
        ("e:a", 2), ("e:b", 2), ("e:c", 1)]
    assert rows[0].one == "e:b"          # sample = deterministic min
    assert rows[0].all == "e:b e:c"      # group_concat sorted
    top1 = select_solutions(sol, group_by=["?x"],
                            aggregates=[("count", "?y", "n")],
                            order_by=["desc(n)", "?x"], limit=1).collect()
    assert [(r.x, r.n) for r in top1] == [("e:a", 2)]


def test_implicit_group_and_star(spark, graph):
    sol = match_bgp(graph, [("?x", "e:knows", "?y")], distinct=False)
    row = select_solutions(
        sol, aggregates=[("count", "*", "n_edges"),
                         ("count_distinct", "?x", "n_subjects"),
                         ("min", "?y", "first_obj")]).collect()[0]
    assert (row.n_edges, row.n_subjects, row.first_obj) == (5, 3, "e:a")


def test_count_skips_nulls_having_bind(spark, graph):
    # OPTIONAL-shaped NULLs: count(?v) counts only bound values
    sol = spark.createDataFrame(
        [("g1", "v1"), ("g1", None), ("g2", None)], ["g", "v"])
    out = select_solutions(
        sol, bind=[("upper(g)", "?gu")], group_by=["?gu"],
        aggregates=[("count", "?v", "n_bound"), ("count", "*", "n_all")],
        having=["n_all >= 1"], order_by=["?gu"]).collect()
    assert [(r.gu, r.n_bound, r.n_all) for r in out] == [
        ("G1", 1, 2), ("G2", 0, 1)]
    kept = select_solutions(
        sol, group_by=["?g"], aggregates=[("count", "?v", "n")],
        having=["n > 0"]).collect()
    assert [(r.g, r.n) for r in kept] == [("g1", 1)]


def test_projection_distinct_offset(spark, graph):
    sol = match_bgp(graph, [("?x", "e:knows", "?y")], distinct=False)
    names = select_solutions(sol, project=["?x"], distinct=True,
                             order_by=["?x"])
    assert [r.x for r in names.collect()] == ["e:a", "e:b", "e:c"]
    page = select_solutions(sol, project=["?x"], distinct=True,
                            order_by=["?x"], offset=1, limit=1).collect()
    assert [r.x for r in page] == ["e:b"]


def test_sparql_select_end_to_end(spark, graph):
    # avg degree-out per subject that also has an age, ordered
    out = sparql_select(
        graph,
        [("?x", "e:knows", "?y"), ("?x", "e:age", "?age")],
        bind=[("cast(age as double)", "?aged")],
        group_by=["?x"],
        aggregates=[("count", "?y", "deg"), ("max", "?aged", "age_v")],
        having=["deg >= 1"],
        order_by=["desc(deg)", "?x"])
    rows = out.collect()
    assert [(r.x, r.deg, r.age_v) for r in rows] == [
        ("e:a", 2, 30.0), ("e:b", 2, 40.0), ("e:c", 1, 50.0)]


def test_errors(spark, graph):
    sol = match_bgp(graph, [("?x", "e:knows", "?y")], distinct=False)
    with pytest.raises(ValueError, match="unknown aggregate"):
        select_solutions(sol, aggregates=[("median", "?x", "m")]).collect()
    with pytest.raises(ValueError, match="only valid for count"):
        select_solutions(sol, aggregates=[("sum", "*", "s")]).collect()
    with pytest.raises(ValueError, match="requires at least one aggregate"):
        select_solutions(sol, group_by=["?x"])


def test_group_concat_distinct_and_sep(spark):
    sol = spark.createDataFrame(
        [("g", 2), ("g", 1), ("g", 2)], ["k", "v"])
    row = select_solutions(
        sol, group_by=["?k"],
        aggregates=[("group_concat", "?v", "all"),
                    ("group_concat_distinct", "?v", "uniq")],
        group_concat_sep=",").collect()[0]
    assert row.all == "1,2,2" and row.uniq == "1,2"
