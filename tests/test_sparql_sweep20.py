"""Sweep-20 regression corpus: SPARQL aggregate error semantics and
ORDER BY term-kind order.

- [spec] SPARQL 1.1 §18.5.1.2/.4: a type error on ANY group element
  errors the whole SUM/AVG aggregate → the variable is UNBOUND for that
  group (SUM(41, "young") was silently returning 41, SQL skip
  semantics). COUNT/SAMPLE/GROUP_CONCAT are unaffected; unbound
  elements are skipped (documented pragmatic major-engine behavior).
- [spec] §15.1: ORDER BY sorts unbound < blank nodes < IRIs < literals
  (numeric literals by value before the rest lexically). The kind
  companion of ordered object-position vars is captured and carried
  through projection, then dropped; DISTINCT still dedups over the
  requested columns only.
"""

import pytest

from rdflib_jsonld_spark.operators.sparql import sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
V = "http://ex.org/v#"
E = "http://ex.org/e/"
PFX = f"PREFIX v: <{V}> PREFIX e: <{E}> "


@pytest.fixture(scope="module")
def agg_quads(spark):
    rows = [
        (None, E + "a", False, V + "age", "literal", "30",
         XSD + "integer", None),
        (None, E + "a", False, V + "age", "literal", "12",
         XSD + "integer", None),
        (None, E + "b", False, V + "age", "literal", "41",
         XSD + "integer", None),
        (None, E + "b", False, V + "age", "literal", "young",
         XSD + "string", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_sum_avg_error_poisons_group(agg_quads):
    out = sparql(agg_quads, PFX + """
        SELECT ?s (SUM(?a) AS ?total) (AVG(?a) AS ?avg) (COUNT(?a) AS ?n)
        WHERE { ?s v:age ?a } GROUP BY ?s ORDER BY ?s""").collect()
    by_s = {r.s: r for r in out}
    a, b = by_s[E + "a"], by_s[E + "b"]
    assert (a.total, a.avg, a.n) == (42.0, 21.0, 2)
    # the 'young' element is a type error -> SUM/AVG unbound; COUNT fine
    assert (b.total, b.avg, b.n) == (None, None, 2)


def test_min_max_sample_groupconcat_unaffected(agg_quads):
    out = sparql(agg_quads, PFX + """
        SELECT ?s (SAMPLE(?a) AS ?one) (GROUP_CONCAT(?a) AS ?c)
        WHERE { ?s v:age ?a } GROUP BY ?s ORDER BY ?s""").collect()
    by_s = {r.s: r for r in out}
    assert by_s[E + "b"].c == "41 young"
    assert by_s[E + "b"].one in ("41", "young")


def test_projection_error_keeps_row_unbound(agg_quads):
    out = sparql(agg_quads, PFX + """
        SELECT ?s (?a + 1 AS ?next)
        WHERE { ?s v:age ?a }""").collect()
    vals = {(r.s, r.next) for r in out}
    assert (E + "b", None) in vals          # "young"+1 -> unbound
    assert (E + "b", 42.0) in vals          # other row unaffected


@pytest.fixture(scope="module")
def kind_quads(spark):
    rows = [
        (None, E + "o1", False, V + "v", "literal", "AAA", None, None),
        (None, E + "o2", False, V + "v", "iri", E + "x", None, None),
        (None, E + "o3", False, V + "v", "bnode", "_:z", None, None),
        (None, E + "o4", False, V + "v", "literal", "5",
         XSD + "integer", None),
        (None, E + "o5", False, V + "v", "literal", "12",
         XSD + "integer", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_order_by_term_kind_order(kind_quads):
    out = sparql(kind_quads, PFX +
                 "SELECT ?s ?v WHERE { ?s v:v ?v } ORDER BY ?v")
    assert [r.v for r in out.collect()] == \
        ["_:z", E + "x", "5", "12", "AAA"]
    assert out.columns == ["s", "v"]     # sort companion dropped


def test_order_by_desc_with_distinct(kind_quads):
    out = sparql(kind_quads, PFX +
                 "SELECT DISTINCT ?v WHERE { ?s v:v ?v } ORDER BY DESC(?v)")
    assert [r.v for r in out.collect()] == \
        ["AAA", "12", "5", E + "x", "_:z"]
    assert out.columns == ["v"]


def test_order_by_subject_var_shape_heuristic(spark):
    rows = [(None, "_:sb", True, V + "p", "literal", "1", None, None),
            (None, E + "sa", False, V + "p", "literal", "2", None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql(df, PFX + "SELECT ?s WHERE { ?s v:p ?o } ORDER BY ?s")
    assert [r.s for r in out.collect()] == ["_:sb", E + "sa"]


def test_sum_avg_empty_multiset_is_zero(agg_quads):
    """[spec] §18.5.1.2 Sum({}) = 0, §18.5.1.4 Avg({}) = 0 (ADVICE r04):
    a group whose var is never numeric-bound — here an OPTIONAL var that
    never matches — aggregates to 0, not unbound; error-poisoned groups
    stay unbound (previous test)."""
    out = sparql(agg_quads, PFX + """
        SELECT ?s (SUM(?w) AS ?total) (AVG(?w) AS ?avg)
        WHERE { ?s v:age ?a OPTIONAL { ?s v:weight ?w } }
        GROUP BY ?s ORDER BY ?s""").collect()
    assert all((r.total, r.avg) == (0.0, 0.0) for r in out), out
