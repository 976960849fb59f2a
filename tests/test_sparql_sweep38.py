"""Sweep-38 regressions (operators/sparql.py) — found by extending the
random-query differential (tools/sparql_fuzz.py) to solution modifiers
and nesting: HAVING, GROUP_CONCAT, ORDER BY/LIMIT/OFFSET, sub-SELECTs.

Four classes pinned here:
  1. HAVING plain expressions take their EBV ([spec] SPARQL 1.1
     §18.2.4.4 — HAVING is a Filter over aggregated solutions), same
     as FILTER; a bare string group key previously raised
     FILTER_NOT_BOOLEAN.
  2. HAVING aggregate comparisons compile through the §17.3 operator
     mapping: ``COUNT(?x) <= "2e0"^^xsd:double`` crashed at ANSI
     constant folding; ``MIN(?v) < const`` compared lexically.
  3. Joins on a var bound in only SOME rows (one UNION branch, an
     OPTIONAL side, an error-able BIND target) are null-compatible
     ([spec] §18.3 solution compatibility): a branch-missing var
     joined as a NULL key and dropped every cross-branch row.
  4. UNION branches whose same-named columns differ in Spark dtype
     (typed BIND boolean/numeric vs lexical string) align by lexical
     form — unionByName's implicit ANSI cast crashed on IRI values.
"""

import pytest

from rdflib_jsonld_spark.operators.sparql import sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
E = "http://ex.org/e/"
P = "http://ex.org/p/"


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        (None, E + "a", False, P + "p", "literal", "x", None, None),
        (None, E + "a", False, P + "p", "literal", "y", None, None),
        (None, E + "b", False, P + "p", "literal", "", None, None),
        (None, E + "a", False, P + "n", "literal", "9",
         XSD + "integer", None),
        (None, E + "b", False, P + "n", "literal", "10",
         XSD + "integer", None),
        # join-on-partial-var fixture: <l1> links <m>, <m> tags "t"
        (None, E + "l1", False, P + "link", "iri", E + "m", None, None),
        (None, E + "m", False, P + "tag", "literal", "t", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_having_plain_expression_is_ebv(quads):
    # EBV of the string group key: non-empty keys pass, "" fails —
    # previously raised DATATYPE_MISMATCH.FILTER_NOT_BOOLEAN
    out = sparql(quads, f"SELECT ?v (COUNT(?s) AS ?n) WHERE {{ "
                 f"?s <{P}p> ?v }} GROUP BY ?v HAVING (?v)")
    assert sorted(r["v"] for r in out.collect()) == ["x", "y"]


def test_having_count_vs_typed_double_literal(quads):
    # ANSI crashed on `bigint <= '2e0'`; the §17.3 mapping compares
    # the COUNT value against the double's VALUE
    out = sparql(
        quads,
        f'SELECT ?s (COUNT(?v) AS ?n) WHERE {{ ?s <{P}p> ?v }} '
        f'GROUP BY ?s HAVING (COUNT(?v) >= '
        f'"2e0"^^<{XSD}double>)')
    assert [r["s"] for r in out.collect()] == [E + "a"]


def test_having_min_compares_by_numeric_value(quads):
    # MIN over {"9","10"} is 9 by VALUE; keep groups with MIN < 10 —
    # a lexical compare ("10" < "9") would keep/drop the wrong groups
    out = sparql(
        quads,
        f'SELECT ?s (MIN(?v) AS ?m) WHERE {{ ?s <{P}n> ?v }} '
        f'GROUP BY ?s HAVING (MIN(?v) < "10"^^<{XSD}integer>)')
    assert [r["s"] for r in out.collect()] == [E + "a"]


def test_join_on_union_branch_missing_var(quads):
    # ?m is bound only in the first UNION branch; the join with the
    # outer pattern on ?m must treat second-branch NULLs as unbound-
    # compatible ([spec] §18.3) — previously every cross-branch row
    # was dropped through the NULL join key
    q = (f"SELECT ?m ?t WHERE {{ "
         f"{{ {{ ?l <{P}link> ?m . }} UNION {{ ?z <{P}tag> 't' . }} }} "
         f"?m <{P}tag> ?t . }}")
    rows = sorted((r["m"], r["t"]) for r in sparql(quads, q).collect())
    # branch 1: m=<m> joins tag t; branch 2: m unbound, takes <m>
    assert rows == [(E + "m", "t"), (E + "m", "t")]


def test_path_bound_literal_keeps_typing(spark):
    # a var bound THROUGH a property path carries the literal's
    # lang/datatype — edges previously held bare lexical forms, so
    # "b"@fr leaked into solutions as plain "b" (and distinct()
    # merged differently-typed literals of one lexical form)
    rows = [
        (None, E + "a", False, P + "p", "literal", "b", None, "fr"),
        (None, E + "b", False, P + "q", "literal", "b", None, None),
        (None, E + "c", False, P + "q", "literal", "5",
         XSD + "integer", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql(df, f'SELECT ?v WHERE {{ ?s (<{P}p>|<{P}q>) ?v . '
                 f'FILTER(LANG(?v) = "fr") }}')
    assert [r["v"] for r in out.collect()] == ["b"]
    out2 = sparql(df, f'SELECT ?s WHERE {{ ?s (<{P}p>|<{P}q>) ?v . '
                 f'FILTER(DATATYPE(?v) = <{XSD}integer>) }}')
    assert [r["s"] for r in out2.collect()] == [E + "c"]
    # exact-term constant endpoint through a path: "b" (plain) must
    # not match "b"@fr
    out3 = sparql(df, f'SELECT ?s WHERE {{ ?s (<{P}p>|<{P}q>) "b" }}')
    assert [r["s"] for r in out3.collect()] == [E + "b"]


def test_order_by_comparison_with_boolean_alias(quads):
    # ORDER BY (?v <= ?b) where ?b is a BOOLEAN-typed computed column:
    # the §17.3 comparison SQL's timestamp/length branches must stay
    # analyzable (previously TRY_CAST(boolean AS TIMESTAMP) failed at
    # analysis time)
    q = (f'SELECT ?v ?b WHERE {{ ?s <{P}n> ?v . '
         f'BIND((?v > 9) AS ?b) }} ORDER BY DESC(?b) ?v')
    vals = [r["v"] for r in sparql(quads, q).collect()]
    assert vals == ["10", "9"]
    # and the comparison-expression key itself must stay analyzable
    q2 = (f'SELECT ?v ?b WHERE {{ ?s <{P}n> ?v . '
          f'BIND((?v > 9) AS ?b) }} ORDER BY DESC((?v <= ?b)) ?v')
    vals2 = [r["v"] for r in sparql(quads, q2).collect()]
    assert vals2 == ["9", "10"]


def test_subselect_projection_keeps_typing(quads):
    # a subquery-projected typed literal crosses the boundary WITH its
    # companions — previously they were dropped and "9"^^xsd:integer
    # surfaced as a plain literal outside (DATATYPE saw xsd:string)
    q = (f"SELECT ?v WHERE {{ {{ SELECT ?v WHERE {{ ?s <{P}n> ?v . }} }} "
         f"FILTER(DATATYPE(?v) = <{XSD}integer>) }}")
    assert sorted(r["v"] for r in sparql(quads, q).collect()) \
        == ["10", "9"]


def test_group_concat_result_is_plain_literal(spark):
    # GROUP_CONCAT returns a string LITERAL ([spec] §18.5.1.7) — a
    # result starting '_:' was shape-heuristically typed as a bnode
    rows = [
        (None, "_:b2", True, P + "p", "literal", "x", None, None),
        (None, E + "a", False, P + "p", "literal", "y", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql(df, f'SELECT (GROUP_CONCAT(?s; SEPARATOR="#") AS ?g) '
                 f'WHERE {{ ?s <{P}p> ?v }}', keep_types=True)
    row = out.collect()[0]
    assert row["g"] == f"_:b2#{E}a"
    assert row["__typ_g__kind"] == "literal"


def test_hash_fn_over_typed_computed_column(quads):
    # SHA256 of a BOOLEAN-typed BIND alias: the string-literal guard
    # correctly errors it to unbound, but the operand SQL previously
    # stayed the raw boolean column and sha2(boolean) failed analysis
    q = (f"SELECT ?v ?z WHERE {{ ?s <{P}n> ?v . BIND((?v > 9) AS ?b) "
         f"BIND(SHA256(?b) AS ?z) }}")
    rows = sparql(quads, q).collect()
    assert sorted(r["v"] for r in rows) == ["10", "9"]
    assert all(r["z"] is None for r in rows)


def test_division_follows_xpath_semantics(quads):
    # double/0 is IEEE (INF), integer/0 and decimal/0 are type errors
    # (unbound) — a raw `/` raised Spark's ANSI DIVIDE_BY_ZERO
    q = (f'SELECT ?v (("2e0"^^<{XSD}double> / "0"^^<{XSD}integer>) AS ?i)'
         f' (("2"^^<{XSD}integer> / "0"^^<{XSD}integer>) AS ?e)'
         f' (("0e0"^^<{XSD}double> / "0"^^<{XSD}integer>) AS ?n)'
         f' WHERE {{ ?s <{P}n> ?v }}')
    rows = sparql(quads, q).collect()
    assert all(r["i"] == float("inf") for r in rows)
    assert all(r["e"] is None for r in rows)
    assert all(r["n"] != r["n"] for r in rows)  # NaN


def test_errored_boolean_branch_stays_error_in_coalesce(quads):
    # EBV of an IRI is a type error; COALESCE must move PAST the
    # errored boolean branch instead of materializing it as 'false'
    q = (f'SELECT ?s (COALESCE((?s || ?s), "fallback") AS ?z) '
         f'WHERE {{ ?s <{P}n> ?v }}')
    rows = sparql(quads, q).collect()
    assert all(r["z"] == "fallback" for r in rows)


def test_errored_string_fn_equality_is_error_not_false(quads):
    # LCASE of a non-literal is a type error; comparing the errored
    # result with = must stay an error (row dropped / var unbound),
    # not evaluate the non-literal conjunct to false
    q = (f'SELECT ?s ((LCASE(?s) = ?s) AS ?z) WHERE {{ ?s <{P}p> ?v }}')
    rows = sparql(quads, q).collect()
    assert rows and all(r["z"] is None for r in rows)


def test_constant_literal_equality_errors_outside_mapping(quads):
    # RDFterm-equal §17.4.1.7: two non-identical literal CONSTANTS with
    # no §17.3 value row (numeric vs lang-tagged) are a type error —
    # the fold previously said false, so the != filtered rows IN
    q1 = (f'SELECT ?v WHERE {{ ?s <{P}n> ?v . '
          f'FILTER(("1"^^<{XSD}integer> != "a"@en)) }}')
    assert sparql(quads, q1).count() == 0
    # value rows still fold: numeric constants compare by VALUE
    q2 = (f'SELECT ?v WHERE {{ ?s <{P}n> ?v . '
          f'FILTER(("30"^^<{XSD}integer> = "30.0"^^<{XSD}decimal>)) }}')
    assert sparql(quads, q2).count() == 2


def test_expression_order_key_uses_term_kind_order(spark):
    # ORDER BY over a COALESCE mixing bnodes and literals: §15.1 kind
    # order applies to expression keys too (bnode < IRI < literal) —
    # previously the runtime-term's VALUE sorted lexically
    rows = [
        (None, E + "a", False, P + "p", "literal", "5",
         XSD + "integer", None),
        (None, E + "b", False, P + "p", "bnode", "_:zz", None, None),
        (None, E + "c", False, P + "p", "iri", E + "m", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    q = (f"SELECT ?s WHERE {{ ?s <{P}p> ?v }} "
         f"ORDER BY (COALESCE(?v, ?s))")
    assert [r["s"] for r in sparql(df, q).collect()] \
        == [E + "b", E + "c", E + "a"]


def test_union_aligns_typed_bind_column_with_lexical(quads):
    # branch 1 binds ?b to a BOOLEAN-typed computed column, branch 2
    # to IRI subjects — unionByName's implicit cast crashed with
    # CAST_INVALID_INPUT on 'http://…'
    q = (f"SELECT ?b WHERE {{ "
         f"{{ ?s <{P}n> ?v . BIND((?v > 5) AS ?b) }} "
         f"UNION {{ ?b <{P}tag> ?t . }} }}")
    vals = sorted(r["b"] for r in sparql(quads, q).collect())
    assert vals == [E + "m", "true", "true"]
