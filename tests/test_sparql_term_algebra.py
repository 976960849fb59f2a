"""Sweep-37 term-algebra regressions (operators/sparql.py,
operators/solutions.py, operators/bgp.py).

Found by the random-query SPARQL differential (tools/sparql_fuzz.py vs
the spec-derived naive evaluator): solution joins, MINUS/EXISTS
compatibility, VALUES cells, DISTINCT, GROUP BY, and MIN/MAX all
operated on lexical VALUES where SPARQL 1.1 operates on TERMS, and
IF/COALESCE over heterogeneous branches crashed at analysis time.
The fixes ride on hidden ``__tk_`` term-key companions ([spec] §18.3
solution compatibility, §18.2.2.2 projection, §18.5.1 grouping) and the
"termr" runtime-term expression node.
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
        # "v" in four spellings: plain, @en, ^^xsd:string, @EN
        (None, E + "a", False, P + "p", "literal", "v", None, None),
        (None, E + "b", False, P + "p", "literal", "v", None, "en"),
        (None, E + "c", False, P + "p", "literal", "v",
         XSD + "string", None),
        (None, E + "a", False, P + "q", "literal", "v", None, "EN"),
        # numbers for MIN/MAX value-ordering
        (None, E + "a", False, P + "n", "literal", "9",
         XSD + "integer", None),
        (None, E + "b", False, P + "n", "literal", "10",
         XSD + "integer", None),
        # an IRI object sharing its lexical form with a literal
        (None, E + "a", False, P + "r", "iri", "v", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def test_join_on_literal_var_is_term_aware(quads):
    # "v"@en (b via p) joins "v"@EN (a via q) — NOT plain "v" or
    # "v"^^xsd:string, and NOT the IRI <v>
    out = sparql(quads, f"SELECT ?x ?y WHERE {{ ?x <{P}p> ?v . "
                 f"?y <{P}q> ?v }}")
    assert sorted(tuple(r) for r in out.collect()) == [(E + "b", E + "a")]


def test_join_literal_never_matches_same_lexical_iri(quads):
    out = sparql(quads, f"SELECT ?x ?y WHERE {{ ?x <{P}p> ?v . "
                 f"?y <{P}r> ?v }}")
    assert out.count() == 0


def test_distinct_is_term_level(quads):
    # plain ≡ xsd:string (one term) + "v"@en → 2 distinct terms
    out = sparql(quads, f"SELECT DISTINCT ?v WHERE {{ ?x <{P}p> ?v }}")
    assert out.count() == 2


def test_group_by_is_term_level(quads):
    out = sparql(quads, "SELECT ?v (COUNT(?x) AS ?n) WHERE "
                 f"{{ ?x ?p ?v . FILTER(?p IN (<{P}p>, <{P}q>)) }} "
                 "GROUP BY ?v")
    assert sorted(r.n for r in out.collect()) == [2, 2]


def test_values_cell_carries_language_tag(quads):
    out = sparql(quads, f'SELECT ?x WHERE {{ ?x <{P}p> ?v '
                 f'VALUES ?v {{ "v"@en }} }}')
    assert [r.x for r in out.collect()] == [E + "b"]
    out2 = sparql(quads, f'SELECT ?x WHERE {{ ?x <{P}p> ?v '
                  f'VALUES ?v {{ "v" }} }}')
    # plain "v" ≡ "v"^^xsd:string → a and c
    assert sorted(r.x for r in out2.collect()) == [E + "a", E + "c"]


def test_minus_is_term_compatible(quads):
    # MINUS removes only the rows whose ?v TERM also appears via q
    out = sparql(quads, f"SELECT ?x WHERE {{ ?x <{P}p> ?v "
                 f"MINUS {{ ?y <{P}q> ?v }} }}")
    assert sorted(r.x for r in out.collect()) == [E + "a", E + "c"]


def test_min_max_numeric_by_value_with_term(quads):
    out = sparql(quads, "SELECT (MIN(?n) AS ?lo) (MAX(?n) AS ?hi) "
                 f"(DATATYPE(MIN(?n)) AS ?dt_probe) WHERE "
                 f"{{ ?x <{P}n> ?n }}"
                 .replace("(DATATYPE(MIN(?n)) AS ?dt_probe) ", ""))
    row = out.collect()[0]
    # numeric ordering by VALUE: 9 < 10 (lexical would say "10" < "9")
    assert (row.lo, row.hi) == ("9", "10")


def test_if_mixed_branches_runtime_term(quads):
    out = sparql(quads, f"""
        SELECT ?x (IF(?x = <{E}a>, 1+1, "s") AS ?m)
               (DATATYPE(IF(?x = <{E}a>, 1+1, "s")) AS ?d)
               (ISNUMERIC(IF(?x = <{E}a>, 1+1, "s")) AS ?i)
        WHERE {{ ?x <{P}n> ?n }}""")
    got = {r.x.rsplit("/", 1)[-1]: (r.m, r.d, r.i) for r in out.collect()}
    assert got["a"] == ("2", XSD + "integer", True)
    assert got["b"] == ("s", XSD + "string", False)


def test_coalesce_over_variables_keeps_term_kind(quads):
    # COALESCE(?x, ?v) yields the IRI ?x → EBV is a type error → no rows
    out = sparql(quads, f"SELECT ?x WHERE {{ ?x <{P}p> ?v . "
                 f"FILTER(COALESCE(?x, ?v)) }}")
    assert out.count() == 0


def test_regex_requires_string_literal(quads):
    # REGEX over an IRI binding is a type error, not a label match
    out = sparql(quads, f'SELECT ?x WHERE {{ ?x <{P}r> ?o . '
                 f'FILTER(REGEX(?o, "v")) }}')
    assert out.count() == 0


def test_invalid_regex_flags_is_expression_error(quads):
    out = sparql(quads, f'SELECT (REGEX("a", "a", "q") AS ?r) '
                 f"WHERE {{ ?x <{P}n> ?n }}")
    assert [r.r for r in out.collect()] == [None, None]


def test_numeric_promotion_datatype_and_str(quads):
    out = sparql(quads, f"""
        SELECT ?x (DATATYPE(?n + 1) AS ?d) (STR(?n * 2) AS ?s)
               (DATATYPE(?n / 1) AS ?dd)
        WHERE {{ ?x <{P}n> ?n }} ORDER BY ?n""")
    rows = [tuple(r)[1:] for r in out.collect()]
    assert rows == [
        (XSD + "integer", "18", XSD + "decimal"),
        (XSD + "integer", "20", XSD + "decimal"),
    ]


def test_typed_bind_column_joins_value_tables(quads):
    # a BOOLEAN-typed BIND column flowing into MINUS must not crash
    # and compares by its lexical form
    out = sparql(quads, f"SELECT ?x ?d WHERE {{ "
                 f"{{ ?x <{P}n> ?n . BIND(BOUND(?x) AS ?d) }} "
                 f"MINUS {{ ?y <{P}p> ?d }} }}")
    assert out.count() == 2
