"""Sweep-25 regression corpus: value-based SPARQL comparisons.

[spec] SPARQL 1.1 §17.3 operator mapping: numerics compare by VALUE
across the numeric tree (op:numeric-equal / less-than), xsd:dateTime
as timestamps, xsd:boolean as false<true, simple/xsd:string by
codepoint; pairings outside the mapping (lang-tagged strings, mixed
types, non-literals) are type errors. Previously var-var and
var-vs-typed-constant comparisons used the lexical form ("7" > "30"
was false, "30"^^xsd:integer = "30.0"^^xsd:decimal was false), and a
BIND of a computed expression shape-derived kind 'iri', silently
failing every term-aware comparison on the alias.
"""

import pytest

from rdflib_jsonld_spark.operators.sparql import sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
V = "http://ex.org/v#"
E = "http://ex.org/e/"
PFX = f"PREFIX v: <{V}> PREFIX e: <{E}> PREFIX xsd: <{XSD}> "


@pytest.fixture(scope="module")
def cmp_quads(spark):
    rows = [
        (None, E + "a", False, V + "age", "literal", "30",
         XSD + "integer", None),
        (None, E + "b", False, V + "age", "literal", "7",
         XSD + "integer", None),
        (None, E + "c", False, V + "age", "literal", "7.0",
         XSD + "decimal", None),
        (None, E + "a", False, V + "name", "literal", "x", None, None),
        (None, E + "b", False, V + "name", "literal", "y", None, "en"),
        (None, E + "a", False, V + "ts", "literal",
         "2024-03-01T10:00:00", XSD + "dateTime", None),
        (None, E + "b", False, V + "ts", "literal",
         "2024-01-15T09:00:00", XSD + "dateTime", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def subs(df, col="x"):
    return sorted(r[col].rsplit("/", 1)[-1] for r in df.collect())


def test_var_var_numeric_value_compare(cmp_quads):
    out = sparql(cmp_quads, PFX +
                 "SELECT ?x WHERE { ?x v:age ?a . ?y v:age ?b "
                 "FILTER(?a < ?b) }")
    # 7 < 30, 7.0 < 30 — lexical order would say "30" < "7"
    assert subs(out) == ["b", "c"]


def test_cross_type_numeric_equality(cmp_quads):
    out = sparql(cmp_quads, PFX +
                 "SELECT ?x ?y WHERE { ?x v:age ?a . ?y v:age ?b "
                 "FILTER(?a = ?b && ?x != ?y) }")
    assert sorted((r.x.rsplit("/", 1)[-1], r.y.rsplit("/", 1)[-1])
                  for r in out.collect()) == [("b", "c"), ("c", "b")]


def test_typed_constant_compares_by_value(cmp_quads):
    out = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:age ?a FILTER(?a < "20"^^xsd:integer) }""")
    assert subs(out) == ["b", "c"]
    out2 = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:age ?a FILTER(?a = "7.00"^^xsd:decimal) }""")
    assert subs(out2) == ["b", "c"]
    # numeric vs non-numeric literal is a type error → dropped, and
    # != of the same pairing is a type error too (NOT an automatic true)
    none = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n = "5"^^xsd:integer) }""")
    assert none.count() == 0
    none2 = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n != "5"^^xsd:integer) }""")
    assert none2.count() == 0


def test_sameterm_stays_strict(cmp_quads):
    # sameTerm is term IDENTITY: 7 and 7.0 are = but not sameTerm
    out = sparql(cmp_quads, PFX +
                 "SELECT ?x WHERE { ?x v:age ?a . ?y v:age ?b "
                 "FILTER(?a = ?b && !sameTerm(?a, ?b)) }")
    assert subs(out) == ["b", "c"]
    none = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:age ?a
                          FILTER(sameTerm(?a, "7.00"^^xsd:decimal)) }""")
    assert none.count() == 0


def test_datetime_value_compare(cmp_quads):
    out = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:ts ?t
            FILTER(?t > "2024-02-01T00:00:00"^^xsd:dateTime) }""")
    assert subs(out) == ["a"]
    out2 = sparql(cmp_quads, PFX +
                  "SELECT ?x WHERE { ?x v:ts ?t . ?y v:ts ?u "
                  "FILTER(?t < ?u) }")
    assert subs(out2) == ["b"]


def test_ordering_type_errors(cmp_quads):
    # lang-tagged vs numeric, and string vs numeric, drop the row
    none = sparql(cmp_quads, PFX +
                  "SELECT ?x WHERE { ?x v:name ?n . ?y v:age ?a "
                  "FILTER(?n < ?a) }")
    assert none.count() == 0
    # plain string vs plain string still compares by codepoint
    out = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n < "z") }""")
    # "x" qualifies; "y"@en is lang-tagged → ordering type error
    assert subs(out) == ["a"]


def test_in_is_term_aware(cmp_quads):
    # [spec] §17.4.1.9: IN ≡ chained = — term-aware, value-based for
    # numerics. "x" is plain; "y"@en must not match a plain member.
    out = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n IN ("x", "z")) }""")
    assert subs(out) == ["a"]
    out2 = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n IN ("y"@en)) }""")
    assert subs(out2) == ["b"]
    # numeric members compare by value (7.0^^decimal matches 7)
    out3 = sparql(cmp_quads, PFX +
                  "SELECT ?x WHERE { ?x v:age ?a FILTER(?a IN (7, 99)) }")
    assert subs(out3) == ["b", "c"]
    # NOT IN: the lang-tagged name is != every plain member → kept
    out4 = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n FILTER(?n NOT IN ("x")) }""")
    assert subs(out4) == ["b"]


def test_order_and_extrema_value_based_across_lexical_forms(spark):
    # canonical double "9.0E-1" sorts between 0.5 and 2 — a lexical
    # order would put it last; MIN/MAX agree (sweep 20/11 machinery,
    # pinned here against the sweep-25 comparison rework)
    rows = [(None, E + "a", False, V + "v", "literal", "9.0E-1",
             XSD + "double", None),
            (None, E + "b", False, V + "v", "literal", "0.5",
             XSD + "decimal", None),
            (None, E + "c", False, V + "v", "literal", "2",
             XSD + "integer", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    q = sparql(df, PFX + "SELECT ?s ?x WHERE { ?s v:v ?x } ORDER BY ?x")
    assert [r.s.rsplit("/", 1)[-1] for r in q.collect()] == ["b", "a", "c"]
    q2 = sparql(df, PFX + "SELECT (MIN(?x) AS ?lo) (MAX(?x) AS ?hi) "
                "WHERE { ?s v:v ?x }")
    row = q2.collect()[0]
    assert (row.lo, row.hi) == ("0.5", "2")


def test_bind_computed_alias_is_literal(cmp_quads):
    out = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:name ?n BIND(CONCAT(STR(?n), "!") AS ?c)
                          FILTER(?c = "x!") }""")
    assert subs(out) == ["a"]
    out2 = sparql(cmp_quads, PFX + """
        SELECT ?x WHERE { ?x v:age ?a BIND(?a + 1 AS ?m)
                          FILTER(?m > 10 && ISLITERAL(?m)) }""")
    assert subs(out2) == ["a"]
    # arithmetic VALUES run in DOUBLE, but the promoted DATATYPE rides
    # on the node ([spec] §17.3 XPath promotion, sweep 37): integer*2
    # is xsd:integer, decimal*2 is xsd:decimal
    out3 = sparql(cmp_quads, PFX + """
        SELECT ?x ?d WHERE { ?x v:age ?a BIND(?a * 2 AS ?m)
                             BIND(DATATYPE(?m) AS ?d)
                             FILTER(ISNUMERIC(?m)) }""")
    assert {(r.x.rsplit("/", 1)[-1], r.d) for r in out3.collect()} == {
        ("a", XSD + "integer"), ("b", XSD + "integer"),
        ("c", XSD + "decimal")}
