"""Sweep-23 regression corpus: SPARQL effective boolean value.

[spec] SPARQL 1.1 §17.2.2: EBV of a boolean literal is its value
(invalid lexicals → false); of a numeric literal false at 0/NaN
(invalid lexicals → false); of a plain/xsd:string/lang literal false
when empty; anything else (IRIs, bnodes, unbound, other typed
literals) is a type error, which FILTER treats as false-for-this-row.
Previously `FILTER(?x)` / `?x && ?y` on bare non-boolean terms raised
an AnalysisException (non-boolean in Filter) or silently leaned on
SQL coercions.
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
def ebv_quads(spark):
    rows = [
        # booleans — true / false / invalid lexical (EBV false)
        (None, E + "bt", False, V + "v", "literal", "true",
         XSD + "boolean", None),
        (None, E + "bf", False, V + "v", "literal", "false",
         XSD + "boolean", None),
        (None, E + "b1", False, V + "v", "literal", "1",
         XSD + "boolean", None),
        (None, E + "bx", False, V + "v", "literal", "maybe",
         XSD + "boolean", None),
        # numerics — nonzero / zero / invalid lexical (EBV false)
        (None, E + "n7", False, V + "v", "literal", "7",
         XSD + "integer", None),
        (None, E + "n0", False, V + "v", "literal", "0",
         XSD + "integer", None),
        (None, E + "nz", False, V + "v", "literal", "0.0",
         XSD + "decimal", None),
        (None, E + "nbad", False, V + "v", "literal", "abc",
         XSD + "integer", None),
        # string-ish — plain, empty plain, lang-tagged, xsd:string
        (None, E + "sp", False, V + "v", "literal", "hi", None, None),
        (None, E + "se", False, V + "v", "literal", "", None, None),
        (None, E + "sl", False, V + "v", "literal", "hei", None, "no"),
        (None, E + "sx", False, V + "v", "literal", "x",
         XSD + "string", None),
        # type errors: IRI, bnode, other typed literal
        (None, E + "iri", False, V + "v", "iri", E + "other", None, None),
        (None, E + "bn", False, V + "v", "bnode", "_:b0", None, None),
        (None, E + "dt", False, V + "v", "literal", "2024-01-01",
         XSD + "date", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def subs(df):
    return sorted(r.s.rsplit("/", 1)[-1] for r in df.collect())


def test_filter_bare_variable_ebv(ebv_quads):
    out = sparql(ebv_quads, PFX + "SELECT ?s WHERE { ?s v:v ?x FILTER(?x) }")
    # truthy: true/1 booleans, nonzero numerics, nonempty strings
    assert subs(out) == ["b1", "bt", "n7", "sl", "sp", "sx"]


def test_filter_negated_bare_variable(ebv_quads):
    out = sparql(ebv_quads, PFX +
                 "SELECT ?s WHERE { ?s v:v ?x FILTER(!?x) }")
    # falsy-but-not-error: false/invalid booleans, 0/invalid numerics,
    # empty string.  Type errors (iri/bnode/date) stay errors under !.
    assert subs(out) == ["bf", "bx", "n0", "nbad", "nz", "se"]


def test_and_or_ebv_coercion(ebv_quads):
    out = sparql(ebv_quads, PFX + """
        SELECT ?s WHERE { ?s v:v ?x FILTER(?x && STRSTARTS(STR(?s), "h")
                                           || ?x) }""")
    assert subs(out) == ["b1", "bt", "n7", "sl", "sp", "sx"]


def test_constant_ebv_forms(ebv_quads):
    # numeric constant 0 → false, nonempty string constant → true
    none = sparql(ebv_quads, PFX + 'SELECT ?s WHERE { ?s v:v ?x FILTER(0) }')
    assert none.count() == 0
    all_ = sparql(ebv_quads, PFX +
                  'SELECT ?s WHERE { ?s v:v ?x FILTER("yes") }')
    assert all_.count() == 15
    empty = sparql(ebv_quads, PFX +
                   'SELECT ?s WHERE { ?s v:v ?x FILTER("") }')
    assert empty.count() == 0


def test_if_condition_ebv(ebv_quads):
    # [spec] §17.4.1.2: IF's condition goes through EBV; a type error
    # errors the whole IF → ?t unbound for iri/bnode/date rows.
    out = sparql(ebv_quads, PFX + """
        SELECT ?s ?t WHERE { ?s v:v ?x BIND(IF(?x, "T", "F") AS ?t) }""")
    got = {r.s.rsplit("/", 1)[-1]: r.t for r in out.collect()}
    assert got["n7"] == "T" and got["bt"] == "T" and got["sp"] == "T"
    assert got["n0"] == "F" and got["bf"] == "F" and got["se"] == "F"
    assert got["bx"] == "F" and got["nbad"] == "F"
    assert got["iri"] is None and got["bn"] is None and got["dt"] is None


def test_or_recovers_from_one_sided_error(ebv_quads):
    # §17.2: error || true → true.  ?x is a type error for e:iri but
    # the other disjunct is true, so the row survives.
    out = sparql(ebv_quads, PFX + """
        SELECT ?s WHERE { ?s v:v ?x
            FILTER(?x || STRSTARTS(STR(?s), "http")) }""")
    assert out.count() == 15
    # error && true → error → row dropped
    out2 = sparql(ebv_quads, PFX + """
        SELECT ?s WHERE { ?s v:v ?x
            FILTER(?x && STRSTARTS(STR(?s), "http")) }""")
    assert subs(out2) == ["b1", "bt", "n7", "sl", "sp", "sx"]
