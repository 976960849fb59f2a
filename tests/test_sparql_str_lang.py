"""Sweep-24 regression corpus: SPARQL string functions — language-tag
propagation and argument compatibility.

[spec] SPARQL 1.1 §17.4.3.1.1: for the binary string functions the
second argument must be simple/xsd:string or carry the SAME language
tag as the first, else type error. §17.4.3 operator table: UCASE/
LCASE/SUBSTR/REPLACE keep arg1's tag; STRBEFORE/STRAFTER keep it only
when a match exists (else empty SIMPLE literal); CONCAT keeps a tag
only when every argument carries the same one. Previously every
string function returned a bare simple literal ("BOB"@en = UCASE of
"bob"@en compared unequal) and incompatible args silently compared
lexically.
"""

import pytest

from rdflib_jsonld_spark.operators.sparql import SparqlError, sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
V = "http://ex.org/v#"
E = "http://ex.org/e/"
PFX = f"PREFIX v: <{V}> PREFIX e: <{E}> "


@pytest.fixture(scope="module")
def lang_quads(spark):
    rows = [
        (None, E + "en", False, V + "name", "literal", "bob", None, "en"),
        (None, E + "cy", False, V + "name", "literal", "bob", None, "cy"),
        (None, E + "pl", False, V + "name", "literal", "bob", None, None),
        (None, E + "xs", False, V + "name", "literal", "bob",
         XSD + "string", None),
    ]
    df = spark.createDataFrame(rows, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def subs(df):
    return sorted(r.s.rsplit("/", 1)[-1] for r in df.collect())


def test_ucase_propagates_lang(lang_quads):
    out = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n FILTER(UCASE(?n) = "BOB"@en) }""")
    assert subs(out) == ["en"]
    out2 = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n FILTER(UCASE(?n) = "BOB") }""")
    assert subs(out2) == ["pl", "xs"]


def test_lang_of_string_fn_result(lang_quads):
    out = sparql(lang_quads, PFX + """
        SELECT ?s ?l WHERE { ?s v:name ?n
                             BIND(LANG(SUBSTR(?n, 1, 2)) AS ?l) }""")
    got = {r.s.rsplit("/", 1)[-1]: r.l for r in out.collect()}
    assert got == {"en": "en", "cy": "cy", "pl": "", "xs": ""}


def test_bind_alias_keeps_runtime_tag(lang_quads):
    # the termx companions flow through BIND so term-aware = works on
    # the alias too
    out = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n BIND(UCASE(?n) AS ?u)
                          FILTER(?u = "BOB"@cy) }""")
    assert subs(out) == ["cy"]
    out2 = sparql(lang_quads, PFX + """
        SELECT ?s ?d WHERE { ?s v:name ?n
                             BIND(DATATYPE(LCASE(?n)) AS ?d) }""")
    got = {r.s.rsplit("/", 1)[-1]: r.d for r in out2.collect()}
    assert got["en"].endswith("langString")
    assert got["pl"] == XSD + "string" and got["xs"] == XSD + "string"


def test_argument_compatibility_contains(lang_quads):
    # same tag → fine; differing tag / tagged-arg2-vs-plain-arg1 →
    # type error → row dropped
    ok = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n FILTER(CONTAINS(?n, "o"@en)) }""")
    assert subs(ok) == ["en"]
    plain = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n FILTER(CONTAINS(?n, "o")) }""")
    assert subs(plain) == ["cy", "en", "pl", "xs"]
    static_bad = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(CONTAINS("bob"@en, "o"@cy)) }""")
    assert static_bad.count() == 0


def test_strafter_match_keeps_tag_nomatch_simple(lang_quads):
    # match → "b"@en; no match → "" simple, so LANG is ''
    out = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(STRAFTER(?n, "bo") = "b"@en) }""")
    assert subs(out) == ["en"]
    out2 = sparql(lang_quads, PFX + """
        SELECT ?s ?l WHERE { ?s v:name ?n
                             BIND(LANG(STRAFTER(?n, "zz")) AS ?l) }""")
    assert {r.l for r in out2.collect()} == {""}
    # incompatible second arg drops the en row only when tags differ
    out3 = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(STRAFTER(?n, "bo"@cy) = "b"@cy) }""")
    assert subs(out3) == ["cy"]


def test_concat_same_tag_rule(lang_quads):
    out = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(CONCAT(?n, ?n) = "bobbob"@en) }""")
    assert subs(out) == ["en"]
    # an untagged constant argument kills the tag
    out2 = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(CONCAT(?n, "!") = "bob!") }""")
    assert subs(out2) == ["cy", "en", "pl", "xs"]
    # constant fold: both constants, same tag
    out3 = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(?n = CONCAT("b"@en, "ob"@en)) }""")
    assert subs(out3) == ["en"]


def test_strlang_rejects_runtime_tagged_input(lang_quads):
    # STRLANG over a string-fn result: legal only for rows where the
    # propagated tag is NULL
    out = sparql(lang_quads, PFX + """
        SELECT ?s WHERE { ?s v:name ?n
                          FILTER(STRLANG(UCASE(?n), "de") = "BOB"@de) }""")
    assert subs(out) == ["pl", "xs"]


def test_union_aligns_runtime_tag_companions(spark):
    # one branch BINDs a computed tagged term (runtime SqlTag
    # companions), the other binds the same var from data — the union
    # aligner must reconcile the companion columns so LANG and
    # term-aware = stay exact across branches
    rows = [(None, E + "a", False, V + "name", "literal", "bob",
             None, "en"),
            (None, E + "b", False, V + "alt", "literal", "sue",
             None, "cy")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = sparql(df, PFX + """
        SELECT ?s ?u ?l WHERE {
          { ?s v:name ?n BIND(UCASE(?n) AS ?u) } UNION { ?s v:alt ?u }
          BIND(LANG(?u) AS ?l) }""")
    got = {r.s.rsplit("/", 1)[-1]: (r.u, r.l) for r in out.collect()}
    assert got == {"a": ("BOB", "en"), "b": ("sue", "cy")}
    f1 = sparql(df, PFX + """
        SELECT ?s WHERE {
          { ?s v:name ?n BIND(UCASE(?n) AS ?u) } UNION { ?s v:alt ?u }
          FILTER(?u = "BOB"@en) }""")
    assert subs(f1) == ["a"]
    f2 = sparql(df, PFX + """
        SELECT ?s WHERE {
          { ?s v:name ?n BIND(UCASE(?n) AS ?u) } UNION { ?s v:alt ?u }
          FILTER(?u = "sue"@cy) }""")
    assert subs(f2) == ["b"]


def test_type_fn_const_shapes(lang_quads):
    out = sparql(lang_quads, f'PREFIX xsd: <{XSD}> ' + PFX + """
        SELECT ?s WHERE { ?s v:name ?n
            FILTER(ISLITERAL(UCASE(?n)) && !ISIRI(STR(?s))
                   && LANG("x"@en) = "en"
                   && DATATYPE("5"^^xsd:integer) = xsd:integer
                   && ISNUMERIC("5"^^xsd:integer)) }""")
    assert out.count() == 4
