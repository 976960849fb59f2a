"""Sweep-10 SPARQL term-semantics regressions (operators/sparql.py).

Found by corner probes against SPARQL 1.1: (1) ``=``/``!=``/``sameTerm``
compared only lexical forms, so ``"Bob"@en = "Bob"`` was true and a
literal could equal a same-lexical IRI; (2) a language tag / datatype on
a BGP literal constant was silently dropped, so ``v:name "Bob"@en``
matched every lexical "Bob"; (3) a trailing VALUES clause ([spec]
SPARQL 1.1 §10.2) was rejected as trailing tokens; (4) VALUES UNDEF
cells joined as NULL equality and silently matched nothing.
"""

import pytest

from rdflib_jsonld_spark.operators.bgp import (decode_literal,
                                               encode_literal,
                                               patch_companion_refs)
from rdflib_jsonld_spark.operators.sparql import sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
V = "http://ex.org/v#"
E = "http://ex.org/e/"

ROWS = [
    (None, E + "a", False, V + "name", "literal", "Bob", XSD + "string",
     None),
    (None, E + "b", False, V + "name", "literal", "Bob",
     RDF + "langString", "en"),
    (None, E + "c", False, V + "name", "literal", "Bob", None, "de"),
    (None, E + "d", False, V + "name", "literal", "Alice", None, None),
    (None, E + "a", False, V + "age", "literal", "30", XSD + "integer",
     None),
    (None, E + "b", False, V + "tag", "literal", "30", None, None),
    (None, E + "a", False, V + "knows", "iri", E + "b", None, None),
]

PFX = f"PREFIX v: <{V}> PREFIX e: <{E}> PREFIX xsd: <{XSD}> "


@pytest.fixture(scope="module")
def quads(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


def ids(df):
    return sorted(r[0] for r in df.collect())


# --- term-aware equality ----------------------------------------------------

def test_eq_plain_literal_excludes_tagged(quads):
    got = ids(sparql(quads, PFX +
                     'SELECT ?s WHERE { ?s v:name ?n FILTER(?n = "Bob") }'))
    assert got == [E + "a"]


def test_neq_is_term_negation(quads):
    got = ids(sparql(quads, PFX +
                     'SELECT ?s WHERE { ?s v:name ?n FILTER(?n != "Bob") }'))
    assert got == sorted([E + "b", E + "c", E + "d"])


def test_eq_lang_literal(quads):
    got = ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                     '{ ?s v:name ?n FILTER(?n = "Bob"@en) }'))
    assert got == [E + "b"]


def test_eq_typed_string_matches_plain(quads):
    got = ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                     '{ ?s v:name ?n FILTER(?n = "Bob"^^xsd:string) }'))
    assert got == [E + "a"]


def test_sameterm_exact(quads):
    got = ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                     '{ ?s v:name ?n FILTER(sameTerm(?n, "Bob"@en)) }'))
    assert got == [E + "b"]


def test_subject_var_never_equals_string_literal(quads):
    # an IRI is not a literal, even with the same lexical form
    got = sparql(quads, PFX + 'SELECT ?n WHERE { ?s v:name ?n '
                 f'FILTER(?s = "{E}a") }}')
    assert got.count() == 0


def test_var_iri_equality_still_works(quads):
    got = ids(sparql(quads, PFX +
                     'SELECT ?s WHERE { ?s v:knows ?o FILTER(?o = e:b) }'))
    assert got == [E + "a"]


def test_var_var_equality_is_term_aware(quads):
    # "Bob"^^xsd:string vs "Bob"@en vs "Bob"@de are pairwise distinct
    got = sparql(quads, PFX + "SELECT ?x ?y WHERE { ?x v:name ?nx . "
                 "?y v:name ?ny FILTER(?nx = ?ny && ?x != ?y) }")
    assert got.count() == 0


def test_str_comparison_stays_lexical(quads):
    got = ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                     '{ ?s v:name ?n FILTER(str(?n) = "Bob") }'))
    assert got == sorted([E + "a", E + "b", E + "c"])


def test_regex_flags_accept_literal_node(quads):
    got = ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                     '{ ?s v:name ?n FILTER(REGEX(?n, "^bob$", "i")) }'))
    assert got == sorted([E + "a", E + "b", E + "c"])


# --- BGP literal constants --------------------------------------------------

def test_bgp_lang_literal_exact(quads):
    assert ids(sparql(quads, PFX +
                      'SELECT ?s WHERE { ?s v:name "Bob"@en }')) == [E + "b"]


def test_bgp_lang_case_insensitive(quads):
    assert ids(sparql(quads, PFX +
                      'SELECT ?s WHERE { ?s v:name "Bob"@DE }')) == [E + "c"]


def test_bgp_typed_literal_exact(quads):
    assert ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                      '{ ?s v:age "30"^^xsd:integer }')) == [E + "a"]
    assert ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                      '{ ?s v:name "Bob"^^xsd:string }')) == [E + "a"]


def test_bgp_plain_literal_exact_term(quads):
    # [spec] §5.2 (sweep 37): a plain literal constant is the TERM
    # "Bob" (≡ "Bob"^^xsd:string, RDF 1.1) — it must NOT match the
    # lang-tagged "Bob"@en / "Bob"@de. (The kwargs surface keeps its
    # lexical-form convention; this is the text front-end.)
    assert ids(sparql(quads, PFX + 'SELECT ?s WHERE '
                      '{ ?s v:name "Bob" }')) == [E + "a"]


def test_construct_template_lang_literal(quads):
    out = sparql(quads, PFX + 'CONSTRUCT { ?s v:label "x"@en } '
                 'WHERE { ?s v:age "30"^^xsd:integer }').collect()
    assert len(out) == 1
    r = out[0]
    assert (r.o_value, r.o_lang, r.o_datatype) == (
        "x", "en", RDF + "langString")


# --- VALUES ------------------------------------------------------------------

def test_trailing_values_clause(quads):
    got = sparql(quads, PFX + "SELECT ?s ?n WHERE { ?s v:name ?n } "
                 "VALUES ?s { e:a }").collect()
    assert [(r.s, r.n) for r in got] == [(E + "a", "Bob")]


def test_values_undef_wildcard_before_bgp(quads):
    got = sparql(quads, PFX + "SELECT ?s ?n WHERE { "
                 'VALUES (?s ?n) { (e:d UNDEF) (UNDEF "Alice") } '
                 "?s v:name ?n }").collect()
    # BOTH VALUES rows are compatible with (d, Alice) → multiset
    # cardinality 2 ([spec] §18.5 join cardinality)
    assert sorted((r.s, r.n) for r in got) == [(E + "d", "Alice")] * 2


def test_values_undef_wildcard_after_bgp(quads):
    got = sparql(quads, PFX + "SELECT ?s ?n WHERE { ?s v:name ?n "
                 "VALUES (?s ?n) { (UNDEF \"Alice\") } }").collect()
    assert sorted((r.s, r.n) for r in got) == [(E + "d", "Alice")]


def test_values_all_undef_row_keeps_everything(quads):
    got = sparql(quads, PFX + "SELECT ?s WHERE { VALUES ?s { UNDEF } "
                 "?s v:name ?n }")
    assert got.count() == 4


# --- helpers ------------------------------------------------------------------

def test_isnumeric_builtin(quads):
    # [spec] §17.4.2.4: true only for literals with a numeric datatype
    # — the plain "30" (e:b's tag) and IRIs are excluded
    got = ids(sparql(quads, PFX + "SELECT ?s WHERE "
                     "{ ?s ?p ?o FILTER(isNumeric(?o)) }"))
    assert got == [E + "a"]


def test_min_max_numeric_not_lexical(quads, spark):
    rows = [(None, E + "a", False, V + "v", "literal", "9",
             XSD + "integer", None),
            (None, E + "b", False, V + "v", "literal", "10",
             XSD + "integer", None)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sparql(df, PFX + "SELECT (MIN(?x) AS ?mn) (MAX(?x) AS ?mx) "
                 "WHERE { ?s v:v ?x }").collect()
    # lexical compare said MIN="10"/MAX="9" before sweep 10
    assert [(r.mn, r.mx) for r in got] == [("9", "10")]
    ordered = sparql(df, PFX + "SELECT ?x WHERE { ?s v:v ?x } "
                     "ORDER BY DESC(?x) LIMIT 1").collect()
    assert [r.x for r in ordered] == ["10"]


def test_count_distinct_star(quads):
    got = sparql(quads, PFX + "SELECT (COUNT(DISTINCT *) AS ?c) "
                 "WHERE { ?s v:name ?n }").collect()
    assert got[0].c == 4


def test_encode_decode_literal_roundtrip():
    for val, lang, dt in [("Bob", "en", None),
                          ('say "hi"\\now', None, XSD + "integer"),
                          ("plain", None, None)]:
        enc = encode_literal(val, lang=lang, datatype=dt)
        assert decode_literal(enc) == (val, lang, dt)
    assert decode_literal("not encoded") is None
    assert decode_literal("?var") is None


def test_patch_companion_refs_fallbacks():
    sql = ("(`n` = 'Bob' AND `__typ_n__kind` = 'literal' AND "
           "`__typ_n__lang` IS NULL)")
    # companion present → untouched
    assert patch_companion_refs(
        sql, ["n", "__typ_n__kind", "__typ_n__lang"]) == sql
    patched = patch_companion_refs(sql, ["n"])
    assert "__typ_n__kind" not in patched
    assert "CAST(NULL AS STRING)" in patched and "startswith(`n`" in patched
