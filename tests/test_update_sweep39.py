"""Sweep-39 regressions — found by the random SPARQL Update
differential (tools/update_fuzz.py vs a spec-derived naive store
application).

Classes pinned:
  1. Quad identity is RDF 1.1 TERM identity, not storage spelling:
     the text front-end's DATA parser spells plain literals with
     explicit xsd:string while the store convention is NULL, so
     ``DELETE DATA`` of a plain literal silently deleted nothing.
     Language tags compare case-insensitively and imply langString.
  2. Template instantiations that would not be valid RDF are skipped
     ([spec] Update §3.1.3 / CONSTRUCT §16.2): a template var bound to
     a literal must not take subject position.
  3. A template position bound to a typed BIND alias (boolean/numeric
     column) renders as its lexical form — the cross-triple union
     previously crashed on an implicit ANSI cast.
  4. (engine-wide, pinned in test_sparql_sweep38-style) a NULL kind
     companion cell with a bound value falls back to the value shape,
     so UNION-branch vars keep exact term equality.
"""

import pytest

from rdflib_jsonld_spark.operators.sparql import sparql
from rdflib_jsonld_spark.operators.update import update

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
E = "http://ex.org/e/"
P = "http://ex.org/p/"


@pytest.fixture()
def store(spark):
    rows = [
        (None, E + "a", False, P + "p", "literal", "plain", None, None),
        (None, E + "a", False, P + "p", "literal", "tagged", None,
         "en-GB"),
        (None, E + "b", False, P + "n", "literal", "9",
         XSD + "integer", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_delete_data_plain_literal_matches_store(store):
    out = update(store, f'DELETE DATA {{ <{E}a> <{P}p> "plain" . }}')
    vals = sorted(r["o_value"] for r in out.collect())
    assert vals == ["9", "tagged"]


def test_delete_data_lang_tag_case_insensitive(store):
    out = update(store, f'DELETE DATA {{ <{E}a> <{P}p> "tagged"@EN-gb . }}')
    vals = sorted(r["o_value"] for r in out.collect())
    assert vals == ["9", "plain"]


def test_insert_then_delete_roundtrip_is_noop(store):
    req = (f'INSERT DATA {{ <{E}c> <{P}p> "x" . }} ; '
           f'DELETE DATA {{ <{E}c> <{P}p> "x" . }}')
    out = update(store, req)
    assert out.count() == 3


def test_template_skips_literal_subject(store):
    # ?v binds literals — "?v <q> <a>" instantiations are invalid RDF
    # and must be skipped, not emitted as literal-spelled subjects
    req = (f'INSERT {{ ?v <{P}q> <{E}a> . ?s <{P}q> ?v . }} '
           f'WHERE {{ ?s <{P}p> ?v }}')
    out = update(store, req)
    new = [r for r in out.collect() if r["p"] == P + "q"]
    assert sorted(r["o_value"] for r in new) == ["plain", "tagged"]
    assert all(r["s"] == E + "a" for r in new)


def test_template_with_typed_bind_alias_position(store):
    # ?flag is a BOOLEAN-typed computed column; as a template object it
    # must land as its lexical form (previously crashed the union)
    req = (f'INSERT {{ <{E}r> <{P}flag> ?flag . }} '
           f'WHERE {{ <{E}b> <{P}n> ?v . BIND((?v > 5) AS ?flag) }}')
    out = update(store, req)
    row = [r for r in out.collect() if r["p"] == P + "flag"]
    assert len(row) == 1 and row[0]["o_value"] == "true"


def test_construct_skips_numeric_alias_subject(spark):
    # a COUNT-valued subquery alias is statically a literal — as a
    # CONSTRUCT subject the instantiation is invalid RDF and skipped
    # (previously emitted an 'iri'-spelled literal subject); as an
    # object it lands as a typed literal
    rows = [(None, E + "a", False, P + "p", "literal", "x", None, None),
            (None, E + "a", False, P + "p", "literal", "y", None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    q = (f"CONSTRUCT {{ ?n <{P}q> <{E}m> . <{E}m> <{P}total> ?n . }} "
         f"WHERE {{ SELECT (COUNT(?v) AS ?n) WHERE {{ "
         f"<{E}a> <{P}p> ?v }} }}")
    out = sparql(df, q).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["s"], r["p"], r["o_kind"], r["o_value"]) == \
        (E + "m", P + "total", "literal", "2")
    assert r["o_datatype"].endswith("integer")


def test_union_null_kind_cell_keeps_term_equality(spark):
    # ?c is bound companion-less (predicate position) in one branch
    # while the other branch's path output materializes kind columns —
    # the NULL cell must fall back to the value shape, not unequal
    rows = [
        (None, E + "r", False, P + "q", "literal", "b", None, None),
        (None, P + "q", False, E + "r", "iri", E + "x", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    q = (f"SELECT ?e ?c WHERE {{ "
         f"{{ ?c (<{P}z>?) ?f . }} UNION {{ ?e ?b 'b' . ?b ?c ?f . }} "
         f"FILTER(?e = ?c) }}")
    rows2 = sparql(df, q).collect()
    assert [(r["e"], r["c"]) for r in rows2] == [(E + "r", E + "r")]
