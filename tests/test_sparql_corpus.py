"""Vendored SPARQL golden-corpus runner (VERDICT r04 #4).

Loads every case in tests/fixtures/sparql/ (authored by
tests/fixtures/make_sparql_corpus.py — expected solutions hand-derived
from the cited SPARQL 1.1 Rec clause, never engine-generated) and runs
it through the text front-end. Comparison is on the quad-table term
spelling; computed values are normalized (floats rounded to 9
decimals, ints passed through) so JSON natives compare stably.
"""

import json
import math
import pathlib

import pytest

from rdflib_jsonld_spark.jsonld.nquads import parse
from rdflib_jsonld_spark.jsonld.tordf import BNODE, LIT, QT
from rdflib_jsonld_spark.operators.sparql import SparqlError, sparql
from rdflib_jsonld_spark.operators.star import term_to_star

CORPUS = sorted((pathlib.Path(__file__).parent
                 / "fixtures" / "sparql").glob("*.json"))

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, "
          "o_kind string, o_value string, o_datatype string, "
          "o_lang string")


def _term_str(t):
    if t[0] == QT:
        return term_to_star(t)
    return ("_:" + t[1]) if t[0] == BNODE else t[1]


def _quad_rows(nq_text):
    rows = []
    for g, s, p, o in parse(nq_text):
        g_str = _term_str(g) if g else None
        if o[0] == LIT:
            rows.append((g_str, _term_str(s), s[0] == BNODE,
                         _term_str(p), "literal", o[1], o[2], o[3]))
        else:
            kind = "bnode" if o[0] == BNODE else (
                "triple" if o[0] == QT else "iri")
            rows.append((g_str, _term_str(s), s[0] == BNODE,
                         _term_str(p), kind, _term_str(o), None, None))
    return rows


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        return int(r) if r == int(r) else r
    if isinstance(v, int):
        return v
    return v


@pytest.mark.parametrize(
    "path", CORPUS, ids=[p.stem for p in CORPUS])
def test_sparql_corpus_case(spark, path):
    c = json.loads(path.read_text())
    quads = spark.createDataFrame(_quad_rows(c["data"]), SCHEMA)
    if c.get("error"):
        with pytest.raises(SparqlError):
            sparql(quads, c["query"]).collect()
        return
    out = sparql(quads, c["query"])
    if c.get("construct") is not None:
        # expected graph as N-Quads text (bnode-free templates only —
        # set comparison, no isomorphism needed)
        want = sorted(map(repr, _quad_rows(c["construct"])))
        got = sorted(repr((r.g, r.s, bool(r.s_is_bnode), r.p, r.o_kind,
                           r.o_value, r.o_datatype, r.o_lang))
                     for r in out.collect())
        assert got == want, f"{c['clause']} — {c['comment']}"
        return
    if c.get("ask") is not None:
        [row] = out.collect()
        assert row.ask == c["ask"], c["clause"]
        return
    vars_, rows = c["expected"]
    got_rows = out.collect()
    assert sorted(out.columns) == sorted(vars_), (
        f"{c['clause']}: projected {out.columns}, expected {vars_}")
    got = [[_norm(r[v]) for v in vars_] for r in got_rows]
    want = [[_norm(x) for x in row] for row in rows]
    if not c.get("ordered"):
        got = sorted(got, key=repr)
        want = sorted(want, key=repr)
    assert got == want, f"{c['clause']} — {c['comment']}"


def test_corpus_is_current():
    """The checked-in JSON must match the authoring script (re-run
    tests/fixtures/make_sparql_corpus.py after editing it)."""
    import tests.fixtures.make_sparql_corpus as mk
    assert len(CORPUS) == len(mk.CASES)
    by_name = {json.loads(p.read_text())["name"]: p for p in CORPUS}
    for c in mk.CASES:
        on_disk = json.loads(by_name[c["name"]].read_text())
        for k, v in c.items():
            assert on_disk[k] == v, (c["name"], k)
