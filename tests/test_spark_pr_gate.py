"""M2 exit criterion (SURVEY.md §7): the P/R ≥ 0.95 gate holds for quads
produced THROUGH the Spark pipeline (fenced-block transcripts →
mapInPandas expand), not just the pure core. Fixtures requiring custom
to_rdf options (base / generalized_rdf / lists-of-lists) flow through the
default pipeline config, so only default-option cases are embedded."""

import json
from pathlib import Path

from rdflib_jsonld_spark.jsonld import nquads
from rdflib_jsonld_spark.jsonld.compare import precision_recall
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT
from rdflib_jsonld_spark.operators.expand import expand_transcripts
from rdflib_jsonld_spark.sources.transcripts import (
    FENCE_CLOSE, FENCE_OPEN, TRANSCRIPT_SCHEMA)

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tordf"


def _eligible_cases():
    out = []
    for path in sorted(FIXTURE_DIR.glob("*.json")):
        case = json.loads(path.read_text())
        if "expect_error" in case or case.get("options") \
                or case.get("registry"):
            continue
        out.append(case)
    return out


def _row_to_term(kind, value, dt, lang):
    if kind == "literal":
        return (LIT, value, dt or "http://www.w3.org/2001/XMLSchema#string",
                lang)
    if kind == "triple" or value.startswith("<<"):
        return nquads.parse_term(value)[0]  # quoted-triple spelling
    if value.startswith("_:"):
        return (BNODE, value[2:])
    return (IRI, value)


def test_spark_pipeline_pr_gate(spark):
    cases = _eligible_cases()
    assert len(cases) >= 30  # most of the corpus is default-option
    rows = []
    for i, case in enumerate(cases):
        text = (f"fixture {case['name']} " + FENCE_OPEN
                + json.dumps(case["input"]) + FENCE_CLOSE)
        rows.append((f"fx_{i:04d}", 0, "user", text, None,
                     __import__("datetime").datetime(2024, 1, 1)))
    df = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    quads = expand_transcripts(df)

    by_conv: dict[str, list] = {}
    for r in quads.collect():
        g = None if r.g is None else (
            (BNODE, r.g[2:]) if r.g.startswith("_:") else (IRI, r.g))
        s = (BNODE, r.s[2:]) if r.s_is_bnode else (
            nquads.parse_term(r.s)[0] if r.s.startswith("<<")
            else (IRI, r.s))
        p = (BNODE, r.p[2:]) if r.p.startswith("_:") else (IRI, r.p)
        o = _row_to_term(r.o_kind, r.o_value, r.o_datatype, r.o_lang)
        by_conv.setdefault(r.conv_id, []).append((g, s, p, o))

    tp_o = tp_e = n_o = n_e = 0
    for i, case in enumerate(cases):
        ours = by_conv.get(f"fx_{i:04d}", [])
        expected = nquads.parse(case["expected_nquads"])
        p, r = precision_recall(ours, expected)
        n_o += len(ours)
        n_e += len(expected)
        tp_o += p * len(ours)
        tp_e += r * len(expected)
        assert r == 1.0 and p == 1.0, (case["name"], p, r)
    precision, recall = tp_o / n_o, tp_e / n_e
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0
