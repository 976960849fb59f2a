"""Spark-stage tests for document-level expand/flatten/compact
(operators/docops.py) over the deterministic documents bridge.

The bridge (sources/doc_transcripts.py) makes node counts arithmetically
predictable: block for doc_id carries 1 + (doc_id % (1 + (doc_id%500)%3))
top-level nodes — so the Spark result is checked against pure arithmetic,
the same construction the DuckDB contract oracle uses.
"""

import pytest

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.docops import (
    compact_roundtrip_stage, expand_documents_stage, expanded_node_counts,
    flatten_documents_stage, frame_documents_stage)
from rdflib_jsonld_spark.sources.doc_transcripts import documents_as_transcripts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def transcripts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return documents_as_transcripts(docs).cache()


def _expected_nodes(doc_id: int) -> int:
    return 1 + doc_id % (1 + (doc_id % 500) % 3)


def test_expand_stage_node_counts_match_arithmetic(spark, transcripts):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = {
        (r["source"], int(r["doc_id"])): _expected_nodes(int(r["doc_id"]))
        for r in docs.select("source", "doc_id").collect()}
    got = expand_documents_stage(transcripts) \
        .select("conv_id", "turn_idx", "n_nodes").collect()
    assert len(got) == len(expected)
    # conv_id=source; turn_idx is the per-source row_number ordering, so
    # compare per-source node-count MULTISETS (order-free, exact).
    from collections import Counter
    want, have = Counter(), Counter()
    for (src, _), n in expected.items():
        want[(src, n)] += 1
    for r in got:
        have[(r["conv_id"], r["n_nodes"])] += 1
    assert want == have


def test_expand_stage_is_narrow(transcripts):
    # the documents bridge repartitions single-split scans on purpose; the
    # expansion stage itself must add NO further shuffle
    base = transcripts._jdf.queryExecution().executedPlan().toString()
    plan = expand_documents_stage(transcripts)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange")


def test_flatten_stage_labels_and_merges(spark, transcripts):
    flat = flatten_documents_stage(transcripts)
    row = flat.orderBy("conv_id", "turn_idx").first()
    import json
    nodes = json.loads(row["doc_json"])
    ids = [n["@id"] for n in nodes]
    assert ids == sorted(ids)  # deterministic ordering
    assert all(isinstance(v, list) for n in nodes for k, v in n.items()
               if k not in ("@id",))


def test_compact_roundtrip_all_ok(spark, transcripts):
    rt = compact_roundtrip_stage(transcripts) \
        .agg(F.count("*").alias("n"),
             F.sum(F.col("ok").cast("int")).alias("n_ok"),
             F.sum("n_quads").alias("quads")).first()
    assert rt["n"] > 0
    assert rt["n_ok"] == rt["n"]  # every block round-trips exactly
    assert rt["quads"] > 0


def test_expanded_node_counts_aggregate(spark, transcripts):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = docs.select(
        F.col("source").alias("conv_id"),
        (F.lit(1) + F.col("doc_id") % (F.lit(1) + (F.col("doc_id") % 500) % 3)
         ).alias("n")) \
        .groupBy("conv_id") \
        .agg(F.count("*").alias("n_blocks"), F.sum("n").alias("n_nodes")) \
        .orderBy("conv_id").collect()
    got = expanded_node_counts(transcripts).collect()
    assert [(r["conv_id"], r["n_blocks"], r["n_nodes"]) for r in got] == \
        [(r["conv_id"], r["n_blocks"], r["n_nodes"]) for r in expected]


def test_frame_stage_matches_arithmetic(spark, transcripts):
    # frame every block by @type Mention: exactly 1 match per block;
    # the embedded `about` alias node carries sameAs iff j >= 1
    from rdflib_jsonld_spark.sources.registry import CONTEXT_V1_IRI
    framed = frame_documents_stage(
        transcripts, {"@context": CONTEXT_V1_IRI, "@type": "Mention"})
    got = framed.agg(
        F.count("*").alias("n"),
        F.sum("n_nodes").alias("n_matched"),
        F.sum(F.col("doc_json").contains("sameAs").cast("long"))
        .alias("n_embedded")).first()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exp = docs.agg(
        F.count("*").alias("n"),
        F.sum((F.col("doc_id") % (F.lit(1) + (F.col("doc_id") % 500) % 3)
               >= 1).cast("long")).alias("n_embedded")).first()
    assert (got["n"], got["n_matched"], got["n_embedded"]) == \
        (exp["n"], exp["n"], exp["n_embedded"])


def test_frame_stage_is_narrow(transcripts):
    from rdflib_jsonld_spark.sources.registry import CONTEXT_V1_IRI
    base = transcripts._jdf.queryExecution().executedPlan().toString()
    plan = frame_documents_stage(
        transcripts, {"@context": CONTEXT_V1_IRI, "@type": "Mention"}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base.count("Exchange")


def test_random_docs_spark_stage_matches_pure_core(spark):
    """Arrow-boundary fidelity: 120 hypothesis-generated documents pushed
    through the distributed expansion stage must expand exactly like the
    pure core (same JSON, same node counts), including unicode text and
    nested/list/value-object shapes."""
    import json
    import warnings
    from tests.test_properties import documents
    from rdflib_jsonld_spark.jsonld.expansion import expand
    from rdflib_jsonld_spark.operators.docops import expand_documents_stage

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # .example() outside @given is
        docs = [documents.example() for _ in range(120)]  # intentional here
    rows = [(f"c{i}", 0, "```ld\n" + json.dumps(d) + "\n```")
            for i, d in enumerate(docs)]
    tdf = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string").repartition(8)
    got = {r["conv_id"]: r["doc_json"]
           for r in expand_documents_stage(tdf).collect()}
    for i, d in enumerate(docs):
        # the stage emits a row per block even when expansion drops a
        # free-floating node (doc_json "[]", n_nodes 0)
        assert json.loads(got[f"c{i}"]) == expand(d), d
