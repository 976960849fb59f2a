"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headliners:
- kg_pipeline_documents : full expand→link→canonicalize on the documents
  bridge (the north-star path).
- kg_expand_synthetic   : transcript expansion throughput on the synthetic
  generator corpus (turns/sec reported in extras.turns_per_sec).
- tpch q1/q3/q5, minhash near-dup, embedding top-k: operator breadth.

Scaling (N vs 4N executors proxy): tools/bench_scaling.py runs the same
expansion job at local[8] and local[32] and records efficiency in
BENCH_SCALING.json / BASELINE.md (driver instruction).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _pin_to_cores(cpus: int) -> bool:
    """Re-exec under ``taskset`` so the JVM+Python workers own exactly
    ``cpus`` cores. Unpinned runs swing ±30% with box load (BASELINE.md);
    pinning + best-of-2 makes BENCH_r{N} deltas comparable across rounds.
    Opt out with SPARK_GRAFT_NO_PIN=1. Returns whether this process runs
    pinned — the JSON carries it so an unpinned fallback (no taskset /
    too few cores) can never masquerade as a pinned measurement."""
    import shutil
    if os.environ.get("SPARK_GRAFT_PINNED") == "1":
        # don't trust an inherited env flag (ADVICE r02): verify the
        # affinity mask actually matches before reporting pinned=true
        try:
            return len(os.sched_getaffinity(0)) == cpus
        except (AttributeError, OSError):
            return False
    if (os.environ.get("SPARK_GRAFT_NO_PIN") == "1"
            or shutil.which("taskset") is None
            or (os.cpu_count() or 0) < cpus):
        return False
    os.environ["SPARK_GRAFT_PINNED"] = "1"
    os.execvp("taskset",
              ["taskset", "-c", f"0-{cpus - 1}", sys.executable] + sys.argv)


def _calibrate() -> float:
    """Single-core CPU probe (ms, best of 3): a fixed sha1 chain whose
    runtime is content-independent. The shared host swings 30-150%
    between rounds (r03 measured the same code 2.5x slower than r02's
    recorded numbers during a contention spike, with /proc/stat steal at
    0.1%) — the probe lets a reader normalize BENCH_r{N} deltas for box
    state instead of mistaking host noise for regressions."""
    best = None
    for _ in range(3):
        t0 = time.time()
        h = b"x" * 1000
        for _ in range(100_000):
            h = __import__("hashlib").sha1(h[:64]).digest() + h[:936]
        dt = (time.time() - t0) * 1000
        best = dt if best is None else min(best, dt)
    return round(best, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
    pinned = _pin_to_cores(cpus)

    from rdflib_jsonld_spark.plans.pipeline import build_session
    import __spark_entry__ as em
    from rdflib_jsonld_spark.operators.expand import expand_transcripts
    from rdflib_jsonld_spark.sources import transcripts as tr

    spark = build_session(f"local[{cpus}]", "bench",
                          shuffle_partitions=max(cpus, 16),
                          driver_memory="8g")
    # sandbox corpora are small files: force one scan split per file so
    # the Python expansion stage actually gets `cpus` concurrent tasks
    # (at real scale the default 128 MB split target is correct)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {"calib_sha1_ms": _calibrate()}

    def timed(name, fn, repeat: int = 2):
        """Best-of-``repeat`` (steady-state; first run absorbs residual
        per-query compile/broadcast cost). The cache is CLEARED before
        every repeat: queries that persist() internally would otherwise
        have their second run served from the first run's still-cached
        plan (Spark CacheManager plan substitution — measured 14.5s →
        1.6s on the KG pipeline), so best-of-N would time a cached scan
        instead of the pipeline."""
        best, out = None, None
        for _ in range(repeat):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # untimed session warm-up: JVM JIT, Python worker pools, first shuffle,
    # broadcast machinery — long-lived cluster sessions run warm, so
    # steady-state is the honest measure. Warm with the same query shape
    # at the smallest scale factor.
    em.q_kg_entity_counts_documents(spark, "/root/testdata/sf0.001").collect()

    # -- KG pipeline over the sf documents bridge --------------------------
    timed("kg_pipeline_documents",
          lambda: em.q_kg_entity_counts_documents(spark, sf_dir).collect())

    # -- transcript expansion throughput (synthetic corpus, parquet-backed)
    with tempfile.TemporaryDirectory() as td:
        tpath = os.path.join(td, "transcripts")
        tr.write_transcripts(spark, tpath, n_convs=n_convs, seed=42,
                             partitions=cpus * 2)
        tdf = tr.read_transcripts(spark, tpath)
        n_turns = tdf.count()

        def run_expand():
            return expand_transcripts(tdf).count()

        n_quads = timed("kg_expand_synthetic", run_expand)
        extras["turns_per_sec"] = round(n_turns / timings["kg_expand_synthetic"], 1)
        extras["n_turns"] = n_turns
        extras["n_quads"] = n_quads

    # -- operator breadth ----------------------------------------------------
    timed("tpch_q1", lambda: em.q_tpch_q1_pricing_summary(spark, sf_dir).collect())
    timed("tpch_q3", lambda: em.q_tpch_q3_shipping_priority(spark, sf_dir).collect())
    timed("tpch_q5", lambda: em.q_tpch_q5_local_supplier(spark, sf_dir).collect())
    timed("minhash_near_dups",
          lambda: em.q_doc_minhash_near_dups(spark, sf_dir).collect())
    timed("emb_topk_cosine", lambda: em.q_emb_topk_cosine(spark, sf_dir).collect())
    timed("events_sessionize",
          lambda: em.q_events_sessionize(spark, sf_dir).collect())
    timed("bgp_mention_counts",
          lambda: em.q_kg_bgp_mention_counts(spark, sf_dir).collect())
    timed("docform_expand",
          lambda: em.q_kg_expanded_node_counts(spark, sf_dir).collect())
    timed("nquads_roundtrip",
          lambda: em.q_kg_nquads_roundtrip(spark, sf_dir).collect())

    from rdflib_jsonld_spark.operators.dedup import winnowing_overlap_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("winnowing_overlap",
          lambda: winnowing_overlap_pairs(docs, min_shared=8).count())

    # pin the Python-stage-recompute class (VERDICT r02 #1/#10): these two
    # feed the mapInPandas expansion into 2- and 3-branch join plans. They
    # run LAST: cc_distributed's checkpoint-block churn perturbs whatever
    # query follows it (measured: nquads_roundtrip 2.6 s standalone but
    # 12 s when scheduled right after cc_distributed), and keeping the
    # r02-era entries in their original order preserves round-over-round
    # comparability of the prefix.
    timed("bgp_optional_sameas",
          lambda: em.q_kg_bgp_optional_sameas(spark, sf_dir).collect())
    timed("cc_distributed",
          lambda: em.q_kg_cc_distributed_documents(spark, sf_dir).collect())

    # late-r03 surface (trailing, keeps the prefix comparable): the
    # SPARQL Update 3-op curation sequence — anti-join deletes +
    # template inserts over the persisted quad table
    timed("sparql_update_rewrite",
          lambda: em.q_kg_sparql_update_rewrite(spark, sf_dir).collect())

    # late-r03 analytics/retrieval wave (trailing): lexical index+score,
    # iterative graph rounds over the sameAs graph, distributed Lloyd
    timed("bm25_topk", lambda: em.q_doc_bm25_topk(spark, sf_dir).collect())
    timed("entity_pagerank",
          lambda: em.q_kg_entity_pagerank(spark, sf_dir).collect())
    timed("emb_kmeans",
          lambda: em.q_emb_kmeans_sizes(spark, sf_dir).collect())

    # late-r03 curation wave (trailing): stride-1 exact-substring islands
    # over every document pair, and the five-stage curation funnel
    # (C4 → Gopher → corpus-dedup → cap → mixture)
    timed("shared_passages",
          lambda: em.q_doc_shared_passages(spark, sf_dir).collect())
    timed("curation_funnel",
          lambda: em.q_doc_curation_funnel(spark, sf_dir).collect())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "kg_pipeline_e2e_plus_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "pinned": pinned,
        "extras": extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
