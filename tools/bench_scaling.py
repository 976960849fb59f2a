"""Two-parallelism scaling measurement (north_rule: throughput scaling
efficiency ≥0.8 from N to 4N executors; sandbox proxy per driver
instruction: local[8] vs local[32] on identical input + code).

Writes BENCH_SCALING.json and prints the table for BASELINE.md.

Method:
- materialize the deterministic synthetic transcript table once (64 parquet
  files so both runs see the same 64 input splits),
- per parallelism level: fresh SparkSession, warm-up job (JVM + Python
  worker pool spin-up excluded from timing), then time
  expand_transcripts(...).count() — the narrow per-turn path that dominates
  the pipeline,
- efficiency = (throughput_32 / throughput_8) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdflib_jsonld_spark.operators.expand import expand_transcripts  # noqa: E402
from rdflib_jsonld_spark.plans.pipeline import build_session  # noqa: E402
from rdflib_jsonld_spark.sources import transcripts as tr  # noqa: E402


def run_level(cpus: int, tpath: str) -> dict:
    spark = build_session(f"local[{cpus}]", f"scaling-{cpus}",
                          shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    tdf = tr.read_transcripts(spark, tpath)
    n_turns = tdf.count()
    # warm-up: spin up Python worker pool + JIT on a small slice
    expand_transcripts(tdf.limit(2000)).count()
    t0 = time.time()
    n_quads = expand_transcripts(tdf).count()
    dt = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "n_turns": n_turns, "n_quads": n_quads,
            "seconds": round(dt, 2),
            "turns_per_sec": round(n_turns / dt, 1)}


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING.json")
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        tpath = os.path.join(td, "transcripts")
        gen = build_session("local[32]", "scaling-gen")
        gen.sparkContext.setLogLevel("ERROR")
        tr.write_transcripts(gen, tpath, n_convs=n_convs, seed=42,
                             partitions=64)
        gen.stop()

        low = run_level(8, tpath)
        high = run_level(32, tpath)

    eff = (high["turns_per_sec"] / low["turns_per_sec"]) / 4.0
    result = {
        "low": low, "high": high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
        "method": "identical parquet input (64 splits), identical code; "
                  "local[8] vs local[32] as N vs 4N executor proxy",
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
