"""Two-parallelism scaling measurement (north_rule: throughput scaling
efficiency ≥0.8 from N to 4N executors; sandbox proxy per driver
instruction: same job, same input, N vs 4N cores).

Methodology — faithful executor proxy:
- An N-core cluster owns N cores TOTAL (JVM task threads + Python workers
  share them). Running local[8] unpinned on a 32-core box hands the
  baseline 4× spare cores and understates scaling. Each level therefore
  runs in a subprocess pinned with ``taskset -c 0..N-1`` to exactly N
  cores — local[N] on N cores vs local[4N] on 4N cores.
- Identical parquet input (256 files, one read split per file via
  maxPartitionBytes/openCostInBytes) and identical code.
- Full untimed warm-up pass (Python worker pool + JIT), then best-of-2
  timed runs of the narrow expand stage that dominates the pipeline.

Writes BENCH_SCALING.json and prints the table for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, tpath: str) -> dict:
    """One measurement at `cpus` cores (call inside a pinned subprocess)."""
    from rdflib_jsonld_spark.operators.expand import expand_transcripts
    from rdflib_jsonld_spark.plans.pipeline import build_session
    from rdflib_jsonld_spark.sources import transcripts as tr

    spark = build_session(f"local[{cpus}]", f"scaling-{cpus}",
                          shuffle_partitions=max(cpus, 16))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    tdf = tr.read_transcripts(spark, tpath)
    n_turns = tdf.count()
    expand_transcripts(tdf).count()  # warm-up, untimed
    best, n_quads = None, 0
    for _ in range(2):
        t0 = time.time()
        n_quads = expand_transcripts(tdf).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    return {"cpus": cpus, "n_turns": n_turns, "n_quads": n_quads,
            "seconds": round(best, 2),
            "turns_per_sec": round(n_turns / best, 1)}


def run_pinned(cpus: int, tpath: str) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--level",
           str(cpus), tpath]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--level":
        print(json.dumps(run_level(int(sys.argv[2]), sys.argv[3])))
        return

    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
    low_cpus = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "8"))
    high_cpus = 4 * low_cpus
    out_path = os.path.join(REPO, "BENCH_SCALING.json")

    from rdflib_jsonld_spark.plans.pipeline import build_session
    from rdflib_jsonld_spark.sources import transcripts as tr

    with tempfile.TemporaryDirectory() as td:
        tpath = os.path.join(td, "transcripts")
        gen = build_session("local[32]", "scaling-gen")
        gen.sparkContext.setLogLevel("ERROR")
        tr.write_transcripts(gen, tpath, n_convs=n_convs, seed=42,
                             partitions=256)
        gen.stop()

        levels = sorted({low_cpus, high_cpus, 4, 16})
        runs = {c: run_pinned(c, tpath) for c in levels}
        low, high = runs[low_cpus], runs[high_cpus]

    eff = (high["turns_per_sec"] / low["turns_per_sec"]) / 4.0
    pairs = []
    for lo in (4, 8):
        hi = lo * 4
        if lo in runs and hi in runs:
            pe = (runs[hi]["turns_per_sec"]
                  / runs[lo]["turns_per_sec"]) / 4.0
            pairs.append({"n": lo, "4n": hi,
                          "turns_per_sec_n": runs[lo]["turns_per_sec"],
                          "turns_per_sec_4n": runs[hi]["turns_per_sec"],
                          "scaling_efficiency": round(pe, 3),
                          "meets_target": pe >= 0.8})

    # Hardware ceiling: the SAME kernel without Spark (multiprocessing,
    # pinned) at the SAME N→4N pair as the headline Spark efficiency and
    # a comparable corpus — mismatched levels/working sets would make the
    # ratio below meaningless. On one shared-memory socket the memory
    # system caps scaling for any implementation; independent cluster
    # nodes don't share a bus.
    kernel_convs = min(n_convs, 20000)  # driver-side corpus, bounded
    kernel = json.loads(subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "kernel_ceiling.py"),
         str(kernel_convs), str(low_cpus)],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip().splitlines()[-1])
    ceiling = kernel["kernel_scaling_efficiency"]

    from bench import _calibrate
    result = {
        "calib_sha1_ms": _calibrate(),  # box-state probe (see bench.py)
        "low": low, "high": high,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
        "pairs_n_to_4n": pairs,
        "kernel_ceiling_no_spark": kernel,
        "efficiency_vs_hardware_ceiling": round(eff / ceiling, 3),
        "method": "taskset-pinned local[N] on N cores vs local[4N] on 4N "
                  "cores (executor proxy); identical parquet input "
                  "(256 splits), identical code; warm pool, best of 2. "
                  "kernel_ceiling = same expansion kernel, no Spark, "
                  "naive multiprocessing chunks on the same pinned cores "
                  "— a single-box comparison point (Spark's Arrow "
                  "batching/pipelining can and does out-scale it).",
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
