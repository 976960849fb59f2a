"""Partitioned quad-table materialization with per-slice lineage + resume.

SURVEY.md §7 M4. Iceberg jars are not provisioned in the sandbox (risk R1),
so the writer targets the documented fallback: directory-partitioned
parquet with the SAME bucket-column layout an Iceberg
``bucket(N, s)``/``bucket(N, p)`` table would use, plus a ``_lineage/``
metrics directory. The writer interface is the one seam to swap for
``spark.read/write.format("iceberg")`` on a real cluster.

Resume model (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):
- Work is split into ``n_slices`` deterministic conv-hash slices
  (``pmod(xxhash64(conv_id), n_slices)``) — the unit of restart.
- Each slice writes quads to ``quads/slice=<i>/`` and then a JSON marker
  ``_lineage/slice_<i>.json`` with {rows_in, quads_out, checksum}; marker
  write is last, so a crash mid-slice leaves no marker and the slice
  re-runs. Because expansion is a pure function of the input slice
  (deterministic bnodes — SURVEY.md §4.3.1), re-running yields identical
  bytes, making the whole pipeline idempotent.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def quad_checksum(quads: DataFrame) -> int:
    """Order-independent set digest of quad identity columns (G4 key)."""
    row = quads.agg(F.expr(
        "bit_xor(xxhash64(coalesce(g,''), s, p, o_kind, o_value, "
        "coalesce(o_datatype,''), coalesce(o_lang,''), conv_id, turn_idx))"
    ).alias("h")).collect()[0]
    return row["h"] if row["h"] is not None else 0


def read_graph(spark: SparkSession, path: str) -> DataFrame:
    """Read a bucket(s)-partitioned graph table written by write_quads."""
    return spark.read.parquet(path)


def lookup_subjects(spark: SparkSession, path: str, subjects: list[str],
                    n_buckets: int = 32) -> DataFrame:
    """Point lookups on the graph table with PARTITION PRUNING: compute
    each subject's bucket driver-side and filter on the partition column,
    so only |distinct buckets| directories are scanned (the Iceberg
    bucket-transform pruning pattern; at 10^12 quads this is the
    difference between touching 1/32 of the table and all of it)."""
    from pyspark.sql import Row
    probe = spark.createDataFrame([Row(s=s) for s in subjects]) \
        .withColumn("s_bucket", F.pmod(F.xxhash64("s"), F.lit(n_buckets)))
    buckets = [r.s_bucket for r in probe.select("s_bucket").distinct().collect()]
    g = read_graph(spark, path)
    return (g.where(F.col("s_bucket").isin(buckets))
            .where(F.col("s").isin(subjects)))


def write_quads(quads: DataFrame, path: str, n_buckets: int = 32) -> None:
    """Final graph table: directory-partitioned by subject hash bucket —
    the stand-in for Iceberg ``bucket(n, s)`` partition transforms
    (SURVEY.md §3.4 shuffle 4). Predicate-bucket layout would be the same
    writer with p."""
    (quads
     .withColumn("s_bucket", F.pmod(F.xxhash64("s"), F.lit(n_buckets)))
     .repartition("s_bucket")
     .write.mode("overwrite").partitionBy("s_bucket").parquet(path))


class ResumableQuadWriter:
    """Slice-at-a-time expansion runner with lineage markers."""

    def __init__(self, spark: SparkSession, out_dir: str, n_slices: int = 8):
        self.spark = spark
        self.out_dir = out_dir
        self.n_slices = n_slices
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.data_dir = os.path.join(out_dir, "quads")
        os.makedirs(self.lineage_dir, exist_ok=True)

    def _marker(self, i: int) -> str:
        return os.path.join(self.lineage_dir, f"slice_{i}.json")

    def done_slices(self) -> set[int]:
        return {i for i in range(self.n_slices)
                if os.path.exists(self._marker(i))}

    def run(self, transcripts: DataFrame,
            expand_fn: Callable[[DataFrame], DataFrame],
            fail_after: int | None = None) -> dict:
        """Process all pending slices; returns summary metrics.

        ``fail_after`` injects a crash after N slices (resume tests,
        SURVEY.md §5.2.6)."""
        sliced = transcripts.withColumn(
            "_slice", F.pmod(F.xxhash64("conv_id"), F.lit(self.n_slices)))
        completed = 0
        for i in range(self.n_slices):
            if os.path.exists(self._marker(i)):
                continue
            part = sliced.where(F.col("_slice") == i).drop("_slice")
            rows_in = part.count()
            quads = expand_fn(part)
            n_errors = 0
            if "_kg_errors" in quads.columns:
                # expand_with_metrics path: error-sentinel rows carry parse
                # failure counts; record them in lineage, keep data clean
                err_row = quads.where(F.col("s") == "_:error") \
                    .agg(F.sum("_kg_errors").alias("n")).collect()[0]
                n_errors = int(err_row["n"] or 0)
                quads = quads.where(F.col("s") != "_:error") \
                    .drop("_kg_errors")
            slice_path = os.path.join(self.data_dir, f"slice={i}")
            quads.write.mode("overwrite").parquet(slice_path)
            written = self.spark.read.parquet(slice_path)
            metrics = {
                "slice": i,
                "rows_in": rows_in,
                "quads_out": written.count(),
                "n_parse_errors": n_errors,
                "checksum": quad_checksum(written),
            }
            # marker LAST → crash before this line re-runs the slice
            with open(self._marker(i), "w") as f:
                json.dump(metrics, f)
            completed += 1
            if fail_after is not None and completed >= fail_after:
                raise RuntimeError(f"injected failure after {completed} slices")
        return self.summary()

    def summary(self) -> dict:
        out = {"slices": [], "quads_out": 0, "rows_in": 0,
               "n_parse_errors": 0}
        for i in sorted(self.done_slices()):
            with open(self._marker(i)) as f:
                m = json.load(f)
            out["slices"].append(m)
            out["quads_out"] += m["quads_out"]
            out["rows_in"] += m["rows_in"]
            out["n_parse_errors"] += m.get("n_parse_errors", 0)
        return out

    def read_quads(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    def reset(self) -> None:
        shutil.rmtree(self.out_dir, ignore_errors=True)
        os.makedirs(self.lineage_dir, exist_ok=True)


def write_quads_bucketed_table(quads: DataFrame, table: str,
                               path: str, n_buckets: int = 32) -> None:
    """Materialize the graph as a NATIVE Spark bucketed table
    (``bucketBy(n, s).sortBy(s)``, external at ``path``): both sides of
    any subject-keyed self-join or entity join then read pre-bucketed
    and pre-sorted, so the join plans WITHOUT a shuffle — the Spark
    face of Iceberg's bucket-transform write distribution, and the
    co-located-join half of the directory-bucketed layout
    :func:`write_quads` keeps for pruning."""
    (quads.write.mode("overwrite")
     .bucketBy(n_buckets, "s").sortBy("s")
     .option("path", path)
     .format("parquet").saveAsTable(table))
