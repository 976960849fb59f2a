"""Temporal operators: scalable as-of join (point-in-time lookup).

No reference counterpart (SURVEY.md §2.F: the reference never joins) —
this is a pipeline extension in the custom-operator family the engine
needs at corpus scale: "most recent fact at or before this row's time,
per key" (feature lookups, session attribution, slowly-changing dims).

Implementation is the union + window forward-fill pattern, NOT a range
join: both sides are unioned on (key, ts) with the right side's payload
carried as a struct, then one window per key ordered by (ts, side)
forward-fills the latest right payload onto each left row. Cost: ONE
shuffle on the key columns (the same shuffle a plain equi-join would pay)
and a per-partition sort — no O(left × right) candidate explosion, skew
handled by the same AQE machinery as any other shuffle. DuckDB's native
ASOF JOIN is the contract oracle (__spark_entry__ events_asof_attribution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              payload_prefix: str = "asof_",
              tolerance_seconds: float | None = None) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``key_cols`` group (backward
    as-of semantics; ties at equal timestamps take the right row).

    Returns all left columns plus ``{payload_prefix}<col>`` for every
    non-key right column (null when no prior right row, or when
    ``tolerance_seconds`` is exceeded).
    """
    rpay = [c for c in right.columns if c not in key_cols]
    lcols = left.columns

    r = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*rpay).alias("__payload"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__left"),
    )
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            right.select(F.struct(*rpay).alias("s")).schema["s"].dataType
        ).alias("__payload"),
        F.struct(*lcols).alias("__left"),
    )

    # right rows sort BEFORE left rows at equal ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row.
    w = (W.partitionBy(*key_cols)
         .orderBy("__ts", "__side")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    filled = (l.unionByName(r)
              .withColumn("__p", F.last("__payload", ignorenulls=True).over(w))
              .withColumn("__pts", F.last(
                  F.when(F.col("__side") == 0, F.col("__ts")),
                  ignorenulls=True).over(w))
              .where(F.col("__side") == 1))

    if tolerance_seconds is not None:
        # parquet timestamps may load as TIMESTAMP_NTZ; cast first
        within = (F.unix_micros(F.col("__ts").cast("timestamp"))
                  - F.unix_micros(F.col("__pts").cast("timestamp"))
                  <= F.lit(int(tolerance_seconds * 1_000_000)))
        filled = filled.withColumn(
            "__p", F.when(within, F.col("__p")))

    out = filled.select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        *[F.col(f"__p.{c}").alias(f"{payload_prefix}{c}") for c in rpay],
    )
    return out
