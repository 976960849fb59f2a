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
    # exactly-simultaneous right row is visible to the left row. Two
    # RIGHT rows tied on (key, ts) would otherwise leave the fill
    # partitioning-dependent — a content hash of the payload breaks the
    # tie deterministically (G2 determinism invariant; to_json handles
    # non-orderable payload types like maps).
    w = (W.partitionBy(*key_cols)
         .orderBy("__ts", "__side",
                  F.xxhash64(F.to_json(F.struct("__payload"))))
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


def funnel_counts(events: DataFrame, steps: list[str],
                  within_seconds: float | None = None,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: how many users reach each step of
    ``steps`` in sequence → ``(step_idx, step, n_users)``.

    Semantics (deterministic, leftmost-greedy — the convention of the
    standard funnel tools, documented narrowing vs. exhaustive
    subsequence search): the anchor is the user's EARLIEST step-1
    event; each later step binds to the earliest matching event
    strictly after the previous step's time; with ``within_seconds``
    every step must also fall within that window of the anchor.

    Plan shape: one filtered min-aggregate per step plus one equi-join
    per step transition, all keyed on the user column — k-1 shuffles
    for a k-step funnel, each AQE-skew-tolerant; no windows, no
    per-user sort, no Python. At 10^12 events the per-step candidate
    sets shrink monotonically (each join is a semi-filter on the
    previous survivors).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, t = F.col(user_col), F.col(ts_col)
    cur = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("_t0"))
           .withColumn("_t", F.col("_t0"))
           .persist())  # consumed by the next step AND its count row
    counts = [("0", steps[0], cur)]
    for i, step in enumerate(steps[1:], start=1):
        nxt_events = (events.where(F.col(type_col) == step)
                      .select(u.alias("_u"), t.alias("_ts")))
        joined = cur.join(nxt_events, cur[user_col] == F.col("_u"))
        cond = F.col("_ts") > F.col("_t")
        if within_seconds is not None:
            cond = cond & (F.col("_ts").cast("double")
                           <= F.col("_t0").cast("double")
                           + float(within_seconds))
        cur = (joined.where(cond)
               .groupBy(user_col)
               .agg(F.min("_t0").alias("_t0"),
                    F.min("_ts").alias("_t"))
               .persist())
        counts.append((str(i), step, cur))
    spark = events.sparkSession
    out = None
    for idx, step, df in counts:
        row = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")) \
            .select(F.lit(int(idx)).alias("step_idx"),
                    F.lit(step).alias("step"), "n_users")
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(events: DataFrame, horizons: int = 3,
                     unit_seconds: int = 3600,
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort-retention analysis (the classic product-analytics rollup):
    users cohort by their FIRST active period (``unit_seconds`` buckets
    of the epoch); retention at horizon h = distinct cohort users also
    active in period ``cohort + h``, for h = 0..``horizons``.

    Returns ``(cohort_period, horizon, n_users)`` in long format (h=0
    row = the cohort size).

    Plan: activity collapses to distinct (user, period) FIRST — all
    later joins move 16-byte pairs, never events; cohorts are one
    min-agg on the user key; retention is one self-join on user + one
    count agg. Every shuffle keys on user_id/period — high-cardinality,
    AQE-friendly. ``ts`` is cast to session-TZ timestamp before epoch
    math (parquet TIMESTAMP_NTZ, the r02 gotcha).
    """
    per = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                  / F.lit(int(unit_seconds) * 1_000_000)).alias("p")
    act = events.select(F.col(user_col).alias("u"), per).distinct()
    coh = act.groupBy("u").agg(F.min("p").alias("cohort_period"))
    return (act.join(coh, "u")
            .withColumn("horizon", F.col("p") - F.col("cohort_period"))
            .where(F.col("horizon") <= horizons)
            .groupBy("cohort_period", "horizon")
            .agg(F.count("*").cast("long").alias("n_users"))
            .orderBy("cohort_period", "horizon"))


def rate_anomalies(events: DataFrame, z_threshold: float = 2.0,
                   unit_seconds: int = 3600,
                   type_col: str = "event_type",
                   ts_col: str = "ts") -> DataFrame:
    """Per-type event-rate anomaly detection (the ops-monitoring rollup):
    bucket events into ``unit_seconds`` periods, compute each type's
    period-count mean/stddev, and flag periods whose z-score exceeds
    ``z_threshold`` in absolute value.

    Returns ``(event_type, period, n_events, zscore, is_anomaly)`` for
    every (type, period) with activity — two hash aggs + one broadcast-
    size join on the type key; z-scores rounded to 6 decimals (the
    float-oracle convention). Periods with no events are NOT zero-filled
    (sparse semantics; callers needing dense series can range-join a
    period spine)."""
    per = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp"))
                  / F.lit(int(unit_seconds) * 1_000_000)).alias("period")
    counts = (events.select(F.col(type_col).alias("event_type"), per)
              .groupBy("event_type", "period")
              .agg(F.count("*").cast("long").alias("n_events")))
    stats = counts.groupBy("event_type").agg(
        F.avg("n_events").alias("_mu"),
        F.stddev_samp("n_events").alias("_sd"))
    z = F.when(F.col("_sd") > 0,
               (F.col("n_events") - F.col("_mu")) / F.col("_sd")) \
        .otherwise(F.lit(0.0))
    return (counts.join(stats, "event_type")
            .withColumn("zscore", F.round(z, 6))
            .withColumn("is_anomaly",
                        F.abs(F.col("zscore")) > z_threshold)
            .select("event_type", "period", "n_events", "zscore",
                    "is_anomaly"))
