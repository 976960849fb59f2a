"""Relational operator-surface contract queries: TPC-H-ish aggregates/
joins, window frames, sessionization, funnels, set ops, JSON stats,
as-of attribution. Split out of __spark_entry__.py (VERDICT r03 #4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


from rdflib_jsonld_spark.contract.common import _t


def q_tpch_q1_pricing_summary(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3_shipping_priority(spark, sf_dir) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q18_large_orders(spark, sf_dir) -> DataFrame:
    """Q18 shape (large-volume customers): group-HAVING over the fact
    table feeding a semi-join back into a 3-way join — the canonical
    hot-key aggregation + AQE-skew-join exercise."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 150)
           .select("l_orderkey"))
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("o_orderdate"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
                F.round("total_qty", 2).alias("total_qty"))
    )


def q_tpch_q14_promo_revenue(spark, sf_dir) -> DataFrame:
    """Q14 shape (promotion effect): fact-to-dim broadcast join with a
    conditional aggregate — covers the `part` dimension table."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-06-01").cast("timestamp")))
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                          .otherwise(F.lit(0.0)))
            / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def q_tpch_q5_local_supplier(spark, sf_dir) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q6_forecast_revenue(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows")))


def q_orders_rank_window(spark, sf_dir) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn"))


def q_events_sessionize(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is exact
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (ev.withColumn("new_session", new_s)
            .groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy("user_id"))


def q_lineitem_cube(spark, sf_dir) -> DataFrame:
    """Grouping-sets breadth (SURVEY §2.E5): CUBE over
    (returnflag, linestatus) with sum/count metrics — Catalyst expands
    to one Expand + hash aggregate; the oracle is DuckDB's native
    GROUP BY CUBE. NULL group keys are the roll-up rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy(F.asc_nulls_first("l_returnflag"),
                     F.asc_nulls_first("l_linestatus")))


def q_events_funnel(spark, sf_dir) -> DataFrame:
    """Ordered-funnel analysis (operators/temporal.funnel_counts):
    signup → view → purchase with a 2-hour window from the anchor,
    leftmost-greedy binding (documented semantics). The oracle replays
    the identical greedy recurrence as chained min-aggregates in SQL."""
    from rdflib_jsonld_spark.operators.temporal import funnel_counts
    ev = _t(spark, sf_dir, "events") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    return funnel_counts(ev, ["signup", "view", "purchase"],
                         within_seconds=7200).orderBy("step_idx")


def q_events_rolling_value_sum(spark, sf_dir) -> DataFrame:
    """Window FRAME coverage (G1 beyond row_number/lag): per-user rolling
    sum over ROWS 2 PRECEDING..CURRENT — the deterministic frame makes
    the float sum engine-portable (same ≤3 addends in the same order)."""
    ev = _t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return (ev.select("event_id", "user_id",
                      F.round(F.sum("value").over(w), 4).alias("rolling3"))
            .orderBy("event_id"))


def q_events_hourly_windows(spark, sf_dir) -> DataFrame:
    """Tumbling-window aggregation (the batch face of the streaming
    windowed agg, G1/I): F.window is epoch-aligned, so hourly buckets
    equal date_trunc('hour') — which is the DuckDB oracle."""
    ev = _t(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour")
    return (ev.groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz")
                    .alias("window_start"), "event_type", "n", "sum_value")
            .orderBy("window_start", "event_type"))


def q_events_sliding_windows(spark, sf_dir) -> DataFrame:
    """SLIDING-window aggregation (1-hour window every 30 minutes —
    the overlapping-window face of G1/I that tumbling windows don't
    exercise): every event lands in exactly window÷slide = 2 windows.
    F.window is epoch-aligned, so the oracle materializes both
    candidate starts per event (trunc-to-30min and 30min earlier) and
    aggregates the union."""
    ev = _t(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes")
    return (ev.groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz")
                    .alias("window_start"), "n", "sum_value")
            .orderBy("window_start"))


def q_events_session_windows(spark, sf_dir) -> DataFrame:
    """NATIVE session windows (F.session_window, 30-minute gap) — the
    engine-managed counterpart of the lag/cumsum sessionization in
    events_sessionize, usable identically under Structured Streaming.
    The oracle derives the same sessions relationally: a new session
    starts where the gap from the previous event exceeds the timeout,
    session id = running sum of starts, then per-session start/end/
    count."""
    ev = _t(spark, sf_dir, "events") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").cast("timestamp_ntz")
                    .alias("session_start"),
                    "n_events")
            .orderBy("user_id", "session_start"))


def q_events_json_stats(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.round(F.avg("value"), 4).alias("avg_value"))
            .orderBy("event_type"))


def q_events_asof_attribution(spark, sf_dir) -> DataFrame:
    """As-of join (union + window forward-fill, one shuffle): each
    purchase event attributed to the user's most recent click at or
    before it. DuckDB's native ASOF JOIN is the oracle."""
    from rdflib_jsonld_spark.operators.temporal import asof_join
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", F.col("event_id").alias("click_id"), "ts")
    joined = asof_join(purchases, clicks, ["user_id"],
                       left_ts="ts", right_ts="ts")
    return (joined.select(
        "event_id", "user_id",
        F.round("value", 2).alias("value"),
        F.col("asof_click_id").alias("click_id"),
        F.round(
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("asof_ts").cast("timestamp")))
            / 1e6, 3).alias("gap_seconds"))
        .orderBy("event_id"))


def q_lineitem_percentiles(spark, sf_dir) -> DataFrame:
    """Exact distribution stats per return flag (percentile is exact and
    engine-portable, unlike approx_percentile — the contract-checkable
    member of the H3 numeric family)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (li.groupBy("l_returnflag")
            .agg(F.round(pct[0], 4).alias("p50"),
                 F.round(pct[1], 4).alias("p90"),
                 F.round(pct[2], 4).alias("p99"),
                 F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"))
            .orderBy("l_returnflag"))


def q_customers_with_orders_semijoin(spark, sf_dir) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("c_nationkey"))


def q_returnflag_set_ops(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    early = li.where(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")) \
        .select("l_returnflag", "l_linestatus").distinct()
    late = li.where(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) \
        .select("l_returnflag", "l_linestatus").distinct()
    return (early.intersect(late)
            .unionByName(early.exceptAll(late))
            .orderBy("l_returnflag", "l_linestatus"))


# --------------------------------------------------------------------------
# driver-contract registry for this domain (merged by __spark_entry__)
# --------------------------------------------------------------------------

QUERIES = {
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
    "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
    "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
    "tpch_q18_large_orders": q_tpch_q18_large_orders,
    "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
    "lineitem_cube": q_lineitem_cube,
    "lineitem_percentiles": q_lineitem_percentiles,
    "orders_rank_window": q_orders_rank_window,
    "events_sessionize": q_events_sessionize,
    "events_funnel": q_events_funnel,
    "events_sliding_windows": q_events_sliding_windows,
    "events_session_windows": q_events_session_windows,
    "events_rolling_value_sum": q_events_rolling_value_sum,
    "events_asof_attribution": q_events_asof_attribution,
    "events_hourly_windows": q_events_hourly_windows,
    "events_json_stats": q_events_json_stats,
    "customers_with_orders_semijoin": q_customers_with_orders_semijoin,
    "returnflag_set_ops": q_returnflag_set_ops,
}

ORACLES: dict = {
    "tpch_q1_pricing_summary": """
                SELECT l_returnflag, l_linestatus,
                       round(sum(l_quantity), 2) AS sum_qty,
                       round(sum(l_extendedprice), 2) AS sum_base_price,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS sum_disc_price,
                       round(avg(l_quantity), 4) AS avg_qty,
                       round(avg(l_discount), 4) AS avg_disc,
                       count(*) AS count_order
                FROM lineitem
                WHERE l_shipdate <= timestamp '1998-09-02'
                GROUP BY l_returnflag, l_linestatus
                ORDER BY l_returnflag, l_linestatus
            """,
    "lineitem_percentiles": """
                SELECT l_returnflag,
                       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
                       round(stddev_samp(l_extendedprice), 4) AS sd
                FROM lineitem
                GROUP BY l_returnflag
                ORDER BY l_returnflag
            """,
    "events_asof_attribution": """
                WITH p AS (SELECT event_id, user_id, ts, value FROM events
                           WHERE event_type = 'purchase'),
                     c AS (SELECT user_id, event_id AS click_id, ts FROM events
                           WHERE event_type = 'click')
                SELECT p.event_id, p.user_id,
                       round(p.value, 2) AS value,
                       c.click_id,
                       round(epoch(p.ts) - epoch(c.ts), 3) AS gap_seconds
                FROM p ASOF LEFT JOIN c
                  ON p.user_id = c.user_id AND p.ts >= c.ts
                ORDER BY p.event_id
            """,
    "tpch_q14_promo_revenue": """
                SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                         THEN l_extendedprice * (1 - l_discount)
                                         ELSE 0.0 END)
                             / sum(l_extendedprice * (1 - l_discount)), 4)
                           AS promo_revenue_pct,
                       count(*)::BIGINT AS n_rows
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1998-03-01'
                  AND l_shipdate <  TIMESTAMP '1998-06-01'
            """,
    "tpch_q18_large_orders": """
                WITH big AS (
                  SELECT l_orderkey
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 150)
                SELECT c_name, c_custkey, o_orderkey,
                       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                       round(o_totalprice, 2) AS o_totalprice,
                       round(sum(l_quantity)::DOUBLE, 2) AS total_qty
                FROM lineitem
                JOIN big USING (l_orderkey)
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
                ORDER BY o_totalprice DESC, o_orderkey
                LIMIT 20
            """,
    "tpch_q3_shipping_priority": """
                SELECT l_orderkey, o_orderdate,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
                FROM customer
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                WHERE c_mktsegment = 'BUILDING'
                  AND o_orderdate < timestamp '1998-01-01'
                  AND l_shipdate  > timestamp '1998-01-01'
                GROUP BY l_orderkey, o_orderdate
                ORDER BY revenue DESC, l_orderkey
                LIMIT 10
            """,
    "tpch_q5_local_supplier": """
                SELECT n_name,
                       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN supplier ON l_suppkey = s_suppkey
                             AND c_nationkey = s_nationkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'
                GROUP BY n_name
                ORDER BY revenue DESC, n_name
            """,
    "tpch_q6_forecast_revenue": """
                SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                       count(*) AS n_rows
                FROM lineitem
                WHERE l_shipdate >= timestamp '1996-01-01'
                  AND l_shipdate <  timestamp '1997-01-01'
                  AND l_discount BETWEEN 0.03 AND 0.07
                  AND l_quantity < 24
            """,
    "lineitem_cube": """
                SELECT l_returnflag, l_linestatus,
                       round(sum(l_quantity), 2) AS sum_qty,
                       count(*) AS n
                FROM lineitem
                GROUP BY CUBE (l_returnflag, l_linestatus)
                ORDER BY l_returnflag, l_linestatus
            """,
    "orders_rank_window": """
                SELECT o_custkey, o_orderkey, rn FROM (
                  SELECT o_custkey, o_orderkey,
                         row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey) AS rn
                  FROM orders)
                WHERE rn <= 3
            """,
    "lineitem_cube": """
                SELECT l_returnflag, l_linestatus,
                       sum(l_quantity)::BIGINT AS sum_qty,
                       count(*)::BIGINT AS n_rows
                FROM lineitem
                GROUP BY CUBE (l_returnflag, l_linestatus)
                ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
            """,
    "events_session_windows": """
                WITH seq AS (
                  SELECT user_id, ts,
                         CASE WHEN lag(ts) OVER w IS NULL
                                   OR epoch(ts) - epoch(lag(ts) OVER w)
                                      > 1800
                              THEN 1 ELSE 0 END AS new_s
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
                tagged AS (
                  SELECT user_id, ts,
                         sum(new_s) OVER (PARTITION BY user_id
                                          ORDER BY ts ROWS UNBOUNDED
                                          PRECEDING) AS sid
                  FROM seq)
                SELECT user_id,
                       min(ts)::TIMESTAMP AS session_start,
                       count(*)::BIGINT AS n_events
                FROM tagged
                GROUP BY user_id, sid
                ORDER BY user_id, session_start
            """,
    "events_sliding_windows": """
                WITH starts AS (
                  SELECT to_timestamp(floor(epoch(ts))::BIGINT
                           - (floor(epoch(ts))::BIGINT % 1800))::TIMESTAMP
                           AS w,
                         value
                  FROM events
                  UNION ALL
                  SELECT to_timestamp(floor(epoch(ts))::BIGINT
                           - (floor(epoch(ts))::BIGINT % 1800)
                           - 1800)::TIMESTAMP,
                         value
                  FROM events)
                SELECT w AS window_start,
                       count(*)::BIGINT AS n,
                       round(sum(value), 2) AS sum_value
                FROM starts
                GROUP BY w
                ORDER BY window_start
            """,
    "events_funnel": """
                WITH s0 AS (
                  SELECT user_id, min(ts) AS t0
                  FROM events WHERE event_type = 'signup'
                  GROUP BY user_id),
                s1 AS (
                  SELECT s0.user_id, s0.t0, min(e.ts) AS t
                  FROM s0 JOIN events e
                    ON e.user_id = s0.user_id AND e.event_type = 'view'
                       AND e.ts > s0.t0
                       AND epoch(e.ts) <= epoch(s0.t0) + 7200
                  GROUP BY s0.user_id, s0.t0),
                s2 AS (
                  SELECT s1.user_id, s1.t0, min(e.ts) AS t
                  FROM s1 JOIN events e
                    ON e.user_id = s1.user_id AND e.event_type = 'purchase'
                       AND e.ts > s1.t
                       AND epoch(e.ts) <= epoch(s1.t0) + 7200
                  GROUP BY s1.user_id, s1.t0)
                SELECT step_idx, step, n_users FROM (
                  SELECT 0 AS step_idx, 'signup' AS step,
                         count(*)::BIGINT AS n_users FROM s0
                  UNION ALL SELECT 1, 'view', count(*)::BIGINT FROM s1
                  UNION ALL SELECT 2, 'purchase', count(*)::BIGINT FROM s2)
                ORDER BY step_idx
            """,
    "events_sessionize": """
                SELECT user_id,
                       sum(new_session)::BIGINT AS n_sessions,
                       count(*) AS n_events
                FROM (
                  SELECT user_id,
                         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                > 1800000000
                              OR lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) IS NULL
                              THEN 1 ELSE 0 END AS new_session
                  FROM events)
                GROUP BY user_id
                ORDER BY user_id
            """,
    "events_rolling_value_sum": """
                SELECT event_id, user_id,
                       round(sum(value) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                           AS rolling3
                FROM events
                ORDER BY event_id
            """,
    "events_hourly_windows": """
                SELECT date_trunc('hour', ts) AS window_start,
                       event_type,
                       count(*) AS n,
                       round(sum(value), 2) AS sum_value
                FROM events
                GROUP BY 1, 2
                ORDER BY window_start, event_type
            """,
    "events_json_stats": """
                SELECT event_type,
                       count(*) AS n,
                       sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT)::BIGINT
                           AS sum_k,
                       round(avg(value), 4) AS avg_value
                FROM events
                GROUP BY event_type
                ORDER BY event_type
            """,
    "customers_with_orders_semijoin": """
                SELECT c_nationkey, count(*) AS n_customers
                FROM customer c
                WHERE EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
                GROUP BY c_nationkey
                ORDER BY c_nationkey
            """,
    "returnflag_set_ops": """
                WITH early AS (
                  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
                  WHERE l_shipdate < timestamp '1996-01-01'),
                late AS (
                  SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
                  WHERE l_shipdate >= timestamp '1996-01-01')
                SELECT * FROM (
                  SELECT * FROM early INTERSECT SELECT * FROM late
                  UNION ALL
                  (SELECT * FROM early EXCEPT SELECT * FROM late))
                ORDER BY l_returnflag, l_linestatus
            """,
}
