"""As-of join tests (operators/temporal.py): backward point-in-time
semantics, ties, tolerance, and the one-shuffle plan shape."""

import datetime as dt

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.temporal import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "p1"), ("u1", _ts(20), "p2"),
         ("u1", _ts(5), "p0"), ("u2", _ts(10), "p3")],
        "user string, ts timestamp, pid string")
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0), ("u1", _ts(15), 2.0),
         ("u1", _ts(20), 3.0), ("u3", _ts(1), 9.0)],
        "user string, ts timestamp, score double")
    return left, right


def test_backward_asof_with_exact_tie(spark):
    left, right = _frames(spark)
    out = {r["pid"]: (r["asof_score"], r["asof_ts"])
           for r in asof_join(left, right, ["user"]).collect()}
    assert out["p0"] == (None, None)          # nothing at or before t=5
    assert out["p1"][0] == 1.0                # t=8 is latest <= 10
    assert out["p2"][0] == 3.0                # exact tie at t=20 matches
    assert out["p3"] == (None, None)          # no u2 rows on the right


def test_tolerance_nulls_out_stale_matches(spark):
    left, right = _frames(spark)
    out = {r["pid"]: r["asof_score"]
           for r in asof_join(left, right, ["user"],
                              tolerance_seconds=1.5).collect()}
    assert out["p1"] is None   # gap 2s > 1.5s
    assert out["p2"] == 3.0    # gap 0s


def test_left_rows_and_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["user"])
    assert out.count() == left.count()
    assert set(out.columns) == {"user", "ts", "pid", "asof_ts", "asof_score"}


def test_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, ["user"])._jdf.queryExecution() \
        .executedPlan().toString()
    # union + one window: exactly one Exchange per input branch on the
    # key, no join node at all
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2
