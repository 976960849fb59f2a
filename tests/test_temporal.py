"""As-of join tests (operators/temporal.py): backward point-in-time
semantics, ties, tolerance, and the one-shuffle plan shape."""

import datetime as dt

import pytest
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


@pytest.mark.usefixtures("spark")
class TestFunnel:
    ROWS = [
        # user 1: full funnel in order
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 00:10:00", "view"),
        (1, "2024-01-01 00:20:00", "purchase"),
        # user 2: steps out of order (purchase before view)
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 00:05:00", "purchase"),
        (2, "2024-01-01 00:30:00", "view"),
        # user 3: signup+view only
        (3, "2024-01-01 01:00:00", "signup"),
        (3, "2024-01-01 01:30:00", "view"),
        # user 4: view without signup — never enters
        (4, "2024-01-01 02:00:00", "view"),
        # user 5: completes but outside a 15-min window
        (5, "2024-01-01 03:00:00", "signup"),
        (5, "2024-01-01 03:20:00", "view"),
        (5, "2024-01-01 03:25:00", "purchase"),
        # user 6: greedy anchor — early signup, later signup would fit
        # the window, leftmost-greedy still anchors at the first
        (6, "2024-01-01 04:00:00", "signup"),
        (6, "2024-01-01 05:00:00", "signup"),
        (6, "2024-01-01 05:05:00", "view"),
    ]

    def _events(self, spark):
        from pyspark.sql import functions as SF
        df = spark.createDataFrame(self.ROWS,
                                   ["user_id", "ts_s", "event_type"])
        return df.withColumn("ts", SF.to_timestamp("ts_s")).drop("ts_s")

    def test_unwindowed_funnel(self, spark):
        from rdflib_jsonld_spark.operators.temporal import funnel_counts
        got = {r.step_idx: (r.step, r.n_users)
               for r in funnel_counts(
                   self._events(spark),
                   ["signup", "view", "purchase"]).collect()}
        # signup: users 1,2,3,5,6 → 5; view after signup: 1,2,3,5,6 → 5;
        # purchase after that view: 1,5 → 2
        assert got == {0: ("signup", 5), 1: ("view", 5),
                       2: ("purchase", 2)}

    def test_windowed_funnel_measures_from_anchor(self, spark):
        from rdflib_jsonld_spark.operators.temporal import funnel_counts
        got = {r.step_idx: r.n_users
               for r in funnel_counts(
                   self._events(spark), ["signup", "view", "purchase"],
                   within_seconds=1800).collect()}
        # 30-min window from the anchor: views qualify for users
        # 1 (+10), 2 (+30, inclusive), 3 (+30), 5 (+20) but NOT 6
        # (+65 from the FIRST signup — leftmost-greedy anchor,
        # documented); purchases then qualify for 1 (+20) and 5 (+25)
        # but not 2 (purchase precedes its view)
        assert got == {0: 5, 1: 4, 2: 2}

    def test_single_step_and_empty(self, spark):
        from rdflib_jsonld_spark.operators.temporal import funnel_counts
        got = funnel_counts(self._events(spark), ["purchase"]).collect()
        assert [(r.step_idx, r.n_users) for r in got] == [(0, 3)]
        import pytest as _pt
        with _pt.raises(ValueError):
            funnel_counts(self._events(spark), [])


def test_cohort_retention_basic(spark):
    import datetime as dt
    from rdflib_jsonld_spark.operators.temporal import cohort_retention
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: first hour 0, returns hour 1 and 3
        (1, base), (1, base + dt.timedelta(hours=1)),
        (1, base + dt.timedelta(hours=3)),
        # user 2: first hour 0 only
        (2, base + dt.timedelta(minutes=30)),
        # user 3: first hour 1, returns hour 2
        (3, base + dt.timedelta(hours=1)),
        (3, base + dt.timedelta(hours=2, minutes=59)),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r["horizon"], r["n_users"] if True else 0, r["cohort_period"])
           for r in cohort_retention(events, horizons=3).collect()}
    periods = sorted({p for (_, _, p) in got})
    p0, p1 = periods[0], periods[0] + 1
    as_map = {(p - p0, h): n for (h, n, p) in got}
    assert as_map[(0, 0)] == 2   # cohort hour 0: users 1,2
    assert as_map[(0, 1)] == 1   # user 1 back at +1h
    assert as_map[(0, 3)] == 1   # user 1 back at +3h
    assert (0, 2) not in as_map  # nobody from cohort 0 at +2h
    assert as_map[(1, 0)] == 1   # cohort hour 1: user 3
    assert as_map[(1, 1)] == 1   # user 3 back at +1h


def test_asof_tied_right_rows_deterministic(spark):
    """Two right rows tied on (key, ts): the winner must not depend on
    partitioning (G2 determinism — the fill breaks ties by payload
    content hash, not arrival order)."""
    from rdflib_jsonld_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [("k", 100, "L")], "k string, ts long, tag string")
    rows = [("k", 50, "alpha"), ("k", 50, "beta")]
    winners = set()
    for parts, order in ((1, rows), (4, rows[::-1]), (7, rows)):
        right = spark.createDataFrame(order, "k string, ts long, v string") \
            .repartition(parts)
        out = asof_join(left, right, ["k"])
        winners.add(out.collect()[0].asof_v)
    assert len(winners) == 1
