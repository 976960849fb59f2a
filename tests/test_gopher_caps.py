"""Gopher quality rules + per-source caps (curation operators)."""

from pyspark.sql import Row, functions as F

from rdflib_jsonld_spark.operators.curation import (
    cap_per_source, gopher_quality_flags)


def _flags(spark, rows):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(rows)])
    out = gopher_quality_flags(docs, min_words=5)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


GOOD = ("the quick brown fox jumps over and over that lazy dog have "
        "with some more plain words here to fill the line out")


def test_good_document_keeps(spark):
    f = _flags(spark, [GOOD])[0]
    assert f["keep"], f


def test_word_count_bounds(spark):
    f = _flags(spark, ["the and short"])[0]
    assert not f["ok_words"] and not f["keep"]


def test_mean_word_length(spark):
    long_words = "the and " + " ".join(["extraordinarily"] * 30)
    f = _flags(spark, [long_words])[0]
    assert not f["ok_mean_len"]


def test_symbol_ratio(spark):
    f = _flags(spark, [GOOD + " " + " ".join(["##"] * 40)])[0]
    assert not f["ok_symbol"]
    # ellipsis runs count too
    f2 = _flags(spark, [GOOD + " " + "... " * 40])[0]
    assert not f2["ok_symbol"]


def test_bullet_and_ellipsis_lines(spark):
    bullets = GOOD + "".join(
        "\n- bullet item %d" % i for i in range(30))
    f = _flags(spark, [bullets])[0]
    assert not f["ok_bullet"]
    ell = GOOD + "\ntrailing thought...\nanother one..."
    f2 = _flags(spark, [ell])[0]
    assert not f2["ok_ellipsis"]


def test_alpha_fraction(spark):
    nums = GOOD + " " + " ".join(str(i) for i in range(100))
    f = _flags(spark, [nums])[0]
    assert not f["ok_alpha"]


def test_stop_words(spark):
    nostop = " ".join(["alpha beta gamma delta epsilon zeta"] * 5)
    f = _flags(spark, [nostop])[0]
    assert not f["ok_stop"]
    onestop = nostop + " the"
    assert not _flags(spark, [onestop])[0]["ok_stop"]
    twostop = nostop + " the and"
    assert _flags(spark, [twostop])[0]["ok_stop"]


def test_cap_per_source_deterministic(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="s%d" % (i % 3), text="t") for i in range(30)])
    kept = cap_per_source(docs, cap=4)
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in
               cap_per_source(docs.repartition(7), cap=4).collect())
    assert a == b and len(a) == 12
    per = kept.groupBy("source").count().collect()
    assert all(r["count"] == 4 for r in per)


def test_cap_larger_than_group_keeps_all(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="only", text="t") for i in range(5)])
    assert cap_per_source(docs, cap=100).count() == 5
