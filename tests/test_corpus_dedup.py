"""Corpus-level duplicate-span removal (dedup.corpus_chunk_dedup)."""

from pyspark.sql import Row

from rdflib_jsonld_spark.operators.dedup import corpus_chunk_dedup


def _run(spark, texts, chunk_chars=10):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    out = corpus_chunk_dedup(docs, chunk_chars=chunk_chars)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_no_duplicates_is_identity(spark):
    texts = ["abcdefghijKLMNOPQRST", "0123456789!@#$%^&*()"]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i]["text_deduped"] == t
        assert got[i]["n_dropped"] == 0
        assert got[i]["n_chunks"] == 2


def test_cross_doc_duplicate_dropped_keeps_first(spark):
    shared = "SHAREDBLK!"  # exactly one 10-char chunk
    texts = [shared + "tail-aaaaa", shared + "tail-bbbbb"]
    got = _run(spark, texts)
    assert got[0]["text_deduped"] == texts[0]  # first occurrence survives
    assert got[1]["text_deduped"] == "tail-bbbbb"
    assert got[1]["n_dropped"] == 1


def test_within_doc_repeat_dropped(spark):
    got = _run(spark, ["AAAAAAAAAA" * 3])
    assert got[0]["text_deduped"] == "AAAAAAAAAA"
    assert got[0]["n_chunks"] == 3 and got[0]["n_dropped"] == 2


def test_fully_duplicated_doc_empties(spark):
    got = _run(spark, ["AAAAAAAAAA", "AAAAAAAAAA"])
    empties = sorted(v["text_deduped"] for v in got.values())
    assert empties == ["", "AAAAAAAAAA"]
    assert got[1]["n_dropped"] == 1 and got[1]["n_chunks"] == 1


def test_partitioning_independent(spark):
    texts = [("block%02d" % (i % 4)).ljust(10, "x") * 3 for i in range(12)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    a = {r["doc_id"]: r["text_deduped"]
         for r in corpus_chunk_dedup(docs, chunk_chars=10).collect()}
    b = {r["doc_id"]: r["text_deduped"]
         for r in corpus_chunk_dedup(docs.repartition(7),
                                     chunk_chars=10).collect()}
    assert a == b


class TestIncrementalExactDedup:
    def test_batch_and_index_dedup(self, spark):
        from rdflib_jsonld_spark.operators.dedup import (
            incremental_exact_dedup)
        from rdflib_jsonld_spark.operators.textstats import (
            with_fingerprint)
        old = spark.createDataFrame(
            [Row(doc_id=100, text="seen before"),
             Row(doc_id=101, text="also seen")])
        seen = with_fingerprint(old)
        new = spark.createDataFrame(
            [Row(doc_id=0, text="brand new"),
             Row(doc_id=1, text="Seen   BEFORE"),   # normalizes to seen
             Row(doc_id=2, text="brand new"),       # within-batch dup
             Row(doc_id=3, text="another fresh one")])
        got = sorted(r["doc_id"] for r in
                     incremental_exact_dedup(new, seen).collect())
        assert got == [0, 3]

    def test_no_index_keeps_batch_firsts(self, spark):
        from rdflib_jsonld_spark.operators.dedup import (
            incremental_exact_dedup)
        new = spark.createDataFrame(
            [Row(doc_id=i, text="t%d" % (i % 2)) for i in range(6)])
        got = sorted(r["doc_id"] for r in
                     incremental_exact_dedup(new).collect())
        assert got == [0, 1]

    def test_chaining_rounds(self, spark):
        from rdflib_jsonld_spark.operators.dedup import (
            incremental_exact_dedup)
        b1 = spark.createDataFrame([Row(doc_id=0, text="alpha"),
                                    Row(doc_id=1, text="beta")])
        s1 = incremental_exact_dedup(b1)
        b2 = spark.createDataFrame([Row(doc_id=2, text="beta"),
                                    Row(doc_id=3, text="gamma")])
        s2 = incremental_exact_dedup(b2, s1.select("fingerprint"))
        assert sorted(r["doc_id"] for r in s2.collect()) == [3]


class TestIncrementalNearDup:
    def test_near_dups_of_history_dropped(self, spark):
        from rdflib_jsonld_spark.operators.dedup import incremental_near_dup
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        seen = spark.createDataFrame(
            [Row(doc_id=100 + i, text=base + " v%d" % i) for i in range(3)]
            + [Row(doc_id=200, text="completely unrelated historical doc "
                                    "about spark query planning at scale")])
        new = spark.createDataFrame(
            [Row(doc_id=0, text=base + " v0 tail"),      # near-dup of 100
             Row(doc_id=1, text="a genuinely fresh new document about "
                                "winnowing fingerprints and islands")])
        got = sorted(r["doc_id"] for r in
                     incremental_near_dup(new, seen,
                                          jaccard_threshold=0.6).collect())
        assert got == [1]

    def test_all_fresh_batch_survives(self, spark):
        from rdflib_jsonld_spark.operators.dedup import incremental_near_dup
        seen = spark.createDataFrame(
            [Row(doc_id=100, text="history doc alpha beta gamma delta")])
        new = spark.createDataFrame(
            [Row(doc_id=0, text="new doc epsilon zeta eta theta iota"),
             Row(doc_id=1, text="another new doc kappa lambda mu nu xi")])
        got = sorted(r["doc_id"] for r in
                     incremental_near_dup(new, seen).collect())
        assert got == [0, 1]
