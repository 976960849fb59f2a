"""Shared-passage extraction (dedup.shared_passages)."""

from pyspark.sql import Row

from rdflib_jsonld_spark.operators.dedup import shared_passages


def _spans(spark, texts, k=10, **kw):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    return sorted(
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in shared_passages(docs, k=k, **kw).collect())


def test_single_shared_passage(spark):
    # normalized texts share exactly "the quick brown fox" (19 chars)
    a = "AAAA the quick brown fox BBBB"
    b = "CCCCCC the quick brown fox DDDD"
    got = _spans(spark, [a, b], k=10)
    # normalized: lowercase; span = " the quick brown fox " incl the
    # flanking spaces that also match
    assert len(got) == 1
    (ia, ib, sa, sb, ln) = got[0]
    assert (ia, ib) == (0, 1)
    na = " ".join(a.lower().split())
    nb = " ".join(b.lower().split())
    assert na[sa:sa + ln] == nb[sb:sb + ln]
    assert "the quick brown fox" in na[sa:sa + ln]


def test_no_match_below_k(spark):
    got = _spans(spark, ["abcdefghij12", "xyz abcde 99"], k=10)
    assert got == []


def test_two_disjoint_passages_two_islands(spark):
    a = "111 first shared block 222 second shared run 333"
    b = "aaaaaa first shared block zz second shared run qqq"
    got = _spans(spark, [a, b], k=10)
    assert len(got) == 2
    na = " ".join(a.lower().split())
    nb = " ".join(b.lower().split())
    for (_, _, sa, sb, ln) in got:
        assert na[sa:sa + ln] == nb[sb:sb + ln]


def test_min_span_filters(spark):
    a = "111 first shared block 222 a much longer second shared run 333"
    b = "zz first shared block qq then a much longer second shared run x"
    all_spans = _spans(spark, [a, b], k=10)
    long_only = _spans(spark, [a, b], k=10, min_span=25)
    assert len(long_only) < len(all_spans)
    assert all(ln >= 25 for (_, _, _, _, ln) in long_only)


def test_repeated_gram_in_one_doc_makes_two_deltas(spark):
    a = "the shared bit 111 the shared bit"
    b = "zz the shared bit zz"
    got = _spans(spark, [a, b], k=10)
    # both occurrences in doc a match doc b's single occurrence
    assert len(got) == 2
    assert all(ia == 0 and ib == 1 for (ia, ib, _, _, _) in got)


def test_df_cap_drops_viral_gram(spark):
    texts = ["common gram here %03d" % i for i in range(8)]
    # every doc shares "common gram here " → 8 docs, pairs capped away
    got_capped = _spans(spark, texts, k=10, df_cap=3)
    got_full = _spans(spark, texts, k=10, df_cap=1000)
    assert got_capped == [] and len(got_full) > 0


def test_partitioning_independent(spark):
    texts = ["pad%d the shared sentence block end" % i for i in range(6)]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    a = sorted(map(tuple, shared_passages(docs, k=10).collect()))
    b = sorted(map(tuple,
                   shared_passages(docs.repartition(5), k=10).collect()))
    assert a == b


class TestDropSharedPassages:
    def _run(self, spark, texts, **kw):
        from rdflib_jsonld_spark.operators.dedup import drop_shared_passages
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        return {r["doc_id"]: r.asDict()
                for r in drop_shared_passages(docs, **kw).collect()}

    def test_later_occurrence_excised(self, spark):
        # flanks share no k-gram, so the span is exactly the passage
        shared = "this exact duplicated passage block is long enough"
        a = "aaa " + shared + " 1111111111"
        b = "bbbbbb " + shared + " 2222222222"
        got = self._run(spark, [a, b], k=10, min_span=20)
        assert got[0]["text_deduped"] == a  # first occurrence intact
        assert shared not in got[1]["text_deduped"]
        assert got[1]["n_cut_spans"] == 1
        assert got[1]["text_deduped"].startswith("bbbbbb")
        assert got[1]["text_deduped"].endswith("2222222222")
        # the cut is the maximal shared run incl. the flanking spaces
        assert got[1]["n_cut_chars"] == len(shared) + 2

    def test_no_duplicates_identity(self, spark):
        texts = ["completely unique first document text",
                 "another document with different words"]
        got = self._run(spark, texts, k=10, min_span=20)
        for i, t in enumerate(texts):
            assert got[i]["text_deduped"] == t
            assert got[i]["n_cut_spans"] == 0
            assert got[i]["n_cut_chars"] == 0

    def test_overlapping_spans_merge(self, spark):
        # doc2 shares one long run with doc0 and an overlapping run with
        # doc1 → its cut intervals overlap and must merge into one
        core = "alpha beta gamma delta epsilon zeta eta theta"
        a = "xx " + core[:30] + " 11111111"
        b = "yy " + core[10:] + " 22222222"
        c = "zz " + core + " 33333333"
        got = self._run(spark, [a, b, c], k=10, min_span=15)
        assert core not in got[2]["text_deduped"]
        assert got[2]["text_deduped"].startswith("zz")
        assert got[2]["text_deduped"].endswith("33333333")

    def test_short_spans_survive(self, spark):
        a = "shared bit here plus aaaaaaaaaaaaaaaaaaaaa"
        b = "shared bit here plus bbbbbbbbbbbbbbbbbbbbb"
        got = self._run(spark, [a, b], k=10, min_span=40)
        # the shared prefix is 21 chars < 40 → untouched
        assert got[1]["text_deduped"] == b
