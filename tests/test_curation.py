"""Dataset-curation operators (operators/curation.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.curation import (
    assign_splits, benchmark_ngram_set, flag_contaminated, pii_counts,
    repetition_scores, scrub_pii)


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_flag_contaminated_exact_and_partial(spark):
    bench = docs_df(spark, ["the quick brown fox jumps over the lazy dog"])
    corpus = docs_df(spark, [
        "the quick brown fox jumps over the lazy dog",   # verbatim
        "note the quick brown fox jumps right here",     # one shared 5-gram
        "completely different text about nothing else",  # clean
        "tiny",                                          # < n words
    ])
    out = {r.doc_id: (r.n_hits, r.contaminated)
           for r in flag_contaminated(
               corpus, benchmark_ngram_set(bench, n=5), n=5).collect()}
    assert out[0][1] and out[0][0] == 5        # 9 words → 5 distinct 5-grams
    assert out[1] == (1, True)                 # "the quick brown fox jumps"
    assert out[2] == (0, False)
    assert out[3] == (0, False)                # short doc: degenerate gram
    assert len(out) == 4                       # every doc present


def test_flag_contaminated_counts_distinct_doc_grams(spark):
    bench = docs_df(spark, ["a b c d e"])
    # the doc repeats the benchmark 5-gram twice → still 1 distinct hit
    corpus = docs_df(spark, ["a b c d e x a b c d e"])
    row = flag_contaminated(corpus, benchmark_ngram_set(bench, n=5),
                            n=5).collect()[0]
    assert row.n_hits == 1 and row.contaminated


def test_flag_contaminated_shuffle_path_matches_broadcast(spark):
    bench = docs_df(spark, ["one two three four five six"])
    corpus = docs_df(spark, ["zero one two three four five seven",
                             "unrelated words only here today now"])
    bg = benchmark_ngram_set(bench, n=5)
    a = sorted((r.doc_id, r.n_hits) for r in
               flag_contaminated(corpus, bg, n=5).collect())
    b = sorted((r.doc_id, r.n_hits) for r in
               flag_contaminated(corpus, bg, n=5,
                                 broadcast_threshold=0).collect())
    assert a == b


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------

def test_repetition_scores_formulas(spark):
    docs = docs_df(spark, [
        "a b a b a b a b",      # heavy 2-gram repetition
        "w x y z q r s t",      # all distinct
    ])
    out = {r.doc_id: r for r in repetition_scores(docs, n=2).collect()}
    # doc 0: grams = [ab, ba]*… → total 7, distinct 2, top 4
    assert out[0].total_grams == 7
    assert out[0].dup_frac == round(1 - 2 / 7, 6)
    assert out[0].top_frac == round(4 / 7, 6)
    # doc 1: 7 grams all distinct
    assert out[1].total_grams == 7
    assert out[1].dup_frac == 0.0
    assert out[1].top_frac == round(1 / 7, 6)


def test_repetition_scores_degenerate_docs(spark):
    docs = docs_df(spark, ["", "one"])
    out = {r.doc_id: r for r in repetition_scores(docs, n=3).collect()}
    for i in (0, 1):  # single degenerate gram → no repetition signal
        assert out[i].total_grams == 1 and out[i].dup_frac == 0.0


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------

def _expected_split(doc_id, seed="v1"):
    h = hashlib.md5(f"{doc_id}\x1f{seed}".encode()).hexdigest()
    b = int(h[:8], 16) % 1_000_000
    return "train" if b < 900_000 else ("val" if b < 950_000 else "test")


def test_assign_splits_matches_reference_md5(spark):
    docs = docs_df(spark, [f"text {i}" for i in range(200)])
    out = {r.doc_id: r.split for r in assign_splits(docs).collect()}
    for i in range(200):
        assert out[i] == _expected_split(i), i


def test_assign_splits_partitioning_independent(spark):
    docs = docs_df(spark, [f"text {i}" for i in range(100)])
    a = {r.doc_id: r.split
         for r in assign_splits(docs.repartition(1)).collect()}
    b = {r.doc_id: r.split
         for r in assign_splits(docs.repartition(16)).collect()}
    assert a == b


def test_assign_splits_seed_rerolls_and_weights_hold(spark):
    docs = docs_df(spark, [f"text {i}" for i in range(2000)])
    a = assign_splits(docs, seed="v1")
    b = assign_splits(docs, seed="v2")
    joined = a.select("doc_id", F.col("split").alias("s1")).join(
        b.select("doc_id", F.col("split").alias("s2")), "doc_id")
    changed = joined.where("s1 != s2").count()
    assert changed > 0
    counts = {r.split: r["count"] for r in a.groupBy("split").count()
              .collect()}
    assert 0.85 < counts["train"] / 2000 < 0.95
    assert counts.get("val", 0) + counts.get("test", 0) == \
        2000 - counts["train"]


def test_assign_splits_bad_weights(spark):
    docs = docs_df(spark, ["x"])
    with pytest.raises(ValueError):
        assign_splits(docs, splits=[("train", 0.5), ("val", 0.1)])


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_counts_per_class(spark):
    docs = docs_df(spark, [
        "mail a.b-c_d%x+1@sub.example.org or other@example.com now",
        "ssn 123-45-6789 and ip 192.168.0.1 and call +15551234567",
        "no pii here at all",
        "",
    ])
    out = {r.doc_id: r for r in pii_counts(docs).collect()}
    assert (out[0].n_email, out[0].n_ssn, out[0].n_ipv4,
            out[0].n_phone) == (2, 0, 0, 0)
    assert (out[1].n_email, out[1].n_ssn, out[1].n_ipv4,
            out[1].n_phone) == (0, 1, 1, 1)
    assert (out[2].n_email, out[3].n_email) == (0, 0)


def test_scrub_pii_order_and_tokens(spark):
    docs = docs_df(spark, [
        "mail x@y.example ssn 123-45-6789 ip 10.0.0.1 tel +12345678",
    ])
    row = scrub_pii(docs).collect()[0]
    assert row.text == ("mail <EMAIL> ssn <SSN> ip <IPV4> tel <PHONE>")
    # email claims dotted digits in its local part before ipv4 can
    tricky = docs_df(spark, ["ping 1.2.3.4@example.com end"])
    assert scrub_pii(tricky).collect()[0].text == "ping <EMAIL> end"


def test_scrub_pii_idempotent_and_out_col(spark):
    docs = docs_df(spark, ["reach user1@example.com at +15550001111"])
    once = scrub_pii(docs)
    assert scrub_pii(once).collect()[0].text == once.collect()[0].text
    kept = scrub_pii(docs, out_col="clean").collect()[0]
    assert "@" in kept.text and "<EMAIL>" in kept.clean


def test_pii_custom_patterns(spark):
    docs = docs_df(spark, ["key AKIA1234 other"])
    pats = {"awskey": r"\bAKIA[0-9A-Z]{4}\b"}
    assert pii_counts(docs, patterns=pats).collect()[0].n_awskey == 1
    assert scrub_pii(docs, patterns=pats).collect()[0].text == \
        "key <AWSKEY> other"


@pytest.mark.usefixtures("spark")
class TestC4Flags:
    def test_flags_and_keep_rule(self, spark):
        from rdflib_jsonld_spark.operators.curation import c4_quality_flags
        rows = [
            (0, "This is a fine first sentence.\n"
                "Here is another good long line!\n"
                'And a third quoted line ends well."'),
            (1, "short line.\nno terminal punctuation here\nums"),
            (2, "Lorem ipsum dolor sit amet makes this one vanish.\n"
                "Even with other good sentences in the document.\n"
                "Three of them, to be safe and sure."),
            (3, "function f() { return 1; } is code-like text here.\n"
                "Second proper sentence for the line counter too.\n"
                "Third proper sentence for the line counter too."),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r.doc_id: r for r in c4_quality_flags(df).collect()}
        assert got[0].n_lines == 3 and got[0].n_kept_lines == 3
        assert got[0].keep
        # doc 1: line 1 ends in '.' but has <5 words; others unpunctuated
        assert got[1].n_kept_lines == 0 and not got[1].keep
        assert got[2].has_lorem_ipsum and not got[2].keep
        assert got[3].has_brace and not got[3].keep
        assert got[4].n_kept_lines == 0 and not got[4].keep

    def test_zero_shuffle(self, spark):
        from rdflib_jsonld_spark.operators.curation import c4_quality_flags
        df = spark.createDataFrame([(0, "x.")], ["doc_id", "text"])
        plan = c4_quality_flags(df) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestUrlCuration:
    def test_canonical_url_cases(self, spark):
        from rdflib_jsonld_spark.operators.curation import canonical_url
        from pyspark.sql import functions as F
        cases = [
            # www + https default port + fragment
            ("https://WWW.Ex.COM:443/a/b/#x", "https://ex.com/a/b"),
            # http default port; non-default port kept
            ("http://ex.com:80/a", "http://ex.com/a"),
            ("http://ex.com:8080/a", "http://ex.com:8080/a"),
            # tracker-only query drops entirely; kept params keep order
            ("https://ex.com/p?utm_source=x&fbclid=1", "https://ex.com/p"),
            ("https://ex.com/p?b=2&utm_medium=m&a=1",
             "https://ex.com/p?b=2&a=1"),
            # ref is a tracker; 'refid' is not
            ("https://ex.com/p?ref=abc&refid=7", "https://ex.com/p?refid=7"),
            # trailing slashes collapse; bare host has empty path
            ("https://ex.com///", "https://ex.com"),
            # path case preserved, scheme/host lowered
            ("HTTPS://EX.com/CaSe", "https://ex.com/CaSe"),
            # non-parsing input falls back to lower(trim(...))
            ("  Not A Url  ", "not a url"),
        ]
        df = spark.createDataFrame([(i, u) for i, (u, _) in
                                    enumerate(cases)], ["i", "u"])
        got = {r["i"]: r["c"] for r in
               df.select("i", canonical_url(F.col("u")).alias("c"))
               .collect()}
        for i, (u, want) in enumerate(cases):
            assert got[i] == want, (u, got[i], want)

    def test_url_dedup_keeps_min_id(self, spark):
        from rdflib_jsonld_spark.operators.curation import url_dedup
        df = spark.createDataFrame(
            [(3, "https://www.a.com/x?utm_source=t"),
             (1, "HTTPS://a.com:443/x/"),
             (2, "https://a.com/y"),
             (4, "https://b.com/x")],
            ["doc_id", "url"])
        kept = sorted(r.doc_id for r in url_dedup(df).collect())
        assert kept == [1, 2, 4]

    def test_domain_filter_blocks_suffix_and_caps(self, spark):
        from rdflib_jsonld_spark.operators.curation import domain_filter
        rows = [(i, f"https://sub.bad.com/{i}") for i in range(3)] + \
               [(10 + i, f"https://bad.com/{i}") for i in range(2)] + \
               [(20 + i, f"https://notbad.com/{i}") for i in range(5)] + \
               [(30 + i, f"https://ok.com/{i}") for i in range(7)]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        out = domain_filter(df, ["bad.com"], cap=4)
        by_dom = {}
        for r in out.collect():
            by_dom.setdefault(r.domain, []).append(r.doc_id)
        # bad.com and *.bad.com gone; notbad.com NOT a suffix match
        assert set(by_dom) == {"notbad.com", "ok.com"}
        assert len(by_dom["notbad.com"]) == 4  # capped from 5
        assert len(by_dom["ok.com"]) == 4      # capped from 7

    def test_domain_filter_deterministic_across_partitioning(self, spark):
        from rdflib_jsonld_spark.operators.curation import domain_filter
        rows = [(i, f"https://d{i % 3}.com/{i}") for i in range(30)]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        a = {r.doc_id for r in domain_filter(df, [], cap=5).collect()}
        b = {r.doc_id for r in
             domain_filter(df.repartition(7), [], cap=5).collect()}
        assert a == b and len(a) == 15
