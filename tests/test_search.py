"""BM25 search vs an independent hand-rolled scorer."""

import math
import re

import pytest

from rdflib_jsonld_spark.operators.search import (
    bm25_topk, build_index, corpus_stats, tokenize_query)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick fox"),
    (2, "a lazy afternoon nap, nothing quick about it"),
    (3, "Brown Bears! brown bears? BROWN bears."),
    (4, ""),
    (5, "fox"),
]


def ref_bm25(docs, query, k1=1.2, b=0.75):
    """Independent reference implementation (public BM25 formula)."""
    tok = lambda t: [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
    # token-less docs produce no postings and can match no query: the
    # engine's N/avgdl are over INDEXED docs (documented in search.py)
    corpus = {d: tok(t) for d, t in docs if tok(t)}
    lens = {d: len(ws) for d, ws in corpus.items()}
    n = len(corpus)
    avgdl = sum(lens.values()) / n
    scores = {}
    for term in tok(query):
        df = sum(1 for ws in corpus.values() if term in ws)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, ws in corpus.items():
            tf = ws.count(term)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[d] / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    return scores


@pytest.mark.usefixtures("spark")
class TestBM25:
    def _index(self, spark):
        df = spark.createDataFrame(DOCS, ["doc_id", "text"])
        return build_index(df)

    def test_scores_match_reference(self, spark):
        idx = self._index(spark)
        for query in ["quick fox", "brown bears", "lazy", "quick"]:
            got = {r.doc: r.score for r in bm25_topk(idx, query, k=10)
                   .collect()}
            want = ref_bm25(DOCS, query)
            assert set(got) == set(want)
            for d in want:
                assert got[d] == pytest.approx(want[d], rel=1e-12)

    def test_topk_order_and_tiebreak(self, spark):
        idx = self._index(spark)
        rows = bm25_topk(idx, "quick fox", k=3).collect()
        assert len(rows) == 3
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        # doc 1 repeats both terms and is short → must rank first
        assert rows[0].doc == 1

    def test_case_and_punctuation_folding(self, spark):
        idx = self._index(spark)
        got = {r.doc for r in bm25_topk(idx, "BROWN!", k=10).collect()}
        assert got == {0, 3}

    def test_empty_and_unknown_query(self, spark):
        idx = self._index(spark)
        assert bm25_topk(idx, "   ").collect() == []
        assert bm25_topk(idx, "zzz qqq").collect() == []

    def test_corpus_stats(self, spark):
        idx = self._index(spark)
        n, avgdl = corpus_stats(idx)
        # doc 4 is empty → produces no postings → 5 indexed docs
        assert n == 5
        toks = sum(len([w for w in re.split("[^a-z0-9]+", t.lower()) if w])
                   for _, t in DOCS)
        assert avgdl == pytest.approx(toks / 5)

    def test_tokenize_query_twin(self):
        assert tokenize_query("A-b C2! ") == ["a", "b", "c2"]
