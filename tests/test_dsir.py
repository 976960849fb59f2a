"""DSIR importance resampling vs an independent pure-Python scorer."""

import hashlib
import math
import re

import pytest

from rdflib_jsonld_spark.operators.dsir import (
    MAX_LITERAL_BUCKETS, dsir_log_weights, dsir_resample,
    gram_bucket_counts)

N_BUCKETS = 128
SEED = "dsir-v1"


def ref_grams(text):
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def ref_bucket(g, n_buckets=N_BUCKETS, seed=SEED):
    return int(hashlib.md5(f"{g}\x1f{seed}".encode())
               .hexdigest()[:8], 16) % n_buckets


def ref_weights(raw, target, n_buckets=N_BUCKETS):
    raw_c, tgt_c = {}, {}
    for _, text in raw:
        for g in ref_grams(text):
            b = ref_bucket(g, n_buckets)
            raw_c[b] = raw_c.get(b, 0) + 1
    for _, text in target:
        for g in ref_grams(text):
            b = ref_bucket(g, n_buckets)
            tgt_c[b] = tgt_c.get(b, 0) + 1
    tr = sum(raw_c.values()) + n_buckets
    tt = sum(tgt_c.values()) + n_buckets
    out = {}
    for doc_id, text in raw:
        w = 0.0
        for g in ref_grams(text):
            b = ref_bucket(g, n_buckets)
            w += (math.log((tgt_c.get(b, 0) + 1.0) / tt)
                  - math.log((raw_c[b] + 1.0) / tr))
        out[doc_id] = w
    return out


RAW = [
    (0, "good clean prose about science and careful method"),
    (1, "good clean prose with science again and again"),
    (2, "spammy junk click here buy now buy now"),
    (3, "junk junk junk spam spam spam"),
    (4, ""),
    (5, "science method prose junk mixture of both worlds"),
]
TARGET = [(100, "good clean science prose and careful method"),
          (101, "clean prose about science method")]


@pytest.mark.usefixtures("spark")
class TestDsirWeights:
    def _frames(self, spark):
        raw = spark.createDataFrame(RAW, ["doc_id", "text"])
        tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
        return raw, tgt

    def test_weights_match_reference(self, spark):
        raw, tgt = self._frames(spark)
        got = {r["doc_id"]: r["dsir_logw"]
               for r in dsir_log_weights(raw, tgt,
                                         n_buckets=N_BUCKETS).collect()}
        want = ref_weights(RAW, TARGET)
        assert got.keys() == want.keys()
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-9)

    def test_target_like_docs_outweigh_junk(self, spark):
        raw, tgt = self._frames(spark)
        got = {r["doc_id"]: r["dsir_logw"]
               for r in dsir_log_weights(raw, tgt,
                                         n_buckets=N_BUCKETS).collect()}
        assert got[0] > got[2] and got[1] > got[3]

    def test_empty_doc_weighs_zero(self, spark):
        raw, tgt = self._frames(spark)
        got = {r["doc_id"]: r["dsir_logw"]
               for r in dsir_log_weights(raw, tgt,
                                         n_buckets=N_BUCKETS).collect()}
        assert got[4] == 0.0

    def test_gram_counts_total(self, spark):
        raw, _ = self._frames(spark)
        total = sum(r["cnt"] for r in
                    gram_bucket_counts(raw, N_BUCKETS).collect())
        assert total == sum(len(ref_grams(t)) for _, t in RAW)

    def test_bucket_guardrail(self, spark):
        raw, tgt = self._frames(spark)
        with pytest.raises(ValueError, match="MAX_LITERAL_BUCKETS"):
            dsir_log_weights(raw, tgt, n_buckets=MAX_LITERAL_BUCKETS * 2)
        with pytest.raises(ValueError, match="positive"):
            dsir_log_weights(raw, tgt, n_buckets=0)


@pytest.mark.usefixtures("spark")
class TestDsirResample:
    def _weighted(self, spark):
        raw = spark.createDataFrame(RAW, ["doc_id", "text"])
        tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
        return dsir_log_weights(raw, tgt, n_buckets=N_BUCKETS)

    def test_draw_is_deterministic(self, spark):
        w = self._weighted(spark)
        a = sorted(r["doc_id"] for r in dsir_resample(w, 3).collect())
        b = sorted(r["doc_id"] for r in dsir_resample(w, 3).collect())
        assert a == b and len(a) == 3

    def test_n_at_least_corpus_returns_all(self, spark):
        w = self._weighted(spark)
        assert dsir_resample(w, 100).count() == len(RAW)

    def test_gumbel_keys_match_reference(self, spark):
        """The top-n set equals a pure-Python replay of the max-Gumbel
        draw (seeded-md5 uniforms)."""
        w = self._weighted(spark)
        got = sorted(r["doc_id"] for r in dsir_resample(w, 3).collect())
        weights = ref_weights(RAW, TARGET)
        keys = {}
        for doc_id, _ in RAW:
            h = int(hashlib.md5(f"{doc_id}\x1fdsir-sample-v1".encode())
                    .hexdigest()[:8], 16)
            u = (h + 0.5) / 2.0 ** 32
            keys[doc_id] = weights[doc_id] - math.log(-math.log(u))
        want = sorted(sorted(keys, key=lambda d: (-keys[d], d))[:3])
        assert got == want

    def test_huge_weight_always_selected(self, spark):
        from pyspark.sql import functions as F
        w = self._weighted(spark).withColumn(
            "dsir_logw",
            F.when(F.col("doc_id") == 3, F.lit(1e6))
            .otherwise(F.col("dsir_logw")))
        got = {r["doc_id"] for r in dsir_resample(w, 1).collect()}
        assert got == {3}

    def test_n_guardrail(self, spark):
        w = self._weighted(spark)
        with pytest.raises(ValueError, match="positive"):
            dsir_resample(w, 0)
