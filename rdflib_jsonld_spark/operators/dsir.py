"""DSIR-style data selection: hashed n-gram importance resampling.

Importance resampling for pre-training data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
methodology): raw-corpus documents are re-weighted toward a TARGET
distribution by the log-likelihood ratio of two bag-of-hashed-n-gram
(unigram + bigram) models, then resampled proportionally to the
importance weight.

100-TB posture:
- the two distribution estimates are additive hash aggregations over an
  ``n_buckets``-bounded key space — map-side combinable, the shuffle
  moves at most ``n_buckets × partitions`` rows, never text;
- scoring is a PURE PROJECTION: the log-ratio table (≤ ``n_buckets``
  rows, collected under an explicit bound like the IVF probe contract)
  ships inside the plan as a ``map`` literal, so the per-document pass
  is zero-shuffle, zero-join whole-stage codegen — the same shape as
  the hashed linear classifier (operators/classify.py);
- resampling uses the seeded-Gumbel top-k trick (max-Gumbel ≡ weighted
  sampling without replacement), with the Gumbel noise a DETERMINISTIC
  md5 function of (doc_id, seed): reruns, retried tasks and resumed
  jobs select the identical subset, and the draw is a TakeOrdered —
  no global sort, no driver state.

Both the md5 bucketing and the Gumbel construction are replicated
verbatim by the DuckDB contract oracles (doc_dsir_weights,
doc_dsir_sample).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .classify import MAX_LITERAL_BUCKETS, _bucket  # noqa: F401 — cap
# shared with the classifier weight maps (ratio tables above it would
# bloat the plan / break codegen; the collect() in dsir_log_weights is
# bounded by the same number)
from .search import TOKEN_SPLIT


def _with_grams(docs: DataFrame, text_col: str, out: str) -> DataFrame:
    """Unigram + space-joined-bigram array per row (tokens are the BM25
    split rule, so they never contain spaces — the two gram kinds are
    disjoint). All JVM: split/filter/transform-with-index."""
    toked = docs.withColumn(
        "_dsir_toks",
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                 lambda t: t != ""))
    bigrams = F.expr(
        "transform(slice(_dsir_toks, 1, greatest(size(_dsir_toks)-1, 0)),"
        " (t, i) -> concat(t, ' ', _dsir_toks[i+1]))")
    return (toked.withColumn(out, F.concat(F.col("_dsir_toks"), bigrams))
            .drop("_dsir_toks"))


def gram_bucket_counts(docs: DataFrame, n_buckets: int = 4096,
                       seed: str = "dsir-v1",
                       text_col: str = "text") -> DataFrame:
    """(bucket, cnt) occurrence counts of hashed unigram+bigram buckets —
    one additive agg, output bounded by ``n_buckets``."""
    g = _with_grams(docs, text_col, "_dsir_grams")
    return (g.select(F.explode("_dsir_grams").alias("_g"))
            .select(_bucket(F.col("_g"), n_buckets, seed).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("cnt")))


def dsir_log_weights(raw_docs: DataFrame, target_docs: DataFrame,
                     n_buckets: int = 4096, seed: str = "dsir-v1",
                     text_col: str = "text", laplace: float = 1.0,
                     out_col: str = "dsir_logw") -> DataFrame:
    """Append ``out_col``: the DSIR importance log-weight
    ``Σ_grams ln p_target(bucket) / p_raw(bucket)`` under Laplace-
    smoothed bucket models (documents with no tokens weigh 0.0).

    Triggers two bounded agg jobs at call time (the distribution
    estimates); the returned frame's scoring is a zero-shuffle
    projection. ``n_buckets`` is capped at MAX_LITERAL_BUCKETS because
    the ratio table travels as a plan literal — fail loudly rather than
    ship a multi-MB plan (ADVICE r02 guardrail pattern).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if n_buckets > MAX_LITERAL_BUCKETS:
        raise ValueError(
            f"n_buckets={n_buckets} exceeds MAX_LITERAL_BUCKETS="
            f"{MAX_LITERAL_BUCKETS}; a plan-literal ratio table this "
            f"large would defeat codegen — shard the bucket space or "
            f"use a broadcast-join variant")
    if laplace <= 0:
        raise ValueError("laplace must be positive (zero counts must "
                         "stay finite)")
    raw_c = {r["bucket"]: r["cnt"] for r in gram_bucket_counts(
        raw_docs, n_buckets, seed, text_col).collect()}
    tgt_c = {r["bucket"]: r["cnt"] for r in gram_bucket_counts(
        target_docs, n_buckets, seed, text_col).collect()}
    tr = float(sum(raw_c.values())) + laplace * n_buckets
    tt = float(sum(tgt_c.values())) + laplace * n_buckets
    # buckets absent from the raw corpus can never be referenced by a
    # raw document, so the map only needs raw-present buckets
    lr = {b: math.log((tgt_c.get(b, 0) + laplace) / tt)
          - math.log((cr + laplace) / tr)
          for b, cr in raw_c.items()}
    if lr:
        lrmap = F.create_map(*[x for b, v in sorted(lr.items())
                               for x in (F.lit(int(b)), F.lit(float(v)))])
        lookup = lambda t: F.coalesce(  # noqa: E731
            lrmap[_bucket(t, n_buckets, seed)], F.lit(0.0))
    else:  # empty raw corpus: nothing to look up
        lookup = lambda t: F.lit(0.0)  # noqa: E731
    g = _with_grams(raw_docs, text_col, "_dsir_grams")
    score = F.aggregate("_dsir_grams", F.lit(0.0),
                        lambda acc, t: acc + lookup(t))
    return g.withColumn(out_col, score).drop("_dsir_grams")


def dsir_resample(weighted: DataFrame, n: int,
                  seed: str = "dsir-sample-v1",
                  weight_col: str = "dsir_logw",
                  id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement of ``n`` rows with
    probability ∝ exp(weight_col), via the max-Gumbel trick: key =
    logw − ln(−ln u) with u a deterministic seeded-md5 uniform of the
    id — the top-n keys ARE a Gumbel-max draw, and the whole draw is a
    TakeOrdered (no global sort, no RNG state, rerun-identical)."""
    if n <= 0:
        raise ValueError("n must be positive")
    h = (F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                          F.lit(seed))), 1, 8), 16, 10).cast("bigint"))
    u = (h + F.lit(0.5)) / F.lit(float(1 << 32))  # u ∈ (0, 1) exactly
    key = F.col(weight_col) - F.log(-F.log(u))
    return (weighted.withColumn("_gumbel", key)
            .orderBy(F.col("_gumbel").desc(), F.col(id_col))
            .limit(n).drop("_gumbel"))
