"""Model-based document scoring: hashed linear text classifier.

The model-quality filter of a pre-training pipeline (fastText-style
hashed bag-of-words linear classifier — Joulin et al. 2016, public
methodology; the GPT-3/LLaMA quality filters are this shape): tokens
hash into a fixed bucket space, each bucket carries a learned weight,
the document score is sigmoid(bias + mean bucket weight). Training is
out of scope (models arrive as weight vectors); SCORING is the 100-TB
concern, and here it is a PURE NARROW PROJECTION:

- tokens come from the same split rule as the BM25 tokenizer
  (operators/search.py TOKEN_SPLIT);
- the bucket is a seeded md5 of the token — engine-replicable (the
  DuckDB oracle reproduces the identical bucketing, the same
  construction as the curation hash-split family);
- the weight lookup is a ``map`` LITERAL inside ``transform`` — the
  whole model ships in the plan (buckets ≍ 10³-10⁶ floats ≪ broadcast
  threshold), so scoring is zero-shuffle, zero-join, zero-Python:
  whole-stage codegen end to end, partitioning-independent, identical
  on every rerun.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .search import TOKEN_SPLIT


def _bucket(tok_col, n_buckets: int, seed: str):
    return (F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", tok_col, F.lit(seed))), 1, 8), 16, 10)
        .cast("bigint") % n_buckets)


def linear_text_classifier(docs: DataFrame, weights: dict[int, float],
                           bias: float = 0.0, n_buckets: int = 1024,
                           seed: str = "clf-v1", text_col: str = "text",
                           score_col: str = "clf_score",
                           threshold: float = 0.5) -> DataFrame:
    """Append ``clf_score`` (sigmoid of bias + mean hashed-bucket
    weight; empty documents score sigmoid(bias)) and ``clf_label``
    (score ≥ threshold). Buckets absent from ``weights`` weigh 0."""
    if not 0 < n_buckets:
        raise ValueError("n_buckets must be positive")
    for b in weights:
        if not 0 <= b < n_buckets:
            raise ValueError(f"bucket {b} outside [0, {n_buckets})")
    wmap = F.create_map(*[x for b, w in sorted(weights.items())
                          for x in (F.lit(int(b)), F.lit(float(w)))])
    # materialize the token array once — inlining it into transform AND
    # both size() calls would re-run the split+filter three times
    toked = docs.withColumn(
        "_clf_toks",
        F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                 lambda t: t != ""))
    toks = F.col("_clf_toks")
    bucket_w = F.transform(
        toks, lambda t: F.coalesce(wmap[_bucket(t, n_buckets, seed)],
                                   F.lit(0.0)))
    mean_w = F.when(
        F.size(toks) > 0,
        F.aggregate(bucket_w, F.lit(0.0), lambda a, x: a + x)
        / F.size(toks)).otherwise(F.lit(0.0))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(float(bias))
                                               + mean_w)))
    out = toked.withColumn(score_col, score).drop("_clf_toks")
    return out.withColumn("clf_label",
                          F.col(score_col) >= F.lit(float(threshold)))
