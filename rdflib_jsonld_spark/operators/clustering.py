"""Distributed k-means and semantic (embedding-cluster) deduplication.

Two corpus-curation operators over the ``embeddings`` table:

- :func:`kmeans` — full-corpus Lloyd's iterations (MacQueen/Lloyd,
  public textbook algorithm). Unlike :func:`similarity.ivf_centroids`
  (which trains a coarse quantizer on a bounded DRIVER sample — the
  right shape when centroids are just an ANN routing model), this runs
  the assignment over EVERY row each round, entirely JVM-side, so the
  final assignment is exact — which is what cluster-then-dedup needs.
- :func:`semantic_dedup` — SemDeDup-style pruning (Abbas et al. 2023,
  public methodology): duplicates are only searched WITHIN a k-means
  cluster, collapsing the O(n²) cosine search to per-cluster blocks —
  the same candidates→verify scale shape as the LSH dedup family
  (operators/dedup.py). The drop rule is deterministic: a document is
  dropped iff some LOWER-id document in its cluster has cosine ≥ τ —
  one self-join + one distinct, exactly SQL-replicable.

Scale posture (10^9-vector ready):
- per iteration: one narrow projection computing k squared-L2 distances
  in whole-stage codegen (``zip_with``/``aggregate`` — no Python) + one
  hash aggregate of 64 per-dimension sums; centroids live in the plan
  as literals (k·dim doubles ≪ broadcast threshold);
- the only driver state is the k×dim centroid matrix (one bounded
  collect per round);
- deterministic throughout: seeded md5-order init (no RNG), fixed
  iteration count, ties broken toward the lower cluster index — the
  properties that make the DuckDB oracle able to replay the whole
  recurrence and a resumed run reproduce assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _dist2(vec_col, centroid: list[float]):
    """Squared L2 distance, JVM-side: fold over zip_with in array order
    (the same left-to-right order DuckDB's list_sum uses, keeping fp
    accumulation comparable between engines)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), lit,
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def _assign_col(vec_col, centroids: list[list[float]]):
    """argmin over k distance expressions; ties → lower cluster index
    (struct ordering compares distance first, then index)."""
    return F.array_min(F.array(*[
        F.struct(_dist2(vec_col, c).alias("d"),
                 F.lit(i).alias("c"))
        for i, c in enumerate(centroids)]))["c"]


def kmeans_init(embeddings: DataFrame, k: int, seed: str = "km-v1",
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic, engine-replicable init: the k rows with the
    smallest md5(id ‖ 0x1F ‖ seed) digests (a seeded uniform draw that
    any SQL engine reproduces — same construction as the curation
    hash-split family). Returns float64 centroid rows."""
    if k <= 0:
        raise ValueError("k must be positive")
    h = F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"),
                          F.lit(seed)))
    rows = (embeddings.select(F.col(vec_col).cast("array<double>")
                              .alias("v"), h.alias("h"))
            .orderBy("h").limit(k).collect())
    if len(rows) < k:
        raise ValueError(f"kmeans_init: need {k} rows, corpus has "
                         f"{len(rows)}")
    return [list(r.v) for r in rows]


def kmeans(embeddings: DataFrame, k: int = 8, iterations: int = 5,
           seed: str = "km-v1", id_col: str = "vec_id",
           vec_col: str = "embedding"):
    """Fixed-iteration distributed Lloyd's → (assignments DataFrame
    ``(id, cluster)``, final centroids). Empty clusters keep their
    previous centroid (deterministic; no re-seeding RNG)."""
    dim = len(embeddings.select(vec_col).first()[0])
    cents = kmeans_init(embeddings, k, seed, id_col, vec_col)
    base = embeddings.select(id_col, F.col(vec_col).cast("array<double>")
                             .alias("_v"))
    for _ in range(iterations):
        assigned = base.withColumn("_c", _assign_col(F.col("_v"), cents))
        stats = (assigned.groupBy("_c")
                 .agg(F.count(F.lit(1)).alias("_n"),
                      *[F.avg(F.col("_v")[i]).alias(f"d{i}")
                        for i in range(dim)])
                 .collect())
        nxt = [list(c) for c in cents]
        for r in stats:
            nxt[r["_c"]] = [r[f"d{i}"] for i in range(dim)]
        cents = nxt
    out = base.withColumn("cluster", _assign_col(F.col("_v"), cents)) \
        .select(id_col, "cluster")
    return out, cents


def _pair_cos(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y),
                            F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y),
                            F.lit(0.0), lambda acc, x: acc + x))
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).otherwise(F.lit(0.0))


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.95,
                   k: int = 8, iterations: int = 5, seed: str = "km-v1",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup: k-means the corpus, then within each cluster drop every
    vector that has a LOWER-id cluster-mate with cosine ≥ ``threshold``.
    Returns ``(id, cluster, keep)``.

    The self-join is keyed on the cluster id — candidate volume is
    Σ|cluster|², never n² (the SemDeDup scale argument); at web scale
    the cluster count k grows with the corpus so blocks stay bounded.
    The pairwise stage persists the assignment first: it is scanned by
    both sides of the self-join (the r02 recompute-per-branch lesson).
    """
    assign, _ = kmeans(embeddings, k, iterations, seed, id_col, vec_col)
    vecs = embeddings.select(F.col(id_col).alias("_id"),
                             F.col(vec_col).cast("array<double>")
                             .alias("_v"))
    tagged = (assign.join(vecs, assign[id_col] == vecs["_id"])
              .select(id_col, "cluster", "_v").persist())
    a = tagged.select(F.col(id_col).alias("ida"), F.col("cluster"),
                      F.col("_v").alias("va"))
    b = tagged.select(F.col(id_col).alias("idb"),
                      F.col("cluster").alias("cb"), F.col("_v").alias("vb"))
    dup_ids = (a.join(b, (a.cluster == b.cb) & (a.ida < b.idb))
               .where(_pair_cos(F.col("va"), F.col("vb"))
                      >= F.lit(float(threshold)))
               .select(F.col("idb").alias("_dup")).distinct())
    out = (tagged.join(dup_ids, tagged[id_col] == dup_ids["_dup"], "left")
           .select(id_col, "cluster", F.col("_dup").isNull().alias("keep")))
    return out
