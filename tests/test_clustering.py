"""Distributed Lloyd k-means + SemDeDup-style semantic dedup, checked
against an independent numpy implementation sharing only the published
algorithm (and the md5-order init rule, which is the contract)."""

import hashlib

import numpy as np
import pytest

from rdflib_jsonld_spark.operators.clustering import (
    kmeans, kmeans_init, semantic_dedup)


def ref_kmeans(ids, vecs, k, iterations, seed="km-v1"):
    """Independent reference: same init rule, plain numpy Lloyd."""
    order = sorted(range(len(ids)),
                   key=lambda i: hashlib.md5(
                       f"{ids[i]}\x1f{seed}".encode()).hexdigest())
    cents = np.array([vecs[i] for i in order[:k]], dtype=np.float64)
    X = np.asarray(vecs, dtype=np.float64)
    for _ in range(iterations):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = X[a == c].mean(axis=0)
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return dict(zip(ids, d.argmin(axis=1)))


def blob_rows(rng, centers, per=20):
    rows = []
    i = 0
    for cx in centers:
        for _ in range(per):
            v = [float(c + rng.normal(0, 0.05)) for c in cx]
            rows.append((i, v))
            i += 1
    return rows


@pytest.mark.usefixtures("spark")
class TestKMeans:
    def test_matches_independent_reference(self, spark):
        rng = np.random.RandomState(3)
        rows = blob_rows(rng, [(0, 0, 0), (10, 0, 0), (0, 10, 0)])
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        assign, cents = kmeans(df, k=3, iterations=4)
        got = {r.vec_id: r.cluster for r in assign.collect()}
        want = ref_kmeans([r[0] for r in rows], [r[1] for r in rows],
                          3, 4)
        assert got == want
        # well-separated blobs → each recovered exactly
        for base in (0, 20, 40):
            assert len({got[i] for i in range(base, base + 20)}) == 1

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # 2 identical points, k=2: one cluster must go empty; no crash,
        # deterministic output
        df = spark.createDataFrame(
            [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0])],
            ["vec_id", "embedding"])
        assign, cents = kmeans(df, k=2, iterations=3)
        got = {r.cluster for r in assign.collect()}
        assert got == {0}  # ties → lower index
        assert len(cents) == 2

    def test_init_deterministic_and_validated(self, spark):
        df = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(10)],
            ["vec_id", "embedding"])
        a = kmeans_init(df, 4)
        b = kmeans_init(df.repartition(5), 4)
        assert a == b
        with pytest.raises(ValueError):
            kmeans_init(df, 11)
        with pytest.raises(ValueError):
            kmeans_init(df, 0)


@pytest.mark.usefixtures("spark")
class TestSemanticDedup:
    @staticmethod
    def _spread_rows(rng, n=20, dim=8):
        # directionally-spread random vectors: pairwise |cos| ≪ 1
        # (a tight off-origin blob would be directionally degenerate —
        # every member at cosine ≈ 1 with every other)
        return [(i, [float(x) for x in rng.normal(0, 1, dim)])
                for i in range(n)]

    def test_planted_duplicates_dropped_lower_id_kept(self, spark):
        rng = np.random.RandomState(5)
        rows = self._spread_rows(rng)
        # clone ids 1 and 12 with tiny perturbation → near-exact dups
        rows += [(100, [x + 1e-4 for x in rows[1][1]]),
                 (112, [x + 1e-4 for x in rows[12][1]])]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = semantic_dedup(df, threshold=0.999, k=2, iterations=3)
        dropped = {r.vec_id for r in out.where("NOT keep").collect()}
        assert dropped == {100, 112}
        kept = {r.vec_id for r in out.where("keep").collect()}
        assert {1, 12} <= kept
        # dup rows co-cluster with their originals
        cl = {r.vec_id: r.cluster for r in out.collect()}
        assert cl[100] == cl[1] and cl[112] == cl[12]

    def test_no_dups_keeps_everything(self, spark):
        rng = np.random.RandomState(6)
        rows = self._spread_rows(rng, n=16)
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = semantic_dedup(df, threshold=0.999, k=2, iterations=2)
        assert out.where("NOT keep").count() == 0
