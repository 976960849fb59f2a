"""Hashed linear classifier vs an independent scorer."""

import hashlib
import math
import re

import pytest

from rdflib_jsonld_spark.operators.classify import linear_text_classifier


def ref_score(text, weights, bias, n_buckets, seed="clf-v1"):
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    if not toks:
        mean = 0.0
    else:
        tot = 0.0
        for t in toks:
            b = int(hashlib.md5(f"{t}\x1f{seed}".encode())
                    .hexdigest()[:8], 16) % n_buckets
            tot += weights.get(b, 0.0)
        mean = tot / len(toks)
    return 1.0 / (1.0 + math.exp(-(bias + mean)))


WEIGHTS = {b: (b % 7 - 3) * 0.8 for b in range(0, 64, 3)}


@pytest.mark.usefixtures("spark")
class TestClassifier:
    DOCS = [
        (0, "the quick brown fox"),
        (1, "Spark SQL window merge JOIN!"),
        (2, ""),
        (3, "aaa aaa aaa"),
        (4, "mixed CASE tokens, with. punctuation?"),
    ]

    def test_scores_match_reference(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        out = linear_text_classifier(df, WEIGHTS, bias=0.2, n_buckets=64)
        got = {r.doc_id: (r.clf_score, r.clf_label) for r in out.collect()}
        for d, t in self.DOCS:
            want = ref_score(t, WEIGHTS, 0.2, 64)
            assert got[d][0] == pytest.approx(want, rel=1e-12)
            assert got[d][1] == (want >= 0.5)

    def test_empty_doc_scores_sigmoid_bias(self, spark):
        df = spark.createDataFrame([(0, "")], ["doc_id", "text"])
        r = linear_text_classifier(df, WEIGHTS, bias=-1.0,
                                   n_buckets=64).collect()[0]
        assert r.clf_score == pytest.approx(1 / (1 + math.exp(1.0)))
        assert not r.clf_label

    def test_partitioning_independent(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        a = {(r.doc_id, r.clf_score) for r in
             linear_text_classifier(df, WEIGHTS).collect()}
        b = {(r.doc_id, r.clf_score) for r in
             linear_text_classifier(df.repartition(4), WEIGHTS).collect()}
        assert a == b

    def test_bad_bucket_rejected(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        with pytest.raises(ValueError):
            linear_text_classifier(df, {9999: 1.0}, n_buckets=64)

    def test_zero_shuffle_plan(self, spark):
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        plan = linear_text_classifier(df, WEIGHTS) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBigramLM:
    @staticmethod
    def ref_scores(texts, alpha=1.0):
        import math
        from collections import Counter
        toks = {i: t.lower().split() for i, t in enumerate(texts)}
        uni, big = Counter(), Counter()
        for ws in toks.values():
            uni.update(ws)
            big.update(zip(ws, ws[1:]))
        v = len(uni)
        out = {}
        for i, ws in toks.items():
            lps = [math.log2((big[(a, b)] + alpha) / (uni[a] + alpha * v))
                   for a, b in zip(ws, ws[1:])]
            if lps:
                out[i] = (len(lps), round(sum(lps) / len(lps), 6))
        return out

    def _run(self, spark, texts, **kw):
        from pyspark.sql import Row
        from rdflib_jsonld_spark.operators.classify import bigram_lm_scores
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        return {r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
                for r in bigram_lm_scores(docs, **kw).collect()}

    def test_matches_reference(self, spark):
        texts = ["the cat sat on the mat",
                 "the dog sat on the log",
                 "a completely different sentence here",
                 "the cat sat on the mat again and again"]
        got = self._run(spark, texts)
        ref = self.ref_scores(texts)
        assert set(got) == set(ref)
        for i in got:
            assert got[i][0] == ref[i][0]
            assert abs(got[i][1] - ref[i][1]) < 1e-6, (i, got[i], ref[i])

    def test_typical_scores_higher_than_rare(self, spark):
        texts = ["the cat sat on the mat"] * 5 + ["zz qq xx vv ww yy"]
        got = self._run(spark, texts)
        assert got[0][1] > got[5][1]

    def test_single_token_doc_absent(self, spark):
        got = self._run(spark, ["word", "two words here"])
        assert 0 not in got and 1 in got

    def test_separate_train_corpus(self, spark):
        from pyspark.sql import Row
        from rdflib_jsonld_spark.operators.classify import bigram_lm_scores
        train = spark.createDataFrame(
            [Row(doc_id=i, text="the cat sat on the mat")
             for i in range(3)])
        score = spark.createDataFrame(
            [Row(doc_id=0, text="the cat sat"),
             Row(doc_id=1, text="qq zz vv")])
        got = {r["doc_id"]: r["avg_logp"]
               for r in bigram_lm_scores(score, train_docs=train).collect()}
        assert got[0] > got[1]


def ref_train(labeled, n_buckets=16, seed="clf-v1", lr=1.0, n_rounds=3):
    """Pure-Python full-batch logistic GD — the recurrence
    train_linear_classifier distributes."""
    feats = []
    for _, text, y in labeled:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        cnt = {}
        for t in toks:
            b = int(hashlib.md5(f"{t}\x1f{seed}".encode())
                    .hexdigest()[:8], 16) % n_buckets
            cnt[b] = cnt.get(b, 0) + 1
        feats.append((float(y), len(toks), cnt))
    n = len(feats)
    w, bias = [0.0] * n_buckets, 0.0
    for _ in range(n_rounds):
        gw, gb = [0.0] * n_buckets, 0.0
        for y, nt, cnt in feats:
            dot = sum(w[b] * c for b, c in cnt.items()) / nt if nt else 0.0
            r = 1.0 / (1.0 + math.exp(-(bias + dot))) - y
            gb += r
            for b, c in cnt.items():
                gw[b] += r * c / nt
        w = [w[b] - lr * gw[b] / n for b in range(n_buckets)]
        bias -= lr * gb / n
    return w, bias


class TestTrainClassifier:
    DOCS = [
        (0, "the quick brown fox jumps", 1),
        (1, "le renard brun rapide saute", 0),
        (2, "the lazy dog sleeps under the tree", 1),
        (3, "chien paresseux dort sous arbre le le", 0),
        (4, "", 1),  # empty doc: bias gradient only
        (5, "quick dog runs the the", 1),
        (6, "renard dort le brun", 0),
    ]

    def _train(self, spark, **kw):
        from rdflib_jsonld_spark.operators.classify import (
            train_linear_classifier)
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text", "y"])
        return train_linear_classifier(df, "y", n_buckets=16,
                                       n_rounds=3, **kw)

    def test_matches_reference_gd(self, spark):
        w, bias = self._train(spark)
        rw, rb = ref_train(self.DOCS)
        assert bias == pytest.approx(rb, rel=1e-9, abs=1e-12)
        for b in range(16):
            assert w[b] == pytest.approx(rw[b], rel=1e-9, abs=1e-12), b

    def test_trained_weights_reproduce_scores(self, spark):
        # feeding the fit back into the scorer = the reference forward
        # pass with the reference weights (same tokenizer + bucketing)
        w, bias = self._train(spark)
        wmap = {b: v for b, v in enumerate(w)}
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text", "y"])
        out = linear_text_classifier(df, wmap, bias=bias, n_buckets=16)
        rw, rb = ref_train(self.DOCS)
        for r in out.collect():
            want = ref_score(self.DOCS[r.doc_id][1],
                             dict(enumerate(rw)), rb, 16)
            assert r.clf_score == pytest.approx(want, rel=1e-9)

    def test_partitioning_independent(self, spark):
        from rdflib_jsonld_spark.operators.classify import (
            train_linear_classifier)
        df = spark.createDataFrame(self.DOCS, ["doc_id", "text", "y"])
        a = train_linear_classifier(df, "y", n_buckets=16, n_rounds=2)
        b = train_linear_classifier(df.repartition(5), "y",
                                    n_buckets=16, n_rounds=2)
        assert a[1] == pytest.approx(b[1], rel=1e-12)
        for x, y in zip(a[0], b[0]):
            assert x == pytest.approx(y, rel=1e-12)

    def test_loss_decreases(self, spark):
        # GD on a linearly-separable-by-language corpus must fit it
        w, bias = self._train(spark)

        def loss(wv, bv):
            tot = 0.0
            for _, text, y in self.DOCS:
                p = ref_score(text, dict(enumerate(wv)), bv, 16)
                p = min(max(p, 1e-12), 1 - 1e-12)
                tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
            return tot

        assert loss(w, bias) < loss([0.0] * 16, 0.0)


def test_scoring_broadcast_fallback_matches_literal(spark, monkeypatch):
    """Past MAX_LITERAL_BUCKETS the forward pass switches to a broadcast
    (bucket, weight) join; scores must match the literal-map path."""
    from rdflib_jsonld_spark.operators import classify
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "beta beta delta xyz"),
         (4, None)], "doc_id long, text string")
    weights = {b: (b % 7 - 3) / 4.0 for b in range(0, 512, 3)}
    lit = classify.linear_text_classifier(
        docs, weights, bias=0.25, n_buckets=512).collect()
    monkeypatch.setattr(classify, "MAX_LITERAL_BUCKETS", 8)
    bc = classify.linear_text_classifier(
        docs, weights, bias=0.25, n_buckets=512).collect()
    lit_m = {r.doc_id: (round(r.clf_score, 12), r.clf_label) for r in lit}
    bc_m = {r.doc_id: (round(r.clf_score, 12), r.clf_label) for r in bc}
    assert lit_m == bc_m
    # schema unchanged by the fallback (no temp columns leak)
    assert sorted(lit[0].asDict()) == sorted(bc[0].asDict())


def test_training_broadcast_fallback_matches_literal(spark, monkeypatch):
    """Training past the cap (broadcast weight table per round) must
    reproduce the literal-map training trajectory."""
    from rdflib_jsonld_spark.operators import classify
    docs = spark.createDataFrame(
        [(1, "good clean text here", 1), (2, "spam spam junk", 0),
         (3, "clean good words", 1), (4, "", 0), (5, "junk junk", 0)],
        "doc_id long, text string, label int")
    w_lit, b_lit = classify.train_linear_classifier(
        docs, "label", n_buckets=32, n_rounds=3)
    monkeypatch.setattr(classify, "MAX_LITERAL_BUCKETS", 4)
    w_bc, b_bc = classify.train_linear_classifier(
        docs, "label", n_buckets=32, n_rounds=3)
    assert round(b_lit, 12) == round(b_bc, 12)
    assert [round(x, 12) for x in w_lit] == [round(x, 12) for x in w_bc]


def test_training_single_action_bias_matches_reference(spark):
    """The folded NULL-bucket bias gradient must equal the explicit
    full-batch logistic recurrence computed in numpy."""
    import math
    from rdflib_jsonld_spark.operators import classify
    rows = [(1, "a b a", 1), (2, "b c", 0), (3, "", 1), (4, "c c c a", 0)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    n_buckets, seed, lr, rounds = 16, "clf-v1", 1.0, 4
    w_s, b_s = classify.train_linear_classifier(
        docs, "label", n_buckets=n_buckets, n_rounds=rounds, lr=lr,
        seed=seed)
    # driver-side reference
    import hashlib
    def bucket(tok):
        h = hashlib.md5(f"{tok}\x1fclf-v1".encode()).hexdigest()[:8]
        return int(h, 16) % n_buckets
    feats = []
    for _, text, y in [(r[0], r[1], r[2]) for r in rows]:
        toks = [t for t in (text or "").lower().split() if t]
        feats.append(([bucket(t) for t in toks], float(y)))
    w = [0.0] * n_buckets
    bias = 0.0
    n = len(rows)
    for _ in range(rounds):
        gw = [0.0] * n_buckets
        gb = 0.0
        for toks, y in feats:
            dot = sum(w[b] for b in toks) / len(toks) if toks else 0.0
            r = 1.0 / (1.0 + math.exp(-(bias + dot))) - y
            for b in toks:
                gw[b] += r / len(toks)
            gb += r
        for b in range(n_buckets):
            w[b] -= lr * gw[b] / n
        bias -= lr * gb / n
    assert round(b_s, 9) == round(bias, 9)
    assert [round(x, 9) for x in w_s] == [round(x, 9) for x in w]
