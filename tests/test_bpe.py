"""Distributed BPE vocabulary learning (operators/bpe.py)."""

from pyspark.sql import Row

from rdflib_jsonld_spark.operators.bpe import learn_bpe_merges, segment_words


def ref_bpe(texts, n_merges):
    """Reference BPE (Sennrich et al. 2016) on word frequencies."""
    from collections import Counter
    wc = Counter()
    for t in texts:
        wc.update(t.lower().split())
    words = {w: list(w) for w in wc}
    merges = []
    for step in range(n_merges):
        pairs = Counter()
        for w, sym in words.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] += wc[w]
        if not pairs:
            break
        (a, b), total = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, a + b, total))
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges, words


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


TEXTS = ["low lower lowest low low",
         "new newer newest new new newer",
         "wide wider widest wide",
         "low new wide slow slower"]


def test_merges_match_reference(spark):
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in learn_bpe_merges(_docs(spark, TEXTS), 6).collect()]
    ref, _ = ref_bpe(TEXTS, 6)
    assert got == ref


def test_segmentation_matches_reference(spark):
    ref_merges, ref_words = ref_bpe(TEXTS, 6)
    seg = segment_words(_docs(spark, TEXTS),
                        [(m[1], m[2]) for m in ref_merges])
    got = {r["w"]: list(r["pieces"]) for r in seg.collect()}
    assert got == ref_words


def test_greedy_overlap_semantics(spark):
    # 'aaaa' with top merge (a,a) → two 'aa' pieces, NOT three pairs
    texts = ["aaaa aaaa"]
    got = [(r["lhs"], r["rhs"]) for r in
           learn_bpe_merges(_docs(spark, texts), 1).collect()]
    assert got == [("a", "a")]
    seg = segment_words(_docs(spark, texts), got)
    assert {r["w"]: list(r["pieces"]) for r in seg.collect()} \
        == {"aaaa": ["aa", "aa"]}


def test_deterministic_tie_break(spark):
    # all pairs appear once → lexicographically smallest merges first
    got = learn_bpe_merges(_docs(spark, ["bc ab"]), 1).collect()
    assert (got[0]["lhs"], got[0]["rhs"]) == ("a", "b")


def test_segmentation_reassembles_hypothesis(spark):
    """Property: for ANY corpus, applying any learned merge list to the
    vocabulary yields pieces that concatenate back to each word."""
    import random
    rng = random.Random(13)
    alpha = "abcdef"
    texts = [" ".join("".join(rng.choice(alpha)
                              for _ in range(rng.randint(1, 8)))
                      for _ in range(rng.randint(3, 12)))
             for _ in range(8)]
    docs = _docs(spark, texts)
    merges = [(r["lhs"], r["rhs"])
              for r in learn_bpe_merges(docs, 5).collect()]
    for r in segment_words(docs, merges).collect():
        assert "".join(r["pieces"]) == r["w"], (r["w"], list(r["pieces"]))


def ref_bpe_batched(texts, n_rounds, batch_k):
    """Reference batched recurrence: per round, top batch_k candidates
    by (count DESC, pair ASC); greedy-accept iff symbol-disjoint from
    every already-accepted pair this round; apply in acceptance order."""
    from collections import Counter
    wc = Counter()
    for t in texts:
        wc.update(t.lower().split())
    words = {w: list(w) for w in wc}

    def apply_merge(a, b):
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out

    merges, step = [], 0
    for _ in range(n_rounds):
        pairs = Counter()
        for w, sym in words.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] += wc[w]
        if not pairs:
            break
        cands = sorted(pairs.items(),
                       key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:batch_k]
        accepted = []
        for (a, b), total in cands:
            if any(x in (a, b) for pa, pb, _ in accepted for x in (pa, pb)):
                continue
            accepted.append((a, b, total))
        for a, b, total in accepted:
            merges.append((step, a, b, a + b, total))
            step += 1
            apply_merge(a, b)
    return merges, words


def test_batched_k1_equals_sequential(spark):
    from rdflib_jsonld_spark.operators.bpe import learn_bpe_batched
    seq = [tuple(r) for r in
           learn_bpe_merges(_docs(spark, TEXTS), 6).collect()]
    bat = [tuple(r) for r in
           learn_bpe_batched(_docs(spark, TEXTS), n_rounds=6,
                             batch_k=1).collect()]
    assert bat == seq


def test_batched_matches_reference_recurrence(spark):
    from rdflib_jsonld_spark.operators.bpe import learn_bpe_batched
    got = [tuple(r) for r in
           learn_bpe_batched(_docs(spark, TEXTS), n_rounds=3,
                             batch_k=4).collect()]
    ref, _ = ref_bpe_batched(TEXTS, 3, 4)
    assert got == ref


def test_batched_equals_sequential_when_no_conflict(spark):
    # disjoint 2-symbol words with well-separated counts: merging one
    # creates no new pairs, so batched == fully-sequential exactly
    from rdflib_jsonld_spark.operators.bpe import learn_bpe_batched
    texts = [" ".join(["xy"] * 5 + ["pq"] * 4 + ["rs"] * 3)]
    seq = [tuple(r) for r in
           learn_bpe_merges(_docs(spark, texts), 3).collect()]
    bat = [tuple(r) for r in
           learn_bpe_batched(_docs(spark, texts), n_rounds=1,
                             batch_k=3).collect()]
    assert bat == seq and len(bat) == 3


def test_batched_conflict_defers_to_next_round(spark):
    # top-2 candidates share 'b': round 1 accepts only (a,b); (b,c)
    # lands in round 2 with its (unchanged) count — equals sequential
    from rdflib_jsonld_spark.operators.bpe import learn_bpe_batched
    texts = [" ".join(["ab"] * 5 + ["bc"] * 4)]
    bat = [tuple(r) for r in
           learn_bpe_batched(_docs(spark, texts), n_rounds=2,
                             batch_k=2).collect()]
    seq = [tuple(r) for r in
           learn_bpe_merges(_docs(spark, texts), 2).collect()]
    assert bat == seq
    assert [(m[1], m[2]) for m in bat] == [("a", "b"), ("b", "c")]
