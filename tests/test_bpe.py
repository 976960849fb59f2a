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
