"""Whole-batch MinHash kernel parity (VERDICT r04 #2).

`_minhash_sig_batch` replaced the last per-document Python loop in the
dedup tier (dedup.py gen()'s zip loop) with one flat-buffer pass. These
tests pin bit-identical parity against the original per-doc recurrence
(`_char_shingles` + `_mix(sh ^ seed).min()`), including the edge docs
the old kernel handled (empty, shorter-than-k, unicode, None) and BOTH
adaptive branches (plain window lane vs lexsort shingle-dedup, which
only triggers on highly repetitive corpora).
"""

import random

import numpy as np

from rdflib_jsonld_spark.operators.dedup import (_char_shingles, _mix,
                                                 _minhash_sig_batch)

SEEDS = _mix(np.arange(1, 65, dtype=np.uint64)
             * np.uint64(0x9E3779B97F4A7C15))


def _ref_sig(text, k=5):
    sh = _char_shingles(text or "", k)
    return _mix(sh[:, None] ^ SEEDS[None, :]).min(axis=0).astype(np.int64)


def _assert_parity(texts, k=5):
    batch = _minhash_sig_batch(texts, SEEDS, k)
    assert batch.shape == (len(texts), len(SEEDS))
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], _ref_sig(t, k)), (i, t)


def test_edge_docs_bit_identical():
    _assert_parity(["", "a", "x" * 4, "x" * 5, None,
                    "hello  World\t x", "ünïcödé ☃ snow " * 7,
                    "日本語のテキストです" * 3, "aaaaa" * 200,
                    "the quick brown fox jumps over the lazy dog"])


def test_random_corpus_bit_identical():
    rng = random.Random(11)
    vocab = ["w%05d" % rng.randrange(99999) for _ in range(5000)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(1, 120)))
             for _ in range(400)]
    _assert_parity(texts)


def test_high_dup_corpus_takes_lexsort_branch_bit_identical():
    # 8-word vocab → sampled shingle-unique ratio < 0.6 → the kernel's
    # per-document lexsort dedup branch runs; parity must still hold
    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "xyz", "lorem",
             "ipsum", "dolor"]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(50, 400)))
             for _ in range(200)]
    _assert_parity(texts)


def test_other_shingle_k():
    _assert_parity(["short", "a bit longer text here", "", "yy"], k=9)


def test_empty_batch():
    out = _minhash_sig_batch([], SEEDS, 5)
    assert out.shape == (0, 64)
