"""Exact-recall fuzzy join vs brute-force Levenshtein."""

import pytest

from rdflib_jsonld_spark.operators.fuzzy import fuzzy_pairs


def lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute(rows, d):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            dist = lev(sa, sb)
            if dist <= d:
                out.add((a, b, dist))
    return out


@pytest.mark.usefixtures("spark")
class TestFuzzyPairs:
    def _run(self, spark, rows, d):
        df = spark.createDataFrame(rows, ["id", "s"])
        return {tuple(r) for r in fuzzy_pairs(df, max_dist=d).collect()}

    def test_matches_bruteforce_random(self, spark):
        import random
        rng = random.Random(31)
        rows = [(i, "".join(rng.choice("abcd")
                            for _ in range(rng.randint(0, 8))))
                for i in range(60)]
        for d in (1, 2):
            assert self._run(spark, rows, d) == brute(rows, d)

    def test_exact_recall_on_adversarial_edits(self, spark):
        base = "supplier-0042"
        rows = [(0, base),
                (1, "Xupplier-0042"),     # substitution at segment 0
                (2, "supplier-004"),      # deletion at the end
                (3, "supplier-00422"),    # insertion at the end
                (4, "suppliers0042"),     # substitution mid-string
                (5, "supplier-9042"),     # substitution in segment 2
                (6, "spplier-0042"),      # deletion in segment 0
                (7, "totally different")]
        got = self._run(spark, rows, 1)
        assert got == brute(rows, 1)
        assert all((0, i) in {(a, b) for a, b, _ in got}
                   for i in (1, 2, 3, 4, 5, 6))

    def test_short_strings_covered(self, spark):
        rows = [(0, "a"), (1, "b"), (2, ""), (3, "ab"), (4, "cd")]
        for d in (1, 2):
            assert self._run(spark, rows, d) == brute(rows, d)

    def test_identical_strings_distance_zero(self, spark):
        rows = [(0, "same"), (1, "same"), (2, "sams")]
        got = self._run(spark, rows, 1)
        assert (0, 1, 0) in got and (0, 2, 1) in got and (1, 2, 1) in got

    def test_bad_dist_rejected(self, spark):
        df = spark.createDataFrame([(0, "x")], ["id", "s"])
        with pytest.raises(ValueError):
            fuzzy_pairs(df, max_dist=0)
