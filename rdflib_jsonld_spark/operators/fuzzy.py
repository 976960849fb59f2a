"""Exact-recall fuzzy string join (edit distance ≤ d) at scale.

Entity surfaces arrive misspelled; the linking family needs a
similarity JOIN on strings with a guaranteed-recall candidate stage
(the LSH dedup operators are probabilistic by design — this one is
exact). Algorithm: segment-pigeonhole candidate generation in the
PassJoin style (Li, Deng, Jiang, Feng 2011, public methodology):

    partition every string into d+1 contiguous segments (even split);
    if ed(s, t) ≤ d then t contains at least ONE of s's segments as an
    exact substring, starting within ±d of its position in s.

So the join key is ``(segment text, segment index, seg-side length)``:
one side emits its d+1 segments, the other emits — for every partner
length l within ±d of its own and every segment index — the substrings
at the allowed starts. Candidates are verified with the built-in
``levenshtein`` (JVM codegen; DuckDB has the same function, which is
what makes the oracle able to brute-force the identical answer).

Scale posture: per string the seg side emits d+1 rows and the sub side
O((2d+1)²·(d+1)) rows — constants, not data-dependent blowup; the
equi-join key spreads on segment text; the only shuffle is that join
plus a pair-dedup. Never all-pairs: the brute-force O(n²) comparison
exists ONLY in the test oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _seg_bounds(L, k):
    """start/length of segment i for a string of length L split into k
    even parts: base = L div k, rem = L mod k; seg i (0-based) has
    length base + (i < rem), start i*base + min(i, rem). Pure integer
    arithmetic — replicated verbatim in the SQL oracle."""
    base = F.floor(L / k).cast("int")
    rem = (L % k).cast("int")

    def length(i):
        return base + F.when(i < rem, 1).otherwise(0)

    def start(i):
        return i * base + F.least(i, rem)

    return start, length


def fuzzy_pairs(df: DataFrame, id_col: str = "id", str_col: str = "s",
                max_dist: int = 1) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with
    ``levenshtein(s_a, s_b) ≤ max_dist`` and ``id_a < id_b`` —
    exact (guaranteed recall), no all-pairs comparison."""
    if max_dist < 1:
        raise ValueError("max_dist must be ≥ 1")
    d = int(max_dist)
    k = d + 1
    base = df.select(F.col(id_col).alias("_id"),
                     F.col(str_col).alias("_s"),
                     F.length(str_col).cast("int").alias("_len"))

    # ---- segment side: the d+1 even segments of each string ----------
    start, length = _seg_bounds(F.col("_len"), k)
    segs = (base.where(F.col("_len") >= k)
            .select("_id", "_s", "_len",
                    F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"))
            .select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
                    F.col("_len").alias("len_a"), "i",
                    F.substring(F.col("_s"), start(F.col("i")) + 1,
                                length(F.col("i"))).alias("seg")))

    # ---- substring side: for every partner length l in ±d and every
    # segment index, the substrings at starts within ±d of the
    # partner-segment position --------------------------------------
    cands = (base
             .select("_id", "_s", "_len",
                     F.explode(F.sequence(
                         F.greatest(F.col("_len") - d, F.lit(1)),
                         F.col("_len") + d)).alias("l"))
             .select("_id", "_s", "_len", "l",
                     F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i")))
    pstart, plength = _seg_bounds(F.col("l"), k)
    cands = cands.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
        F.col("l"), F.col("i"),
        pstart(F.col("i")).alias("ps"), plength(F.col("i")).alias("pl"))
    lo = F.greatest(F.col("ps") - d, F.lit(0))
    hi = F.least(F.col("ps") + d, F.length("s_b") - F.col("pl"))
    cands = (cands.where(F.col("pl") > 0)
             # guard hi >= lo: Spark's sequence(a, b) DESCENDS when
             # a > b instead of being empty
             .where(hi >= lo)
             .select("id_b", "s_b", "l", "i", "pl",
                     F.explode(F.sequence(lo, hi)).alias("p"))
             .select("id_b", "s_b", "l", "i",
                     F.substring(F.col("s_b"), F.col("p") + 1,
                                 F.col("pl")).alias("seg")))

    pairs = (segs.join(cands,
                       (segs.seg == cands.seg) & (segs.i == cands.i)
                       & (segs.len_a == cands.l)
                       & (segs.id_a < cands.id_b))
             .select("id_a", "s_a", "id_b", "s_b"))

    # strings SHORTER than d+1 segments fall outside the pigeonhole
    # scheme (they cannot be split into d+1 nonempty parts) — pair them
    # by length band instead. The short side's DISTINCT value set is
    # alphabet-bounded (|Σ|^d values at most), so this never approaches
    # all-pairs.
    shorts = base.where(F.col("_len") < k) \
        .select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
                F.col("_len").alias("len_a"))
    others = base.select(F.col("_id").alias("id_b"),
                         F.col("_s").alias("s_b"),
                         F.col("_len").alias("len_b"))
    short_pairs = (shorts.join(
        others,
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= d))
        .select("id_a", "s_a", "id_b", "s_b"))
    # the symmetric case: a LONG a paired with a short b (id order put
    # the short one second)
    shorts_b = base.where(F.col("_len") < k) \
        .select(F.col("_id").alias("id_b"), F.col("_s").alias("s_b"),
                F.col("_len").alias("len_b"))
    longs_a = base.where(F.col("_len") >= k) \
        .select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"),
                F.col("_len").alias("len_a"))
    short_pairs2 = (longs_a.join(
        shorts_b,
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= d))
        .select("id_a", "s_a", "id_b", "s_b"))

    all_pairs = (pairs.unionByName(short_pairs)
                 .unionByName(short_pairs2)
                 .dropDuplicates(["id_a", "id_b"]))
    return (all_pairs
            .withColumn("dist", F.levenshtein("s_a", "s_b"))
            .where(F.col("dist") <= d)
            .select("id_a", "id_b", "dist"))
