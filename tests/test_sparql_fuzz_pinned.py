"""Always-on scaled-down random-query SPARQL differential.

The full campaigns (tools/sparql_fuzz.py, sweeps 37-38) run thousands
of seeds; this pinned version keeps a small always-green slice in the
suite so the query surface — BGP/OPTIONAL/UNION/MINUS/FILTER/BIND/
VALUES/GRAPH, property paths, sub-SELECTs, aggregates + HAVING, ORDER
BY/LIMIT/OFFSET — stays covered by the engine-vs-naive-evaluator
comparison on every run (CLAUDE.md r05 lesson: pin a reduced always-on
version of every fuzz program).
"""
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "tools"))

N_SEEDS = int(os.environ.get("SPARQL_FUZZ_PINNED_N", "40"))


@pytest.mark.parametrize("chunk", range(4))
def test_random_query_differential(spark, chunk):
    import sparql_fuzz as sf

    stats = Counter()
    failures = []
    per = N_SEEDS // 4
    for seed in range(chunk * per, (chunk + 1) * per):
        div = sf.run_one(spark, seed, stats)
        if div is not None:
            failures.append((seed, div[0], div[1], div[3]))
    assert not failures, failures
