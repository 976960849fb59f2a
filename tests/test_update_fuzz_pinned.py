"""Always-on scaled-down random SPARQL Update differential
(tools/update_fuzz.py, sweep 39) — INSERT/DELETE DATA, DELETE WHERE,
the modify form with WITH/USING, CLEAR/DROP, ADD/COPY/MOVE, compared
against the naive store application on every suite run."""
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                "..", "tools"))

N_SEEDS = int(os.environ.get("UPDATE_FUZZ_PINNED_N", "24"))


@pytest.mark.parametrize("chunk", range(2))
def test_random_update_differential(spark, chunk):
    import update_fuzz as uf

    stats = Counter()
    failures = []
    per = N_SEEDS // 2
    for seed in range(chunk * per, (chunk + 1) * per):
        div = uf.run_one(spark, seed, stats)
        if div is not None:
            failures.append((seed, div[0], div[1], div[3]))
    assert not failures, failures
