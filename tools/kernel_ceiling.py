"""Single-box scaling ceiling for the expansion kernel, WITHOUT Spark:
plain multiprocessing, pinned to N then 4N cores, same quads_for_turn
work. This isolates hardware (memory-bandwidth/turbo) limits from engine
overhead — the honest denominator for the BENCH_SCALING efficiency number
on a shared-memory box (independent cluster nodes don't share a bus).

Usage: python tools/kernel_ceiling.py [n_convs] [low_cpus] → one JSON
line (levels = low_cpus and 4*low_cpus, matching the Spark measurement).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdflib_jsonld_spark.sources import transcripts as tr  # noqa: E402

_ROWS: list = []
_CHUNK = 1000


def _work(chunk_idx: int) -> int:
    from rdflib_jsonld_spark.jsonld.context import Context
    from rdflib_jsonld_spark.operators.expand import quads_for_turn
    from rdflib_jsonld_spark.sources.registry import CONTEXT_V1_IRI, REGISTRY
    ctx = Context(registry=REGISTRY).load(CONTEXT_V1_IRI)
    lo, hi = chunk_idx * _CHUNK, min(len(_ROWS), (chunk_idx + 1) * _CHUNK)
    n = 0
    for conv, ti, text in _ROWS[lo:hi]:
        q, _ = quads_for_turn(conv, ti, text, ctx)
        n += len(q)
    return n


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = 4 * low
    for c in range(n_convs):
        _ROWS.extend((r["conv_id"], r["turn_idx"], r["text"])
                     for r in tr.generate_conv(42, c))
    nchunks = (len(_ROWS) + _CHUNK - 1) // _CHUNK
    out = {"n_turns": len(_ROWS), "low_cpus": low, "high_cpus": high}
    rates = {}
    for ncpu in (low, high):
        os.sched_setaffinity(0, set(range(ncpu)))
        with mp.Pool(ncpu) as p:
            p.map(_work, range(min(nchunks, ncpu)))  # warm
            t0 = time.time()
            sum(p.map(_work, range(nchunks)))
            rates[ncpu] = len(_ROWS) / (time.time() - t0)
    out["turns_per_sec_low"] = round(rates[low], 1)
    out["turns_per_sec_high"] = round(rates[high], 1)
    out["kernel_scaling_efficiency"] = round(rates[high] / rates[low] / 4.0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
