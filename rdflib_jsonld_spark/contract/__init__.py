"""Driver-contract query modules (split from __spark_entry__.py, VERDICT r03 #4).

Also owns the merged-registry ordering: the driver's CORRECTNESS gate
samples exactly the first 50 ``queries()`` entries in dict order, so a
plain ``{**kg, **relational, **docs}`` merge left the 47 doc_/emb_
LLM-pipeline queries invisible to four rounds of driver verification
(VERDICT r04 "What's wrong #1"). ``interleave_registries`` round-robins
the merged dict across the four name domains (kg_*, doc_*, emb_*,
everything else) so every domain lands inside any length-N prefix
roughly in proportion, without changing the key set or the callables.
"""

from __future__ import annotations

from itertools import zip_longest


def interleave_registries(*dicts: dict) -> dict:
    """Merge dicts, then reorder keys round-robin across name domains.

    Domains are the first ``_``-separated token when it is one of
    ``kg``/``doc``/``emb``; all other prefixes (tpch, events, lineitem,
    orders, customers, returnflag, supplier, multimodal) share a single
    "relational/other" bucket. Within a domain the original insertion
    order is preserved, so the flagship kg_entity_counts_documents stays
    first overall.
    """
    merged: dict = {}
    for d in dicts:
        merged.update(d)
    buckets: dict[str, list] = {"kg": [], "doc": [], "emb": [], "other": []}
    for name in merged:
        prefix = name.split("_", 1)[0]
        buckets[prefix if prefix in ("kg", "doc", "emb") else "other"].append(name)
    out: dict = {}
    for group in zip_longest(*buckets.values()):
        for name in group:
            if name is not None:
                out[name] = merged[name]
    return out
