"""Deterministic synthetic transcript source (FIXTURES.md §1).

Schema is the driver-mandated `input_hint` shape (BASELINE.json:16):
``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp``. Turn text embeds 0-3 JSON-LD mention documents in fenced
blocks; some turns carry none (recall path) and some carry malformed JSON
(error path). Everything is a pure function of (seed, conv_id) so the table
can be generated *distributed* with ``spark.range(n).mapInPandas`` — no
driver-side materialization, no collected state — and regenerating any
partition yields identical bytes (the property that makes per-partition
resume meaningful, SURVEY.md §4.3.3).

Entity model (FIXTURES.md §5): a closed vocabulary of ``N_ENTITIES``
entities with zipf popularity (entity 0 is "hot" → exercises salted
aggregation/skew paths, SURVEY.md §2.E6/F6). Entity ``i`` owns
``1 + i % 3`` alias IRIs ``kge:e/{i}/a{j}``; mentions reference a random
alias, and every mention of alias j>0 ships owl:sameAs chain statements
j→j-1→…→0 in the same fenced block, so connected components can provably
recover the gold clustering ``alias → kge:e/{i}/a0``.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .registry import CONTEXT_V1_IRI, KG

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

FENCE_OPEN = "```ld\n"
FENCE_CLOSE = "\n```"

N_ENTITIES = 500
ROLES = ("user", "assistant", "tool")
TOOLS = ("search", "lookup", "calc", "browse")

_W1 = ("quantum", "amber", "crimson", "delta", "echo", "falcon", "granite",
       "harbor", "ivory", "jade", "kestrel", "lumen", "meridian", "nimbus",
       "onyx", "prairie", "quartz", "raven", "sierra", "tundra")
_W2 = ("systems", "widget", "labs", "dynamics", "forge", "works", "collective",
       "union", "holdings", "partners", "industries", "logic", "networks",
       "analytics", "robotics")
_FILLER = ("the", "user", "asked", "about", "we", "looked", "into", "records",
           "for", "and", "found", "that", "it", "relates", "to", "several",
           "known", "entities", "in", "this", "conversation", "context",
           "earlier", "turn", "mentioned", "details", "follow", "below")


def entity_base_name(i: int) -> str:
    return f"{_W1[i % len(_W1)]} {_W2[(i * 7) % len(_W2)]} {i}"


def entity_n_aliases(i: int) -> int:
    return 1 + i % 3


def alias_iri(i: int, j: int) -> str:
    return f"{KG}e/{i}/a{j}"


def canonical_iri(i: int) -> str:
    return alias_iri(i, 0)


def surface_variant(base: str, v: int) -> str:
    return (base, base.title(), base.replace(" ", "-"), base.upper(),
            base + " inc")[v % 5]


def _zipf_weights(n: int, s: float = 1.1) -> list[float]:
    return [1.0 / (r ** s) for r in range(1, n + 1)]


_ZIPF = _zipf_weights(N_ENTITIES)
_BASE_TS = datetime(2024, 1, 1)


def _mention_block(rng: random.Random, conv: str, turn: int, k: int) -> str:
    ent = rng.choices(range(N_ENTITIES), weights=_ZIPF, k=1)[0]
    n_alias = entity_n_aliases(ent)
    j = rng.randrange(n_alias)
    base = entity_base_name(ent)
    surface = surface_variant(base, rng.randrange(5))
    mention = {
        "id": f"{KG}m/{conv}/{turn}/{k}",
        "@type": "Mention",
        "surface": surface,
        "about": alias_iri(ent, j),
        "turn": f"{KG}conv/{conv}/turn/{turn}",
        "confidence": round(rng.uniform(0.5, 1.0), 3),
    }
    if rng.random() < 0.25:
        mention["label"] = {"en": base, "de": base + " GmbH"}
    if rng.random() < 0.2:
        mention["tags"] = base.split(" ")[:2]
    nodes = [mention]
    # sameAs chain down to a0 guarantees gold-recoverable components.
    for jj in range(j, 0, -1):
        nodes.append({"id": alias_iri(ent, jj),
                      "sameAs": alias_iri(ent, jj - 1)})
    doc = {"@context": CONTEXT_V1_IRI, "@graph": nodes} if len(nodes) > 1 \
        else {"@context": CONTEXT_V1_IRI, **mention}
    return FENCE_OPEN + json.dumps(doc, sort_keys=True) + FENCE_CLOSE


def _turn_text(rng: random.Random, conv: str, turn: int) -> str:
    parts = [" ".join(rng.choices(_FILLER, k=rng.randrange(4, 14)))]
    n_mentions = rng.choices((0, 1, 2, 3), weights=(25, 45, 22, 8), k=1)[0]
    for k in range(n_mentions):
        parts.append(_mention_block(rng, conv, turn, k))
        parts.append(" ".join(rng.choices(_FILLER, k=rng.randrange(2, 8))))
    if rng.random() < 0.02:  # malformed-JSON error path
        parts.append(FENCE_OPEN + '{"broken": unquoted' + FENCE_CLOSE)
    return " ".join(parts)


def generate_conv(seed: int, conv_n: int) -> list[dict]:
    """All turns of one conversation — pure function of (seed, conv_n)."""
    conv = f"conv_{conv_n:08d}"
    rng = random.Random(f"{seed}:{conv_n}")
    # zipf-skewed turn counts: every 1000th conv is hot (FIXTURES.md §1)
    n_turns = rng.randrange(150, 250) if conv_n % 1000 == 7 \
        else rng.randrange(2, 13)
    t0 = _BASE_TS + timedelta(seconds=conv_n % 86400, days=conv_n % 365)
    rows = []
    for turn in range(n_turns):
        role = ROLES[turn % len(ROLES)]
        rows.append({
            "conv_id": conv,
            "turn_idx": turn,
            "role": role,
            "text": _turn_text(rng, conv, turn),
            "tool": rng.choice(TOOLS) if role == "tool" else None,
            "ts": t0 + timedelta(seconds=30 * turn + (conv_n + turn) % 17),
        })
    return rows


def transcripts_df(spark: SparkSession, n_convs: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: ``spark.range`` over conv
    numbers → ``mapInPandas`` → transcript rows. Hash-partitioned on the
    range so hot conversations spread across tasks."""
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv_n in pdf["id"]:
                out.extend(generate_conv(seed, int(conv_n)))
            if out:
                yield pd.DataFrame(out)

    base = spark.range(0, n_convs, numPartitions=partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def write_transcripts(spark: SparkSession, path: str, n_convs: int,
                      seed: int = 42, partitions: int | None = None) -> None:
    """Materialize to parquet partition-ranged by conv hash (the sandbox
    stand-in for an Iceberg table bucket(conv_id) layout, SURVEY.md §7 M4
    risk R1)."""
    transcripts_df(spark, n_convs, seed, partitions).write.mode("overwrite") \
        .parquet(path)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
