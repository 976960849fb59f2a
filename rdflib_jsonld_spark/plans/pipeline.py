"""The north-star KG-construction pipeline, end to end (SURVEY.md §3.4).

    transcripts(conv_id, turn_idx, role, text, tool, ts)
      → [narrow]  fused extract+expand (mapInPandas; ctx broadcast)
      → [shuffle] graph-set dedup (G4)
      → [shuffle] blocking + sameAs edges → large/small-star CC (F1/F2)
      → [bcast]   canonical rewrite (F3)
      → [shuffle] write bucket(s)-partitioned quad table (M4)

All per-turn work is shuffle-free until linking; the canonical map is
broadcast (entities ≪ quads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdflib_jsonld_spark.operators.expand import (
    dedup_quads, expand_transcripts)
from rdflib_jsonld_spark.operators.linking import (
    canonical_mapping, canonicalize_quads, entity_mention_counts)


def build_session(master: str = "local[*]", app: str = "kg-pipeline",
                  shuffle_partitions: int | None = None,
                  driver_memory: str | None = None) -> SparkSession:
    """Session defaults tuned for the pipeline: AQE on (skew join +
    coalesce), Arrow on (vectorized Python exchange). ``driver_memory``
    only takes effect when the builder launches the JVM (plain-python
    local mode — the bench); under spark-submit the submit args win."""
    b = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if driver_memory:
        b = b.config("spark.driver.memory", driver_memory)
    return b.getOrCreate()


def register_views(stages: dict[str, DataFrame],
                   prefix: str = "kg_") -> list[str]:
    """Expose pipeline stages as temp views so users can `spark.sql` over
    the constructed graph (quads/mapping/canonical_quads/entity_counts) —
    Catalyst produces the same plans either way (SQL API parity)."""
    names = []
    for key, df in stages.items():
        name = f"{prefix}{key}"
        df.createOrReplaceTempView(name)
        names.append(name)
    return names


def construct_graph(transcripts: DataFrame) -> dict[str, DataFrame]:
    """Full pipeline; returns the intermediate + final DataFrames so
    callers (tests, bench, driver contract) can pick their stage."""
    quads_raw = expand_transcripts(transcripts)
    # persisted: every downstream stage (CC, rewrite, counts) actions it;
    # the production path materializes this table instead (run_pipeline)
    quads = dedup_quads(quads_raw).persist()
    mapping = canonical_mapping(quads)
    canon = canonicalize_quads(quads, mapping)
    counts = entity_mention_counts(quads, mapping)
    return {
        "quads_raw": quads_raw,
        "quads": quads,
        "mapping": mapping,
        "canonical_quads": canon,
        "entity_counts": counts,
    }
