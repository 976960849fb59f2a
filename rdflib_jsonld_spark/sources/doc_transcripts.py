"""Derive transcript rows from the driver's ``documents`` parquet table.

Purpose: connect /root/testdata to the KG pipeline with a construction
whose *expected output is arithmetically predictable from doc_id alone* —
this is what lets the DuckDB oracle check the ENTIRE
expand→link→canonicalize pipeline end-to-end (see __spark_entry__.py
``kg_entity_counts_documents``):

- entity          = doc_id % 500
- alias index j   = doc_id % (1 + entity % 3)
- surface variant = doc_id % 5  (all variants normalize to one block key)
- the fenced block carries the mention + the owl:sameAs chain j→…→0,
  so CC provably maps every alias to kge:e/{entity}/a0.

Everything below is JVM-side column algebra (format_string/concat/element_at)
— the mention JSON is assembled without any Python UDF, so the derivation
itself adds no Python cost at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .registry import CONTEXT_V1_IRI, KG
from .transcripts import _W1, _W2, FENCE_CLOSE, FENCE_OPEN

N_ENTITIES = 500


def documents_as_transcripts(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → transcript rows
    (conv_id=source, turn_idx=row_number-1) whose text embeds exactly one
    deterministic fenced mention document."""
    ent = F.col("doc_id") % N_ENTITIES
    n_alias = F.lit(1) + (ent % 3)
    j = F.col("doc_id") % n_alias

    w1 = F.array(*[F.lit(w) for w in _W1])
    w2 = F.array(*[F.lit(w) for w in _W2])
    base = F.concat_ws(
        " ",
        F.element_at(w1, (ent % len(_W1) + 1).cast("int")),
        F.element_at(w2, ((ent * 7) % len(_W2) + 1).cast("int")),
        ent.cast("string"),
    )
    variant = F.element_at(
        F.array(
            base,
            F.initcap(base),
            F.translate(base, " ", "-"),
            F.upper(base),
            F.concat(base, F.lit(" inc")),
        ),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )

    alias = F.concat(F.lit(f"{KG}e/"), ent.cast("string"),
                     F.lit("/a"), j.cast("string"))
    turn_iri = F.concat(F.lit(f"{KG}conv/"), F.col("source"),
                        F.lit("/turn/"), F.col("doc_id").cast("string"))
    mention_id = F.concat(F.lit(f"{KG}m/doc/"), F.col("doc_id").cast("string"))

    def alias_iri(jj):
        return F.concat(F.lit(f"{KG}e/"), ent.cast("string"),
                        F.lit("/a"), jj.cast("string"))

    # sameAs chain elements for j→j-1→…→0 (j ≤ 2 by construction)
    link1 = F.format_string(',{"id":"%s","sameAs":"%s"}',
                            alias_iri(F.lit(1)), alias_iri(F.lit(0)))
    link2 = F.format_string(',{"id":"%s","sameAs":"%s"}',
                            alias_iri(F.lit(2)), alias_iri(F.lit(1)))
    chain = (F.when(j >= 2, F.concat(link2, link1))
             .when(j >= 1, link1)
             .otherwise(F.lit("")))

    doc_json = F.format_string(
        '{"@context":"%s","@graph":[{"id":"%s","@type":"Mention",'
        '"surface":"%s","about":"%s","turn":"%s","confidence":0.9}%s]}',
        F.lit(CONTEXT_V1_IRI), mention_id, variant, alias, turn_iri, chain,
    )

    out = docs.select(
        F.col("source").alias("conv_id"),
        # doc_id IS the turn index: unique per conv by construction, and
        # avoiding a row_number() window kills a whole shuffle (a window
        # partitioned by the low-cardinality `source` would also funnel
        # the corpus through ≤|sources| skewed reducers at scale)
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.col("text"), F.lit(" " + FENCE_OPEN), doc_json,
                 F.lit(FENCE_CLOSE)).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
    )
    # the sandbox table is a single parquet file → one scan split; the
    # downstream expansion is CPU-bound Python, so spread it across the
    # cluster (tiny shuffle ≪ parallel speedup; real corpora arrive in
    # thousands of splits and skip this)
    spark = docs.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < n_parts:
        out = out.repartition(n_parts)
    return out
