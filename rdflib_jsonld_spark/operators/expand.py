"""Transcript → quad-table expansion stage (the Spark face of to-rdf).

One fused ``mapInPandas`` pass per input partition: regex-extract fenced
JSON-LD blocks from turn text, parse, run the pure to-rdf core
(rdflib_jsonld_spark.jsonld.tordf — SURVEY.md §2.D1-D11/C3-C6), and emit
quad rows with (conv_id, turn_idx) lineage columns. Fusing extraction and
expansion keeps the whole per-turn path NARROW (zero shuffles until
linking — SURVEY.md §3.4) and crosses the Arrow boundary once.

Scale notes:
- The resolved @context is constructed once per executor from the
  broadcast registry (SURVEY.md §1.2), not per row.
- Blank-node labels are ``{conv_id}/{turn_idx}/{block}#{n}`` — globally
  unique and deterministic, so re-running any partition reproduces
  identical rows (resume-safe; replaces rdflib's process-global BNode
  counter, SURVEY.md §4.3.1 / D11).
- Malformed JSON blocks are counted and dropped (B3 error path); counts
  surface via the `_kg_errors` column of `expand_with_metrics`.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from rdflib_jsonld_spark.jsonld.context import Context
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, to_rdf
from rdflib_jsonld_spark.sources.registry import CONTEXT_V1_IRI, REGISTRY

QUAD_SCHEMA = T.StructType([
    T.StructField("g", T.StringType(), True),
    T.StructField("s", T.StringType(), False),
    T.StructField("s_is_bnode", T.BooleanType(), False),
    T.StructField("p", T.StringType(), False),
    T.StructField("o_kind", T.StringType(), False),
    T.StructField("o_value", T.StringType(), False),
    T.StructField("o_datatype", T.StringType(), True),
    T.StructField("o_lang", T.StringType(), True),
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
])

QUAD_COLS = [f.name for f in QUAD_SCHEMA.fields]
#: The quad identity (graph set semantics, G4) excludes lineage columns.
QUAD_KEY_COLS = ["g", "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"]

_FENCE_RE = re.compile(r"```ld\n(.*?)\n```", re.DOTALL)


def extract_blocks(text: str) -> list[str]:
    """Fenced JSON-LD blocks in a turn's text (A1 source stage)."""
    return _FENCE_RE.findall(text)


def _term_cols(t: tuple) -> tuple[str, bool]:
    """term → (string form, is_bnode). Bnodes keep the '_:' prefix;
    quoted triples (JSON-LD-star @annotation / embedded @id) take the
    canonical '<< … >>' table spelling (operators/star.py)."""
    if t[0] == BNODE:
        return "_:" + t[1], True
    if t[0] == "qt":
        from rdflib_jsonld_spark.operators.star import term_to_star
        return term_to_star(t), False
    return t[1], False


def quads_for_turn(conv_id: str, turn_idx: int, text: str,
                   ctx: Context,
                   registry: dict | None = None) -> tuple[list[tuple], int]:
    """Pure per-turn worker: returns (quad rows, n_parse_errors)."""
    reg = registry if registry is not None else REGISTRY
    rows: list[tuple] = []
    errors = 0
    for k, block in enumerate(extract_blocks(text)):
        try:
            doc = json.loads(block)
        except (ValueError, RecursionError):
            # RecursionError: maliciously deep JSON must count as a parse
            # error, not kill the executor task (one bad doc ≠ dead job)
            errors += 1
            continue
        if isinstance(doc, dict) and doc.get("@context") == CONTEXT_V1_IRI:
            doc = {key: v for key, v in doc.items() if key != "@context"}
            local_ctx = ctx  # broadcast-resolved fast path
        else:
            local_ctx = None
        try:
            quads = to_rdf(doc, ctx=local_ctx, registry=reg,
                           bnode_prefix=f"{conv_id}/{turn_idx}/{k}#")
        except Exception:
            errors += 1
            continue
        for g, s, p, o in quads:
            g_str = _term_cols(g)[0] if g is not None else None
            s_str, s_bn = _term_cols(s)
            p_str, _ = _term_cols(p)
            if o[0] == LIT:
                _, lex, dt, lang = o
                rows.append((g_str, s_str, s_bn, p_str, "literal", lex,
                             dt, lang, conv_id, turn_idx))
            else:
                o_str, o_bn = _term_cols(o)
                o_kind = "bnode" if o_bn else (
                    "triple" if o[0] == "qt" else "iri")
                rows.append((g_str, s_str, s_bn, p_str, o_kind, o_str,
                             None, None, conv_id, turn_idx))
    return rows, errors


def expand_transcripts(transcripts: DataFrame,
                       registry: dict | None = None) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, …) → quads DataFrame.

    Narrow (no shuffle): one Arrow-batched pass per input partition.
    Column pruning: only (conv_id, turn_idx, text) are read — with a
    parquet source Catalyst pushes this into the scan (ReadSchema).
    ``registry`` merges extra pre-fetched remote contexts over the
    built-in one (sources/registry.py load_registry_dir).
    """
    pruned = transcripts.select("conv_id", "turn_idx", "text")
    reg = {**REGISTRY, **(registry or {})}

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = Context(registry=reg).load(CONTEXT_V1_IRI)
        for pdf in batches:
            out: list[tuple] = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                rows, _ = quads_for_turn(conv_id, int(turn_idx), text, ctx,
                                         registry=reg)
                out.extend(rows)
            if out:
                yield pd.DataFrame(out, columns=QUAD_COLS)

    return pruned.mapInPandas(expand, schema=QUAD_SCHEMA)


METRICS_SCHEMA = T.StructType(QUAD_SCHEMA.fields + [
    T.StructField("_kg_errors", T.IntegerType(), False),
])


def expand_with_metrics(transcripts: DataFrame,
                        registry: dict | None = None) -> DataFrame:
    """Variant that carries per-turn parse-error counts for the lineage/
    metrics sink (SURVEY.md §4.3.3). Error turns emit a sentinel row with
    s='_:error' so counts survive even when no quads do."""
    pruned = transcripts.select("conv_id", "turn_idx", "text")
    reg = {**REGISTRY, **(registry or {})}

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = Context(registry=reg).load(CONTEXT_V1_IRI)
        for pdf in batches:
            out: list[tuple] = []
            for conv_id, turn_idx, text in zip(
                    pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
                rows, errs = quads_for_turn(conv_id, int(turn_idx), text,
                                            ctx, registry=reg)
                out.extend(r + (0,) for r in rows)
                if errs:
                    out.append((None, "_:error", True, "_:error", "literal",
                                "", None, None, conv_id, int(turn_idx), errs))
            if out:
                yield pd.DataFrame(out, columns=QUAD_COLS + ["_kg_errors"])

    return pruned.mapInPandas(expand, schema=METRICS_SCHEMA)


def dedup_quads(quads: DataFrame) -> DataFrame:
    """Graph set semantics (G4): rdflib Graph.add is idempotent — the
    relational equivalent is dropDuplicates over the quad identity
    (lineage keeps the first witness)."""
    return quads.dropDuplicates(QUAD_KEY_COLS)
