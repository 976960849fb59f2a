"""IRI / bnode column functions (H1/H6; relational twins of
[v0.5.0] util.py split_iri — SURVEY.md §2.A8)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: split at the last '#', '/', or ':' — namespace keeps the separator.
_NS_RE = r"^(.*[#/:])[^#/:]*$"
_LOCAL_RE = r"^.*[#/:]([^#/:]*)$"


def iri_namespace(col) -> Column:
    """Namespace part of an IRI (prefix-discovery key for auto-compaction,
    E4): everything up to and including the last gen-delim."""
    return F.regexp_extract(col, _NS_RE, 1)


def iri_local_name(col) -> Column:
    return F.regexp_extract(col, _LOCAL_RE, 1)


def is_bnode(col) -> Column:
    return F.col(col).startswith("_:") if isinstance(col, str) \
        else col.startswith("_:")


def bnode_label(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.startswith("_:"), F.substring(c, 3, 2 ** 31 - 1)) \
        .otherwise(None)


def quad_identity_hash() -> Column:
    """64-bit hash over the quad identity columns (G4 set key) — the
    shuffle-friendly stand-in for shipping whole quads."""
    return F.xxhash64(
        F.coalesce(F.col("g"), F.lit("")), F.col("s"), F.col("p"),
        F.col("o_kind"), F.col("o_value"),
        F.coalesce(F.col("o_datatype"), F.lit("")),
        F.coalesce(F.col("o_lang"), F.lit("")))
