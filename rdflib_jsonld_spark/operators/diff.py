"""Graph diff / set algebra over quad tables (SURVEY.md §2.G4 + F5).

rdflib graphs are sets; the relational equivalents:
- union + dropDuplicates = graph merge (G4)
- exceptAll both ways    = graph diff (the oracle/diff join F5: anti joins
  give false-positive / false-negative sets directly)
- intersect              = common subgraph

Used by the resume tests and by P/R computation between a candidate quad
table and an oracle table at any scale (no collect)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .expand import QUAD_KEY_COLS


def _keyed(df: DataFrame) -> DataFrame:
    return df.select(*QUAD_KEY_COLS).dropDuplicates(QUAD_KEY_COLS)


def graph_union(a: DataFrame, b: DataFrame) -> DataFrame:
    return _keyed(a).unionByName(_keyed(b)).dropDuplicates(QUAD_KEY_COLS)


def graph_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return _keyed(a).intersect(_keyed(b))


def _nullsafe_cond(a: DataFrame, b: DataFrame):
    """g/o_datatype/o_lang are nullable: a plain equi-join never matches
    NULL=NULL, so the identity join must be null-safe (<=>)."""
    cond = None
    for c in QUAD_KEY_COLS:
        eq = a[c].eqNullSafe(b[c])
        cond = eq if cond is None else cond & eq
    return cond


def graph_diff(ours: DataFrame, oracle: DataFrame) -> dict[str, DataFrame]:
    """{'both', 'only_ours' (false pos), 'only_oracle' (false neg)} via
    null-safe semi/anti joins on the quad identity (F5)."""
    a, b = _keyed(ours).alias("a"), _keyed(oracle).alias("b")
    return {
        "both": a.join(b, _nullsafe_cond(a, b), "left_semi"),
        "only_ours": a.join(b, _nullsafe_cond(a, b), "left_anti"),
        "only_oracle": b.join(a, _nullsafe_cond(b, a), "left_anti"),
    }


def precision_recall(ours: DataFrame, oracle: DataFrame) -> dict[str, float]:
    """Distributed quad-level P/R (NOTE: label-sensitive — run both sides
    through the same deterministic bnode labeling, as the pipeline does)."""
    d = graph_diff(ours, oracle)
    tp = d["both"].count()
    fp = d["only_ours"].count()
    fn = d["only_oracle"].count()
    return {
        "tp": tp, "fp": fp, "fn": fn,
        "precision": tp / (tp + fp) if tp + fp else 1.0,
        "recall": tp / (tp + fn) if tp + fn else 1.0,
    }
