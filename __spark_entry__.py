"""Driver contract for rdflib_jsonld_spark (spark-graft rounds).

Thin assembly module: entry()/queries()/oracle_sql() exactly as the
driver expects, with the ~110 query implementations and their DuckDB
oracle SQL split per domain into rdflib_jsonld_spark/contract/
{kg,relational,docs}.py (VERDICT r03 #4 - the 5k-line single file
made review intractable). Each module keeps its queries and oracles
adjacent in domain-local QUERIES/ORACLES dicts, merged here;
tests/test_contract_surface.py pins the no-shadowing and
registry==defs invariants across the split."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from rdflib_jsonld_spark.contract.common import KG, _t  # noqa: F401
from rdflib_jsonld_spark.contract import docs, kg, relational
from rdflib_jsonld_spark.contract import interleave_registries
from rdflib_jsonld_spark.contract.kg import *  # noqa: F401,F403
from rdflib_jsonld_spark.contract.relational import *  # noqa: F401,F403
from rdflib_jsonld_spark.contract.docs import *  # noqa: F401,F403
from rdflib_jsonld_spark.contract.kg import (  # noqa: F401
    _kg_entity_counts_documents)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → transcripts → expand → CC-link → canonical
    entity mention counts (top 20) on sf0.001."""
    return _kg_entity_counts_documents(spark, "/root/testdata/sf0.001", 20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2):
    name -> callable(spark, sf_dir) -> DataFrame. Round-robin ordered
    across kg/doc/emb/relational domains so the driver's first-50
    CORRECTNESS sample covers every domain (VERDICT r04 #1)."""
    return interleave_registries(kg.QUERIES, relational.QUERIES, docs.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every queries() entry (same parquet views);
    the driver compares rows/schema/values at sf=0.01. Ordered to
    mirror queries() exactly."""
    merged = {**kg.ORACLES, **relational.ORACLES, **docs.ORACLES}
    ordered = {name: merged[name] for name in queries() if name in merged}
    ordered.update({name: sql for name, sql in merged.items()
                    if name not in ordered})
    return ordered
