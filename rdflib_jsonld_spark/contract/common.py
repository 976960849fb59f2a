"""Shared contract helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KG = "https://kg.example.org/"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"
