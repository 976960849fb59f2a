"""rdflib_jsonld_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of RDFLib/rdflib-jsonld
(JSON-LD → RDF expansion, context resolution, compaction / serialization; see
SURVEY.md) re-expressed Spark-first: the JSON-LD processing algorithms live in
a pure-Python, dependency-free core (``rdflib_jsonld_spark.jsonld``) that is
invoked from vectorized Arrow/pandas UDF stages (``mapInPandas`` /
``applyInPandas``) over DataFrames, while everything relational — grouping,
joins, entity-linking connected components, dedup, stats — is built from
native ``pyspark.sql`` operators so Catalyst/AQE optimize it.

Reference parity citations use the scheme documented in SURVEY.md §0:
``[checkout]`` = /root/reference file:line, ``[v0.5.0]`` = historical module
layout of the last full release, ``[spec]`` = W3C JSON-LD 1.0/1.1 + API Recs.
"""

__version__ = "0.1.0"
