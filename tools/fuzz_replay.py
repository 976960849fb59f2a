"""Replay an explicit (quads, query) pair through both the engine and
the naive evaluator — for diagnosing sparql_fuzz divergences whose
generator-seed mapping has since changed (the generator evolves; the
logged query/quads text is the stable repro).

Usage: edit QUADS/QUERY below, then `python tools/fuzz_replay.py`.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(__file__))

from collections import Counter

QUADS = [(('iri', 'urn:g1'), ('iri', 'http://e/s3'), ('iri', 'http://e/p'), ('lit', 'a', None, None)), (None, ('iri', 'http://e/q'), ('iri', 'http://e/q'), ('lit', 'b', None, 'fr')), (('iri', 'urn:g1'), ('iri', 'http://e/s2'), ('iri', 'http://e/r'), ('iri', 'http://e/s1')), (None, ('iri', 'http://e/s1'), ('iri', 'http://e/r'), ('lit', '5', 'http://www.w3.org/2001/XMLSchema#integer', None)), (('iri', 'urn:g1'), ('iri', 'http://e/s1'), ('iri', 'http://e/r'), ('lit', '', None, None)), (None, ('iri', 'http://e/p'), ('iri', 'http://e/p'), ('lit', '-3', 'http://www.w3.org/2001/XMLSchema#integer', None)), (None, ('iri', 'http://e/s1'), ('iri', 'http://e/p'), ('lit', 'v', 'http://e/dt', None)), (None, ('bnode', 'b1'), ('iri', 'http://e/q'), ('bnode', 'b2')), (('iri', 'urn:g1'), ('iri', 'http://e/s3'), ('iri', 'http://e/q'), ('bnode', 'b2')), (None, ('iri', 'http://e/q'), ('iri', 'http://e/r'), ('bnode', 'b1')), (('iri', 'urn:g1'), ('iri', 'http://e/q'), ('iri', 'http://e/p'), ('lit', 'v', 'http://e/dt', None)), (None, ('iri', 'http://e/p'), ('iri', 'http://e/p'), ('lit', 'false', 'http://www.w3.org/2001/XMLSchema#boolean', None)), (None, ('iri', 'http://e/s3'), ('iri', 'http://e/r'), ('iri', 'http://e/r')), (None, ('iri', 'http://e/r'), ('iri', 'http://e/p'), ('iri', 'http://e/p'))]

QUERY = ("SELECT ?f (MIN(DISTINCT ?a) AS ?agg0) WHERE { "
         "{ <http://e/q> ?d ?b . ?a ?f ?d . } "
         "{ { ?d ?e <http://e/s1> . ?e <http://e/r> ?e . ?e ?f ?d . } "
         "UNION { ?e <http://e/r> ?b . } } } GROUP BY ?f")


def main():
    from pyspark.sql import SparkSession
    from sparql_fuzz import decode_engine, quads_df, row_key

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "1")
             .config("spark.default.parallelism", "1")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "4g")
             .appName("fuzz-replay").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from rdflib_jsonld_spark.operators.sparql import sparql
    df = quads_df(spark, QUADS)
    out = sparql(df, QUERY, keep_types=True)
    engine = decode_engine(out)
    print("ENGINE rows:")
    for r in engine:
        print("   ", r)
    print(Counter(map(row_key, engine)))


if __name__ == "__main__":
    main()
