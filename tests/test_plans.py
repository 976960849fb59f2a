"""Physical-plan quality gates (the '.explain and iterate' discipline):
- parquet scans prune columns and push filters,
- the expand stage is shuffle-free,
- small dimensions broadcast,
- salted aggregation has partial+final HashAggregate.
"""

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.expand import expand_transcripts

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jsparkSession.parseMode(mode)
    ) if hasattr(df.sparkSession._jsparkSession, "parseMode") else \
        df._jdf.queryExecution().toString()


def formatted(df) -> str:
    # stable accessor across Spark 4.x: explainString via ExplainMode
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_scan_pruning_and_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (li.where(F.col("l_shipdate") <= F.lit("1996-01-01").cast("timestamp"))
         .select("l_returnflag", "l_quantity"))
    p = formatted(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in p \
        or "LessThanOrEqual(l_shipdate" in p
    # column pruning: read schema carries only the needed columns
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_extendedprice" not in rs and "l_returnflag" in rs


def test_expand_stage_is_narrow(spark):
    from rdflib_jsonld_spark.sources import transcripts as tr
    df = tr.transcripts_df(spark, n_convs=5, partitions=2)
    quads = expand_transcripts(df)
    p = formatted(quads)
    assert "Exchange" not in p, p  # zero shuffles before linking
    assert "MapInPandas" in p or "mapInPandas" in p.lower()


def test_broadcast_join_for_small_dim(spark):
    import __spark_entry__ as em
    q = em.q_tpch_q5_local_supplier(spark, SF)
    p = formatted(q)
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_salted_agg_two_level(spark):
    from rdflib_jsonld_spark.operators.linking import entity_mention_counts
    from rdflib_jsonld_spark.operators.expand import expand_transcripts
    from rdflib_jsonld_spark.sources import transcripts as tr
    quads = expand_transcripts(tr.transcripts_df(spark, 5, partitions=2))
    mapping = spark.createDataFrame([("a", "b")], ["node", "root"])
    counts = entity_mention_counts(quads, mapping)
    p = formatted(counts)
    # two groupBys → at least two HashAggregate pairs in the plan
    assert p.count("HashAggregate") >= 4
