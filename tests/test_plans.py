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


def test_docops_scan_prunes_to_three_columns(spark):
    """The document-form stages must read only (conv_id, turn_idx, text)
    from a parquet-backed transcript table (ReadSchema pruning)."""
    import tempfile, os
    from rdflib_jsonld_spark.operators.docops import expand_documents_stage
    from rdflib_jsonld_spark.sources import transcripts as tr
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "t")
        tr.write_transcripts(spark, path, n_convs=20, seed=1, partitions=2)
        tdf = tr.read_transcripts(spark, path)
        p = formatted(expand_documents_stage(tdf))
        read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
        assert read_schema and "role" not in read_schema[0] \
            and "tool" not in read_schema[0] and "ts" not in read_schema[0]


def test_nquads_sink_stays_in_codegen(spark):
    """N-Quads line building must be pure JVM (no Python eval nodes) and
    inside a WholeStageCodegen span."""
    from rdflib_jsonld_spark.sources.nquads_io import nquads_lines
    df = spark.createDataFrame(
        [(None, "http://e/s", False, "http://e/p", "literal", "x",
          None, None)],
        "g string, s string, s_is_bnode boolean, p string, o_kind string, "
        "o_value string, o_datatype string, o_lang string")
    p = formatted(nquads_lines(df))
    assert "EvalPython" not in p and "InPandas" not in p
    assert "codegen id" in p  # whole-stage codegen span


def test_q14_broadcasts_part_dim(spark):
    import __spark_entry__ as em
    p = formatted(em.q_tpch_q14_promo_revenue(spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p
