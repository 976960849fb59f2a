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


def test_near_dup_pipeline_no_cartesian(spark):
    """The whole fuzzy-dedup pipeline (LSH candidates → verify → CC edges)
    must be equi-joins only — a cartesian anywhere is the O(n²) failure
    mode the banded design exists to avoid."""
    from rdflib_jsonld_spark.operators import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    planted = (docs.limit(3)
               .withColumn("doc_id", F.col("doc_id") + 1000)
               .withColumn("text", F.concat("text", F.lit(" t"))))
    both = docs.unionByName(planted)
    cands = dedup.minhash_lsh_pairs(both, jaccard_threshold=0.0)
    verified = dedup.exact_ngram_jaccard_verify(cands, both, threshold=0.8)
    p = formatted(verified)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p


def test_ngram_jaccard_df_cap_in_plan(spark):
    """The stop-gram cap must sit BETWEEN the gram generation and the
    self-join (a filter on the aggregated document frequency feeding the
    join input), not after the blow-up."""
    from rdflib_jsonld_spark.operators.dedup import ngram_jaccard_pairs
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = ngram_jaccard_pairs(docs, threshold=0.4, df_cap=7)
    p = formatted(q)
    assert "CartesianProduct" not in p
    # the df-cap filter appears as a post-aggregation predicate on the count
    assert "gram_df" in p and "7" in p


def test_multimodal_feature_stage_prunes_metadata(spark, tmp_path):
    """Against a parquet-backed media table, extract_features reads only
    (media_id, kind, payload), and a metadata-only consumer never drags
    the blob column through the scan (column pruning both ways)."""
    from rdflib_jsonld_spark.operators import multimodal
    path = str(tmp_path / "media")
    multimodal.synthetic_media_df(spark, n=6).write.parquet(path)
    media = spark.read.parquet(path)
    p = formatted(multimodal.extract_features(media))
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "payload" in rs and "duration_ms" not in rs and "width" not in rs
    p2 = formatted(media.select("media_id", "duration_ms"))
    rs2 = [ln for ln in p2.splitlines() if "ReadSchema" in ln][0]
    assert "payload" not in rs2 and "duration_ms" in rs2


def test_q14_broadcasts_part_dim(spark):
    import __spark_entry__ as em
    p = formatted(em.q_tpch_q14_promo_revenue(spark, SF))
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_bucketed_table_self_join_has_no_shuffle(spark, tmp_path):
    """The bucketed SPO table makes subject-keyed self-joins
    exchange-free: both sides read pre-bucketed, pre-sorted buckets
    (the co-located-join evidence SCALE.md's write posture claims)."""
    from rdflib_jsonld_spark.operators.expand import (
        dedup_quads, expand_transcripts)
    from rdflib_jsonld_spark.sources.quads_io import (
        write_quads_bucketed_table)
    from rdflib_jsonld_spark.sources.transcripts import transcripts_df

    quads = dedup_quads(expand_transcripts(transcripts_df(spark, 6)))
    write_quads_bucketed_table(quads, "spo_bucketed",
                               str(tmp_path / "spo"), n_buckets=4)
    # force the shuffle-join path: at test scale the tiny table would
    # otherwise BROADCAST (which is also exchange-free in the shuffle
    # sense, but is not the plan shape under test)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table("spo_bucketed")
        a = t.select(F.col("s"), F.col("p").alias("pa"))
        b = t.select(F.col("s"), F.col("p").alias("pb"))
        joined = a.join(b, "s").where(F.col("pa") < F.col("pb"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        # and it still computes the right thing
        n = joined.count()
        cross = (quads.select("s", F.col("p").alias("pa"))
                 .join(quads.select("s", F.col("p").alias("pb")), "s")
                 .where(F.col("pa") < F.col("pb")).count())
        assert n == cross and n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS spo_bucketed")
