"""W3C Direct Mapping (operators/directmap.py): row IRIs, datatype
map, NULL suppression, bnode rows, FK references, zero-shuffle plan."""

import datetime

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.directmap import (table_to_quads,
                                                     tables_to_quads)

XSD = "http://www.w3.org/2001/XMLSchema#"
B = "http://example.org/db/"


def test_pk_row_iri_and_datatypes(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5, True, datetime.datetime(2024, 1, 2, 3, 4, 5))],
        "id int, name string, score double, ok boolean, at timestamp")
    quads = {(r.p, r.o_kind, r.o_value, r.o_datatype)
             for r in table_to_quads(df, "t", pk=["id"]).collect()}
    s = f"{B}t/id=1"
    rows = table_to_quads(df, "t", pk=["id"]).collect()
    assert all(r.s == s and not r.s_is_bnode for r in rows)
    assert (f"{B}t#id", "literal", "1", XSD + "integer") in quads
    assert (f"{B}t#name", "literal", "x", XSD + "string") in quads
    assert (f"{B}t#score", "literal", "2.5", XSD + "double") in quads
    assert (f"{B}t#ok", "literal", "true", XSD + "boolean") in quads
    assert (f"{B}t#at", "literal", "2024-01-02T03:04:05",
            XSD + "dateTime") in quads
    assert ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "iri",
            f"{B}t", None) in quads


def test_null_columns_emit_no_triple(spark):
    df = spark.createDataFrame([(1, None)], "id int, name string")
    quads = table_to_quads(df, "t", pk=["id"]).collect()
    assert {r.p for r in quads} == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", f"{B}t#id"}


def test_bnode_rows_without_pk_deterministic(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "x int, y string")
    a = table_to_quads(df, "t").collect()
    b = table_to_quads(df.repartition(4), "t").collect()
    assert all(r.s_is_bnode and r.s.startswith("_:t/") for r in a)
    assert {(r.s, r.p, r.o_value) for r in a} == \
        {(r.s, r.p, r.o_value) for r in b}
    # distinct rows get distinct bnodes
    assert len({r.s for r in a}) == 2


def test_composite_pk_and_fk(spark):
    df = spark.createDataFrame([(1, 2, 7)], "a int, b int, r int")
    quads = table_to_quads(df, "t", pk=["a", "b"],
                           fks={"r": ("other", ["ok"])}).collect()
    assert quads[0].s == f"{B}t/a=1;b=2"
    ref, = [r for r in quads if r.p == f"{B}t#ref-r"]
    assert (ref.o_kind, ref.o_value) == ("iri", f"{B}other/ok=7")


def test_mapping_is_narrow(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    plan = table_to_quads(df, "t", pk=["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_tables_to_quads_union(spark):
    t1 = spark.createDataFrame([(1,)], "a int")
    t2 = spark.createDataFrame([(2,)], "b int")
    out = tables_to_quads({"t1": t1, "t2": t2},
                          pks={"t1": ["a"], "t2": ["b"]})
    assert out.count() == 4   # (type + 1 literal) per table
    assert {r.conv_id for r in out.collect()} == {"t1", "t2"}
