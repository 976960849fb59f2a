"""RDFS entailment materialization (operators/inference.py)."""

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.inference import (RDF_TYPE, RDFS,
                                                     rdfs_closure)

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
EX = "http://ex.org/"


def q(spark, rows):
    return spark.createDataFrame(
        [(None, s, s.startswith("_:"), p,
          "literal" if lit else "iri", o,
          "http://www.w3.org/2001/XMLSchema#string" if lit else None,
          None)
         for s, p, o, lit in rows], SCHEMA)


def triples(df):
    return {(r.s, r.p, r.o_value) for r in df.collect()}


def test_rdfs9_subclass_type_propagation(spark):
    quads = q(spark, [
        (EX + "cat", RDFS + "subClassOf", EX + "mammal", False),
        (EX + "mammal", RDFS + "subClassOf", EX + "animal", False),
        (EX + "tom", RDF_TYPE, EX + "cat", False),
    ])
    out = triples(rdfs_closure(quads))
    assert (EX + "tom", RDF_TYPE, EX + "mammal") in out
    assert (EX + "tom", RDF_TYPE, EX + "animal") in out          # depth 2
    assert (EX + "cat", RDFS + "subClassOf", EX + "animal") in out  # rdfs11


def test_rdfs7_property_inheritance(spark):
    quads = q(spark, [
        (EX + "hasPet", RDFS + "subPropertyOf", EX + "knows", False),
        (EX + "a", EX + "hasPet", EX + "b", False),
    ])
    out = triples(rdfs_closure(quads))
    assert (EX + "a", EX + "knows", EX + "b") in out


def test_rdfs2_rdfs3_domain_range(spark):
    quads = q(spark, [
        (EX + "hasPet", RDFS + "domain", EX + "Person", False),
        (EX + "hasPet", RDFS + "range", EX + "Animal", False),
        (EX + "name", RDFS + "range", EX + "Broken", False),
        (EX + "a", EX + "hasPet", EX + "b", False),
        (EX + "a", EX + "name", "Alice", True),
    ])
    out = triples(rdfs_closure(quads))
    assert (EX + "a", RDF_TYPE, EX + "Person") in out
    assert (EX + "b", RDF_TYPE, EX + "Animal") in out
    # range never types a literal
    assert not any(t[0] == "Alice" for t in out)


def test_rule_chaining_inheritance_feeds_domain_feeds_subclass(spark):
    quads = q(spark, [
        (EX + "hasCat", RDFS + "subPropertyOf", EX + "hasPet", False),
        (EX + "hasPet", RDFS + "domain", EX + "Owner", False),
        (EX + "Owner", RDFS + "subClassOf", EX + "Person", False),
        (EX + "a", EX + "hasCat", EX + "b", False),
    ])
    out = triples(rdfs_closure(quads))
    assert (EX + "a", EX + "hasPet", EX + "b") in out     # rdfs7
    assert (EX + "a", RDF_TYPE, EX + "Owner") in out      # rdfs2 on 7
    assert (EX + "a", RDF_TYPE, EX + "Person") in out     # rdfs9 on 2


def test_idempotent_and_preserves_columns(spark):
    quads = q(spark, [
        (EX + "cat", RDFS + "subClassOf", EX + "animal", False),
        (EX + "tom", RDF_TYPE, EX + "cat", False),
    ]).withColumn("conv_id", F.lit("c0")).withColumn(
        "turn_idx", F.lit(0))
    once = rdfs_closure(quads)
    assert once.columns == quads.columns
    assert rdfs_closure(once).count() == once.count()
    # inferred rows carry NULL lineage, originals keep theirs
    inf = once.where(F.col("conv_id").isNull())
    assert inf.count() == once.count() - quads.count()


def test_no_ontology_is_identity(spark):
    quads = q(spark, [(EX + "a", EX + "p", EX + "b", False)])
    assert rdfs_closure(quads) is quads
