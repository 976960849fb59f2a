"""RDFS entailment materialization (operators/inference.py)."""

import pytest
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


@pytest.mark.usefixtures("spark")
class TestOwlPropertyClosure:
    OWL = "http://www.w3.org/2002/07/owl#"
    EX = "http://ex.org/"

    def _quads(self, spark, rows):
        schema = ("g string, s string, s_is_bnode boolean, p string, "
                  "o_kind string, o_value string, o_datatype string, "
                  "o_lang string")
        return spark.createDataFrame(rows, schema)

    def _row(self, s, p, o, o_kind="iri"):
        return (None, s, s.startswith("_:"), p, o_kind, o,
                "http://www.w3.org/2001/XMLSchema#string"
                if o_kind == "literal" else None, None)

    def test_inverse_symmetric_transitive(self, spark):
        from rdflib_jsonld_spark.operators.inference import (
            owl_property_closure)
        EX, OWL = self.EX, self.OWL
        RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        rows = [
            self._row(EX + "parentOf", OWL + "inverseOf", EX + "childOf"),
            self._row(EX + "knows", RDF_TYPE, OWL + "SymmetricProperty"),
            self._row(EX + "anc", RDF_TYPE, OWL + "TransitiveProperty"),
            self._row(EX + "a", EX + "parentOf", EX + "b"),
            self._row(EX + "c", EX + "childOf", EX + "d"),
            self._row(EX + "a", EX + "knows", EX + "b"),
            self._row(EX + "x", EX + "anc", EX + "y"),
            self._row(EX + "y", EX + "anc", EX + "z"),
            # literal object: must NOT invert
            self._row(EX + "a", EX + "parentOf", "lit", o_kind="literal"),
        ]
        out = owl_property_closure(self._quads(spark, rows))
        got = {(r.s, r.p, r.o_value) for r in out.collect()}
        assert (EX + "b", EX + "childOf", EX + "a") in got
        assert (EX + "d", EX + "parentOf", EX + "c") in got
        assert (EX + "b", EX + "knows", EX + "a") in got
        assert (EX + "x", EX + "anc", EX + "z") in got
        # no literal-subject garbage
        assert not any(s == "lit" for s, _, _ in got)
        # idempotent: second pass adds nothing
        again = owl_property_closure(out)
        assert again.count() == out.count()

    def test_symmetric_plus_transitive_composes(self, spark):
        from rdflib_jsonld_spark.operators.inference import (
            owl_property_closure)
        EX, OWL = self.EX, self.OWL
        RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        rows = [
            self._row(EX + "same", RDF_TYPE, OWL + "SymmetricProperty"),
            self._row(EX + "same", RDF_TYPE, OWL + "TransitiveProperty"),
            self._row(EX + "a", EX + "same", EX + "b"),
            self._row(EX + "b", EX + "same", EX + "c"),
        ]
        out = owl_property_closure(self._quads(spark, rows))
        got = {(r.s, r.o_value) for r in out.collect()
               if r.p == EX + "same"}
        nodes = {EX + "a", EX + "b", EX + "c"}
        # symmetric chain a-b-c closes to the complete digraph with
        # self-loops (every node sits on a 2-cycle)
        assert got == {(u, v) for u in nodes for v in nodes}

    def test_no_declarations_is_identity(self, spark):
        from rdflib_jsonld_spark.operators.inference import (
            owl_property_closure)
        rows = [self._row(self.EX + "a", self.EX + "p", self.EX + "b")]
        df = self._quads(spark, rows)
        assert owl_property_closure(df).count() == 1


@pytest.mark.usefixtures("spark")
class TestOwlSameasRules:
    OWL = "http://www.w3.org/2002/07/owl#"
    EX = "http://ex.org/"
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def _quads(self, spark, rows):
        schema = ("g string, s string, s_is_bnode boolean, p string, "
                  "o_kind string, o_value string, o_datatype string, "
                  "o_lang string")
        return spark.createDataFrame(rows, schema)

    def test_fp_and_ifp_pairs(self, spark):
        from rdflib_jsonld_spark.operators.inference import (
            owl_sameas_rules)
        EX, OWL, RT = self.EX, self.OWL, self.RT
        xsd_s = "http://www.w3.org/2001/XMLSchema#string"
        rows = [
            (None, EX + "bornIn", False, RT, "iri",
             OWL + "FunctionalProperty", None, None),
            (None, EX + "email", False, RT, "iri",
             OWL + "InverseFunctionalProperty", None, None),
            # FP: one subject, two (alias) objects → objects identified
            (None, EX + "p1", False, EX + "bornIn", "iri", EX + "paris",
             None, None),
            (None, EX + "p1", False, EX + "bornIn", "iri",
             EX + "paris-fr", None, None),
            # FP with a literal object: ignored
            (None, EX + "p2", False, EX + "bornIn", "literal", "Paris",
             xsd_s, None),
            # IFP: two subjects, same literal key → subjects identified
            (None, EX + "a", False, EX + "email", "literal", "x@y.z",
             xsd_s, None),
            (None, EX + "b", False, EX + "email", "literal", "x@y.z",
             xsd_s, None),
            # same lexical, DIFFERENT language → not the same key
            (None, EX + "c", False, EX + "email", "literal", "x@y.z",
             "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
             "en"),
        ]
        got = {(r.src, r.dst) for r in
               owl_sameas_rules(self._quads(spark, rows)).collect()}
        assert got == {(EX + "paris", EX + "paris-fr"),
                       (EX + "a", EX + "b")}

    def test_no_declarations_empty(self, spark):
        from rdflib_jsonld_spark.operators.inference import (
            owl_sameas_rules)
        rows = [(None, self.EX + "a", False, self.EX + "p", "iri",
                 self.EX + "b", None, None)]
        assert owl_sameas_rules(self._quads(spark, rows)).collect() == []


def test_owl_equivalent_property_chain(spark):
    """prp-eqp1/2 with driver-closed chains: p ≡ q ≡ r copies edges
    across all three in one pass."""
    from rdflib_jsonld_spark.operators.inference import (
        OWL, owl_property_closure)
    E = "http://e/"
    rows = [
        (None, E + "p", False, OWL + "equivalentProperty", "iri",
         E + "q", None, None),
        (None, E + "q", False, OWL + "equivalentProperty", "iri",
         E + "r", None, None),
        (None, E + "a", False, E + "p", "literal", "v", None, None),
        (None, E + "b", False, E + "r", "iri", E + "c", None, None),
    ]
    quads = spark.createDataFrame(rows, SCHEMA)
    out = owl_property_closure(quads)
    got = {(r.s, r.p, r.o_value) for r in out.collect()}
    for pred in ("p", "q", "r"):
        assert (E + "a", E + pred, "v") in got
        assert (E + "b", E + pred, E + "c") in got


def test_owl_equivalent_class_types(spark):
    """cax-eqc1/2: rdf:type copies across equivalent classes, both
    directions."""
    from rdflib_jsonld_spark.operators.inference import (
        OWL, RDF_TYPE, owl_property_closure)
    E = "http://e/"
    rows = [
        (None, E + "C", False, OWL + "equivalentClass", "iri",
         E + "D", None, None),
        (None, E + "x", False, RDF_TYPE, "iri", E + "C", None, None),
        (None, E + "y", False, RDF_TYPE, "iri", E + "D", None, None),
    ]
    quads = spark.createDataFrame(rows, SCHEMA)
    out = owl_property_closure(quads)
    got = {(r.s, r.o_value) for r in out.where(
        out.p == RDF_TYPE).collect()}
    assert {(E + "x", E + "C"), (E + "x", E + "D"),
            (E + "y", E + "C"), (E + "y", E + "D")} <= got


def test_owl_equivalence_feeds_transitive(spark):
    """An equivalentProperty copy of a TransitiveProperty's edges joins
    the closure input (ordering completeness)."""
    from rdflib_jsonld_spark.operators.inference import (
        OWL, RDF_TYPE, owl_property_closure)
    E = "http://e/"
    rows = [
        (None, E + "t", False, RDF_TYPE, "iri",
         OWL + "TransitiveProperty", None, None),
        (None, E + "p", False, OWL + "equivalentProperty", "iri",
         E + "t", None, None),
        (None, E + "a", False, E + "p", "iri", E + "b", None, None),
        (None, E + "b", False, E + "t", "iri", E + "c", None, None),
    ]
    quads = spark.createDataFrame(rows, SCHEMA)
    out = owl_property_closure(quads)
    got = {(r.s, r.p, r.o_value) for r in out.collect()}
    assert (E + "a", E + "t", E + "c") in got   # copied edge + closure
