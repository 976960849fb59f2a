"""R2RML-style custom mapping (operators/r2rml.py)."""

import pytest

from rdflib_jsonld_spark.operators.r2rml import (
    r2rml_map, triples_map_to_quads)

EX = "http://e/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


@pytest.mark.usefixtures("spark")
class TestR2RML:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "Ann", 7, 4.5), (2, "Bob", None, 3.0)],
            "id int, name string, dept int, score double")

    MAP = {
        "table": "people",
        "subject": {"template": EX + "person/{id}",
                    "class": EX + "Person",
                    "graph": EX + "g/hr"},
        "predicates": [
            {"predicate": EX + "name", "column": "name"},
            {"predicate": EX + "label", "column": "name", "lang": "EN"},
            {"predicate": EX + "dept",
             "template": EX + "dept/{dept}"},
            {"predicate": EX + "score", "column": "score"},
            {"predicate": EX + "org", "constant": EX + "Acme",
             "term_type": "iri"},
        ],
    }

    def test_full_mapping_shapes(self, spark):
        out = triples_map_to_quads(self._df(spark), self.MAP)
        got = {(r.g, r.s, r.p, r.o_kind, r.o_value, r.o_datatype,
                r.o_lang) for r in out.collect()}
        g = EX + "g/hr"
        p1 = EX + "person/1"
        assert (g, p1, RDF_TYPE, "iri", EX + "Person", None, None) in got
        assert (g, p1, EX + "name", "literal", "Ann", XSD + "string",
                None) in got
        assert (g, p1, EX + "label", "literal", "Ann", LANGSTR,
                "en") in got
        assert (g, p1, EX + "dept", "iri", EX + "dept/7", None,
                None) in got
        assert (g, p1, EX + "score", "literal", "4.5", XSD + "double",
                None) in got
        assert (g, p1, EX + "org", "iri", EX + "Acme", None, None) in got

    def test_null_suppression(self, spark):
        out = triples_map_to_quads(self._df(spark), self.MAP)
        # Bob's dept is NULL → no dept triple for person/2 (R2RML §11)
        p2 = {(r.p, r.o_value) for r in out.collect()
              if r.s == EX + "person/2"}
        assert not any(p == EX + "dept" for p, _ in p2)
        assert (EX + "name", "Bob") in p2

    def test_zero_shuffle_plan(self, spark):
        plan = triples_map_to_quads(self._df(spark), self.MAP) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_multi_table_union_and_sparql(self, spark):
        from rdflib_jsonld_spark.operators.sparql import sparql
        depts = spark.createDataFrame([(7, "Eng")], "id int, dname string")
        quads = r2rml_map(
            {"people": self._df(spark), "depts": depts},
            [self.MAP,
             {"table": "depts",
              "subject": {"template": EX + "dept/{id}"},
              "predicates": [
                  {"predicate": EX + "dname", "column": "dname"}]}])
        # join across the two mapped tables through SPARQL
        res = sparql(quads.drop("conv_id", "turn_idx"), f"""
            SELECT ?n ?dn WHERE {{
              GRAPH <{EX}g/hr> {{ ?p <{EX}name> ?n .
                                  ?p <{EX}dept> ?d . }}
              ?d <{EX}dname> ?dn .
            }}""").collect()
        assert [(r.n, r.dn) for r in res] == [("Ann", "Eng")]

    def test_bad_mapping_rejected(self, spark):
        with pytest.raises(ValueError):
            triples_map_to_quads(self._df(spark), {
                "table": "t", "subject": {"template": EX + "x/{id}"},
                "predicates": [{"predicate": EX + "p"}]})
