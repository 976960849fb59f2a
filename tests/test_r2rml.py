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


class TestSweep19IriSafe:
    """[spec] R2RML §7.3: template substitutions into IRI term maps use
    the IRI-safe (percent-encoded) value; literal templates stay raw.
    A language tag on a template map implies rdf:langString (§7.4)."""

    def _df(self, spark):
        return spark.createDataFrame(
            [("a key/1", "Customer#000000001 50% 'x'")],
            "k string, name string")

    def test_subject_and_object_templates_percent_encode(self, spark):
        quads = triples_map_to_quads(self._df(spark), {
            "table": "t",
            "subject": {"template": EX + "row/{k}"},
            "predicates": [
                {"predicate": EX + "ref", "template": EX + "n/{name}"}]})
        row = quads.collect()[0]
        assert row.s == EX + "row/a%20key%2F1"
        assert row.o_value == EX + "n/Customer%23000000001%2050%25%20%27x%27"

    def test_literal_template_stays_raw(self, spark):
        quads = triples_map_to_quads(self._df(spark), {
            "table": "t",
            "subject": {"template": EX + "row/{k}"},
            "predicates": [
                {"predicate": EX + "disp", "template": "name={name}",
                 "term_type": "literal"}]})
        assert quads.collect()[0].o_value == \
            "name=Customer#000000001 50% 'x'"

    def test_template_lang_implies_langstring(self, spark):
        quads = triples_map_to_quads(self._df(spark), {
            "table": "t",
            "subject": {"template": EX + "row/{k}"},
            "predicates": [
                {"predicate": EX + "disp", "template": "hi {name}",
                 "term_type": "literal", "lang": "EN-gb"}]})
        row = quads.collect()[0]
        assert row.o_datatype == LANGSTR
        assert row.o_lang == "en-gb"

    def test_directmap_row_iri_percent_encodes(self, spark):
        from rdflib_jsonld_spark.operators.directmap import table_to_quads
        df = spark.createDataFrame([("k 1/x", "v")], "pk string, v string")
        quads = table_to_quads(df, "t", base=EX, pk=["pk"],
                               fks={"v": ("other", ["ok"])})
        rows = {r.p: r for r in quads.collect()}
        assert rows[RDF_TYPE].s == EX + "t/pk=k%201%2Fx"
        assert rows[EX + "t#ref-v"].o_value == EX + "other/ok=v"
