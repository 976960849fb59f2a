"""SPARQL results serializers (operators/results.py): JSON/XML/CSV/TSV
driver-side strings plus the distributed writer, against hand-written
expected serializations per the W3C results-format specs."""

import json

import pytest
from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.results import (to_csv, to_json, to_tsv,
                                                   to_xml, write_results)
from rdflib_jsonld_spark.operators.sparql import sparql

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
XSD = "http://www.w3.org/2001/XMLSchema#"
V = "http://ex.org/v#"
E = "http://ex.org/e/"
PFX = f"PREFIX v: <{V}> PREFIX e: <{E}> "

ROWS = [
    (None, E + "a", False, V + "name", "literal", "Alice", XSD + "string",
     None),
    (None, E + "a", False, V + "age", "literal", "30", XSD + "integer",
     None),
    (None, E + "b", False, V + "name", "literal", "Bob", None, "en"),
    (None, E + "b", False, V + "addr", "bnode", "_:x1", None, None),
]


@pytest.fixture(scope="module")
def quads(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def sols(quads):
    return sparql(quads, PFX + "SELECT ?s ?o { ?s ?p ?o } ORDER BY ?s ?o",
                  keep_types=True)


def test_json_bindings(sols):
    d = json.loads(to_json(sols))
    assert d["head"]["vars"] == ["s", "o"]
    bs = d["results"]["bindings"]
    assert len(bs) == 4
    cells = {(b["o"]["type"], b["o"]["value"],
              b["o"].get("xml:lang"), b["o"].get("datatype")) for b in bs}
    assert ("literal", "30", None, XSD + "integer") in cells
    assert ("literal", "Bob", "en", None) in cells
    assert ("bnode", "_:x1", None, None) in cells
    # plain xsd:string serializes as a PLAIN literal
    assert ("literal", "Alice", None, None) in cells
    assert all(b["s"]["type"] == "uri" for b in bs)


def test_json_ask(quads):
    out = sparql(quads, PFX + 'ASK { e:a v:name "Alice" }')
    assert json.loads(to_json(out)) == {"head": {}, "boolean": True}


def test_xml(sols):
    x = to_xml(sols)
    assert x.startswith('<?xml version="1.0"?>')
    assert '<variable name="s"/>' in x and '<variable name="o"/>' in x
    assert f'<literal datatype="{XSD}integer">30</literal>' in x
    assert '<literal xml:lang="en">Bob</literal>' in x
    assert "<bnode>x1</bnode>" in x
    assert f"<uri>{E}a</uri>" in x


def test_csv_and_tsv(sols):
    c = to_csv(sols)
    lines = c.split("\r\n")
    assert lines[0] == "s,o"
    assert f"{E}a,30" in lines and f"{E}b,Bob" in lines
    t = to_tsv(sols)
    tl = t.split("\n")
    assert tl[0] == "?s\t?o"
    assert f'<{E}a>\t"30"^^<{XSD}integer>' in tl
    assert f'<{E}b>\t"Bob"@en' in tl
    # bnode labels go through the sentinel encoder (r05: TSV writers
    # joined the sweep-27 writer-grammar convention)
    assert f"<{E}b>\t_:_ex1" in tl


def test_csv_quoting_and_unbound(spark, quads):
    out = sparql(quads, PFX + "SELECT ?n ?u { ?s v:name ?n "
                 'OPTIONAL { ?s v:none ?u } BIND("a,\\"b\\"" AS ?x) }')
    # unbound cells are empty; commas/quotes are RFC-4180 quoted
    out2 = sparql(quads, PFX + 'SELECT ?x { BIND("a,\\"b" AS ?x) '
                  "?s v:age ?o }")
    c = to_csv(out2)
    assert '"a,""b"' in c
    c = to_csv(out)
    assert any(line.endswith(",") for line in c.split("\r\n")[1:3])


def test_graph_result_rejected(quads):
    g = sparql(quads, PFX + "CONSTRUCT { ?s v:p ?o } WHERE { ?s v:name ?o }")
    with pytest.raises(ValueError, match="graph"):
        to_json(g)


def test_write_results_roundtrip(spark, sols, tmp_path):
    write_results(sols, str(tmp_path / "c"), format="csv")
    back = spark.read.option("header", True).csv(str(tmp_path / "c"))
    assert back.columns == ["s", "o"] and back.count() == 4
    write_results(sols, str(tmp_path / "t"), format="tsv")
    rows = {r.value for r in spark.read.text(str(tmp_path / "t")).collect()}
    assert f'<{E}a>\t"30"^^<{XSD}integer>' in rows
    assert f'<{E}b>\t"Bob"@en' in rows
    write_results(sols, str(tmp_path / "j"), format="json")
    recs = [json.loads(r.value) for r in
            spark.read.text(str(tmp_path / "j")).collect()]
    assert {r["o"]["value"] for r in recs} == {"Alice", "30", "Bob", "_:x1"}
    assert all(r["s"]["type"] == "uri" for r in recs)
    langs = {r["o"].get("xml:lang") for r in recs}
    assert "en" in langs


def test_tsv_bnode_labels_grammar_encoded(spark):
    """r05 sweep (writer escaping): pipeline bnode labels carry
    '/ # : .' lineage salts — the TSV writers (driver string AND
    distributed JVM column) must emit grammar-legal BLANK_NODE_LABELs
    via the shared sentinel encoder, byte-identically."""
    from rdflib_jsonld_spark.jsonld.nquads import encode_label
    from rdflib_jsonld_spark.operators.results import to_tsv, tsv_lines
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = spark.createDataFrame(
        [(None, "_:c1/0/2#5", True, "http://p", "iri", "http://o",
          None, None)],
        "g string, s string, s_is_bnode boolean, p string, o_kind string,"
        " o_value string, o_datatype string, o_lang string")
    out = sparql(quads, "SELECT ?s ?o WHERE { ?s <http://p> ?o }",
                 keep_types=True)
    body = to_tsv(out).splitlines()[1]
    enc = "_:" + encode_label("c1/0/2#5")
    assert body.split("\t")[0] == enc
    import re
    assert not re.search(r"[/#]", body.split("\t")[0])
    [jvm_row] = tsv_lines(out).collect()
    assert jvm_row[0] == body


def test_quoted_triple_bindings_serialize_as_triple_terms(spark):
    """r05: a variable bound to a quoted-triple spelling serializes per
    the SPARQL 1.2 results draft — nested s/p/o in JSON, <triple> in
    XML, the raw (label-encoded) spelling in TSV; driver and JVM TSV
    agree byte-for-byte."""
    import json as _json
    from rdflib_jsonld_spark.operators.results import (to_json, to_tsv,
                                                       to_xml, tsv_lines)
    from rdflib_jsonld_spark.operators.sparql import sparql
    rows = [(None, "<< <http://ex/a> <http://ex/knows> _:b/0 >>", False,
             "http://ex/conf", "literal", "0.9",
             "http://www.w3.org/2001/XMLSchema#decimal", None)]
    q = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    sel = sparql(q, "SELECT ?s ?c WHERE { ?s <http://ex/conf> ?c }",
                 keep_types=True)
    tsv_line = to_tsv(sel).splitlines()[1]
    assert tsv_line.startswith("<< <http://ex/a>")
    assert "_:_eb_s0" in tsv_line          # inner label sentinel-encoded
    [jvm] = [r[0] for r in tsv_lines(sel).collect()]
    assert jvm == tsv_line
    cell = _json.loads(to_json(sel))["results"]["bindings"][0]["s"]
    assert cell["type"] == "triple"
    assert cell["value"]["object"] == {"type": "bnode", "value": "b/0"}
    x = to_xml(sel)
    assert "<triple><subject>" in x and "<bnode>b/0</bnode>" in x


def test_xml_illegal_chars_substituted(spark):
    """Sweep 34: XML-1.0-unrepresentable chars (C0 minus tab/nl/cr,
    U+FFFE/FFFF) are substituted with U+FFFD so the output stays
    well-formed — they were emitted raw before, which every downstream
    XML parser rejects. JSON/CSV/TSV carry them losslessly."""
    import xml.dom.minidom
    rows = [(None, E + "d", False, V + "p", "literal",
             "ctrl\x01char\x00nul￿tail", None, None),
            (None, E + "e", False, V + "p", "literal",
             "kept\ttab\nnl", None, None)]
    quads = spark.createDataFrame(rows, SCHEMA)
    out = sparql(quads, PFX + "SELECT ?o WHERE { ?s v:p ?o } ORDER BY ?o")
    x = to_xml(out)
    xml.dom.minidom.parseString(x)  # well-formed
    assert "ctrl�char�nul�tail" in x
    assert "kept\ttab\nnl" in x          # XML-legal whitespace survives
    j = json.loads(to_json(out))
    vals = sorted(b["o"]["value"]
                  for b in j["results"]["bindings"])
    assert vals[0] == "ctrl\x01char\x00nul￿tail"  # JSON lossless
