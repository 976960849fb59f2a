"""SHACL-core validation (operators/validation.py): every constraint
component, targets, and the empty-report conformance case."""

import pytest

from rdflib_jsonld_spark.operators.validation import RDF_TYPE, validate

SCHEMA = ("g string, s string, s_is_bnode boolean, p string, o_kind string, "
          "o_value string, o_datatype string, o_lang string")
EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def q(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def viol(df):
    return {(r.shape_id, r.focus, r.path, r.constraint, r.value)
            for r in df.collect()}


@pytest.fixture(scope="module")
def quads(spark):
    rows = [
        (None, EX + "p1", False, RDF_TYPE, "iri", EX + "Person", None, None),
        (None, EX + "p1", False, EX + "name", "literal", "Ann",
         XSD + "string", None),
        (None, EX + "p1", False, EX + "age", "literal", "30",
         XSD + "integer", None),
        (None, EX + "p1", False, EX + "knows", "iri", EX + "p2", None, None),
        (None, EX + "p2", False, RDF_TYPE, "iri", EX + "Person", None, None),
        (None, EX + "p2", False, EX + "age", "literal", "214",
         XSD + "integer", None),
        (None, EX + "p2", False, EX + "knows", "iri", EX + "ghost",
         None, None),
        (None, EX + "p2", False, EX + "name", "literal", "bo2",
         XSD + "string", None),
        (None, EX + "p2", False, EX + "name", "literal", "Bob",
         XSD + "string", None),
    ]
    df = q(spark, rows).cache()
    df.count()
    yield df
    df.unpersist()


def test_min_max_count(quads):
    out = validate(quads, [{
        "id": "S", "target_class": EX + "Person",
        "properties": [{"path": EX + "nick", "min_count": 1},
                       {"path": EX + "name", "max_count": 1}]}])
    assert viol(out) == {
        ("S", EX + "p1", EX + "nick", "min_count", None),
        ("S", EX + "p2", EX + "nick", "min_count", None),
        ("S", EX + "p2", EX + "name", "max_count", None)}


def test_datatype_nodekind_class(quads):
    out = validate(quads, [{
        "id": "S", "target_class": EX + "Person",
        "properties": [
            {"path": EX + "age", "datatype": XSD + "string"},
            {"path": EX + "name", "node_kind": "iri"},
            {"path": EX + "knows", "class": EX + "Person"}]}])
    v = viol(out)
    assert ("S", EX + "p1", EX + "age", "datatype", "30") in v
    assert ("S", EX + "p1", EX + "name", "node_kind", "Ann") in v
    # p1 knows p2 (a Person) → ok; p2 knows ghost (untyped) → violation
    assert ("S", EX + "p2", EX + "knows", "class", EX + "ghost") in v
    assert not any(t[1] == EX + "p1" and t[3] == "class" for t in v)


def test_pattern_in_range(quads):
    out = validate(quads, [{
        "id": "S", "target_class": EX + "Person",
        "properties": [
            {"path": EX + "name", "pattern": "^[A-Z]"},
            {"path": EX + "age", "min_inclusive": 0,
             "max_inclusive": 150},
            {"path": EX + "name", "in": ["Ann", "Bob"]}]}])
    v = viol(out)
    assert ("S", EX + "p2", EX + "name", "pattern", "bo2") in v
    assert ("S", EX + "p2", EX + "age", "max_inclusive", "214") in v
    assert ("S", EX + "p2", EX + "name", "in", "bo2") in v
    assert not any(t[3] == "min_inclusive" for t in v)


def test_targets_and_conformance(quads, spark):
    ok = validate(quads, [{
        "id": "S", "target_class": EX + "Person",
        "properties": [{"path": EX + "age", "min_count": 1,
                        "datatype": XSD + "integer"}]}])
    assert ok.count() == 0
    subj = validate(quads, [{
        "id": "T", "target_subjects_of": EX + "knows",
        "properties": [{"path": EX + "age", "min_count": 1}]}])
    assert subj.count() == 0
    node = validate(quads, [{
        "id": "N", "target_node": [EX + "ghost"],
        "properties": [{"path": EX + "name", "min_count": 1}]}])
    assert viol(node) == {("N", EX + "ghost", EX + "name",
                           "min_count", None)}
    assert validate(quads, []).count() == 0
    with pytest.raises(ValueError, match="target"):
        validate(quads, [{"id": "bad", "properties": []}])


def test_lengths_hasvalue_uniquelang(spark):
    rows = [
        (None, EX + "d1", False, RDF_TYPE, "iri", EX + "Doc", None, None),
        (None, EX + "d1", False, EX + "code", "literal", "abcde",
         XSD + "string", None),
        (None, EX + "d1", False, EX + "label", "literal", "hi",
         "rdf:langString", "en"),
        (None, EX + "d1", False, EX + "label", "literal", "hello",
         "rdf:langString", "en"),
        (None, EX + "d1", False, EX + "label", "literal", "salut",
         "rdf:langString", "fr"),
        (None, EX + "d2", False, RDF_TYPE, "iri", EX + "Doc", None, None),
        (None, EX + "d2", False, EX + "code", "literal", "x",
         XSD + "string", None),
        (None, EX + "d2", False, EX + "status", "literal", "ok",
         XSD + "string", None),
    ]
    shapes = [{
        "id": "DocShape", "target_class": EX + "Doc",
        "properties": [
            {"path": EX + "code", "min_length": 2, "max_length": 4},
            {"path": EX + "label", "unique_lang": True,
             "language_in": ["en", "fr"]},
            {"path": EX + "status", "has_value": "ok"},
        ]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        ("DocShape", EX + "d1", EX + "code", "max_length", "abcde"),
        ("DocShape", EX + "d2", EX + "code", "min_length", "x"),
        ("DocShape", EX + "d1", EX + "label", "unique_lang", "en"),
        ("DocShape", EX + "d1", EX + "status", "has_value", None),
    }


def test_property_pairs_equals_disjoint_lessthan(spark):
    rows = [
        (None, EX + "e1", False, RDF_TYPE, "iri", EX + "Ev", None, None),
        (None, EX + "e1", False, EX + "start", "literal", "5",
         XSD + "integer", None),
        (None, EX + "e1", False, EX + "end", "literal", "10",
         XSD + "integer", None),
        (None, EX + "e1", False, EX + "a", "literal", "x", None, None),
        (None, EX + "e1", False, EX + "b", "literal", "x", None, None),
        (None, EX + "e2", False, RDF_TYPE, "iri", EX + "Ev", None, None),
        (None, EX + "e2", False, EX + "start", "literal", "9",
         XSD + "integer", None),
        (None, EX + "e2", False, EX + "end", "literal", "9",
         XSD + "integer", None),
        (None, EX + "e2", False, EX + "a", "literal", "x", None, None),
        (None, EX + "e2", False, EX + "b", "literal", "y", None, None),
        (None, EX + "e2", False, EX + "same", "literal", "x", None, None),
    ]
    shapes = [{
        "id": "EvShape", "target_class": EX + "Ev",
        "properties": [
            {"path": EX + "start", "less_than": EX + "end"},
            {"path": EX + "a", "equals": EX + "b"},
            {"path": EX + "a", "disjoint": EX + "same"},
        ]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        ("EvShape", EX + "e2", EX + "start", "less_than", "9"),
        ("EvShape", EX + "e2", EX + "a", "equals", "x"),
        ("EvShape", EX + "e2", EX + "a", "equals", "y"),
        ("EvShape", EX + "e2", EX + "a", "disjoint", "x"),
    }
    # numeric comparison, not lexical: "5" < "10" numerically
    assert ("EvShape", EX + "e1", EX + "start", "less_than", "5") not in got


def test_closed_shape(spark):
    rows = [
        (None, EX + "c1", False, RDF_TYPE, "iri", EX + "C", None, None),
        (None, EX + "c1", False, EX + "name", "literal", "n", None, None),
        (None, EX + "c1", False, EX + "extra", "literal", "boom",
         None, None),
        (None, EX + "c1", False, EX + "meta", "literal", "m", None, None),
    ]
    shapes = [{
        "id": "CShape", "target_class": EX + "C", "closed": True,
        "ignored_properties": [EX + "meta"],
        "properties": [{"path": EX + "name", "min_count": 1}],
    }]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        ("CShape", EX + "c1", EX + "extra", "closed", "boom"),
    }
