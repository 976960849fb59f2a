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


# ---- sweep 18: spec-comparison semantics ----------------------------------

def test_range_nontrue_comparisons_violate(spark):
    """[spec] SHACL §4.3: min/maxInclusive violate whenever the SPARQL
    comparison does NOT return true — non-numeric literals, lang-tagged
    strings, IRIs and bnodes were silently passing."""
    rows = [
        (None, EX + "r1", False, RDF_TYPE, "iri", EX + "R", None, None),
        (None, EX + "r1", False, EX + "v", "literal", "5",
         XSD + "integer", None),
        (None, EX + "r2", False, RDF_TYPE, "iri", EX + "R", None, None),
        (None, EX + "r2", False, EX + "v", "literal", "soon",
         XSD + "string", None),
        (None, EX + "r3", False, RDF_TYPE, "iri", EX + "R", None, None),
        (None, EX + "r3", False, EX + "v", "iri", EX + "five", None, None),
        (None, EX + "r4", False, RDF_TYPE, "iri", EX + "R", None, None),
        # numeric-LOOKING lexical but non-numeric datatype: type error
        (None, EX + "r4", False, EX + "v", "literal", "7",
         XSD + "string", None),
    ]
    shapes = [{"id": "R", "target_class": EX + "R",
               "properties": [{"path": EX + "v", "min_inclusive": 0,
                               "max_inclusive": 10}]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        ("R", EX + "r2", EX + "v", "min_inclusive", "soon"),
        ("R", EX + "r2", EX + "v", "max_inclusive", "soon"),
        ("R", EX + "r3", EX + "v", "min_inclusive", EX + "five"),
        ("R", EX + "r3", EX + "v", "max_inclusive", EX + "five"),
        ("R", EX + "r4", EX + "v", "min_inclusive", "7"),
        ("R", EX + "r4", EX + "v", "max_inclusive", "7"),
    }


def test_equals_disjoint_are_term_aware(spark):
    """sh:equals/sh:disjoint compare RDF terms ([spec] §4.5): 'x'@en and
    'x'@fr differ; an IRI never equals a same-lexical literal."""
    LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    rows = [
        (None, EX + "t1", False, RDF_TYPE, "iri", EX + "T", None, None),
        (None, EX + "t1", False, EX + "a", "literal", "x", LS, "en"),
        (None, EX + "t1", False, EX + "b", "literal", "x", LS, "fr"),
        (None, EX + "t2", False, RDF_TYPE, "iri", EX + "T", None, None),
        (None, EX + "t2", False, EX + "a", "iri", EX + "x", None, None),
        (None, EX + "t2", False, EX + "same", "literal", EX + "x",
         XSD + "string", None),
        (None, EX + "t3", False, RDF_TYPE, "iri", EX + "T", None, None),
        (None, EX + "t3", False, EX + "a", "literal", "x", LS, "en"),
        (None, EX + "t3", False, EX + "b", "literal", "x", LS, "en"),
        (None, EX + "t3", False, EX + "same", "literal", "x", LS, "en"),
    ]
    shapes = [{"id": "T", "target_class": EX + "T",
               "properties": [{"path": EX + "a", "equals": EX + "b"},
                              {"path": EX + "a", "disjoint": EX + "same"}]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        # t1: 'x'@en vs 'x'@fr — both directions violate equals
        ("T", EX + "t1", EX + "a", "equals", "x"),
        # t2: IRI <ex:x> has no equal on b; same-lexical literal is NOT
        # shared (disjoint holds). equals reports both orphan sides.
        ("T", EX + "t2", EX + "a", "equals", EX + "x"),
        # t3: identical terms — equals holds, disjoint violated
        ("T", EX + "t3", EX + "a", "disjoint", "x"),
    }


def test_less_than_incomparable_pairs_violate(spark):
    """sh:lessThan ([spec] §4.5.3): SPARQL type errors (mixed numeric/
    string, lang-tagged operands, IRIs) are violations, never passes."""
    LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    rows = [
        (None, EX + "l1", False, RDF_TYPE, "iri", EX + "L", None, None),
        (None, EX + "l1", False, EX + "a", "literal", "5",
         XSD + "integer", None),
        (None, EX + "l1", False, EX + "z", "literal", "abc",
         XSD + "string", None),
        (None, EX + "l2", False, RDF_TYPE, "iri", EX + "L", None, None),
        (None, EX + "l2", False, EX + "a", "literal", "abc",
         XSD + "string", None),
        (None, EX + "l2", False, EX + "z", "literal", "abd",
         XSD + "string", None),
        (None, EX + "l3", False, RDF_TYPE, "iri", EX + "L", None, None),
        (None, EX + "l3", False, EX + "a", "literal", "hi", LS, "en"),
        (None, EX + "l3", False, EX + "z", "literal", "zz", LS, "en"),
        (None, EX + "l4", False, RDF_TYPE, "iri", EX + "L", None, None),
        (None, EX + "l4", False, EX + "a", "iri", EX + "n1", None, None),
        (None, EX + "l4", False, EX + "z", "iri", EX + "n2", None, None),
    ]
    shapes = [{"id": "L", "target_class": EX + "L",
               "properties": [{"path": EX + "a", "less_than": EX + "z"}]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {
        # numeric vs string: type error -> violation
        ("L", EX + "l1", EX + "a", "less_than", "5"),
        # lang-tagged operands: type error -> violation
        ("L", EX + "l3", EX + "a", "less_than", "hi"),
        # IRIs: type error -> violation
        ("L", EX + "l4", EX + "a", "less_than", EX + "n1"),
        # l2 'abc' < 'abd' lexically: conforms
    }


def test_pattern_bnode_always_violates(spark):
    rows = [
        (None, EX + "p", False, RDF_TYPE, "iri", EX + "P", None, None),
        (None, EX + "p", False, EX + "ref", "bnode", "_:abc", None, None),
        (None, EX + "p", False, EX + "ref", "iri", EX + "abc", None, None),
    ]
    shapes = [{"id": "P", "target_class": EX + "P",
               "properties": [{"path": EX + "ref", "pattern": "abc"}]}]
    got = viol(validate(q(spark, rows), shapes))
    # the IRI matches its string form; the bnode violates regardless
    assert got == {("P", EX + "p", EX + "ref", "pattern", "_:abc")}


def test_compound_node_kinds(spark):
    rows = [
        (None, EX + "k", False, RDF_TYPE, "iri", EX + "K", None, None),
        (None, EX + "k", False, EX + "v", "iri", EX + "i", None, None),
        (None, EX + "k", False, EX + "w", "literal", "lit", None, None),
        (None, EX + "k", False, EX + "w", "bnode", "_:b", None, None),
    ]
    shapes = [{"id": "K", "target_class": EX + "K",
               "properties": [
                   {"path": EX + "v", "node_kind": "bnode_or_iri"},
                   {"path": EX + "w", "node_kind": "bnode_or_literal"},
                   {"path": EX + "v", "node_kind": "iri_or_literal"}]}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == set()
    shapes[0]["properties"] = [{"path": EX + "w",
                                "node_kind": "bnode_or_iri"}]
    got = viol(validate(q(spark, rows), shapes))
    assert got == {("K", EX + "k", EX + "w", "node_kind", "lit")}


def test_term_key_no_boundary_collisions(spark):
    """ADVICE r04: distinct terms whose concatenations collide at the
    value/datatype boundary must produce DISTINCT join keys."""
    from rdflib_jsonld_spark.operators.validation import _term_key
    df = spark.createDataFrame(
        [("literal", "ab", "http://X", None),
         ("literal", "a", "bhttp://X", None),      # value suffix vs dt prefix
         ("literal", "x", "http://d", "en"),
         ("literal", "x", "http://den", None),     # dt suffix vs lang
         ("literal", "x\x1fy", "http://d", None),  # separator inside value
         ("literal", "x", "http://d", None)],
        "o_kind string, value string, o_datatype string, o_lang string")
    keys = [r.k for r in df.select(_term_key().alias("k")).collect()]
    assert len(set(keys)) == len(keys), keys
