"""Golden-corpus tests for the pure JSON-LD→RDF core (SURVEY.md §5.2.1-2).

Each fixture in tests/fixtures/tordf/*.json carries hand-authored expected
N-Quads (see make_corpus.py provenance note). The comparison is
bnode-isomorphism-aware (SURVEY.md §4.3.1). The module also computes the
corpus-level P/R gate from BASELINE.md (target ≥0.95, goal 1.0).
"""

import json
from pathlib import Path

import pytest

from rdflib_jsonld_spark.jsonld import to_rdf
from rdflib_jsonld_spark.jsonld.compare import isomorphic, precision_recall
from rdflib_jsonld_spark.jsonld.errors import JsonLdError
from rdflib_jsonld_spark.jsonld import nquads

FIXTURE_DIR = Path(__file__).parent / "fixtures" / "tordf"
FIXTURES = sorted(FIXTURE_DIR.glob("*.json"))


def _load(path):
    return json.loads(path.read_text())


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_fixture(path):
    case = _load(path)
    opts = case.get("options", {})
    kwargs = dict(
        base=opts.get("base"),
        generalized_rdf=opts.get("generalized_rdf", False),
        allow_lists_of_lists=opts.get("allow_lists_of_lists", True),
        registry=case.get("registry"),
        rdf_direction=opts.get("rdf_direction"),
    )
    if "expect_error" in case:
        with pytest.raises(JsonLdError) as exc:
            to_rdf(case["input"], **kwargs)
        assert exc.value.code == case["expect_error"]
        return
    ours = to_rdf(case["input"], **kwargs)
    expected = nquads.parse(case["expected_nquads"])
    assert isomorphic(ours, expected), (
        f"{path.stem}:\nOURS:\n{nquads.serialize(ours)}\n"
        f"EXPECTED:\n{nquads.serialize(expected)}"
    )


def test_corpus_precision_recall_gate():
    """BASELINE.md gate: corpus-level P/R ≥ 0.95 (goal 1.0)."""
    tp_ours = tp_exp = n_ours = n_exp = 0
    for path in FIXTURES:
        case = _load(path)
        if "expect_error" in case:
            continue
        opts = case.get("options", {})
        ours = to_rdf(case["input"], base=opts.get("base"),
                      generalized_rdf=opts.get("generalized_rdf", False),
                      allow_lists_of_lists=opts.get("allow_lists_of_lists", True),
                      registry=case.get("registry"),
                      rdf_direction=opts.get("rdf_direction"))
        expected = nquads.parse(case["expected_nquads"])
        p, r = precision_recall(ours, expected)
        n_ours += len(ours)
        n_exp += len(expected)
        tp_ours += p * len(ours)
        tp_exp += r * len(expected)
    precision = tp_ours / n_ours
    recall = tp_exp / n_exp
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # stretch goal: exact on the vendored corpus
    assert precision == 1.0 and recall == 1.0, (precision, recall)


def test_rdf_direction_roundtrip():
    """to_rdf(i18n-datatype) → from_rdf(i18n-datatype) reproduces
    @language/@direction value objects (JLD-API 1.1 §10.5/§10.6)."""
    from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
    doc = {"@id": "http://e/s",
           "http://e/p": {"@value": "hello", "@language": "en",
                          "@direction": "ltr"}}
    quads = to_rdf(doc, rdf_direction="i18n-datatype")
    assert quads[0][3] == ("lit", "hello",
                           "https://www.w3.org/ns/i18n#en_ltr", None)
    [node] = from_rdf(quads, rdf_direction="i18n-datatype")
    [vobj] = node["http://e/p"]
    assert vobj == {"@value": "hello", "@language": "en",
                    "@direction": "ltr"}
    # default mode leaves the i18n datatype opaque (typed literal)
    [node2] = from_rdf(quads)
    assert node2["http://e/p"][0]["@type"].startswith(
        "https://www.w3.org/ns/i18n#")
    import pytest as _pytest
    # compound-literal is now the SUPPORTED second mode (see
    # test_compound_literal.py); only typo'd modes raise
    with _pytest.raises(ValueError):
        to_rdf(doc, rdf_direction="compound")


def test_nquads_roundtrip():
    from rdflib_jsonld_spark.jsonld.nquads import parse, quad_to_nq
    line = '<http://e/s> <http://e/p> "a\\"b\\nc"@en-us <http://e/g> .'
    (q,) = parse(line)
    assert quad_to_nq(q) == line
