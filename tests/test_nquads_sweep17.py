"""Sweep-17 regression corpus: N-Quads grammar corners ([spec] RDF 1.1
N-Quads, W3C Rec 2014-02-25).

Pure-core fixes: full ECHAR set (\\b \\f \\' were kept as raw two-char
sequences); UCHAR unescaping in the DATATYPE IRI position; bnode labels no
longer swallow the terminating '.'; parse_line validates the full
statement (missing final dot / trailing garbage raise — silent-accept
class); a trailing '# comment' after the dot is legal; LANGTAG follows the
spec production (must start alphabetic).

Spark fast-path fixes: IRIs/datatypes are UCHAR-unescaped (was a pure-vs-
vectorized divergence); malformed lines raise under strict=True (default)
instead of vanishing; trailing comments and spec LANGTAG accepted.
"""

import pytest

from rdflib_jsonld_spark.jsonld.nquads import parse_line, _unescape

EX_S = ("iri", "http://e/s")
EX_P = ("iri", "http://e/p")


def test_echar_full_set():
    q = parse_line('<http://e/s> <http://e/p> "a\\bz \\f \\\' end" .')
    assert q[3] == ("lit", "a\bz \f ' end",
                    "http://www.w3.org/2001/XMLSchema#string", None)


def test_uchar_in_iris_and_datatype():
    q = parse_line('<http://e/\\u0041> <http://e/p> '
                   '"x"^^<http://e/dt\\u0042> .')
    assert q[1] == ("iri", "http://e/A")
    assert q[3] == ("lit", "x", "http://e/dtB", None)


def test_bnode_label_does_not_eat_final_dot():
    q = parse_line('<http://e/s> <http://e/p> _:b0.')
    assert q[3] == ("bnode", "b0")
    # internal dots stay part of the label (PN_CHARS allows medial '.')
    q = parse_line('<http://e/s> <http://e/p> _:a.b .')
    assert q[3] == ("bnode", "a.b")


def test_missing_final_dot_raises():
    with pytest.raises(ValueError, match="missing final"):
        parse_line('<http://e/s> <http://e/p> <http://e/o>')


def test_trailing_garbage_raises():
    with pytest.raises(ValueError):
        parse_line('<http://e/s> <http://e/p> <http://e/o> '
                    '<http://e/g> xx .')
    with pytest.raises(ValueError, match="trailing content"):
        parse_line('<http://e/s> <http://e/p> <http://e/o> . .')


def test_trailing_comment_is_legal():
    q = parse_line('<http://e/s> <http://e/p> <http://e/o> . # done')
    assert q == (None, EX_S, EX_P, ("iri", "http://e/o"))


def test_langtag_grammar():
    assert parse_line('<http://e/s> <http://e/p> "x"@en-US-2 .')[3] == \
        ("lit", "x", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
         "en-us-2")
    with pytest.raises(ValueError):
        parse_line('<http://e/s> <http://e/p> "x"@419 .')


# ---- Spark fast path ------------------------------------------------------

def _collect(spark, tmp_path, lines, **kw):
    from rdflib_jsonld_spark.sources.nquads_io import read_nquads
    p = tmp_path / "s17.nq"
    p.write_text("\n".join(lines) + "\n")
    return sorted(map(tuple, read_nquads(spark, str(p), **kw).collect()),
                  key=lambda t: tuple(str(x) for x in t))


def test_spark_uchar_iri_matches_pure(spark, tmp_path):
    rows = _collect(spark, tmp_path, [
        '<http://e/\\u0041> <http://e/p> "v"^^<http://e/dt\\u0042> .',
    ])
    assert rows == [(None, "http://e/A", False, "http://e/p",
                     "literal", "v", "http://e/dtB", None)]


def test_spark_trailing_comment_and_echars(spark, tmp_path):
    rows = _collect(spark, tmp_path, [
        '<http://e/s> <http://e/p> "a\\bz\\f\\\'" . # trailing',
    ])
    assert rows == [(None, "http://e/s", False, "http://e/p",
                     "literal", "a\bz\f'",
                     "http://www.w3.org/2001/XMLSchema#string", None)]


def test_spark_strict_raises_on_malformed(spark, tmp_path):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as ei:
        _collect(spark, tmp_path, [
            '<http://e/s> <http://e/p> <http://e/o> .',
            'this is not an nquad',
        ])
    assert "malformed N-Quads line" in str(ei.value)


def test_spark_permissive_skips_malformed(spark, tmp_path):
    rows = _collect(spark, tmp_path, [
        '<http://e/s> <http://e/p> <http://e/o> .',
        'this is not an nquad',
        '# comment',
        '',
    ], strict=False)
    assert rows == [(None, "http://e/s", False, "http://e/p",
                     "iri", "http://e/o", None, None)]


def test_spark_comments_blank_ok_under_strict(spark, tmp_path):
    rows = _collect(spark, tmp_path, [
        '# leading comment',
        '',
        '   ',
        '<http://e/s> <http://e/p> "x"@en-GB .',
    ])
    assert rows == [(None, "http://e/s", False, "http://e/p",
                     "literal", "x",
                     "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                     "en-gb")]
