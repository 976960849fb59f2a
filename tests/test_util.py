"""norm_url / split_iri unit tests — parity with the reference's
test/test_util.py doctest wrapper (SURVEY.md §5.1; [v0.5.0] util.py)."""

from rdflib_jsonld_spark.jsonld.context import norm_url, split_iri


def test_norm_url_joins():
    base = "http://example.org/dir/doc"
    assert norm_url(base, "other") == "http://example.org/dir/other"
    assert norm_url(base, "/abs") == "http://example.org/abs"
    assert norm_url(base, "#frag") == "http://example.org/dir/doc#frag"
    assert norm_url(base, "../up") == "http://example.org/up"
    assert norm_url(base, "http://other.org/x") == "http://other.org/x"
    assert norm_url(None, "rel") == "rel"
    assert norm_url(base, "") == base


def test_split_iri():
    assert split_iri("http://ex.org/ns#name") == ("http://ex.org/ns#", "name")
    assert split_iri("http://ex.org/path/leaf") == ("http://ex.org/path/", "leaf")
    assert split_iri("urn:uuid:abc") == ("urn:uuid:", "abc")
    ns, name = split_iri("http://ex.org/ns#")
    assert name is None or name == ""


def test_compare_canonicalize_properties():
    """The P/R comparator itself: relabeling is invisible; perturbation
    is visible (soundness of the gate, SURVEY.md §4.3.1)."""
    from rdflib_jsonld_spark.jsonld.compare import canonicalize, isomorphic
    from rdflib_jsonld_spark.jsonld.tordf import to_rdf
    doc = {"@context": {"ex": "http://e/"},
           "ex:p": [{"ex:q": "a"}, {"ex:q": "b", "ex:r": {"ex:q": "c"}}],
           "ex:list": {"@list": [1, 2, 3]}}
    q1 = to_rdf(doc, bnode_prefix="x")
    q2 = to_rdf(doc, bnode_prefix="completely/different#")
    assert isomorphic(q1, q2)
    assert canonicalize(q1) == canonicalize(q2)
    # drop one quad → not isomorphic
    assert not isomorphic(q1[:-1], q2)
    # swap a literal → not isomorphic
    q3 = [q if q[3] != ("lit", "a", "http://www.w3.org/2001/XMLSchema#string", None)
          else (q[0], q[1], q[2], ("lit", "z", q[3][2], None)) for q in q1]
    assert not isomorphic(q3, q2)
