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


def test_isomorphic_ignores_duplicate_multiplicity():
    """r02 review regression: graphs are SETS — a duplicated quad must
    not perturb WL signatures, even beyond the exact-search bound."""
    from rdflib_jsonld_spark.jsonld.compare import canonicalize, isomorphic
    P = ("iri", "http://e/p")
    chain = [(None, ("bnode", f"n{i}"), P, ("bnode", f"n{i+1}"))
             for i in range(12)]
    dup = chain + [chain[5]] * 3
    assert canonicalize(dup) == canonicalize(chain)
    assert isomorphic(dup, chain)


def test_scoped_propagate_from_registry_context():
    """r02 review regression: @propagate inside a REGISTRY-IRI scoped
    context must be honored (not just inline dicts)."""
    from rdflib_jsonld_spark.jsonld.tordf import to_rdf
    registry = {"http://e/scoped": {"@context": {"@propagate": False,
                                                 "name": "http://e/name"}}}
    doc = {"@context": {"ex": "http://e/",
                        "p": {"@id": "http://e/p",
                              "@context": "http://e/scoped"}},
           "@id": "http://e/s",
           "p": {"@id": "http://e/a",
                 "ex:child": {"@id": "http://e/b", "name": "x"}}}
    quads = to_rdf(doc, registry=registry)
    preds = {q[2][1] for q in quads}
    # 'name' must NOT resolve on the nested child (propagate: false)
    assert "http://e/name" not in preds
    assert "http://e/child" in preds


def test_from_rdf_rejects_bad_rdf_direction():
    from rdflib_jsonld_spark.jsonld.fromrdf import from_rdf
    import pytest as _pytest
    # both spec modes are supported (compound-literal landed r04)
    assert from_rdf([], rdf_direction="i18n-datatype") == []
    assert from_rdf([], rdf_direction="compound-literal") == []
    with _pytest.raises(ValueError):
        from_rdf([], rdf_direction="i18n_datatype")  # typo'd


def _cycle_quads(cycles: list[list[str]]):
    """Disjoint bnode cycles linked by one edge predicate."""
    P = ("iri", "http://e/p")
    out = []
    for nodes in cycles:
        for i, n in enumerate(nodes):
            out.append((None, ("bnode", n), P,
                        ("bnode", nodes[(i + 1) % len(nodes)])))
    return out


def test_isomorphic_wl_tied_regular_graphs():
    """ADVICE r01 regression: WL color refinement ties ALL nodes of a
    C4⊎C5 cycle union (every node degree-2, uniform neighborhoods), and
    the two sides' min-label individualization picks land in DIFFERENT
    cycles (>8 bnodes, so the exact-permutation fallback is out of
    reach). Branching individualization must still prove isomorphism —
    and must still reject the genuinely different C9."""
    from rdflib_jsonld_spark.jsonld.compare import isomorphic
    # side A: min label n0 sits in the C4
    a = _cycle_quads([["n0", "n1", "n2", "n3"],
                      ["n4", "n5", "n6", "n7", "n8"]])
    # side B: min label m0 sits in the C5
    b = _cycle_quads([["m0", "m1", "m2", "m3", "m4"],
                      ["m5", "m6", "m7", "m8"]])
    assert isomorphic(a, b)
    c9 = _cycle_quads([["k0", "k1", "k2", "k3", "k4", "k5", "k6", "k7",
                        "k8"]])
    assert not isomorphic(a, c9)
    assert not isomorphic(c9, b)
