"""BGP matching over constructed quad tables."""

from pyspark.sql import functions as F

from rdflib_jsonld_spark.operators.bgp import match_bgp
from rdflib_jsonld_spark.operators.expand import (
    QUAD_SCHEMA, dedup_quads, expand_transcripts)
from rdflib_jsonld_spark.sources import transcripts as tr
from rdflib_jsonld_spark.sources.registry import KG, OWL_SAMEAS, VOCAB

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _quads(spark, rows):
    full = [(None, s, s.startswith("_:"), p, k, o, None, None, "c", 0)
            for s, p, o, k in rows]
    return spark.createDataFrame(full, schema=QUAD_SCHEMA)


def test_chain_pattern(spark):
    q = _quads(spark, [
        ("e:a", "e:knows", "e:b", "iri"),
        ("e:b", "e:knows", "e:c", "iri"),
        ("e:c", "e:knows", "e:a", "iri"),
        ("e:a", "e:name", "alice", "literal"),
    ])
    fof = match_bgp(q, [("?x", "e:knows", "?y"), ("?y", "e:knows", "?z")])
    got = {(r.x, r.y, r.z) for r in fof.collect()}
    assert ("e:a", "e:b", "e:c") in got and len(got) == 3
    named = match_bgp(q, [("?x", "e:knows", "?y"), ("?x", "e:name", "?n")])
    assert {(r.x, r.n) for r in named.collect()} == {("e:a", "alice")}


def test_constant_subject_and_object(spark):
    q = _quads(spark, [
        ("e:a", "e:p", "v1", "literal"),
        ("e:b", "e:p", "v1", "literal"),
        ("e:a", "e:q", "v2", "literal"),
    ])
    got = {r.s for r in
           match_bgp(q, [("?s", "e:p", "v1")]).collect()}
    assert got == {"e:a", "e:b"}
    preds = {r.p for r in match_bgp(q, [("e:a", "?p", "?v")]).collect()}
    assert preds == {"e:p", "e:q"}


def test_bgp_on_pipeline_output(spark):
    quads = dedup_quads(expand_transcripts(
        tr.transcripts_df(spark, n_convs=25, seed=42, partitions=4))).cache()
    # mentions of entities that have an explicit sameAs assertion
    res = match_bgp(quads, [
        ("?m", VOCAB + "about", "?e"),
        ("?e", OWL_SAMEAS, "?canon"),
        ("?m", RDF_TYPE, VOCAB + "Mention"),
    ])
    rows = res.collect()
    assert rows
    assert all(r.m.startswith(KG + "m/") for r in rows)
    assert all(r.e.startswith(KG + "e/") for r in rows)
    # cross-check one binding against direct filters
    direct = (quads.where((F.col("p") == OWL_SAMEAS)).select("s").distinct())
    with_sameas = {r.s for r in direct.collect()}
    assert {r.e for r in rows} <= with_sameas
    quads.unpersist()


def test_bgp_optional_and_filter(spark):
    """OPTIONAL keeps unmatched rows with NULL bindings; FILTER applies
    after joins (can test bound()-style null checks)."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    rows = [
        (None, "http://e/m1", False, "http://e/about", "iri", "http://e/a",
         None, None),
        (None, "http://e/m1", False, "http://e/conf", "literal", "0.9",
         None, None),
        (None, "http://e/m2", False, "http://e/about", "iri", "http://e/b",
         None, None),
    ]
    quads = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    out = match_bgp_extended(
        quads,
        [("?m", "http://e/about", "?e")],
        optional=[("?m", "http://e/conf", "?c")],
    ).collect()
    by_m = {r["m"]: (r["e"], r["c"]) for r in out}
    assert by_m["http://e/m1"] == ("http://e/a", "0.9")
    assert by_m["http://e/m2"] == ("http://e/b", None)

    filtered = match_bgp_extended(
        quads, [("?m", "http://e/about", "?e")],
        optional=[("?m", "http://e/conf", "?c")],
        filters=["c IS NOT NULL AND cast(c AS double) > 0.5"]).collect()
    assert len(filtered) == 1 and filtered[0]["m"] == "http://e/m1"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        match_bgp_extended(quads, [("?m", "http://e/about", "?e")],
                           optional=[("?x", "http://e/conf", "?c")])


def test_bgp_union_null_pads_disjoint_vars(spark):
    """UNION combines solution sets; variables unbound in a branch are
    NULL (SPARQL unbound semantics)."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    q = _quads(spark, [
        ("e:m1", "e:about", "e:a", "iri"),
        ("e:a", "e:sameAs", "e:canon", "iri"),
        ("e:m2", "e:label", "two", "literal"),
    ])
    # same vars in both branches → plain set union
    out = match_bgp_extended(q, [("?s", "e:about", "?o")],
                             union=[[("?s", "e:sameAs", "?o")]])
    got = {(r.s, r.o) for r in out.collect()}
    assert got == {("e:m1", "e:a"), ("e:a", "e:canon")}
    # branch-private variable → NULL-padded in the other branch's rows
    out2 = match_bgp_extended(q, [("?s", "e:about", "?o")],
                              union=[[("?s", "e:label", "?lbl")]])
    rows = {(r.s, r.o, r.lbl) for r in out2.collect()}
    assert rows == {("e:m1", "e:a", None), ("e:m2", None, "two")}


def test_bgp_values_inline_bindings(spark):
    """VALUES joins inline bindings on shared vars; unmatched binding
    rows contribute nothing; a no-shared-var VALUES cross-joins."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    q = _quads(spark, [
        ("e:m1", "e:about", "e:a", "iri"),
        ("e:m2", "e:about", "e:b", "iri"),
        ("e:m3", "e:about", "e:c", "iri"),
    ])
    out = match_bgp_extended(q, [("?m", "e:about", "?e")],
                             values=(["e"], [("e:a",), ("e:c",), ("e:zz",)]))
    assert {(r.m, r.e) for r in out.collect()} == \
        {("e:m1", "e:a"), ("e:m3", "e:c")}
    # new variable introduced by VALUES with no overlap → cross product
    out2 = match_bgp_extended(q, [("?m", "e:about", "e:a")],
                              values=(["tag"], ["t1", "t2"]))
    assert {(r.m, r.tag) for r in out2.collect()} == \
        {("e:m1", "t1"), ("e:m1", "t2")}


def test_bgp_not_exists_vs_minus(spark):
    """The observable semantic difference between the negation forms:
    with shared vars both anti-join; with NO shared vars NOT EXISTS
    empties the result when the group matches, MINUS removes nothing."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    q = _quads(spark, [
        ("e:m1", "e:about", "e:a", "iri"),
        ("e:m2", "e:about", "e:b", "iri"),
        ("e:a", "e:sameAs", "e:canon", "iri"),
    ])
    pat = [("?m", "e:about", "?e")]
    shared = [("?e", "e:sameAs", "?t")]
    ne = match_bgp_extended(q, pat, not_exists=shared)
    mi = match_bgp_extended(q, pat, minus=shared)
    assert {r.m for r in ne.collect()} == {"e:m2"}
    assert {r.m for r in mi.collect()} == {"e:m2"}
    disjoint = [("?x", "e:sameAs", "?y")]  # matches, shares no variable
    ne2 = match_bgp_extended(q, pat, not_exists=disjoint)
    mi2 = match_bgp_extended(q, pat, minus=disjoint)
    assert ne2.count() == 0          # NOT EXISTS: global gate fires
    assert mi2.count() == 2          # MINUS: domain-disjoint → no-op
    # non-matching disjoint group → NOT EXISTS keeps everything
    ne3 = match_bgp_extended(q, pat,
                             not_exists=[("?x", "e:nope", "?y")])
    assert ne3.count() == 2


def test_construct_preserves_term_typing(spark):
    """ADVICE r01: object variables must re-emit with their ORIGINAL
    kind/datatype/lang — an IRI-shaped literal ("mailto:x") stays a
    literal, typed literals keep their datatype, lang tags survive."""
    from rdflib_jsonld_spark.operators.bgp import construct
    rows = [
        (None, "http://e/m1", False, "http://e/note", "literal", "mailto:x",
         "http://www.w3.org/2001/XMLSchema#string", None),
        (None, "http://e/m1", False, "http://e/age", "literal", "42",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        (None, "http://e/m1", False, "http://e/label", "literal", "hi",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en"),
        (None, "http://e/m1", False, "http://e/link", "iri", "http://e/t",
         None, None),
    ]
    quads = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    for pred in ("note", "age", "label", "link"):
        out = construct(
            quads,
            where=[("?m", f"http://e/{pred}", "?v")],
            template=[("?m", f"http://e/out_{pred}", "?v")],
        ).collect()
        assert len(out) == 1
        src = next(r for r in rows if r[3] == f"http://e/{pred}")
        got = out[0]
        assert (got["o_kind"], got["o_value"], got["o_datatype"],
                got["o_lang"]) == (src[4], src[5], src[6], src[7]), pred


def test_construct_optional_rebind_falls_back_to_shape(spark):
    """r02 review regression: a variable bound as a required SUBJECT but
    re-bound in OBJECT position by an unmatched OPTIONAL has NULL
    companion typing — CONSTRUCT must fall back to shape classification
    (iri/bnode), never emit o_kind NULL."""
    from rdflib_jsonld_spark.operators.bgp import construct
    rows = [
        (None, "http://e/m1", False, "http://e/about", "iri", "http://e/a",
         None, None),
        (None, "http://e/s2", False, "http://e/q", "iri", "http://e/m1",
         None, None),
        (None, "http://e/m2", False, "http://e/about", "iri", "http://e/a",
         None, None),
    ]
    quads = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    out = construct(
        quads,
        where=[("?m", "http://e/about", "?e")],
        optional=[("?s2", "http://e/q", "?m")],  # rebinds ?m as object
        template=[("http://e/agg", "http://e/saw", "?m")],
    ).collect()
    kinds = {r["o_value"]: r["o_kind"] for r in out}
    # m2's optional missed → companion NULL → shape fallback says iri
    assert kinds == {"http://e/m1": "iri", "http://e/m2": "iri"}


def test_join_order_heuristic(spark):
    """Most-constant pattern leads; predicate stats break ties; the order
    stays connectivity-aware (no accidental cross join); results are
    identical with and without optimization."""
    from rdflib_jsonld_spark.operators.bgp import (
        _order_patterns, collect_predicate_stats, match_bgp)
    pats = [
        ("?m", "e:about", "?e"),            # 1 const
        ("?m", "e:type", "e:Mention"),      # 2 consts → leads
        ("?e", "e:sameAs", "?c"),           # 1 const, connects via ?e
    ]
    assert _order_patterns(pats, None)[0] == 1
    # stats tie-break between two 1-const patterns: rarer predicate first
    stats = {"e:about": 1000, "e:sameAs": 10, "e:type": 500}
    order = _order_patterns(pats, stats)
    assert order[0] == 1
    # after pattern 1 (binds ?m), only pattern 0 connects — pattern 2 must
    # NOT jump ahead despite its rarer predicate (cross-join avoidance)
    assert order[1] == 0 and order[2] == 2
    q = _quads(spark, [
        ("e:m1", "e:type", "e:Mention", "iri"),
        ("e:m1", "e:about", "e:a", "iri"),
        ("e:a", "e:sameAs", "e:canon", "iri"),
    ])
    r_opt = {tuple(r) for r in match_bgp(q, pats, optimize=True,
                                         stats=stats).collect()}
    r_raw = {tuple(r) for r in match_bgp(q, pats, optimize=False).collect()}
    assert r_opt == r_raw == {("e:canon", "e:a", "e:m1")}
    assert collect_predicate_stats(q) == {
        "e:type": 1, "e:about": 1, "e:sameAs": 1}


def test_construct_emits_new_graph(spark):
    """CONSTRUCT: solutions instantiate template triples into a fresh
    deduplicated quad table; NULL bindings drop the row."""
    from rdflib_jsonld_spark.operators.bgp import construct
    rows = [
        (None, "http://e/m1", False, "http://e/about", "iri", "http://e/a",
         None, None),
        (None, "http://e/m2", False, "http://e/about", "iri", "http://e/a",
         None, None),
        (None, "http://e/m2", False, "http://e/conf", "literal", "0.9",
         None, None),
    ]
    quads = spark.createDataFrame(
        rows, "g string, s string, s_is_bnode boolean, p string, "
              "o_kind string, o_value string, o_datatype string, "
              "o_lang string")
    out = construct(
        quads,
        where=[("?m", "http://e/about", "?e")],
        optional=[("?m", "http://e/conf", "?c")],
        template=[("?e", "http://e/mentionedBy", "?m"),
                  ("?e", "http://e/score", "?c"),
                  ("?e", "http://e/kind", "entity")],
    ).collect()
    got = {(r["s"], r["p"], r["o_value"], r["o_kind"]) for r in out}
    assert ("http://e/a", "http://e/mentionedBy", "http://e/m1",
            "iri") in got
    assert ("http://e/a", "http://e/mentionedBy", "http://e/m2",
            "iri") in got
    # optional c bound only for m2 → exactly one score triple
    assert sum(1 for t in got if t[1] == "http://e/score") == 1
    # constant object 'entity' is literal-typed; template dedups
    assert ("http://e/a", "http://e/kind", "entity", "literal") in got
    assert len([t for t in got if t[1] == "http://e/kind"]) == 1


def test_bgp_extensions_vs_reference_evaluator(spark):
    """Differential robustness: on random small graphs, the Spark BGP
    surface (conjunction, UNION, OPTIONAL-free negations) must agree
    with an independent naive SPARQL-algebra evaluator written directly
    from the spec (join of bindings / set union / anti-compatibility)."""
    import random

    def naive_match(rows, patterns):
        sols = [dict()]
        for (s, p, o) in patterns:
            new = []
            for b in sols:
                for (rs, rp, ro) in rows:
                    b2 = dict(b)
                    ok = True
                    for pos, val in (((s), rs), ((p), rp), ((o), ro)):
                        if pos.startswith("?"):
                            v = pos[1:]
                            if b2.get(v, val) != val:
                                ok = False
                                break
                            b2[v] = val
                        elif pos != val:
                            ok = False
                            break
                    if ok:
                        new.append(b2)
            sols = new
        return sols

    def as_set(sols, var_order):
        return {tuple(b.get(v) for v in var_order) for b in sols}

    rng = random.Random(7)
    preds = ["e:p", "e:q", "e:r"]
    nodes = [f"e:n{i}" for i in range(6)]
    for trial in range(6):
        rows = sorted({(rng.choice(nodes), rng.choice(preds),
                        rng.choice(nodes)) for _ in range(14)})
        q = _quads(spark, [(s, p, o, "iri") for s, p, o in rows])
        pat = [("?x", rng.choice(preds), "?y")]
        alt = [("?x", rng.choice(preds), "?y")]
        neg = [("?y", rng.choice(preds), "?z")]

        # conjunction + second hop
        two = pat + [("?y", rng.choice(preds), "?z")]
        got = {(r.x, r.y, r.z) for r in match_bgp(q, two).collect()}
        want = as_set(naive_match(rows, two), ["x", "y", "z"])
        assert got == want, (trial, "conj")

        from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
        # UNION
        got = {(r.x, r.y) for r in
               match_bgp_extended(q, pat, union=[alt]).collect()}
        want = as_set(naive_match(rows, pat), ["x", "y"]) \
            | as_set(naive_match(rows, alt), ["x", "y"])
        assert got == want, (trial, "union")

        # NOT EXISTS: drop solutions where the substituted group matches
        base = naive_match(rows, pat)
        neg_sols = naive_match(rows, neg)
        neg_ys = {b["y"] for b in neg_sols}
        want = {(b["x"], b["y"]) for b in base if b["y"] not in neg_ys}
        got = {(r.x, r.y) for r in
               match_bgp_extended(q, pat, not_exists=neg).collect()}
        assert got == want, (trial, "not_exists")

        # MINUS with shared var y: same as anti on y; with disjoint
        # group: no-op
        got = {(r.x, r.y) for r in
               match_bgp_extended(q, pat, minus=neg).collect()}
        assert got == want, (trial, "minus-shared")
        got = {(r.x, r.y) for r in
               match_bgp_extended(
                   q, pat, minus=[("?a", rng.choice(preds), "?b")])
               .collect()}
        assert got == {(b["x"], b["y"]) for b in base}, (trial, "minus-dis")


def test_bgp_graph_scoping(spark):
    """SPARQL GRAPH clause: constant scopes to one named graph; a
    variable binds graph names (named graphs only) and forces pattern
    co-occurrence within a single graph; default (None) keeps the
    rdflib ConjunctiveGraph any-graph semantics."""
    from rdflib_jsonld_spark.operators.bgp import (
        match_bgp, match_bgp_extended)
    rows = [
        ("e:g1", "e:a", "e:p", "v1"),
        ("e:g1", "e:a", "e:q", "w1"),
        ("e:g2", "e:a", "e:p", "v2"),
        ("e:g2", "e:b", "e:q", "w2"),
        (None,   "e:a", "e:p", "v0"),
    ]
    q = spark.createDataFrame(
        [(g, s, False, p, "literal", o, None, None) for g, s, p, o in rows],
        "g string, s string, s_is_bnode boolean, p string, o_kind string, "
        "o_value string, o_datatype string, o_lang string")
    # any-graph default
    got = {r.v for r in match_bgp(q, [("e:a", "e:p", "?v")]).collect()}
    assert got == {"v0", "v1", "v2"}
    # constant graph
    got = {r.v for r in match_bgp(q, [("e:a", "e:p", "?v")],
                                  graph="e:g1").collect()}
    assert got == {"v1"}
    # graph variable: binds names, excludes the default graph
    got = {(r.gr, r.v) for r in
           match_bgp(q, [("e:a", "e:p", "?v")], graph="?gr").collect()}
    assert got == {("e:g1", "v1"), ("e:g2", "v2")}
    # co-occurrence: both patterns must hold in the SAME graph
    got = {(r.gr, r.v, r.w) for r in match_bgp(
        q, [("e:a", "e:p", "?v"), ("?s2", "e:q", "?w")],
        graph="?gr").collect()}
    assert got == {("e:g1", "v1", "w1"), ("e:g2", "v2", "w2")}
    # GRAPH scope threads through the extended surface (negation here)
    got = {r.v for r in match_bgp_extended(
        q, [("e:a", "e:p", "?v")],
        not_exists=[("e:b", "e:q", "?z")], graph="e:g1").collect()}
    assert got == {"v1"}  # e:b/e:q exists only in g2 → not in scope


def test_bgp_constants_push_down_to_parquet_scan(spark, tmp_path):
    """Scale evidence: a BGP pattern's constants must reach the parquet
    scan as PushedFilters (predicate pushdown through the projection),
    and the scan must prune to the referenced columns only."""
    q = _quads(spark, [
        ("e:m1", "e:about", "e:a", "iri"),
        ("e:m1", "e:type", "e:Mention", "iri"),
        ("e:m2", "e:about", "e:b", "iri"),
    ])
    path = str(tmp_path / "quads.parquet")
    q.write.parquet(path)
    stored = spark.read.parquet(path)
    out = match_bgp(stored, [("?m", "e:about", "?e")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(p,e:about)" in plan.replace("`", ""), plan[:2000]
    # column pruning: the scan schema must not read o_datatype/o_lang
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "o_datatype" not in scan[0] and "o_lang" not in scan[0]
