"""SPARQL 1.1 property paths over the quad table.

The BGP surface (operators/bgp.py) covers conjunctive patterns +
OPTIONAL/FILTER/UNION/VALUES/negation; ``transitive_closure``
(operators/linking.py) covers ``p+``. This module completes the SPARQL
1.1 property-path grammar ([spec] SPARQL 1.1 Query §9, Property Paths)
as compositional DataFrame algebra:

    ========== =============================== =========================
    syntax     constructor                     Spark evaluation
    ========== =============================== =========================
    iri        ``link(iri)``                   predicate-filtered scan
    ^p         ``inv(p)``                      column swap (no shuffle)
    p1/p2      ``seq(p1, p2)``                 equi-join dst=src
    p1|p2      ``alt(p1, p2)``                 union + distinct
    p+         ``plus(p)``                     path-doubling closure
    p*         ``star(p)``                     closure ∪ zero-length
    p?         ``opt(p)``                      edges ∪ zero-length
    !(a|b)     ``nps([a, b])``                 anti-filtered scan
    ========== =============================== =========================

``parse_path("about/(sameAs|^sameAs)*")`` builds the same AST from the
SPARQL surface syntax (bare tokens or ``<iri>``; precedence ``|`` <
``/`` < postfix ``*+?`` < prefix ``^``/``!``, parens group).

Semantics notes ([spec] §9.3 evaluation, §18.4 ALP):
- a path evaluates to the DISTINCT set of (src, dst) term pairs it
  connects — SPARQL path evaluation is set-based (no duplicate solutions
  from multiple routes, no infinite cycles);
- zero-length paths (``*``/``?``) with variable endpoints match every
  TERM IN THE GRAPH to itself — subjects and objects, literals
  included; with a CONSTANT endpoint they match the constant to itself
  unconditionally, graph membership not required ([spec] §18.4
  ZeroLengthPath — sweep 21);
- ``nps`` is the forward negated property set ``!(iri1|...|irin)``;
  inverse and mixed member forms (``!^a``, ``!(a|^b)``) desugar at
  parse time via the spec's own algebra translation
  ``alt(NPS(fwd), inv(NPS(rev)))`` ([spec] §18.2.2.3 — sweep 10).
- terms are compared by their binding string (the engine-wide BGP
  convention): bnodes as ``_:label``, literals by lexical form.

Scale: every combinator is JVM-side column algebra; the only iterative
piece is the closure (path doubling = O(log diameter) shuffle rounds,
``localCheckpoint`` per round — linking.py:181). ``match_path`` with a
constant endpoint switches to SEEDED evaluation (frontier expansion from
the constant, O(path-length + diameter) small rounds) so a bounded query
like ``<e> sameAs* ?x`` never materializes the full closure — the ALP
shape of [spec] §18.4. An unseeded ``star``/``opt`` materializes the
node universe (≤ 2× quad count rows) — intended for alias-graph-sized
relations, same posture as transitive_closure.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .linking import transitive_closure

# ---------------------------------------------------------------------------
# AST constructors (plain tuples: picklable, hashable, printable)
# ---------------------------------------------------------------------------


def link(iri: str) -> tuple:
    return ("link", iri)


def inv(path: tuple) -> tuple:
    return ("inv", path)


def seq(*paths: tuple) -> tuple:
    if len(paths) < 2:
        raise ValueError("seq needs >= 2 parts")
    return ("seq", *paths)


def alt(*paths: tuple) -> tuple:
    if len(paths) < 2:
        raise ValueError("alt needs >= 2 parts")
    return ("alt", *paths)


def plus(path: tuple) -> tuple:
    return ("plus", path)


def star(path: tuple) -> tuple:
    return ("star", path)


def opt(path: tuple) -> tuple:
    return ("opt", path)


def nps(iris: list[str]) -> tuple:
    if not iris:
        raise ValueError("negated property set needs >= 1 IRI")
    return ("nps", tuple(iris))


# ---------------------------------------------------------------------------
# surface-syntax parser
# ---------------------------------------------------------------------------

_SPECIAL = set("/|^()*+?!<>")


def _tokenize(s: str) -> list[str]:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c == "<":  # <iri> — may contain specials
            j = s.index(">", i)
            out.append(s[i + 1:j])
            out.append("\0iri")  # marker: previous token is a raw IRI
            i = j + 1
        elif c in _SPECIAL:
            out.append(c)
            i += 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in _SPECIAL:
                j += 1
            out.append(s[i:j])
            out.append("\0iri")
            i = j
    return out


def parse_path(s: str) -> tuple:
    """Parse SPARQL property-path surface syntax into the tuple AST.

    Grammar (SPARQL 1.1 §9.1): alternation ``|`` binds loosest, then
    sequence ``/``, then postfix ``* + ?``, then prefix ``^`` and
    ``!(...)``; parentheses group. IRIs are bare tokens or ``<...>``.
    """
    toks = _tokenize(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take(expected=None):
        nonlocal pos
        t = toks[pos]
        if expected is not None and t != expected:
            raise ValueError(f"expected {expected!r}, got {t!r} in {s!r}")
        pos += 1
        return t

    def parse_alt():
        parts = [parse_seq()]
        while peek() == "|":
            take("|")
            parts.append(parse_seq())
        return parts[0] if len(parts) == 1 else ("alt", *parts)

    def parse_seq():
        parts = [parse_postfix()]
        while peek() == "/":
            take("/")
            parts.append(parse_postfix())
        return parts[0] if len(parts) == 1 else ("seq", *parts)

    def parse_postfix():
        node = parse_primary()
        while peek() in ("*", "+", "?"):
            node = {"*": star, "+": plus, "?": opt}[take()](node)
        return node

    def parse_primary():
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of path in {s!r}")
        if t == "^":
            take("^")
            return inv(parse_primary())
        if t == "!":
            take("!")
            fwd: list[str] = []
            rev: list[str] = []

            def one_member():
                if peek() == "^":
                    take("^")
                    rev.append(take())
                else:
                    fwd.append(take())
                take("\0iri")

            if peek() == "(":
                take("(")
                one_member()
                while peek() == "|":
                    take("|")
                    one_member()
                take(")")
            else:
                one_member()   # paren-less !iri / !^iri form
            # [spec] §18.2.2.3: !(f…|^r…) = alt(NPS(f…), inv(NPS(r…)))
            parts = ([nps(fwd)] if fwd else []) \
                + ([inv(nps(rev))] if rev else [])
            return parts[0] if len(parts) == 1 else alt(*parts)
        if t == "(":
            take("(")
            node = parse_alt()
            take(")")
            return node
        iri = take()
        take("\0iri")
        return link(iri)

    node = parse_alt()
    if pos != len(toks):
        raise ValueError(f"trailing tokens {toks[pos:]!r} in {s!r}")
    return node


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def _scoped(quads: DataFrame, graph: str | None) -> DataFrame:
    if graph is None:
        return quads
    if graph == "*":  # any NAMED graph
        return quads.where(F.col("g").isNotNull())
    return quads.where(F.col("g") == graph)


_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _enc_obj():
    """Self-describing spelling of the OBJECT term for path edges:
    literals as ``"esc"``, ``"esc"@lang`` (tag lowercased), or
    ``"esc"^^dt`` (xsd:string ≡ plain); IRIs and ``_:`` bnodes stay
    bare. Injective, so closure joins and distinct() operate on exact
    TERMS — sweep 38: edges previously carried the bare lexical form,
    so a path-bound ``"b"@fr`` leaked into solutions as plain ``"b"``
    and distinct() merged differently-typed literals."""
    esc = F.regexp_replace(F.col("o_value"), r'([\\"])', r'\\$1')
    quoted = F.concat(F.lit('"'), esc, F.lit('"'))
    lang = F.lower(F.col("o_lang"))
    dt = F.expr(f"nullif(o_datatype, '{_XSD_STRING}')")
    lit = (F.when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang))
           .when(dt.isNotNull(), F.concat(quoted, F.lit("^^"), dt))
           .otherwise(quoted))
    return F.when(F.col("o_kind") == "literal", lit) \
        .otherwise(F.col("o_value"))


def _enc_const(value: str, lang: str | None = None,
               dt: str | None = None) -> str:
    """Python twin of :func:`_enc_obj` for constant literal
    endpoints."""
    body = value.replace("\\", "\\\\").replace('"', '\\"')
    if lang:
        return f'"{body}"@{lang.lower()}'
    if dt and dt != _XSD_STRING:
        return f'"{body}"^^{dt}'
    return f'"{body}"'


def _const_alts(term: str) -> list[str]:
    """Spellings a constant endpoint may take in the edge relation.
    An encoded literal (the text front-end encodes every literal,
    sweep 37) maps to its exact edge spelling; an IRI-shaped or
    ``_:`` bare constant stays bare; a bare NON-IRI-shaped constant
    (kwargs surface's plain-literal convention) seeds both its bare
    and plain-literal spellings."""
    from .bgp import decode_literal
    lit = decode_literal(term)
    if lit is not None:
        return [_enc_const(*lit)]
    if term.startswith("_:") \
            or re.match(r"[A-Za-z][A-Za-z0-9+.-]*:", term):
        return [term]
    return [term, _enc_const(term)]


def _decode_term_out(df: DataFrame, name: str) -> DataFrame:
    """Decode an edge-spelling output column back into the engine's
    solution convention: lexical value + ``__typ_*`` companions +
    ``__tk_`` term key."""
    from .bgp import TK_PREFIX, TYPED_PREFIX, term_key_col
    c = F.col(name)
    is_lit = c.startswith('"')
    raw = F.regexp_extract(c, r'^"((?:[^"\\]|\\.)*)"', 1)
    val = F.regexp_replace(raw, r'\\(.)', r'$1')
    lang_raw = F.regexp_extract(c, r'"@([A-Za-z0-9-]+)$', 1)
    dt_raw = F.regexp_extract(c, r'"\^\^(\S+)$', 1)
    kind = (F.when(is_lit, F.lit("literal"))
            .when(c.startswith("_:"), F.lit("bnode"))
            .otherwise(F.lit("iri")))
    lang = F.when(is_lit & (F.length(lang_raw) > 0), lang_raw)
    dt = F.when(is_lit & (F.length(dt_raw) > 0), dt_raw)
    return (df
            .withColumn(f"{TYPED_PREFIX}{name}__kind",
                        F.when(c.isNotNull(), kind))
            .withColumn(f"{TYPED_PREFIX}{name}__lang", lang)
            .withColumn(f"{TYPED_PREFIX}{name}__datatype", dt)
            .withColumn(TK_PREFIX + name,
                        F.when(c.isNotNull(),
                               term_key_col(kind, dt, lang)))
            .withColumn(name, F.when(is_lit, val).otherwise(c)))


def graph_nodes(quads: DataFrame, graph: str | None = None) -> DataFrame:
    """Distinct terms of the graph (subjects ∪ objects, literals
    included) as one ``node`` column — the zero-length-path domain.
    Object literals carry the :func:`_enc_obj` spelling, like every
    path edge."""
    q = _scoped(quads, graph)
    return (q.select(F.col("s").alias("node"))
            .union(q.select(_enc_obj().alias("node")))
            .distinct())


def _pairs(df: DataFrame) -> DataFrame:
    return df.select("src", "dst")


def eval_path(quads: DataFrame, path: tuple,
              graph: str | None = None, max_iter: int = 20) -> DataFrame:
    """Full-relation evaluation: DISTINCT (src, dst) pairs the path
    connects anywhere in the graph. ``graph`` scopes like the BGP GRAPH
    clause (None = any graph, "*" = named graphs only, else constant)."""
    q = _scoped(quads, graph)
    kind = path[0]
    if kind == "link":
        return _pairs(q.where(F.col("p") == path[1]).select(
            F.col("s").alias("src"), _enc_obj().alias("dst"))).distinct()
    if kind == "nps":
        return _pairs(q.where(~F.col("p").isin(*path[1])).select(
            F.col("s").alias("src"), _enc_obj().alias("dst"))).distinct()
    if kind == "inv":
        inner = eval_path(quads, path[1], graph, max_iter)
        return inner.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst"))
    if kind == "seq":
        # parts 2..n evaluate SEEDED from the left accumulator's dst set:
        # a trailing closure/star never materializes the full relation
        # (nor the node-universe identity) — only the reachable slice
        acc = eval_path(quads, path[1], graph, max_iter)
        for part in path[2:]:
            mid = acc.select(F.col("dst").alias("src")).distinct()
            right = _eval_from(quads, _push_inv(part), mid, graph, max_iter)
            acc = (acc.alias("a")
                   .join(right.alias("b"), F.col("a.dst") == F.col("b.src"))
                   .select(F.col("a.src").alias("src"),
                           F.col("b.dst").alias("dst"))
                   .distinct())
        return acc
    if kind == "alt":
        acc = eval_path(quads, path[1], graph, max_iter)
        for part in path[2:]:
            acc = acc.union(eval_path(quads, part, graph, max_iter))
        return acc.distinct()
    if kind == "plus":
        return transitive_closure(
            eval_path(quads, path[1], graph, max_iter), max_iter=max_iter)
    if kind in ("star", "opt"):
        base = eval_path(quads, path[1], graph, max_iter)
        if kind == "star":
            base = transitive_closure(base, max_iter=max_iter)
        ident = graph_nodes(quads, graph).select(
            F.col("node").alias("src"), F.col("node").alias("dst"))
        return base.union(ident).distinct()
    raise ValueError(f"unknown path node {path!r}")


def _push_inv(path: tuple, invert: bool = False) -> tuple:
    """Normalize so ``inv`` only wraps link/nps: ^(a/b) = ^b/^a,
    ^(p+) = (^p)+, ^^p = p ([spec] §9.3 path equivalences). Seeded
    evaluation relies on this — an un-pushed ``inv(plus(p))`` would
    force a full-relation closure just to filter it."""
    kind = path[0]
    if kind in ("link", "nps"):
        return ("inv", path) if invert else path
    if kind == "inv":
        return _push_inv(path[1], not invert)
    if kind == "seq":
        parts = [_push_inv(p, invert) for p in path[1:]]
        if invert:
            parts.reverse()
        return ("seq", *parts)
    if kind == "alt":
        return ("alt", *[_push_inv(p, invert) for p in path[1:]])
    if kind in ("plus", "star", "opt"):
        return (kind, _push_inv(path[1], invert))
    raise ValueError(f"unknown path node {path!r}")


def _seeded_closure(edges: DataFrame, seeds: DataFrame,
                    max_iter: int, include_zero: bool) -> DataFrame:
    """(origin, node) pairs reachable from each seed via >=1 (or >=0 when
    ``include_zero``) edge steps: frontier BFS with a visited set,
    O(diameter) small rounds, ``localCheckpoint`` per round.

    Constraint propagation is disabled for the loop's plans (restored
    after): Spark 4.1's LogicalRDD constraint rewrite chokes on
    checkpoints derived from anti-joins-against-checkpoints
    ("key not found: origin#N" from UnionBase.rewriteConstraints when the
    next round unions them). The loop's join keys gain nothing from
    propagated constraints — every relation here is already distinct and
    non-null by construction."""
    spark = edges.sparkSession
    prop_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(prop_key)
    spark.conf.set(prop_key, "false")
    try:
        origins = seeds.select(F.col("src").alias("origin")).distinct()
        if include_zero:
            visited = origins.select("origin", F.col("origin").alias("node"))
        else:
            visited = (origins.join(
                edges, origins["origin"] == edges["src"])
                .select("origin", F.col("dst").alias("node")).distinct())
        visited = visited.localCheckpoint(eager=True)
        frontier = visited
        for _ in range(max_iter):
            step = (frontier.alias("f")
                    .join(edges.alias("e"), F.col("f.node") == F.col("e.src"))
                    .select(F.col("f.origin").alias("origin"),
                            F.col("e.dst").alias("node"))
                    .distinct())
            new = step.join(visited, on=["origin", "node"], how="left_anti") \
                .localCheckpoint(eager=True)
            if new.limit(1).count() == 0:
                break
            nxt = visited.union(new).localCheckpoint(eager=True)
            visited.unpersist()
            visited = nxt
            frontier = new
    finally:
        spark.conf.set(prop_key, prev)
    return visited.select(F.col("origin").alias("src"),
                          F.col("node").alias("dst"))


def eval_path_from(quads: DataFrame, path: tuple, seeds: DataFrame,
                   graph: str | None = None,
                   max_iter: int = 20) -> DataFrame:
    """Seeded evaluation: (src, dst) pairs where src ∈ ``seeds`` (a
    one-column ``src`` DataFrame). Never materializes the full closure —
    closures run as frontier BFS from the seeds and sequences thread the
    reached set left-to-right, so cost scales with the reachable
    neighborhood, not the graph ([spec] §18.4 ALP shape)."""
    return _eval_from(quads, _push_inv(path), seeds, graph, max_iter)


def _eval_from(quads: DataFrame, path: tuple, seeds: DataFrame,
               graph: str | None, max_iter: int) -> DataFrame:
    seeds = seeds.select("src").distinct()
    kind = path[0]
    if kind in ("link", "nps"):
        return eval_path(quads, path, graph).join(seeds, on="src")
    if kind == "inv":
        # normalized: inner is link/nps. ^p from seeds = p arriving AT
        # seeds — a predicate-filtered scan joined on dst, then swap
        inner = eval_path(quads, path[1], graph, max_iter)
        return (inner.join(seeds.select(F.col("src").alias("dst")), on="dst")
                .select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if kind == "seq":
        acc = _eval_from(quads, path[1], seeds, graph, max_iter)
        for part in path[2:]:
            mid = acc.select(F.col("dst").alias("src")).distinct()
            right = _eval_from(quads, part, mid, graph, max_iter)
            acc = (acc.alias("a")
                   .join(right.alias("b"), F.col("a.dst") == F.col("b.src"))
                   .select(F.col("a.src").alias("src"),
                           F.col("b.dst").alias("dst"))
                   .distinct())
        return acc
    if kind == "alt":
        acc = _eval_from(quads, path[1], seeds, graph, max_iter)
        for part in path[2:]:
            acc = acc.union(_eval_from(quads, part, seeds, graph, max_iter))
        return acc.distinct()
    if kind in ("plus", "star"):
        # materialize the step relation once — the BFS loop scans it
        # every round (and it may carry a Python expansion upstream)
        edges = eval_path(quads, path[1], graph, max_iter) \
            .localCheckpoint(eager=True)
        # [spec] §18.4 ZeroLengthPath(term X, var Y) binds Y to X
        # UNCONDITIONALLY — a seeded (constant-endpoint) star includes
        # the seed itself even when it never occurs in the graph
        # (sweep 21; only the VAR-VAR zero-length path is restricted to
        # graph terms). Mid-sequence seeds always occur in the graph,
        # so this changes nothing for threaded sequences.
        return _seeded_closure(edges, seeds, max_iter,
                               include_zero=(kind == "star"))
    if kind == "opt":
        base = _eval_from(quads, path[1], seeds, graph, max_iter)
        ident = seeds.select("src", F.col("src").alias("dst"))
        return base.union(ident).distinct()
    raise ValueError(f"unknown path node {path!r}")


def _is_var(x: str) -> bool:
    return isinstance(x, str) and x.startswith("?")


def match_path(quads: DataFrame, subj: str, path: tuple | str, obj: str,
               graph: str | None = None, max_iter: int = 20,
               distinct: bool = True) -> DataFrame:
    """One path pattern ``subj path obj`` → solution DataFrame, the
    path analogue of a ``match_bgp`` pattern. ``subj``/``obj`` are
    ``?var`` or constants; ``path`` is an AST tuple or surface syntax
    (``parse_path`` applied). Constant endpoints switch to seeded
    evaluation (constant object evaluates the INVERSE path seeded from
    the object — same bounded cost). Join the result with
    ``match_bgp`` output on the shared variable names for mixed
    BGP+path queries."""
    if isinstance(path, str):
        path = parse_path(path)
    s_var, o_var = _is_var(subj), _is_var(obj)
    # constant endpoints seed with their EDGE spellings (sweep 38:
    # exact-term matching — an encoded "x"@en endpoint now matches
    # only the tagged literal; a bare constant seeds both its IRI and
    # plain-literal spellings for kwargs-surface compatibility)
    subj_alts = None if s_var else _const_alts(subj)
    obj_alts = None if o_var else _const_alts(obj)
    if not s_var:
        seeds = quads.sparkSession.createDataFrame(
            [(a,) for a in subj_alts], ["src"])
        pairs = eval_path_from(quads, path, seeds, graph, max_iter)
    elif not o_var:
        seeds = quads.sparkSession.createDataFrame(
            [(a,) for a in obj_alts], ["src"])
        pairs = eval_path_from(quads, inv(path), seeds, graph, max_iter) \
            .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        pairs = eval_path(quads, path, graph, max_iter)

    if s_var and o_var:
        if subj == obj:  # same variable both ends → cyclic constraint
            out = pairs.where(F.col("src") == F.col("dst")) \
                .select(F.col("src").alias(subj[1:]))
        else:
            out = pairs.select(F.col("src").alias(subj[1:]),
                               F.col("dst").alias(obj[1:]))
    elif s_var:
        out = pairs.where(F.col("dst").isin(obj_alts)) \
            .select(F.col("src").alias(subj[1:]))
    elif o_var:
        out = pairs.where(F.col("src").isin(subj_alts)) \
            .select(F.col("dst").alias(obj[1:]))
    else:  # ASK shape: both constant → 0/1 row existence
        out = pairs.where(F.col("src").isin(subj_alts)
                          & F.col("dst").isin(obj_alts)) \
            .select(F.lit(1).alias("_exists"))
    out = out.distinct() if distinct else out
    # decode edge spellings into the solution convention (lexical
    # value + typing companions + term key)
    for v in dict.fromkeys([subj[1:]] * s_var + [obj[1:]] * o_var):
        out = _decode_term_out(out, v)
    return out
