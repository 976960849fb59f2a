"""Basic graph pattern (BGP) matching over the quad table.

rdflib users query constructed graphs with triple patterns (
``graph.triples((s, p, o))`` / SPARQL BGPs — the rdflib surface the
reference plugs into). The Spark-native equivalent: each pattern is a
filtered projection of the quad table; shared variables become equi-join
keys; Catalyst orders the joins and AQE picks broadcast/skew strategies.

Pattern syntax: a 3-tuple of strings; ``?name`` marks a variable,
anything else is a constant (IRI or plain-literal lexical). Example:

    match_bgp(quads, [
        ("?m", VOCAB + "about",   "?e"),
        ("?m", VOCAB + "surface", "?s"),
    ])  →  DataFrame(m, e, s)

Scale notes: each pattern scans the (bucketed, predicate-filterable) quad
table with its constants pushed down. The left-deep join order is chosen
by a selectivity heuristic (most constants first, then rarest predicate
when ``stats`` are supplied, connectivity-aware so no accidental cross
joins) — exactly the static ordering a triple store would pick; pass
``optimize=False`` to keep author order. Variables bind the string form
of terms (bnodes keep ``_:``); object bindings also carry hidden
``<var>__kind/__datatype/__lang`` companions when ``with_types=True`` so
CONSTRUCT can re-emit values with their original typing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _is_var(x: str) -> bool:
    return isinstance(x, str) and x.startswith("?")


def collect_predicate_stats(quads: DataFrame) -> dict[str, int]:
    """One cheap stats action: predicate → quad count, for join ordering.
    Run this on a MATERIALIZED quad table (running it on an unpersisted
    expansion plan would recompute the Python stage)."""
    return {r["p"]: r["n"] for r in
            quads.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()}


def _pattern_vars(pat: tuple[str, str, str]) -> set[str]:
    out = set()
    for x in pat:
        if _is_var(x):
            out.add(x[1:])
        elif isinstance(x, tuple) and x[0] == "qt":
            # RDF-star quoted pattern ("qt", s, p, o): inner vars join
            out |= {y[1:] for y in x[1:] if _is_var(y)}
    return out


def _order_patterns(patterns: list[tuple[str, str, str]],
                    stats: dict[str, int] | None) -> list[int]:
    """Greedy connectivity-aware selectivity order (returns indices).

    Score: more constants = more selective; among equals, a constant
    predicate with a lower corpus frequency (when stats given) wins; the
    original index breaks remaining ties (stable). After the first pick,
    only patterns sharing a variable with the bound set are considered
    unless none connects (disconnected groups keep their cross join)."""
    def sel_key(i: int):
        s, p, o = patterns[i]
        n_const = sum(0 if _is_var(x) else 1 for x in (s, p, o))
        freq = stats.get(p, 0) if (stats and not _is_var(p)) else 0
        return (-n_const, freq, i)

    remaining = list(range(len(patterns)))
    order: list[int] = []
    bound: set[str] = set()
    while remaining:
        connected = [i for i in remaining
                     if not order or (bound & _pattern_vars(patterns[i]))]
        pool = connected or remaining
        pick = min(pool, key=sel_key)
        order.append(pick)
        remaining.remove(pick)
        bound |= _pattern_vars(patterns[pick])
    return order


TYPED_PREFIX = "__typ_"  # reserved: user variables must not start with it
TK_PREFIX = "__tk_"      # reserved: normalized term-key companions


def term_key_col(kind, dt, lang):
    """Normalized TERM-DISCRIMINATOR column ([spec] SPARQL 1.1 §18.3:
    solution compatibility equates RDF TERMS, not lexical forms —
    sweep 37: value-only joins matched "a" with "a"@en). 'iri' /
    'bnode' / 'triple' by kind; literals 'L@<lang>' (lowercased — the
    rdf:langString-dt and bare-lang storage spellings normalize
    identically) or 'L<datatype>' with plain ≡ xsd:string. Joining on
    (value, term_key) is exact term equality."""
    return (F.when(kind == "literal",
                   F.concat(F.lit("L"),
                            F.when(lang.isNotNull(),
                                   F.concat(F.lit("@"), F.lower(lang)))
                            .otherwise(F.coalesce(
                                dt, F.lit(_XSD_STRING)))))
            .otherwise(kind))


def term_key_of(kind: str, dt: str | None, lang: str | None) -> str:
    """Python-side twin of :func:`term_key_col` for constant cells."""
    if kind != "literal":
        return kind
    if lang:
        return "L@" + lang.lower()
    return "L" + (dt or _XSD_STRING)


def _shape_key_col(value):
    """Term key derived from value shape alone — s/p/g positions bind
    IRIs or ('_:'-prefixed) bnodes, never literals."""
    return (F.when(value.startswith("_:"), F.lit("bnode"))
            .otherwise(F.lit("iri")))

_ENC_LIT_RE = re.compile(
    r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(\S+))?$', re.S)
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
_RDF_LANGSTRING = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                   "langString")


def encode_literal(value: str, lang: str | None = None,
                   datatype: str | None = None) -> str:
    """Constant-term encoding for literals that carry a language tag or
    datatype in pattern/template position (N-Triples-shaped, datatype
    bare). Plain literals stay bare strings — the kwargs surface's
    lexical-form matching convention (sweep 10: the text front-end's
    ``"Bob"@en`` matched ANY "Bob" because the tag was dropped)."""
    import json
    body = json.dumps(value)[1:-1]
    if lang:
        return f'"{body}"@{lang}'
    if datatype:
        return f'"{body}"^^{datatype}'
    return f'"{body}"'


def decode_literal(term: str) -> tuple | None:
    """Inverse of :func:`encode_literal` → ``(value, lang, datatype)``,
    or None when ``term`` is not in encoded form."""
    if not term.startswith('"'):
        return None
    m = _ENC_LIT_RE.match(term)
    if not m:
        return None
    import json
    return json.loads('"' + m.group(1) + '"'), m.group(2), m.group(3)


def _encoded_literal_filter(df: DataFrame, lit: tuple) -> DataFrame:
    """Exact-term match for an encoded literal constant: value, kind,
    and lang (case-insensitive) / datatype (xsd:string ≡ plain)."""
    value, lang, dt = lit
    df = df.where((F.col("o_value") == value)
                  & (F.col("o_kind") == "literal"))
    if lang:
        df = df.where(F.lower(F.col("o_lang")) == lang.lower())
    else:
        df = df.where(F.col("o_lang").isNull()
                      & (F.coalesce(F.col("o_datatype"),
                                    F.lit(_XSD_STRING))
                         == (dt or _XSD_STRING)))
    return df


def _pattern_df(quads: DataFrame, i: int, s: str, p: str, o: str,
                typed: set[str] | None = None,
                capture_types: bool = False,
                graph_var: str | None = None,
                emit_term_keys: bool = False) -> tuple:
    """One pattern → filtered projection. With ``capture_types``, a
    variable bound in OBJECT position also projects its
    o_kind/o_datatype/o_lang as hidden ``__typ_<var>__*`` companion
    columns (recorded in ``typed``). A variable repeated WITHIN the
    pattern (e.g. ("?x", p, "?x")) adds the positional equality filter
    instead of silently overwriting the earlier binding. With
    ``graph_var``, the g column binds that variable in every pattern
    (so multi-pattern matches require co-occurrence in ONE graph)."""
    df = quads
    cols = {}

    def lit_cols(src: str):
        """(kind, datatype, lang) column names when ``src`` can hold a
        LITERAL binding (object positions), else None."""
        if src == "o_value":
            return ("o_kind", "o_datatype", "o_lang")
        if src.startswith("__qt") and src.endswith("_ovalue"):
            base = src[:-len("ovalue")]
            return (base + "okind", base + "odt", base + "olang")
        return None

    def src_tk(src: str):
        lc = lit_cols(src)
        if lc is not None:
            return term_key_col(*(F.col(c) for c in lc))
        return _shape_key_col(F.col(src))

    def bind(var: str, src: str):
        nonlocal df
        if var in cols:
            prev = cols[var]
            df = df.where(F.col(prev) == F.col(src))
            # same-pattern repeat across positions equates TERMS, not
            # lexical forms (sweep 37): a literal in object position
            # never equals the IRI/bnode a subject/predicate slot binds
            a, b = lit_cols(prev), lit_cols(src)
            if a and b:
                df = df.where(term_key_col(*(F.col(c) for c in a))
                              == term_key_col(*(F.col(c) for c in b)))
            elif a:
                df = df.where(F.col(a[0]) != F.lit("literal"))
            elif b:
                df = df.where(F.col(b[0]) != F.lit("literal"))
        else:
            cols[var] = src

    type_proj = []

    def qt_constrain(term: tuple, source: str, slot: str):
        # RDF-star quoted pattern over the star.py table spelling in
        # ``source``: decompose ONCE into temp columns, then constants
        # filter and ?vars bind like any other position. Inner object
        # vars capture kind/datatype/lang companions from the
        # decomposition (they may be literals).
        nonlocal df
        from .star import quoted_components
        comps = quoted_components(F.col(source))
        names = [f"__qt{i}{slot}_{k}"
                 for k in ("s", "p", "okind", "ovalue", "odt", "olang")]
        for name, col in zip(names, comps):
            df = df.withColumn(name, col)
        qs_c, qp_c, qok_c, qov_c, qod_c, qol_c = names
        df = df.where(F.col(qs_c).isNotNull())
        for inner, colname in ((term[1], qs_c), (term[2], qp_c)):
            if isinstance(inner, tuple) and inner[0] == "qt":
                # nested quoted pattern (annotation on an annotation):
                # the decomposition left the inner '<< … >>' spelling in
                # this column — peel the next level recursively
                df = df.where(F.col(colname).startswith("<<"))
                qt_constrain(inner, colname, slot + "n")
            elif _is_var(inner):
                bind(inner[1:], colname)
            else:
                df = df.where(F.col(colname) == inner)
        io = term[3]
        if _is_var(io):
            var = io[1:]
            bind(var, qov_c)
            if capture_types and typed is not None and var not in typed:
                typed.add(var)
                type_proj.extend([
                    F.col(qok_c).alias(f"{TYPED_PREFIX}{var}__kind"),
                    F.col(qod_c).alias(f"{TYPED_PREFIX}{var}__datatype"),
                    F.col(qol_c).alias(f"{TYPED_PREFIX}{var}__lang")])
        else:
            lit = decode_literal(io)
            if lit is not None:
                lex, lang, dt = lit
                df = df.where((F.col(qov_c) == lex)
                              & (F.col(qok_c) == "literal"))
                if lang:
                    df = df.where(F.lower(F.col(qol_c)) == lang.lower())
                else:
                    df = df.where(
                        F.col(qol_c).isNull()
                        & (F.coalesce(F.col(qod_c), F.lit(_XSD_STRING))
                           == (dt or _XSD_STRING)))
            else:
                df = df.where(F.col(qov_c) == io)

    if graph_var is not None:
        bind(graph_var, "g")
    if isinstance(s, tuple) and s[0] == "qt":
        df = df.where(F.col("s").startswith("<<"))
        qt_constrain(s, "s", "s")
    elif _is_var(s):
        bind(s[1:], "s")
    else:
        df = df.where(F.col("s") == s)
    if _is_var(p):
        bind(p[1:], "p")
    else:
        df = df.where(F.col("p") == p)
    if isinstance(o, tuple) and o[0] == "qt":
        df = df.where(F.col("o_kind") == "triple")
        qt_constrain(o, "o_value", "o")
        o = "?__qt_consumed"  # sentinel: fall through neither branch
        proj = [F.col(src).alias(var) for var, src in cols.items()]
        tk_proj = [src_tk(src).alias(TK_PREFIX + var)
                   for var, src in cols.items()] if emit_term_keys \
            else []
        if not proj:
            proj = [F.lit(1).alias(f"_exists_{i}")]
        return df.select(*proj, *type_proj, *tk_proj), set(cols)
    if _is_var(o):
        var = o[1:]
        bind(var, "o_value")
        if capture_types and typed is not None and var not in typed:
            typed.add(var)
            type_proj = [
                F.col("o_kind").alias(f"{TYPED_PREFIX}{var}__kind"),
                F.col("o_datatype").alias(f"{TYPED_PREFIX}{var}__datatype"),
                F.col("o_lang").alias(f"{TYPED_PREFIX}{var}__lang")]
    else:
        lit = decode_literal(o)
        if lit is not None:
            df = _encoded_literal_filter(df, lit)
        else:
            df = df.where(F.col("o_value") == o)
    proj = [F.col(src).alias(var) for var, src in cols.items()]
    tk_proj = [src_tk(src).alias(TK_PREFIX + var)
               for var, src in cols.items()] if emit_term_keys else []
    if not proj:  # all-constant pattern: existence check → empty-schema row
        proj = [F.lit(1).alias(f"_exists_{i}")]
    return df.select(*proj, *type_proj, *tk_proj), set(cols)


def _companion_cols(columns) -> list[str]:
    return [c for c in columns if c.startswith(TYPED_PREFIX)]


_COMPANION_REF_RE = re.compile(
    rf"`{TYPED_PREFIX}(\w+?)__(kind|datatype|lang)`")


def patch_companion_refs(sql: str, columns) -> str:
    """Rewrite compiled-SQL references to companion columns that do not
    exist in the given solution table: a variable never bound in object
    position carries no captured kind/datatype/lang — its kind derives
    from the value shape (``_:`` prefix → bnode, else IRI) and its
    lang/datatype are NULL. Lets term-aware filters (sparql.py sweep 10)
    run against subject/predicate/graph variables without capturing
    companions for every position."""
    cols = set(columns)

    def rep(m):
        if m.group(0).strip("`") in cols:
            return m.group(0)
        if m.group(2) == "kind":
            v = f"`{m.group(1)}`"
            return (f"(CASE WHEN {v} IS NULL THEN NULL "
                    f"WHEN startswith({v}, '_:') THEN 'bnode' "
                    f"ELSE 'iri' END)")
        return "CAST(NULL AS STRING)"

    if TYPED_PREFIX in sql:
        sql = _COMPANION_REF_RE.sub(rep, sql)
    return _patch_missing_vars(sql, cols)


def _patch_missing_vars(sql: str, cols: set) -> str:
    """NULL out backticked references to columns absent from the
    solution table ([spec] a variable used in an expression but bound
    nowhere in the pattern is simply UNBOUND — a type error where
    evaluated, never an UNRESOLVED_COLUMN AnalysisException; sweep 37).
    Quote-aware: content inside single-quoted SQL string constants
    (which escape ``\\`` and ``'`` per the compiler's _sql_str) is
    never rewritten."""
    if "`" not in sql:
        return sql
    out = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "\\":
                    j += 2
                    continue
                if sql[j] == "'":
                    j += 1
                    break
                j += 1
            out.append(sql[i:j])
            i = j
            continue
        if ch == "`":
            j = sql.find("`", i + 1)
            if j < 0:
                out.append(sql[i:])
                break
            name = sql[i + 1:j]
            if name in cols or not re.fullmatch(r"\w+", name):
                out.append(sql[i:j + 1])
            else:
                out.append("CAST(NULL AS STRING)")
            i = j + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _first_object_binders(patterns) -> dict[str, int]:
    """var → ORIGINAL index of the first pattern binding it in object
    position. Companion typing is captured at exactly that pattern, so
    the emitted datatype does not depend on the join-order heuristic."""
    out: dict[str, int] = {}
    for i, (_, _, o) in enumerate(patterns):
        if _is_var(o) and o[1:] not in out:
            out[o[1:]] = i
    return out


def match_bgp(quads: DataFrame, patterns: list[tuple[str, str, str]],
              distinct: bool = True, optimize: bool = True,
              stats: dict[str, int] | None = None,
              with_types: bool = False,
              graph: str | None = None,
              keep_term_keys: bool = False) -> DataFrame:
    """Join all patterns on shared variables; returns one column per
    variable (SPARQL SELECT * semantics over a BGP, set results).

    ``graph`` scopes the match (SPARQL GRAPH clause):
    - None (default): match quads in ANY graph — the rdflib
      ConjunctiveGraph semantics the rest of the pipeline uses;
    - ``"?g"``: named graphs only; the graph name binds to the variable
      (one more join key when patterns must co-occur in one graph);
    - an IRI/bnode-label constant: only that named graph.
    The quad-table filter (g IS NOT NULL / g = const) is pushed into the
    scan by Catalyst like any other pattern constant.
    """
    if not patterns:
        raise ValueError("empty BGP")
    if graph is not None:
        if _is_var(graph):
            quads = quads.where(F.col("g").isNotNull())
        else:
            quads = quads.where(F.col("g") == graph)
    graph_var = graph[1:] if (graph is not None and _is_var(graph)) else None
    order = _order_patterns(patterns, stats) if optimize \
        else list(range(len(patterns)))
    typed: set[str] | None = set() if with_types else None
    first_obj = _first_object_binders(patterns) if with_types else {}
    acc = None
    bound: set[str] = set()
    for i in order:
        s, p, o = patterns[i]
        capture = with_types and _is_var(o) and first_obj.get(o[1:]) == i
        df, vars_i = _pattern_df(quads, i, s, p, o, typed,
                                 capture_types=capture,
                                 graph_var=graph_var,
                                 emit_term_keys=keep_term_keys)
        if acc is None:
            acc, bound = df, vars_i
            continue
        shared = sorted(bound & vars_i)
        if shared:
            # join on (value, term_key) — exact TERM equality per
            # [spec] §18.3 (sweep 37: value-only joins matched "a"
            # with "a"@en and literals with same-lexical IRIs)
            keys = shared + [TK_PREFIX + v for v in shared
                             if TK_PREFIX + v in acc.columns
                             and TK_PREFIX + v in df.columns]
            acc = acc.join(df, on=keys, how="inner")
        else:
            acc = acc.crossJoin(df)  # disconnected pattern groups
        bound |= vars_i
    extra = _companion_cols(acc.columns) if with_types else []
    tks = sorted(c for c in acc.columns if c.startswith(TK_PREFIX))
    acc = acc.select(*sorted(bound), *sorted(extra), *tks) if bound \
        else acc
    if distinct:
        acc = acc.distinct()   # term-level: term keys are in scope
    if not keep_term_keys and tks:
        acc = acc.drop(*tks)
    return acc


def match_bgp_extended(quads: DataFrame,
                       patterns: list[tuple[str, str, str]],
                       optional: list[tuple[str, str, str]] | None = None,
                       filters: list[str] | None = None,
                       union: list[list[tuple[str, str, str]]] | None = None,
                       values: tuple[list[str], list[tuple]] | None = None,
                       not_exists: list[tuple[str, str, str]] | None = None,
                       minus: list[tuple[str, str, str]] | None = None,
                       distinct: bool = True,
                       optimize: bool = True,
                       stats: dict[str, int] | None = None,
                       with_types: bool = False,
                       graph: str | None = None) -> DataFrame:
    """BGP + the SPARQL constructs a graph user reaches for beyond
    conjunction, each mapped to its natural Spark join:

    - ``optional``: patterns LEFT-joined on their shared variables —
      unmatched rows keep NULL bindings (SPARQL OPTIONAL semantics for
      the non-correlated common case);
    - ``filters``: SQL boolean expressions over the bound variable
      columns (SPARQL FILTER), e.g. ``"conf > 0.5"`` — applied after all
      joins so they can reference optional bindings (checked with
      ``IS NOT NULL`` like SPARQL's bound());
    - ``union``: alternative pattern groups — ``{patterns} UNION {g}``
      for each group ``g``. Solution sets are combined with
      ``unionByName(allowMissingColumns=True)``: variables unbound in a
      branch are NULL-padded, exactly SPARQL's unbound semantics;
    - ``values``: inline solution bindings ``(var_names, rows)`` —
      SPARQL VALUES. Joined (inner) on the variables already bound;
      variables new to the query attach via the bindings themselves. A
      small driver-side literal table → Catalyst broadcasts it;
    - ``not_exists``: FILTER NOT EXISTS group — drop solutions for which
      the group matches with the shared variables substituted. Shared
      vars → ``left_anti`` equi-join; NO shared vars → the group acts as
      a global gate (any match empties the result), expressed as a
      constant-true anti-join against ``limit(1)`` of the group;
    - ``minus``: SPARQL MINUS group. Like NOT EXISTS on the shared
      variables, EXCEPT that with no shared variables MINUS removes
      nothing (the spec's domain-disjointness rule — the observable
      difference between the two negation forms). NULL bindings (from
      OPTIONAL) never match the anti-join key, mirroring MINUS's
      treatment of unbound-vs-bound incompatibility for the common case.

    Catalyst still owns join strategy/ordering; filters on required
    variables are pushed through the joins by the optimizer. Anti-joins
    broadcast when the negation group is small (AQE decides).

    NULL-binding caveat (documented deviation): a variable that is NULL
    in a solution (unbound — from a UNION pad or unmatched OPTIONAL)
    never equals a join key, so OPTIONAL/VALUES joined after UNION and
    the negation anti-joins treat unbound as NON-matching, whereas
    SPARQL's compatibility relation treats unbound as compatible with
    anything. All-bound solutions (every BGP-only query) are exact.
    """
    acc = match_bgp(quads, patterns, distinct=False, optimize=optimize,
                    stats=stats, with_types=with_types, graph=graph)
    for grp in union or []:
        alt = match_bgp(quads, grp, distinct=False, optimize=optimize,
                        stats=stats, with_types=with_types, graph=graph)
        acc = acc.unionByName(alt, allowMissingColumns=True)
    companions = set(_companion_cols(acc.columns))
    bound = set(acc.columns) - companions
    typed: set[str] | None = (
        {c[len(TYPED_PREFIX):].rsplit("__", 1)[0] for c in companions}
        if with_types else None)
    opt_first = _first_object_binders(optional or []) if with_types else {}
    for i, (s, p, o) in enumerate(optional or []):
        capture = with_types and _is_var(o) \
            and o[1:] not in (typed or set()) and opt_first.get(o[1:]) == i
        df, vars_i = _pattern_df(quads, 1000 + i, s, p, o, typed,
                                 capture_types=capture)
        shared = sorted(bound & vars_i)
        if not shared:
            raise ValueError(
                f"optional pattern {i} shares no variable with the BGP")
        acc = acc.join(df, on=shared, how="left")
        bound |= vars_i
        companions |= set(_companion_cols(df.columns))
    if values is not None:
        var_names, rows = values
        vdf = quads.sparkSession.createDataFrame(
            [tuple(r) if isinstance(r, (tuple, list)) else (r,)
             for r in rows], list(var_names))
        shared = sorted(bound & set(var_names))
        acc = acc.join(vdf, on=shared, how="inner") if shared \
            else acc.crossJoin(vdf)
        bound |= set(var_names)
    for group, is_minus in ((not_exists, False), (minus, True)):
        if not group:
            continue
        sub = match_bgp(quads, group, distinct=False, optimize=optimize,
                        stats=stats, graph=graph)
        shared = sorted(bound & set(sub.columns))
        if shared:
            acc = acc.join(sub.select(*shared), on=shared, how="left_anti")
        elif not is_minus:
            # NOT EXISTS with a disconnected group: any match removes
            # every solution — anti-join on TRUE against one probe row
            acc = acc.join(sub.limit(1), on=F.lit(True), how="left_anti")
        # MINUS with no shared variables removes nothing (spec rule)
    for expr in filters or []:
        acc = acc.where(F.expr(patch_companion_refs(expr, acc.columns)))
    acc = acc.select(*sorted(bound), *sorted(companions))
    return acc.distinct() if distinct else acc


def construct(quads: DataFrame,
              where: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL-CONSTRUCT-style graph transformation: match the WHERE BGP,
    instantiate each template triple per solution, emit a NEW quad table
    (default graph, deduplicated — graphs are sets, G4).

    Template positions are ``?var`` references or constants. A variable
    in object position re-emits with its ORIGINAL kind/datatype/language
    (threaded through the solution as companion columns), so a literal
    that happens to look like "mailto:x" stays a literal and typed
    literals keep their datatype. Variables that were only ever bound in
    subject/predicate position are IRIs-or-bnodes by construction and are
    classified by their ``_:`` prefix. Object CONSTANTS are classified by
    shape: absolute-IRI-looking → IRI, else xsd:string literal (the
    documented caveat for constants only).
    """
    sols = match_bgp_extended(quads, where, optional=optional,
                              filters=filters, distinct=True,
                              with_types=True)
    return instantiate_template(sols, template)


def _star_escape_col(c):
    """JVM twin of the star.py table-spelling literal escaping
    (backslash FIRST; matches operators/star.py term_to_star)."""
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def _qt_template_col(term: tuple, have: set):
    """Template quoted-triple term → a column building its star.py
    table spelling from the current solution row (SPARQL 1.2 annotation
    blocks / quoted templates in CONSTRUCT and Update). Components are
    vars (spelled by their type companions when captured), constants,
    or nested quoted terms (recursion)."""
    comps = []
    for pos in term[1:]:
        if isinstance(pos, tuple) and pos[0] == "qt":
            comps.append(_qt_template_col(pos, have))
            continue
        if _is_var(pos):
            var = pos[1:]
            v = F.col(var)
            shape = F.when(v.startswith("_:"), F.lit("bnode")) \
                .when(v.startswith("<<"), F.lit("triple")) \
                .otherwise(F.lit("iri"))
            if f"{TYPED_PREFIX}{var}__kind" in have:
                kind = F.coalesce(F.col(f"{TYPED_PREFIX}{var}__kind"),
                                  shape)
                dt = F.col(f"{TYPED_PREFIX}{var}__datatype")
                lang = F.col(f"{TYPED_PREFIX}{var}__lang")
            else:
                kind = shape
                dt = F.lit(None).cast("string")
                lang = F.lit(None).cast("string")
            lit_sp = F.concat(F.lit('"'), _star_escape_col(v), F.lit('"'))
            lit_sp = F.when(lang.isNotNull(),
                            F.concat(lit_sp, F.lit("@"), lang)) \
                .when(dt.isNotNull() & (dt != XSD_STRING),
                      F.concat(lit_sp, F.lit("^^<"), dt, F.lit(">"))) \
                .otherwise(lit_sp)
            comps.append(
                F.when(kind == "literal", lit_sp)
                .when(kind == "bnode", v)
                .when(kind == "triple", v)     # already a spelling
                .otherwise(F.concat(F.lit("<"), v, F.lit(">"))))
            continue
        enc = decode_literal(pos)
        if enc is not None:
            val, elang, edt = enc
            esc = (val.replace("\\", "\\\\").replace('"', '\\"')
                   .replace("\n", "\\n").replace("\r", "\\r")
                   .replace("\t", "\\t"))
            sp = f'"{esc}"'
            if elang:
                sp += f"@{elang}"
            elif edt and edt != XSD_STRING:
                sp += f"^^<{edt}>"
            comps.append(F.lit(sp))
        elif pos.startswith("_:"):
            comps.append(F.lit(pos))
        elif re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", pos):
            comps.append(F.lit(f"<{pos}>"))
        else:
            esc = (pos.replace("\\", "\\\\").replace('"', '\\"')
                   .replace("\n", "\\n").replace("\r", "\\r")
                   .replace("\t", "\\t"))
            comps.append(F.lit(f'"{esc}"'))
    return F.concat(F.lit("<< "), comps[0], F.lit(" "), comps[1],
                    F.lit(" "), comps[2], F.lit(" >>"))


def instantiate_template(sols: DataFrame,
                         template: list[tuple[str, str, str]],
                         graph: str | None = None) -> DataFrame:
    """Instantiate CONSTRUCT template triples over an arbitrary solution
    table (one column per variable, optional ``__typ_*`` companions) —
    the template half of :func:`construct`, reusable by callers that
    build their solution set some other way (e.g. the SPARQL text
    front-end's group-graph-pattern evaluator).

    ``graph`` names the target graph for every produced quad: ``None``
    (default graph), a constant IRI, or a ``?var`` bound in ``sols``
    (rows where it is unbound are skipped, mirroring s/p/o) — used by
    SPARQL Update's ``GRAPH {}`` template blocks."""
    have = set(sols.columns)
    dtypes = dict(sols.dtypes)
    # a TYPED solution column (numeric aggregate alias, boolean BIND)
    # is statically a literal — valid in object position only
    # (sweep 39: a COUNT-valued subquery alias in subject position
    # emitted an 'iri'-spelled literal subject)
    xsd = "http://www.w3.org/2001/XMLSchema#"
    _NUM_DTS = {"bigint": xsd + "integer", "int": xsd + "integer",
                "double": xsd + "double", "float": xsd + "double",
                "boolean": xsd + "boolean"}

    def _typed_lit(var: str) -> str | None:
        t = dtypes.get(var)
        if t is None or t == "string":
            return None
        if t.startswith("decimal"):
            return xsd + "decimal"
        return _NUM_DTS.get(t, XSD_STRING)

    if graph is None:
        g_col = F.lit(None).cast("string")
    elif _is_var(graph):
        g_col = F.col(graph[1:])
    else:
        g_col = F.lit(graph)

    out = None
    for s, p, o in template:
        if any(isinstance(pos, str) and _is_var(pos)
               and _typed_lit(pos[1:]) is not None for pos in (s, p)) \
                or (graph is not None and _is_var(graph)
                    and _typed_lit(graph[1:]) is not None):
            continue    # literal subject/predicate/graph — never valid
        def _subj(pos):
            if isinstance(pos, tuple) and pos[0] == "qt":
                # quoted-triple template term (annotation blocks /
                # '<< … >>' in CONSTRUCT/Update templates): build the
                # star.py table spelling from the solution row
                return _qt_template_col(pos, have)
            return F.col(pos[1:]) if _is_var(pos) else F.lit(pos)

        s_col, p_col = _subj(s), _subj(p)
        if isinstance(o, tuple) and o[0] == "qt":
            o_col = _qt_template_col(o, have)
            kind = F.lit("triple")
            dt = F.lit(None).cast("string")
            lang = F.lit(None).cast("string")
        elif _is_var(o) and _typed_lit(o[1:]) is not None:
            # typed computed column in object position: a literal of
            # the column's promoted datatype, value as its lexical form
            var = o[1:]
            o_col = F.col(var).cast("string")
            kind = F.when(o_col.isNotNull(), F.lit("literal"))
            dt = F.when(o_col.isNotNull(), F.lit(_typed_lit(var)))
            lang = F.lit(None).cast("string")
        elif _is_var(o):
            var = o[1:]
            o_col = F.col(var)
            shape_kind = F.when(o_col.startswith("_:"), F.lit("bnode")) \
                .otherwise(F.lit("iri"))
            if f"{TYPED_PREFIX}{var}__kind" in have:
                # companions can be NULL when the var's object binding
                # came from an unmatched OPTIONAL but the value itself is
                # bound via a required s/p position → fall back to shape
                # (s/p terms are IRIs-or-bnodes by construction)
                kind = F.coalesce(F.col(f"{TYPED_PREFIX}{var}__kind"),
                                  shape_kind)
                dt = F.col(f"{TYPED_PREFIX}{var}__datatype")
                lang = F.col(f"{TYPED_PREFIX}{var}__lang")
            else:  # bound only in s/p position → IRI or bnode
                kind = shape_kind
                dt = F.lit(None).cast("string")
                lang = F.lit(None).cast("string")
        elif (enc := decode_literal(o)) is not None:
            # lang/datatype-carrying literal constant (encode_literal);
            # engine identity convention (jsonld/tordf.py): tagged →
            # rdf:langString, plain → explicit xsd:string
            val, elang, edt = enc
            o_col = F.lit(val)
            kind = F.lit("literal")
            dt = F.lit(_RDF_LANGSTRING if elang
                       else (edt or XSD_STRING)).cast("string")
            lang = F.lit(elang).cast("string")
        else:
            o_col = F.lit(o)
            is_iri = F.lit(o).rlike(r"^([A-Za-z][A-Za-z0-9+.-]*:|_:)")
            kind = (F.when(F.lit(o).startswith("_:"), F.lit("bnode"))
                    .when(is_iri, F.lit("iri")).otherwise(F.lit("literal")))
            dt = F.when(~is_iri, F.lit(XSD_STRING)).otherwise(
                F.lit(None).cast("string"))
            lang = F.lit(None).cast("string")
        # positions cast to their lexical string form: a typed BIND
        # alias (boolean/numeric column) in a template position would
        # otherwise make this part's column typed and the cross-part
        # unionByName insert a crashing ANSI string cast (sweep 39)
        g_col, s_col, p_col, o_col = (c.cast("string") for c in
                                      (g_col, s_col, p_col, o_col))
        row = sols.select(
            g_col.alias("g"),
            s_col.alias("s"),
            s_col.startswith("_:").alias("s_is_bnode"),
            p_col.alias("p"),
            kind.alias("o_kind"),
            o_col.alias("o_value"),
            dt.alias("o_datatype"),
            lang.alias("o_lang"),
        ).where(s_col.isNotNull() & p_col.isNotNull() & o_col.isNotNull())
        # [spec] CONSTRUCT §16.2 / Update §3.1.3: instantiations that
        # would not be valid RDF are SKIPPED — a template var bound to
        # a literal cannot take subject/predicate/graph position, and a
        # bnode cannot be a predicate (sweep 39: a literal-bound ?s
        # emitted a literal-subject quad spelled as an IRI)
        for pos, require_iri in ((s, False), (p, True)):
            if not (isinstance(pos, str) and _is_var(pos)):
                continue
            kc = f"{TYPED_PREFIX}{pos[1:]}__kind"
            if kc in have:
                k_ok = F.coalesce(F.col(kc), F.lit("iri")) \
                    .isin(*(["iri"] if require_iri
                            else ["iri", "bnode", "triple"]))
                row = row.where(k_ok)
            if require_iri:
                row = row.where(~F.col("p").startswith("_:"))
        if graph is not None and _is_var(graph):
            row = row.where(F.col("g").isNotNull())
            gkc = f"{TYPED_PREFIX}{graph[1:]}__kind"
            if gkc in have:
                row = row.where(F.coalesce(F.col(gkc), F.lit("iri"))
                                .isin("iri", "bnode"))
        out = row if out is None else out.unionByName(row)
    if out is None:
        # every template triple was statically invalid (typed-literal
        # subject/predicate) — an empty quad table
        return sols.sparkSession.createDataFrame(
            [], schema="g string, s string, s_is_bnode boolean, "
                       "p string, o_kind string, o_value string, "
                       "o_datatype string, o_lang string")
    return out.dropDuplicates(
        ["g", "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"])
