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
table with its constants pushed down; the join graph is left-deep in
list order — put the most selective pattern first, exactly like a triple
store. Variables bind the string form of terms (bnodes keep ``_:``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _is_var(x: str) -> bool:
    return isinstance(x, str) and x.startswith("?")


def _pattern_df(quads: DataFrame, i: int, s: str, p: str, o: str) -> tuple:
    df = quads
    cols = {}
    if _is_var(s):
        cols[s[1:]] = "s"
    else:
        df = df.where(F.col("s") == s)
    if _is_var(p):
        cols[p[1:]] = "p"
    else:
        df = df.where(F.col("p") == p)
    if _is_var(o):
        cols[o[1:]] = "o_value"
    else:
        df = df.where(F.col("o_value") == o)
    proj = [F.col(src).alias(var) for var, src in cols.items()]
    if not proj:  # all-constant pattern: existence check → empty-schema row
        proj = [F.lit(1).alias(f"_exists_{i}")]
    return df.select(*proj), set(cols)


def match_bgp(quads: DataFrame, patterns: list[tuple[str, str, str]],
              distinct: bool = True) -> DataFrame:
    """Join all patterns on shared variables; returns one column per
    variable (SPARQL SELECT * semantics over a BGP, set results)."""
    if not patterns:
        raise ValueError("empty BGP")
    acc = None
    bound: set[str] = set()
    for i, (s, p, o) in enumerate(patterns):
        df, vars_i = _pattern_df(quads, i, s, p, o)
        if acc is None:
            acc, bound = df, vars_i
            continue
        shared = sorted(bound & vars_i)
        if shared:
            acc = acc.join(df, on=shared, how="inner")
        else:
            acc = acc.crossJoin(df)  # disconnected pattern groups
        bound |= vars_i
    acc = acc.select(*sorted(bound)) if bound else acc
    return acc.distinct() if distinct else acc


def match_bgp_extended(quads: DataFrame,
                       patterns: list[tuple[str, str, str]],
                       optional: list[tuple[str, str, str]] | None = None,
                       filters: list[str] | None = None,
                       distinct: bool = True) -> DataFrame:
    """BGP + the two most common SPARQL constructs beyond conjunction:

    - ``optional``: patterns LEFT-joined on their shared variables —
      unmatched rows keep NULL bindings (SPARQL OPTIONAL semantics for
      the non-correlated common case);
    - ``filters``: SQL boolean expressions over the bound variable
      columns (SPARQL FILTER), e.g. ``"conf > 0.5"`` — applied after all
      joins so they can reference optional bindings (checked with
      ``IS NOT NULL`` like SPARQL's bound()).

    Catalyst still owns join strategy/ordering; filters on required
    variables are pushed through the joins by the optimizer.
    """
    acc = match_bgp(quads, patterns, distinct=False)
    bound = set(acc.columns)
    for i, (s, p, o) in enumerate(optional or []):
        df, vars_i = _pattern_df(quads, 1000 + i, s, p, o)
        shared = sorted(bound & vars_i)
        if not shared:
            raise ValueError(
                f"optional pattern {i} shares no variable with the BGP")
        acc = acc.join(df, on=shared, how="left")
        bound |= vars_i
    for expr in filters or []:
        acc = acc.where(F.expr(expr))
    acc = acc.select(*sorted(bound))
    return acc.distinct() if distinct else acc


def construct(quads: DataFrame,
              where: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              filters: list[str] | None = None) -> DataFrame:
    """SPARQL-CONSTRUCT-style graph transformation: match the WHERE BGP,
    instantiate each template triple per solution, emit a NEW quad table
    (default graph, deduplicated — graphs are sets, G4).

    Template positions are ``?var`` references or constants; object
    constants become IRIs if absolute-IRI-shaped, else plain literals.
    Variables bound to NULL (unmatched optionals) drop that template row,
    mirroring SPARQL's incomplete-triple rule.
    """
    sols = match_bgp_extended(quads, where, optional=optional,
                              filters=filters, distinct=True)

    def _term(pos: str, as_obj: bool):
        if _is_var(pos):
            return F.col(pos[1:])
        return F.lit(pos)

    out = None
    for s, p, o in template:
        s_col, p_col, o_col = _term(s, False), _term(p, False), _term(o, True)
        is_lit = ~o_col.rlike(r"^([A-Za-z][A-Za-z0-9+.-]*:|_:)")
        row = sols.select(
            F.lit(None).cast("string").alias("g"),
            s_col.alias("s"),
            s_col.startswith("_:").alias("s_is_bnode"),
            p_col.alias("p"),
            F.when(is_lit, F.lit("literal"))
             .when(o_col.startswith("_:"), F.lit("bnode"))
             .otherwise(F.lit("iri")).alias("o_kind"),
            o_col.alias("o_value"),
            F.when(is_lit,
                   F.lit("http://www.w3.org/2001/XMLSchema#string"))
             .otherwise(F.lit(None).cast("string")).alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        ).where(s_col.isNotNull() & p_col.isNotNull() & o_col.isNotNull())
        out = row if out is None else out.unionByName(row)
    return out.dropDuplicates(
        ["g", "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"])
