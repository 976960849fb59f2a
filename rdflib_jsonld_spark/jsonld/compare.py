"""Blank-node-isomorphism-aware graph comparison and P/R scoring.

Output graphs are equal to the reference's only *up to bnode relabeling*
(deterministic salted labels replace rdflib's uuid counter — SURVEY.md
§4.3.1), so the P/R gate (BASELINE.json:2, target ≥0.95) canonicalizes
bnode labels on BOTH sides before set comparison.

Algorithm: iterative signature refinement (WL-style color refinement over
the quad structure, in the spirit of RDF dataset canonicalization /
URDNA2015 — public algorithm) with deterministic tie-breaking, plus a
backtracking isomorphism search fallback for small ambiguous graphs.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from .tordf import BNODE


def _bnodes(quads) -> set:
    out = set()
    for q in quads:
        for t in q:  # g, s, p, o — p may be a bnode under generalized RDF
            if t is not None and t[0] == BNODE:
                out.add(t[1])
    return out


def _h(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()[:16]


def _signatures(quads, rounds: int = 4,
                seed: dict[str, str] | None = None) -> dict[str, str]:
    """label -> structural signature, refined ``rounds`` times. ``seed``
    pre-distinguishes individualized nodes (see canonicalize)."""
    labels = _bnodes(quads)
    sig = {b: (seed.get(b, "init") if seed else "init") for b in labels}

    def term_repr(t, me):
        if t is None:
            return "∅"
        if t[0] == BNODE:
            return "self" if t[1] == me else f"b:{sig[t[1]]}"
        return repr(t)

    for _ in range(rounds):
        new = {}
        for b in labels:
            parts = []
            for g, s, p, o in quads:
                involved = any(t is not None and t[0] == BNODE and t[1] == b
                               for t in (g, s, p, o))
                if not involved:
                    continue
                role = ("G" if g is not None and g[0] == BNODE and g[1] == b else "") + \
                       ("S" if s[0] == BNODE and s[1] == b else "") + \
                       ("P" if p[0] == BNODE and p[1] == b else "") + \
                       ("O" if o[0] == BNODE and o[1] == b else "")
                parts.append(f"{role}|{term_repr(g, b)}|{term_repr(s, b)}|"
                             f"{term_repr(p, b)}|{term_repr(o, b)}")
            # cumulative refinement: keep the node's own previous color so
            # colors only ever split (and individualization seeds persist)
            new[b] = _h(sig[b] + "&" + "&".join(sorted(parts)))
        if new == sig:
            break
        sig = new
    return sig


def canonicalize(quads) -> frozenset:
    """Relabel bnodes deterministically; returns a frozenset of quads.

    Ties after color refinement mean automorphic orbits (e.g. two
    identical list chains on one subject). Independently index-breaking
    them can pair chain members inconsistently ACROSS twins, so ties are
    resolved by individualization-refinement (the URDNA2015/nauty
    pattern — public algorithm): distinguish one tied node, re-refine so
    the distinction propagates through its whole structure, repeat. Any
    member of an automorphic orbit yields the same canonical form, so
    the pick (smallest original label) is side-independent.
    """
    n_bn = len(_bnodes(quads))
    rounds = max(4, min(n_bn, 16))  # propagate through chains/diameters
    sig = _signatures(quads, rounds=rounds)
    seed: dict[str, str] = {}
    for _ in range(n_bn):
        groups: dict[str, list] = {}
        for b, s in sig.items():
            groups.setdefault(s, []).append(b)
        tied = [(s, g) for s, g in groups.items() if len(g) > 1]
        if not tied:
            break
        # pick the ORBIT canonically (smallest signature — label-free, so
        # both comparison sides split the same orbit); within the orbit
        # any member yields the same form (automorphy), use min label
        _, grp = min(tied, key=lambda sg: sg[0])
        seed[min(grp)] = f"ind{len(seed)}"
        sig = _signatures(quads, rounds=rounds, seed=seed)
    order = sorted(sig, key=lambda b: (sig[b], b))
    # residual-tie pass (fully symmetric leftovers): index by stable order
    mapping = {}
    seen: dict[str, int] = {}
    for b in order:
        n = seen.get(sig[b], 0)
        seen[sig[b]] = n + 1
        mapping[b] = f"c{sig[b]}_{n}"

    def remap(t):
        if t is not None and t[0] == BNODE:
            return (BNODE, mapping[t[1]])
        return t

    return frozenset(tuple(remap(t) for t in q) for q in quads)


def isomorphic(a, b) -> bool:
    """True iff quad SETS are equal up to bnode relabeling. Duplicate
    quads in either input are collapsed first — graphs are sets ([spec]
    RDF 1.1 §3.1), and expansion legitimately emits the same quad twice."""
    a, b = list(a), list(b)
    ca, cb = canonicalize(a), canonicalize(b)
    if ca == cb:
        return True
    # Fallback exact search for small graphs with automorphisms the
    # refinement couldn't split.
    ba, bb = sorted(_bnodes(a)), sorted(_bnodes(b))
    if len(ba) != len(bb) or len(ba) > 8:
        return False
    bset = set(map(tuple, b))
    for perm in permutations(bb):
        m = dict(zip(ba, perm))

        def remap(t, m=m):
            if t is not None and t[0] == BNODE:
                return (BNODE, m[t[1]])
            return t

        if {tuple(remap(t) for t in q) for q in a} == bset:
            return True
    return False


def precision_recall(ours, expected) -> tuple[float, float]:
    """Quad-level P/R after canonicalization (BASELINE.md gate)."""
    ca, ce = canonicalize(ours), canonicalize(expected)
    if not ca and not ce:
        return 1.0, 1.0
    inter = len(ca & ce)
    p = inter / len(ca) if ca else 1.0
    r = inter / len(ce) if ce else 1.0
    return p, r
