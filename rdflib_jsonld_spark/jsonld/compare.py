"""Blank-node-isomorphism-aware graph comparison and P/R scoring.

Output graphs are equal to the reference's only *up to bnode relabeling*
(deterministic salted labels replace rdflib's uuid counter — SURVEY.md
§4.3.1), so the P/R gate (BASELINE.json:2, target ≥0.95) canonicalizes
bnode labels on BOTH sides before set comparison.

Algorithm: iterative signature refinement (WL-style color refinement over
the quad structure, in the spirit of RDF dataset canonicalization /
URDNA2015 — public algorithm) with individualization-refinement for tied
orbits. ``isomorphic`` additionally BRANCHES over tied-orbit members (the
nauty-style search, budget-bounded) before concluding non-isomorphic:
WL ties on regular/symmetric structures can make the two sides'
deterministic min-label picks individualize non-corresponding nodes, and
without branching that produced false negatives (ADVICE r01). False
positives remain impossible — equality of canonical forms is checked on
the full quad sets.

Refinement work is cut by a per-bnode incidence cache (each node touches
only its own quads each round) and by warm-starting each
individualization round from the already-refined coloring (colors only
ever split, so a refined coloring is a valid starting point).
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from .canonicalize import _iter_bnodes
from .tordf import BNODE, QT


def _bnodes(quads) -> set:
    out = set()
    for q in quads:
        for t in q:  # g, s, p, o — p may be a bnode under generalized RDF
            out.update(_iter_bnodes(t))
    return out


def _remap_term(t, mapping):
    """Relabel bnodes in a term, descending into quoted triples
    (sweep 29: QT-internal bnodes were baked in as repr constants,
    making isomorphic star datasets compare unequal)."""
    if t is None:
        return t
    if t[0] == BNODE:
        return (BNODE, mapping[t[1]])
    if t[0] == QT:
        return (QT, tuple(_remap_term(x, mapping) for x in t[1]))
    return t


def _h(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()[:16]


def _build_incidence(quads):
    """label → [(role, tokens)] for the quads the bnode appears in.
    tokens render per-round as constants / 'self' / current neighbor
    color, so each refinement round touches only incident quads."""
    labels = _bnodes(quads)
    inc: dict[str, list] = {b: [] for b in labels}

    def _tok(t, b):
        """Per-round render token for one term: constants stay fixed,
        bnodes render as self/current color, quoted triples recurse."""
        if t is None:
            return ("c", "∅")
        if t[0] == BNODE:
            return ("self",) if t[1] == b else ("b", t[1])
        if t[0] == QT:
            return ("qt", tuple(_tok(x, b) for x in t[1]))
        return ("c", repr(t))

    for q in quads:
        involved = set()
        for t in q:
            involved.update(_iter_bnodes(t))
        for b in involved:
            role = "".join(
                r for r, t in zip("GSPO", q)
                if t is not None and b in set(_iter_bnodes(t)))
            inc[b].append((role, tuple(_tok(t, b) for t in q)))
    return labels, inc


def _render_tok(tok, sig) -> str:
    if tok[0] == "c":
        return tok[1]
    if tok[0] == "self":
        return "self"
    if tok[0] == "qt":
        return "<<" + "|".join(_render_tok(x, sig) for x in tok[1]) + ">>"
    return f"b:{sig[tok[1]]}"


def _refine(inc, labels, init_sig: dict[str, str], rounds: int):
    """WL color refinement from ``init_sig``; cumulative (a node's new
    color folds in its previous one), so colors only ever split and
    individualization marks persist. Early exit compares the induced
    PARTITION, not raw hashes (cumulative rehashing changes every hash
    every round): colors only split, so an unchanged distinct-color
    count means the partition is stable."""
    sig = dict(init_sig)
    n_colors = len(set(sig.values()))
    for _ in range(rounds):
        new = {}
        for b in labels:
            parts = []
            for role, toks in inc[b]:
                parts.append(role + "|" + "|".join(
                    _render_tok(tok, sig) for tok in toks))
            new[b] = _h(sig[b] + "&" + "&".join(sorted(parts)))
        sig = new
        new_n = len(set(sig.values()))
        if new_n == n_colors:
            break
        n_colors = new_n
    return sig


def _finish_mapping(quads, sig) -> frozenset:
    order = sorted(sig, key=lambda b: (sig[b], b))
    # residual-tie pass (fully symmetric leftovers): index by stable order
    mapping: dict[str, str] = {}
    seen: dict[str, int] = {}
    for b in order:
        n = seen.get(sig[b], 0)
        seen[sig[b]] = n + 1
        mapping[b] = f"c{sig[b]}_{n}"

    return frozenset(tuple(_remap_term(t, mapping) for t in q)
                     for q in quads)


def _tied_groups(sig):
    groups: dict[str, list] = {}
    for b, s in sig.items():
        groups.setdefault(s, []).append(b)
    return [(s, g) for s, g in groups.items() if len(g) > 1]


def _prepare(quads):
    """Dedup quads (graphs are SETS — [spec] RDF 1.1 §3.1; expansion
    legitimately emits duplicates, and multiplicity must not perturb WL
    signatures), build incidence, run the initial refinement once."""
    quads = list(dict.fromkeys(tuple(q) for q in quads))
    labels, inc = _build_incidence(quads)
    n_bn = len(labels)
    rounds = max(4, min(n_bn, 16))  # propagate through chains/diameters
    sig0 = _refine(inc, labels, {b: "init" for b in labels}, rounds)
    return quads, labels, inc, rounds, sig0


def _canon_forms(quads, branch: bool, budget: list,
                 prepared=None) -> list[frozenset]:
    """Canonical form(s) by individualization-refinement.

    branch=False → exactly one form (deterministic min-label picks).
    branch=True  → DFS over ALL members of each chosen orbit, bounded by
    ``budget`` (a one-element list counting remaining refinement calls);
    used by ``isomorphic`` to rule out pick-misalignment false negatives.
    The orbit to split is chosen by its label-free color (min signature),
    so both comparison sides always split corresponding orbits.
    ``prepared`` reuses a _prepare() result (the branch path would
    otherwise redo the incidence build + initial refinement).
    """
    quads, labels, inc, rounds, sig0 = prepared or _prepare(quads)
    n_bn = len(labels)
    out: list[frozenset] = []

    budget[0] -= 1

    def search(sig, depth):
        tied = _tied_groups(sig)
        if not tied or depth >= n_bn:
            out.append(_finish_mapping(quads, sig))
            return
        _, grp = min(tied, key=lambda sg: sg[0])
        members = sorted(grp) if branch else [min(grp)]
        for m in members:
            if budget[0] <= 0:
                # budget exhausted: emit the current (possibly tied)
                # refinement finished deterministically, so the search
                # stays sound (never claims equality it didn't verify)
                if not out:
                    out.append(_finish_mapping(quads, sig))
                return
            budget[0] -= 1
            marked = dict(sig)
            marked[m] = _h(sig[m] + f"&ind{depth}")
            search(_refine(inc, labels, marked, rounds), depth + 1)

    search(sig0, 0)
    return out


def canonicalize(quads, prepared=None) -> frozenset:
    """Relabel bnodes deterministically; returns a frozenset of quads
    (duplicates collapse — graphs are sets).

    Ties after color refinement mean automorphic-or-WL-tied orbits (e.g.
    two identical list chains on one subject); they are resolved by
    individualization-refinement (URDNA2015/nauty pattern — public):
    distinguish one tied node (min original label), re-refine so the
    distinction propagates, repeat.
    """
    n = max(1, len(_bnodes(quads)))
    return _canon_forms(quads, branch=False, budget=[n + 2],
                        prepared=prepared)[0]


def isomorphic(a, b, branch_budget: int = 160) -> bool:
    """True iff quad SETS are equal up to bnode relabeling. Duplicate
    quads in either input are collapsed first — graphs are sets ([spec]
    RDF 1.1 §3.1), and expansion legitimately emits the same quad twice.

    On a deterministic-form mismatch: exact permutation search for ≤8
    bnodes, else budget-bounded branching individualization over BOTH
    sides' tied orbits (any common form proves isomorphism; exhausting
    the budget without one conservatively returns False).
    """
    prep_a, prep_b = _prepare(a), _prepare(b)
    a, b = prep_a[0], prep_b[0]  # deduped quad lists
    ca = canonicalize(a, prepared=prep_a)
    cb = canonicalize(b, prepared=prep_b)
    if ca == cb:
        return True
    ba, bb = sorted(_bnodes(a)), sorted(_bnodes(b))
    if len(ba) != len(bb):
        return False
    if len(ba) <= 8:
        # exact search for small graphs
        bset = set(map(tuple, b))
        for perm in permutations(bb):
            m = dict(zip(ba, perm))
            if {tuple(_remap_term(t, m) for t in q) for q in a} == bset:
                return True
        return False
    forms_a = set(_canon_forms(a, branch=True, budget=[branch_budget],
                               prepared=prep_a))
    if cb in forms_a:
        return True
    forms_b = set(_canon_forms(b, branch=True, budget=[branch_budget],
                               prepared=prep_b))
    return bool(forms_a & forms_b)


def precision_recall(ours, expected) -> tuple[float, float]:
    """Quad-level P/R after canonicalization (BASELINE.md gate).
    Duplicates collapse on both sides (set semantics)."""
    ca, ce = canonicalize(ours), canonicalize(expected)
    if not ca and not ce:
        return 1.0, 1.0
    inter = len(ca & ce)
    p = inter / len(ca) if ca else 1.0
    r = inter / len(ce) if ce else 1.0
    return p, r
