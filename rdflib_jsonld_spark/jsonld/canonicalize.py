"""RDF Dataset Canonicalization (RDFC-1.0 / URDNA2015) — pure core.

Deterministic canonical blank-node labels for a quad list, the
canonical N-Quads serialization, and its sha256 — the primitives that
make GRAPH-LEVEL operations joinable at scale: two documents are
isomorphic iff their canonical hashes are equal, so graph dedup
becomes an ordinary hash groupBy instead of pairwise isomorphism
checks (see operators/docops.canonical_hash_stage).

[spec] W3C RDF Dataset Canonicalization (RDFC-1.0),
https://www.w3.org/TR/rdf-canon/ — §4.4 canonicalization algorithm,
§4.6 Hash First Degree Quads, §4.7 Hash Related Blank Node, §4.8 Hash
N-Degree Quads. The label prefix is the spec's ``c14n``. The reference
checkout has no canonicalization (tombstone; URDNA2015 post-dates
v0.5.0) — pipeline-extension breadth on the engine's own term-tuple
quad model.

The N-degree phase explores permutations of same-hash related bnodes
(spec-faithful); pathological "poison" graphs are factorial there, so
``max_degree_nodes`` bounds the work and raises rather than hanging a
task — real documents never approach it.
"""

from __future__ import annotations

import hashlib
from itertools import permutations

from . import keys
from .nquads import _escape
from .tordf import BNODE, IRI, QT

CANON_PREFIX = "c14n"


def _iter_bnodes(t):
    """Blank-node labels in a term, descending into quoted triples
    (RDF 1.2 triple terms participate in canonicalization — sweep 29:
    star quads raised a bare ValueError and were silently dropped by
    hash stages' error guards)."""
    if t is None:
        return
    if t[0] == BNODE:
        yield t[1]
    elif t[0] == QT:
        for inner in t[1]:
            yield from _iter_bnodes(inner)


def _term_nq(t, labels: dict | None = None) -> str:
    kind = t[0]
    if kind == IRI:
        return f"<{t[1]}>"
    if kind == BNODE:
        lbl = labels.get(t[1], t[1]) if labels is not None else t[1]
        return f"_:{lbl}"
    if kind == QT:
        s, p, o = t[1]
        return (f"<<( {_term_nq(s, labels)} {_term_nq(p, labels)} "
                f"{_term_nq(o, labels)} )>>")
    _, lex, dt, lang = t
    base = f'"{_escape(lex)}"'
    if lang:
        return f"{base}@{lang}"
    if dt and dt != keys.XSD_STRING:
        return f"{base}^^<{dt}>"
    return base


def _quad_nq(q, labels: dict | None = None) -> str:
    g, s, p, o = q
    parts = [_term_nq(s, labels), _term_nq(p, labels), _term_nq(o, labels)]
    if g is not None:
        parts.append(_term_nq(g, labels))
    return " ".join(parts) + " ."


class _Issuer:
    """Identifier issuer ([spec] §4.5) with copy() for the N-degree
    trial paths."""

    __slots__ = ("prefix", "map", "n")

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.map: dict[str, str] = {}
        self.n = 0

    def issue(self, old: str) -> str:
        got = self.map.get(old)
        if got is not None:
            return got
        label = f"{self.prefix}{self.n}"
        self.n += 1
        self.map[old] = label
        return label

    def copy(self) -> "_Issuer":
        c = _Issuer(self.prefix)
        c.map = dict(self.map)
        c.n = self.n
        return c


class _State:
    __slots__ = ("bnode_quads", "canonical")

    def __init__(self):
        self.bnode_quads: dict[str, list] = {}
        self.canonical = _Issuer(CANON_PREFIX)


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _hash_first_degree(state: _State, n: str) -> str:
    """[spec] §4.6: serialize the bnode's quads with the reference node
    as ``_:a`` and every other bnode as ``_:z``; hash the sorted lines."""
    lines = []
    for q in state.bnode_quads[n]:
        labels = {}
        for t in q:
            for b in _iter_bnodes(t):
                labels[b] = "a" if b == n else "z"
        lines.append(_quad_nq(q, labels) + "\n")
    return _sha256("".join(sorted(lines)))


def _hash_related(state: _State, related: str, quad, issuer: _Issuer,
                  position: str, fdh: dict) -> str:
    """[spec] §4.7 Hash Related Blank Node."""
    inp = position
    if position != "g":
        inp += f"<{quad[2][1]}>"
    if related in state.canonical.map:
        inp += "_:" + state.canonical.map[related]
    elif related in issuer.map:
        inp += "_:" + issuer.map[related]
    else:
        inp += fdh[related]
    return _sha256(inp)


def _hash_n_degree(state: _State, identifier: str, issuer: _Issuer,
                   fdh: dict, depth: int = 0):
    """[spec] §4.8 Hash N-Degree Quads → (hash, issuer)."""
    if depth > 64:
        raise ValueError("canonicalization recursion limit "
                         "(pathological graph)")
    related_hashes: dict[str, set] = {}
    for quad in state.bnode_quads[identifier]:
        for pos, t in (("s", quad[1]), ("o", quad[3]), ("g", quad[0])):
            for b in _iter_bnodes(t):
                if b != identifier:
                    h = _hash_related(state, b, quad, issuer, pos, fdh)
                    related_hashes.setdefault(h, set()).add(b)
    data = ""
    for rh in sorted(related_hashes):
        data += rh
        chosen_path = ""
        chosen_issuer = issuer
        for perm in permutations(sorted(related_hashes[rh])):
            issuer_copy = issuer.copy()
            path = ""
            recursion: list[str] = []
            skip = False
            for related in perm:
                if related in state.canonical.map:
                    path += "_:" + state.canonical.map[related]
                else:
                    if related not in issuer_copy.map:
                        recursion.append(related)
                    path += "_:" + issuer_copy.issue(related)
                if chosen_path and len(path) >= len(chosen_path) \
                        and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            for related in recursion:
                rhash, rissuer = _hash_n_degree(state, related,
                                                issuer_copy, fdh,
                                                depth + 1)
                path += "_:" + issuer_copy.issue(related)
                path += f"<{rhash}>"
                issuer_copy = rissuer
                if chosen_path and len(path) >= len(chosen_path) \
                        and path > chosen_path:
                    skip = True
                    break
            if skip:
                continue
            if not chosen_path or path < chosen_path:
                chosen_path = path
                chosen_issuer = issuer_copy
        data += chosen_path
        issuer = chosen_issuer
    return _sha256(data), issuer


def canonicalize(quads: list, max_degree_nodes: int = 24) -> list:
    """Quad tuples → the same quads with canonical ``c14nN`` bnode
    labels ([spec] §4.4). Deterministic for any input labeling of an
    isomorphic dataset. ``max_degree_nodes`` bounds the non-unique
    first-degree pool (poison-graph guard)."""
    state = _State()
    for q in quads:
        for t in q:
            for b in _iter_bnodes(t):
                state.bnode_quads.setdefault(b, []).append(q)

    fdh = {n: _hash_first_degree(state, n) for n in state.bnode_quads}
    by_hash: dict[str, list] = {}
    for n, h in fdh.items():
        by_hash.setdefault(h, []).append(n)

    non_unique: list[tuple[str, list]] = []
    for h in sorted(by_hash):
        nodes = by_hash[h]
        if len(nodes) == 1:
            state.canonical.issue(nodes[0])
        else:
            non_unique.append((h, nodes))
    if sum(len(ns) for _, ns in non_unique) > max_degree_nodes:
        raise ValueError(
            f"more than {max_degree_nodes} blank nodes share first-"
            f"degree hashes — refusing the factorial N-degree phase")
    for _, nodes in non_unique:
        results = []
        for n in nodes:
            if n in state.canonical.map:
                continue
            temp = _Issuer("b")
            temp.issue(n)
            results.append(_hash_n_degree(state, n, temp, fdh))
        for _, result_issuer in sorted(results, key=lambda r: r[0]):
            for old in result_issuer.map:
                state.canonical.issue(old)

    labels = state.canonical.map

    def relabel(t):
        if t is None:
            return t
        if t[0] == BNODE:
            return (BNODE, labels[t[1]])
        if t[0] == QT:
            return (QT, tuple(relabel(x) for x in t[1]))
        return t

    return [tuple(relabel(t) for t in q) for q in quads]


def canonical_nquads(quads: list, **kw) -> str:
    """Canonical N-Quads document: canonical labels, sorted lines
    ([spec] §4.4 step 8 serialization)."""
    out = sorted(_quad_nq(q) + "\n" for q in canonicalize(quads, **kw))
    return "".join(out)


def canonical_hash(quads: list, **kw) -> str:
    """sha256 of the canonical N-Quads — equal iff datasets are
    isomorphic; the graph-dedup join key."""
    return _sha256(canonical_nquads(quads, **kw))
