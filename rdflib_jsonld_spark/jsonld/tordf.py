"""JSON-LD document → RDF quads (the "to-rdf" / deserialize algorithm).

Single-pass recursive walk of the raw JSON tree with the active context —
the same architecture the reference used ([v0.5.0] parser.py Parser.parse →
_add_to_graph → _key_to_graph → _to_object/_add_list, ~L120-480; SURVEY.md
§2.D, §3.1) rather than spec-style expand-then-deserialize, because it is a
pure function over one document and therefore embarrassingly parallel inside
an Arrow-batched UDF.

Term encoding (plain tuples — picklable, Arrow-friendly):
    ("iri", value)                      IRI
    ("bnode", label)                    blank node (label WITHOUT "_:")
    ("lit", lexical, datatype, lang)    literal

Quad: ``(graph_term_or_None, s_term, p_term, o_term)``; ``None`` graph =
default graph (SURVEY.md §1.2).

Deterministic blank nodes: labels are ``{prefix}{n}`` in first-allocation
order per document, replacing rdflib's process-global uuid counter
([v0.5.0] parser.py BNode use, D11) — a documented semantic deviation that
preserves RDF graph isomorphism (SURVEY.md §4.3.1) and is what makes the
pipeline distributable and resumable.
"""

from __future__ import annotations

import functools
import json
import math
import re as _re

from . import keys
from .context import Context, UNDEF
from .errors import (ConflictingIndexes, InvalidAnnotation,
                     InvalidBaseDirection, InvalidEmbeddedNode,
                     InvalidIdValue,
                     InvalidIncludedValue, InvalidIndexValue,
                     InvalidLanguageTaggedString,
                     InvalidLanguageTaggedValue, InvalidListOfLists,
                     InvalidNestValue, InvalidReversePropertyMap,
                     InvalidReversePropertyValue, InvalidReverseValue,
                     InvalidSetOrListObject, InvalidTypedValue,
                     InvalidTypeValue, InvalidValueObject,
                     InvalidValueObjectValue)

# the only entries a value object admits ([spec] §5.1 step 13.4.3)
_key_survives = keys.key_survives  # [spec] §5.1 step 13.3 (ADVICE r03)

_VALUE_OBJECT_KEYS = frozenset({keys.VALUE, keys.TYPE, keys.LANG,
                                keys.DIRECTION, keys.INDEX, keys.CONTEXT})

IRI = "iri"
BNODE = "bnode"
LIT = "lit"
#: RDF-star quoted-triple term kind: ("qt", (s_term, p_term, o_term)).
#: Legal in subject/object position per RDF-star (W3C CG report / RDF
#: 1.2 WD) — canonical home here so the document walks can emit it;
#: nquads.py re-exports it.
QT = "qt"


class _State:
    """Per-document mutable state: bnode allocation + label map.

    Parity: [v0.5.0] parser.py node_id_map (~L160-200, D11) — a document-
    local map so ``"@id": "_:b0"`` reuses one bnode per document.
    """

    __slots__ = ("counter", "id_map", "prefix", "quads", "generalized",
                 "allow_ll", "rdf_direction", "pending")

    def __init__(self, prefix: str, generalized: bool, allow_ll: bool,
                 rdf_direction: str | None = None):
        self.counter = 0
        self.id_map: dict[str, str] = {}
        self.prefix = prefix
        self.quads: list = []
        self.generalized = generalized
        self.allow_ll = allow_ll
        self.rdf_direction = rdf_direction
        # compound-literal helper triples awaiting their parent quad's
        # graph — flushed by _emit into the same graph
        self.pending: list = []

    def fresh_bnode(self) -> tuple:
        label = f"{self.prefix}{self.counter}"
        self.counter += 1
        return (BNODE, label)

    def bnode_for(self, doc_label: str) -> tuple:
        got = self.id_map.get(doc_label)
        if got is None:
            got = f"{self.prefix}{self.counter}"
            self.counter += 1
            self.id_map[doc_label] = got
        return (BNODE, got)


def to_rdf(data, context_data=None, base: str | None = None,
           generalized_rdf: bool = False, allow_lists_of_lists: bool = True,
           registry: dict | None = None, bnode_prefix: str = "b",
           ctx: Context | None = None, version: float | None = None,
           rdf_direction: str | None = None) -> list:
    """Parsed JSON value → list of quads.

    Signature parity: [v0.5.0] parser.py to_rdf(data, dataset, base,
    context_data, version, generalized_rdf, allow_lists_of_lists)
    (~L100-120; [checkout] docs/jsonld-parser.rst:50 documents the public
    function). ``dataset`` is replaced by the returned quad list;
    ``registry`` replaces remote-context HTTP fetch (SURVEY.md §2.A7).
    ``ctx`` short-circuits context resolution with a pre-resolved (e.g.
    broadcast) Context — the per-executor fast path (SURVEY.md §1.2).

    ``rdf_direction``: None (default) drops ``@direction`` on RDF output
    (spec-compliant default); ``"i18n-datatype"`` encodes direction-
    carrying strings as ``i18n:<lang>_<dir>``-typed literals ([spec]
    JLD-API 1.1 §10.6 step 12 / §8 rdfDirection); ``"compound-literal"``
    reifies direction-carrying strings as a fresh bnode with
    ``rdf:value`` / ``rdf:language`` / ``rdf:direction`` entries (the
    spec's second mode), emitted into the SAME graph as the parent
    triple with the document's deterministic bnode allocator.
    """
    if rdf_direction not in (None, "i18n-datatype", "compound-literal"):
        raise ValueError(f"unsupported rdfDirection: {rdf_direction!r}")
    if ctx is None:
        ctx = Context(base=base, registry=registry)
        if version is not None:  # signature parity: [v0.5.0] to_rdf(version)
            ctx.version = float(version)
        if context_data is not None:
            ctx = ctx.load(context_data)
    state = _State(bnode_prefix, generalized_rdf, allow_lists_of_lists,
                   rdf_direction)

    # Top-level dispatch: array | @graph wrapper | single node
    # ([v0.5.0] parser.py Parser.parse ~L120-160, D1).
    nodes = data if isinstance(data, list) else [data]
    for node in nodes:
        if isinstance(node, dict):
            _add_to_graph(node, None, ctx, state, topmost=True)

    if not generalized_rdf:
        # Drop triples with bnode predicates ([spec] JLD-API §10.1; D10).
        state.quads = [q for q in state.quads if q[2][0] != BNODE]
    # Relative IRIs cannot appear in RDF ([spec] JLD-API §10.3: only
    # absolute IRIs produce triples) — arises under @base:null / no base.
    if any(_has_relative_iri(q) for q in state.quads):
        state.quads = [q for q in state.quads if not _has_relative_iri(q)]
    return state.quads


_ABS_IRI_RE = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def _has_relative_iri(q: tuple) -> bool:
    for t in q:
        if t is not None and t[0] == IRI:
            v = t[1]
            if v.startswith("http://") or v.startswith("https://"):
                continue  # fast path: the overwhelmingly common schemes
            if ":" not in v or not _ABS_IRI_RE.match(v):
                return True
    return False


def _node_keyword_map(node: dict, ctx: Context) -> dict:
    """Expand every key once; returns {raw_key: expanded(None|kw|iri)}.
    Rides the per-shape memo (Context.expand_keys): corpora repeat a few
    node shapes millions of times."""
    kt = tuple(node)
    return dict(zip(kt, ctx.expand_keys(kt)))



def _graph_obj_has_map(v):
    if isinstance(v, dict):
        return True
    if isinstance(v, list):
        return any(_graph_obj_has_map(x) for x in v)
    return False


def _semantic_entry(ctx: Context, node: dict, k, e) -> bool:
    """Does this entry keep a topmost map from being a bare graph
    object? Mirrors expansion: stray keywords the walk ignores (e.g. a
    literal "@json"/"@container" KEY) and entries whose expansion drops
    to nothing (empty @reverse/@nest/@included, fully-filtered @type)
    are vacuous (sweeps 35-36 differential)."""
    if e is None or e in (keys.GRAPH, keys.CONTEXT):
        return False
    if e == keys.TYPE:
        raw = node[k] if isinstance(node[k], list) else [node[k]]
        for t in raw:
            if not isinstance(t, str):
                return True  # errors later — still semantic
            ti = ctx.expand_iri(t, vocab=True)
            if ti is not None and ti not in keys.KEYWORDS:
                return True
        return False
    if e == keys.REV:
        # semantic iff a member key survives the REV branch's own
        # filtering (keyword/unexpandable keys are skipped there)
        if not isinstance(node[k], dict):
            return True  # errors later — still semantic
        for rk in node[k]:
            ri = ctx.expand_iri(rk, vocab=True)
            if ri == keys.REV:
                return True  # errors later
            if ri is not None and ri not in keys.KEYWORDS:
                return True
        return False
    if e == keys.NEST:
        return node[k] not in ({}, [])
    if e == keys.INCLUDED:
        return _graph_obj_has_map(node[k])
    if e in keys.KEYWORDS and e not in (
            keys.TYPE, keys.ID, keys.INDEX, keys.ANNOTATION,
            keys.LIST, keys.SET, keys.VALUE):
        return False  # ignored by the walk AND by expansion
    return True


def _add_to_graph(node: dict, graph, ctx: Context, state: _State,
                  topmost: bool = False, from_map: bool = False,
                  force_subj: tuple | None = None):
    """Node object → subject term; emits quads. [v0.5.0] parser.py
    _add_to_graph (~L160-200, D2) + _key_to_graph (~L200-330, B1/D3-D6)."""
    if not isinstance(node, dict):
        return None
    # Non-propagating scoped-context revert ([spec] 1.1 §4.1.8 / JLD-API
    # expansion step 8): entering a nested node object drops a pending
    # type-scoped context; the node then applies its own @type scoping.
    # EXCEPT bare subject references ({"@id": ...} only) and direct
    # container-map entries (steps 13.7-13.8 recurse with from map=true)
    # — those keep the scoped context (mirrors expansion.py; value
    # objects never reach this function).
    if ctx.previous is not None and not from_map:
        probe = ctx.expand_keys(tuple(node))
        # the exemption requires @id to actually be present (ADVICE r02:
        # an EMPTY map is not a subject reference — mirrors expansion.py)
        is_subject_ref = keys.ID in probe and not (set(probe) - {keys.ID})
        if not is_subject_ref:
            ctx = ctx.previous
    if keys.CONTEXT in node:
        ctx = ctx.load(node[keys.CONTEXT])

    kmap = _node_keyword_map(node, ctx)

    # Free-floating VALUE OBJECT (object-position ones route through
    # _to_object before this function): validate per the value-object
    # rules — the errors the expansion engine raises here too — then
    # drop it (B3). Sweep 35 wild-doc differential: this path used to
    # node-walk the leftovers, emitting a spurious rdf:type quad for
    # {"@value": null, "@type": T} and silently accepting invalid
    # @value arrays. state=None keeps validation side-effect-free (no
    # compound-literal pending quads for a dropped object).
    vo_key = set_key = None
    has_list = False
    for _k, _e in kmap.items():  # ONE pass for all three guards (hot path)
        if _e == keys.VALUE:
            if vo_key is None:
                vo_key = _k
        elif _e == keys.LIST:
            has_list = True
        elif _e == keys.SET and set_key is None:
            set_key = _k
    if vo_key is not None:
        _value_object_to_term(node, kmap, vo_key, None, ctx, None)
        return None
    # Free-floating LIST OBJECT: same treatment — the @list/@index
    # sibling rule applies ([spec] expansion step 14.1) AND the members
    # still validate (expansion walks them before the drop — e.g. an
    # @id: null member errors). A scratch state discards their quads
    # without disturbing the main bnode counter (D11 determinism).
    if has_list:
        _check_list_siblings(node, ctx)
        lkey = next(k for k, e in kmap.items() if e == keys.LIST)
        scratch = _State(state.prefix, state.generalized, state.allow_ll,
                         state.rdf_direction)
        _add_list(_as_list(node[lkey], ctx), None, ctx, scratch, graph)
        return None
    # Top-level SET OBJECT unwraps to its members ([spec] expansion
    # step 14.2) — sweep 35 wild-doc differential: this path silently
    # dropped the whole object, LOSING its members' quads. Sibling
    # rule first (@index/@context only), then each member processes
    # at the same position; free-floating scalars drop as usual.
    if set_key is not None:
        bad = [k for k, e in kmap.items() if k != set_key
               and _key_survives(e)
               and e not in (keys.INDEX, keys.CONTEXT)]
        if bad:
            raise InvalidSetOrListObject(f"@set with {bad!r}")
        s_idx = next((k for k, e in kmap.items() if e == keys.INDEX),
                     None)
        if s_idx is not None and not isinstance(node[s_idx], str):
            raise InvalidIndexValue(repr(node[s_idx]))
        last = None
        sq = list(node[set_key]) if isinstance(node[set_key], list) \
            else [node[set_key]]
        while sq:  # nested arrays flatten (expansion step 5.2.4)
            item = sq.pop(0)
            if isinstance(item, list):
                sq[0:0] = item
            elif isinstance(item, dict):
                last = _add_to_graph(item, graph, ctx, state,
                                     topmost=topmost, from_map=from_map)
        return last

    # Type-scoped contexts ([spec] 1.1 §4.1.8, C5): collect raw @type terms.
    type_key = next((k for k, e in kmap.items() if e == keys.TYPE), None)
    if type_key is not None:
        raw_types = node[type_key]
        raw_types = raw_types if isinstance(raw_types, list) else [raw_types]
        str_types = [t for t in raw_types if isinstance(t, str)]
        ctx = ctx.subcontext_for_type(str_types)
        kmap = _node_keyword_map(node, ctx)

    keys.check_colliding_keywords(kmap)

    # A bare top-level {"@graph": [...]} (no @id) targets the default graph
    # ([v0.5.0] parser.py D1/D3 dispatch). Keys that expansion's
    # normalization DROPS as empty (@reverse {} / @nest {}|[]) are
    # vacuous here too (sweep 35 differential: an empty @reverse made
    # the @graph land under a spurious bnode graph name).
    # A bare top-level {"@graph": [...]} (no @id) targets the default
    # graph ([v0.5.0] parser.py D1/D3 dispatch); the semantics mirror
    # expansion's normalization (see _semantic_entry). Only computed at
    # the top level — the per-node hot path pays nothing.
    only_graph = topmost and not any(
        _semantic_entry(ctx, node, k, e) for k, e in kmap.items())

    # Subject: @id → IRI/bnode (or a quoted triple when the @id value is
    # an embedded node — JSON-LD-star draft), else fresh bnode (D2).
    subj = force_subj
    id_key = next((k for k, e in kmap.items() if e == keys.ID), None)
    if id_key is not None and force_subj is None:
        idv = node[id_key]
        if isinstance(idv, dict):
            subj = _embedded_triple(idv, graph, ctx, state)
        elif not isinstance(idv, str):
            # [spec] 1.1 API expansion step 13.4.3.1
            raise InvalidIdValue(repr(idv))
        else:
            subj = _to_rdf_id(idv, ctx, state)
    elif id_key is not None:
        # forced-subject walks (@nest merge) IGNORE the nested @id but
        # still validate it, like the expansion twin (sweep 35
        # differential: {"@nest": {"@id": null}} and invalid embedded
        # @id maps silently passed). A scratch state keeps validation
        # allocation-free for the main document.
        idv = node[id_key]
        if isinstance(idv, dict):
            _embedded_triple(idv, graph, ctx,
                             _State(state.prefix, state.generalized,
                                    state.allow_ll, state.rdf_direction))
        elif not isinstance(idv, str):
            raise InvalidIdValue(repr(idv))
    if subj is None and not only_graph:
        subj = state.fresh_bnode()


    for key, expanded in kmap.items():
        value = node[key]
        if expanded == keys.INDEX and not isinstance(value, str):
            # [spec] 1.1 API expansion step 13.4.8
            raise InvalidIndexValue(repr(value))
        if expanded in (None, keys.CONTEXT, keys.ID, keys.INDEX, keys.VALUE,
                        keys.LANG, keys.DIRECTION, keys.NONE):
            continue  # B1: skip handled / non-semantic / unmapped keys

        if expanded == keys.TYPE:
            for t in _as_list(value, ctx):
                if not isinstance(t, str):
                    # [spec] 1.1 API expansion step 13.4.4
                    raise InvalidTypeValue(repr(t))
                t_iri = ctx.expand_iri(t, vocab=True) if isinstance(t, str) else None
                if t_iri is None or t_iri in keys.KEYWORDS:
                    continue
                obj = _iri_or_bnode(t_iri, state)
                _emit(state, graph, subj, (IRI, keys.RDF_TYPE), obj)
            continue

        if expanded == keys.GRAPH:
            # Nested @graph under a node with @id → named-graph quads (D3).
            target = None if only_graph else subj
            gq = list(_as_list(value, ctx))
            while gq:  # nested arrays flatten (expansion step 5.2.4)
                item = gq.pop(0)
                if isinstance(item, list):
                    gq[0:0] = item
                elif isinstance(item, dict):
                    _add_to_graph(item, target, ctx, state)
            continue

        if expanded == keys.INCLUDED:  # [spec] 1.1 §9.13: sibling nodes
            # nested arrays flatten and nulls drop ([spec] §5.1 step
            # 13.4.7.2 expands with the active property, flattening per
            # step 5.2.4 — ADVICE r03, mirrors expansion.py); scalars
            # and value objects remain errors
            stack = list(_as_list(value, ctx))
            while stack:
                item = stack.pop(0)
                if isinstance(item, list):
                    stack[:0] = _as_list(item, ctx)
                    continue
                if item is None:
                    continue
                if not isinstance(item, dict):
                    # node objects only ([spec] §5.1 13.4.6.x; sweep 6)
                    raise InvalidIncludedValue(repr(item))
                ikmap = {k: ctx.expand_key(k) for k in item}
                ival = next((k for k, e in ikmap.items()
                             if e == keys.VALUE), None)
                if ival is not None:
                    # a value object that expands to NULL vanishes like
                    # expansion's null drop (sweep 35); one that
                    # survives is "not a node object" → error
                    if _value_object_to_term(item, ikmap, ival, None,
                                             ctx, None) is None:
                        continue
                    raise InvalidIncludedValue(repr(item))
                _add_to_graph(item, graph, ctx, state)
            continue

        if expanded == keys.NEST:  # [spec] 1.1 §9.10: transparent nesting
            for item in _as_list(value, ctx):
                if not isinstance(item, dict) or any(
                        ctx.expand_key(k) == keys.VALUE for k in item):
                    # [spec] 1.1 §9.10 (sweep 6): @nest takes NODE
                    # objects only — scalars/value objects are errors
                    raise InvalidNestValue(repr(item))
                _nest_into(item, subj, graph, ctx, state)
            continue

        if expanded == keys.REV:
            # {"@reverse": {p: [o...]}} → (o, p, s) (D4).
            if not isinstance(value, dict):
                # [spec] §5.1 step 13.7.1 (sweep 6: silently ignored)
                raise InvalidReverseValue(repr(value))
            if isinstance(value, dict):
                for rk, rv in value.items():
                    p_iri = ctx.expand_iri(rk, vocab=True)
                    if p_iri == keys.REV:
                        # [spec] §5.1 step 13.7.2 (sweep 6)
                        raise InvalidReversePropertyMap(rk)
                    if p_iri is None or p_iri in keys.KEYWORDS:
                        continue
                    pred = _iri_or_bnode(p_iri, state)
                    rq = list(_as_list(rv, ctx))
                    rvals = []
                    while rq:  # nested arrays flatten (step 5.2.4)
                        it = rq.pop(0)
                        if isinstance(it, list):
                            rq[0:0] = it
                        else:
                            rvals.append(it)
                    for v in rvals:
                        if isinstance(v, dict) and (
                                _is_list_object(v) or any(
                                    ctx.expand_key(k) == keys.LIST
                                    for k in v)):
                            # [spec] §5.1 step 13.13: list objects are
                            # never valid reverse values (sweep 6: the
                            # list head was silently emitted as subject)
                            raise InvalidReversePropertyValue(repr(v))
                        obj = _to_object(v, ctx.terms.get(rk), ctx, state, graph)
                        if obj is not None:
                            if obj[0] == LIT:
                                # [spec] 1.1 API expansion step 13.4.9
                                raise InvalidReversePropertyValue(repr(v))
                            _emit(state, graph, obj, pred, subj)
            continue

        if expanded == keys.ANNOTATION:
            # Annotations at the sites that can host them (object values
            # under a non-reverse property) are stripped by the parent's
            # emission loop BEFORE this walk runs — one surviving here
            # sits in a position with no base triple to annotate
            # (top-level node, @graph/@included/@nest item, graph
            # container entry): [spec] JSON-LD-star draft error.
            raise InvalidAnnotation(
                "@annotation outside an embedded value/node position")

        if expanded in keys.KEYWORDS:
            continue

        # --- regular predicate ---
        term = ctx.terms.get(key)
        sub_ctx = ctx.subcontext_for_term(key)  # property-scoped (C5)
        pred = _iri_or_bnode(expanded, state)

        if term is not None and term.reverse:  # reverse term (D4)
            # @reverse composes with @index ([spec] 1.1 §9.6: only @set/
            # @index may combine with @reverse): unfold the map FIRST so
            # entry nodes keep their @id (r03 review: the map itself was
            # being treated as one node → fresh bnode, @id lost)
            vals = value
            if term.container and keys.INDEX in term.container \
                    and isinstance(value, dict):
                vals = [v for mv in value.values()
                        for v in _as_list(mv, sub_ctx)]
            for v in _as_list(vals, sub_ctx):
                if isinstance(v, dict) and (
                        _is_list_object(v) or any(
                            sub_ctx.expand_key(k) == keys.LIST
                            for k in v)):
                    # [spec] §5.1 step 14: list objects are never valid
                    # reverse values (sweep 6)
                    raise InvalidReversePropertyValue(repr(v))
                obj = _to_object(v, term, sub_ctx, state, graph)
                if obj is not None:
                    if obj[0] == LIT:
                        # [spec] 1.1 API expansion step 14 (reverse
                        # terms never take literal values)
                        raise InvalidReversePropertyValue(repr(v))
                    _emit(state, graph, obj, pred, subj)
            continue

        container = term.container if term is not None else set()

        if term is not None and term.type is not UNDEF \
                and term.type == keys.JSON:
            # [spec] §5.1 step 13.6 beats container unfolding: the whole
            # raw value is ONE rdf:JSON literal; a @list container then
            # wraps that single literal (step 13.11) — sweep 12: this
            # path built a multi-element list of per-item literals
            obj = (LIT, canonical_json(value), keys.RDF_JSON, None)
            if keys.LIST in container:
                bn = state.fresh_bnode()
                _emit(state, graph, bn, (IRI, keys.RDF_FIRST), obj)
                _emit(state, graph, bn, (IRI, keys.RDF_REST),
                      (IRI, keys.RDF_NIL))
                obj = bn
            _emit(state, graph, subj, pred, obj)
            continue

        if keys.LANG in container and isinstance(value, dict):
            # language map (D6): {"en": "x", "de": ["y"]}
            map_dir = _default_direction(term, ctx)
            for lang, vals in value.items():
                for v in _as_list(vals, sub_ctx):
                    if not isinstance(v, str):
                        continue
                    tag = None if lang == keys.NONE or lang == ctx.alias(keys.NONE) \
                        else lang.lower()
                    if map_dir and state.rdf_direction == "i18n-datatype":
                        obj = _i18n_literal(v, tag, map_dir)
                    elif map_dir and \
                            state.rdf_direction == "compound-literal":
                        obj = _compound_literal(state, v, tag, map_dir)
                    else:
                        dt = keys.RDF_LANGSTRING if tag else keys.XSD_STRING
                        obj = (LIT, v, dt, tag)
                    _emit(state, graph, subj, pred, obj)
            continue

        if (keys.INDEX in container or keys.ID in container
                or keys.TYPE in container) and isinstance(value, dict):
            if keys.GRAPH in container:
                # graph-keyed maps ([spec] 1.1 §9.11 combined with
                # @index/@id): every map entry is a NAMED GRAPH. @index
                # keys are non-semantic (fresh bnode graph name); @id
                # keys name the graph; @none in an @id map → anonymous.
                for mkey, vals in value.items():
                    for v in _as_list(vals, sub_ctx):
                        if not isinstance(v, dict):
                            continue
                        if keys.ID in container and mkey not in (
                                keys.NONE, ctx.alias(keys.NONE)):
                            gterm = _to_rdf_id(mkey, ctx, state) \
                                or state.fresh_bnode()
                        else:
                            gterm = state.fresh_bnode()
                        inner = v.get(keys.GRAPH, v)
                        for item in _as_list(inner, sub_ctx):
                            if isinstance(item, dict):
                                _add_to_graph(item, gterm, sub_ctx, state,
                                              from_map=True)
                        _emit(state, graph, subj, pred, gterm)
                continue
            # index/id/type maps: keys non-semantic for @index (D5); for
            # @id/@type maps the key becomes the node's @id/@type.
            for mkey, vals in value.items():
                for v in _as_list(vals, sub_ctx):
                    v2 = v
                    if keys.INDEX in container and term is not None \
                            and term.index is not None:
                        # property-based data indexing ([spec] 1.1
                        # §4.6.3): the map key becomes a value of the
                        # index property on each NODE; @none adds none
                        if mkey not in (keys.NONE,
                                        sub_ctx.alias(keys.NONE)):
                            if not isinstance(v, dict) or any(
                                    sub_ctx.expand_key(k) == keys.VALUE
                                    for k in v):
                                raise InvalidValueObject(
                                    f"{term.name}: property-based index "
                                    f"over a non-node value")
                            v2 = dict(v)
                            prev = v2.get(term.index)
                            v2[term.index] = [mkey] + _as_list(prev) \
                                if prev is not None else mkey
                    elif keys.INDEX in container and isinstance(v, dict) \
                            and mkey not in (keys.NONE,
                                             sub_ctx.alias(keys.NONE)):
                        # [spec] expansion step 13.8.3.7.2 twin (sweep
                        # 7): an item's own @index must equal the map key
                        iv = next((v[k] for k in v
                                   if sub_ctx.expand_key(k)
                                   == keys.INDEX), None)
                        if iv is not None and iv != mkey:
                            raise ConflictingIndexes(
                                f"{term.name if term else pred}: "
                                f"{iv!r} vs {mkey!r}")
                    elif keys.ID in container and isinstance(v, dict) and keys.ID not in v \
                            and mkey != keys.NONE:
                        v2 = dict(v)
                        v2[keys.ID] = mkey
                    elif keys.TYPE in container and isinstance(v, dict) and mkey != keys.NONE:
                        v2 = dict(v)
                        v2[keys.TYPE] = _as_list(v.get(keys.TYPE, [])) + [mkey] \
                            if keys.TYPE in v else mkey
                    v2, anns = _split_annotations(v2, sub_ctx)
                    obj = _to_object(v2, term, sub_ctx, state, graph,
                                     from_map=True)
                    if obj is not None:
                        _emit(state, graph, subj, pred, obj)
                        for ann in anns:
                            _annotate(ann, (QT, (subj, pred, obj)),
                                      graph, sub_ctx, state)
                    elif anns:
                        raise InvalidAnnotation(
                            "@annotation on a dropped value")
            continue

        if keys.LIST in container and not _is_list_object(value):
            # term-level @container:@list wraps the value array (D7)
            head = _add_list(_as_list(value, sub_ctx), term, sub_ctx,
                             state, graph)
            _emit(state, graph, subj, pred, head)
            continue

        if keys.GRAPH in container:
            # @container:@graph ([spec] 1.1 §9.11): each value is a graph.
            # A value that is already a GRAPH OBJECT with its own @id
            # (only @graph/@id/@index members) keeps that id as the
            # graph name (it is never re-wrapped) — anything else gets a
            # fresh anonymous graph.
            for v in _as_list(value, sub_ctx):
                if isinstance(v, dict):
                    vmap = {sub_ctx.expand_key(k): k for k in v}
                    is_graph_obj = keys.GRAPH in vmap and all(
                        ek in (keys.GRAPH, keys.ID, keys.INDEX)
                        for ek in vmap)
                    gterm = None
                    if is_graph_obj and keys.ID in vmap:
                        gterm = _to_rdf_id(v[vmap[keys.ID]], sub_ctx,
                                           state)
                    if gterm is None:
                        gterm = state.fresh_bnode()
                    inner = v[vmap[keys.GRAPH]] if keys.GRAPH in vmap \
                        else v
                    for item in _as_list(inner, sub_ctx):
                        if isinstance(item, dict):
                            _add_to_graph(item, gterm, sub_ctx, state,
                                          from_map=True)
                    _emit(state, graph, subj, pred, gterm)
            continue

        # nested plain arrays FLATTEN in non-list positions ([spec]
        # expansion step 5.2.4; sweep 35 differential: [[false]] was
        # silently dropped by the direct walk). Set objects unwrap
        # here carrying their LOCAL @context into the members (the
        # _as_list unwrap discarded it — invalid contexts passed
        # silently and member terms resolved in the wrong scope).
        queue = [(v, sub_ctx) for v in
                 (value if isinstance(value, list) else [value])]
        flat = []
        while queue:
            item, ictx = queue.pop(0)
            if isinstance(item, list):
                queue[0:0] = [(x, ictx) for x in item]
                continue
            skey = None
            if isinstance(item, dict):
                skey = next((k for k in item
                             if ictx.expand_key(k) == keys.SET), None)
            if skey is None:
                flat.append((item, ictx))
                continue
            ictx2 = ictx.load(item[keys.CONTEXT]) \
                if keys.CONTEXT in item else ictx
            bad = [k for k in item if k != skey
                   and _key_survives(ictx2.expand_key(k))
                   and ictx2.expand_key(k) not in (keys.INDEX,
                                                   keys.CONTEXT)]
            if bad:
                raise InvalidSetOrListObject(f"@set with {bad!r}")
            s_idx = next((k for k in item
                          if ictx2.expand_key(k) == keys.INDEX), None)
            if s_idx is not None and not isinstance(item[s_idx], str):
                raise InvalidIndexValue(repr(item[s_idx]))
            sv = item[skey]
            queue[0:0] = [(x, ictx2) for x in
                          (sv if isinstance(sv, list) else [sv])]
        for v, ictx in flat:
            v2, anns = _split_annotations(v, ictx)
            obj = _to_object(v2, term, ictx, state, graph)
            if obj is not None:
                _emit(state, graph, subj, pred, obj)
                # JSON-LD-star annotation syntax: assert the base triple
                # (above) AND each annotation property with the QUOTED
                # triple as subject
                for ann in anns:
                    _annotate(ann, (QT, (subj, pred, obj)), graph,
                              ictx, state)
            elif anns:
                raise InvalidAnnotation("@annotation on a dropped value")

    # Free-floating value check (B3): a node with only @id emits nothing by
    # itself — quads come from its uses. That matches set semantics.
    return subj


def _split_annotations(v, ctx: Context):
    """Return ``(value_without_@annotation, [annotation maps])`` for a
    dict value; non-dicts pass through with no annotations. [spec]
    JSON-LD-star draft: @annotation carries one map or an array of
    maps — anything else is an invalid annotation."""
    if not isinstance(v, dict):
        return v, []
    inner = ctx.load(v[keys.CONTEXT]) if keys.CONTEXT in v else ctx
    ann_keys = [k for k in v if inner.expand_key(k) == keys.ANNOTATION]
    if not ann_keys:
        return v, []
    anns = []
    for k in ann_keys:
        for item in _as_list(v[k], inner):
            if not isinstance(item, dict):
                raise InvalidAnnotation(repr(item))
            anns.append(item)
    v2 = {k: val for k, val in v.items() if k not in ann_keys}
    return v2, anns


def _annotate(ann: dict, qt_subj: tuple, graph, ctx: Context,
              state: _State) -> None:
    """Emit one annotation object's properties with the quoted triple
    as subject (JSON-LD-star draft annotation syntax). Annotation
    objects describe the EDGE, never a node: @id (or @value/@list/
    @graph shapes) inside one is an invalid annotation."""
    inner = ctx.load(ann[keys.CONTEXT]) if keys.CONTEXT in ann else ctx
    for k in ann:
        if inner.expand_key(k) in (keys.ID, keys.VALUE, keys.LIST,
                                   keys.GRAPH):
            raise InvalidAnnotation(f"{k!r} inside an annotation object")
    _add_to_graph(ann, graph, ctx, state, force_subj=qt_subj)


def _embedded_triple(node: dict, graph, ctx: Context,
                     state: _State) -> tuple:
    """``@id`` whose value is a map → quoted-triple subject term
    ([spec] JSON-LD-star draft "embedded node"): the map must describe
    exactly ONE triple — an @id plus exactly one property (or @type)
    with exactly one value — and is NOT asserted."""
    inner = ctx.load(node[keys.CONTEXT]) if keys.CONTEXT in node else ctx
    kmap = {k: inner.expand_key(k) for k in node}
    if any(e == keys.ANNOTATION for e in kmap.values()):
        raise InvalidEmbeddedNode("@annotation inside an embedded node")
    id_key = next((k for k, e in kmap.items() if e == keys.ID), None)
    if id_key is None:
        raise InvalidEmbeddedNode("embedded node requires @id")
    idv = node[id_key]
    if isinstance(idv, dict):
        es = _embedded_triple(idv, graph, inner, state)
    elif isinstance(idv, str):
        es = _to_rdf_id(idv, inner, state)
    else:
        raise InvalidIdValue(repr(idv))
    if es is None:
        raise InvalidEmbeddedNode(f"unresolvable embedded @id {idv!r}")
    props = [(k, e) for k, e in kmap.items()
             if e not in (None, keys.CONTEXT, keys.ID)]
    if len(props) != 1:
        raise InvalidEmbeddedNode(
            f"embedded node needs exactly one property, got "
            f"{[k for k, _ in props]!r}")
    k, e = props[0]
    vals = node[k] if isinstance(node[k], list) else [node[k]]
    if len(vals) != 1:
        raise InvalidEmbeddedNode(
            f"embedded property {k!r} needs exactly one value")
    if e == keys.TYPE:
        t = vals[0]
        t_iri = inner.expand_iri(t, vocab=True) if isinstance(t, str) \
            else None
        if t_iri is None or t_iri in keys.KEYWORDS:
            raise InvalidEmbeddedNode(f"embedded @type {t!r}")
        return (QT, (es, (IRI, keys.RDF_TYPE), _iri_or_bnode(t_iri, state)))
    if e in keys.KEYWORDS:
        raise InvalidEmbeddedNode(f"keyword {e} in an embedded node")
    term = inner.terms.get(k)
    sub_ctx = inner.subcontext_for_term(k)
    eo = _to_object(vals[0], term, sub_ctx, state, graph)
    if eo is None:
        raise InvalidEmbeddedNode(f"embedded value of {k!r} dropped")
    return (QT, (es, _iri_or_bnode(e, state), eo))


def _nest_into(nested: dict, subj, graph, ctx: Context, state: _State) -> None:
    """@nest: properties of the nested map attach to the outer subject
    (force_subj — carries ANY term kind, including quoted-triple
    subjects inside annotation objects; r05 sweep: the previous
    fake-@id trick raised InvalidIdValue for @nest inside
    @annotation). A nested map's own @id is ignored, matching the
    expansion twin's nest-merge loop."""
    _add_to_graph(dict(nested), graph, ctx, state, force_subj=subj)


def _emit(state: _State, graph, s, p, o) -> None:
    state.quads.append((graph, s, p, o))
    if state.pending:
        # compound-literal helper triples ride in the parent's graph
        for s2, p2, o2 in state.pending:
            state.quads.append((graph, s2, p2, o2))
        state.pending.clear()


def _as_list(v, ctx: Context | None = None) -> list:
    """Array-ify, unwrapping @set objects ([spec] §5.1 step 13.4.11).
    With a ctx the detection is ALIAS-aware and sibling keys other than
    @index/@context raise invalid set or list object; nested sets
    flatten (sweep 6: an aliased @set was walked as an empty node
    object, and illegal siblings were silently dropped). Without a ctx
    this is the legacy alias-blind unwrap (internal list-building
    sites), which never validates."""
    items = v if isinstance(v, list) else [v]
    # fast path (hot kernel): only dict members can be set objects
    if not any(isinstance(i, dict) for i in items):
        return items
    out = []
    for item in items:
        skey = None
        if isinstance(item, dict):
            if keys.SET in item:
                skey = keys.SET
            elif ctx is not None:
                skey = next((k for k in item
                             if ctx.expand_key(k) == keys.SET), None)
        if skey is None:
            out.append(item)
            continue
        if ctx is not None:
            # keys that fail step 13.3 (don't expand / no colon, not a
            # keyword) drop BEFORE sibling validation (ADVICE r03)
            bad = [k for k in item if k != skey
                   and _key_survives(ctx.expand_key(k))
                   and ctx.expand_key(k) not in (keys.INDEX, keys.CONTEXT)]
            if bad:
                raise InvalidSetOrListObject(f"@set with {bad!r}")
        out.extend(_as_list(item[skey], ctx))
    return out


def _is_list_object(v) -> bool:
    return isinstance(v, dict) and keys.LIST in v


def _check_list_siblings(v: dict, ctx: Context) -> None:
    """[spec] §5.1 step 13.4.9.1 (sweep 6): a @list object admits only
    @index beside it — anything else that survives step 13.3 is
    invalid, never a silent merge (ADVICE r03: dropped keys drop first)."""
    bad = [k for k in v
           if _key_survives(ctx.expand_key(k))
           and ctx.expand_key(k) not in (keys.LIST, keys.INDEX,
                                         keys.CONTEXT)]
    if bad:
        raise InvalidSetOrListObject(f"@list with {bad!r}")
    idx = next((k for k in v if ctx.expand_key(k) == keys.INDEX), None)
    if idx is not None and not isinstance(v[idx], str):
        # step 13.4.8 validates the @index VALUE here too (sweep 35)
        raise InvalidIndexValue(repr(v[idx]))


def _iri_or_bnode(iri: str, state: _State) -> tuple:
    if iri.startswith("_:"):
        return state.bnode_for(iri)
    return (IRI, iri)


def _to_rdf_id(value: str, ctx: Context, state: _State):
    """@id value → subject/object term ([v0.5.0] parser.py _to_rdf_id, D9)."""
    if value.startswith("_:"):
        return state.bnode_for(value)
    iri = ctx.expand_iri(value, vocab=False)
    if iri is None or iri in keys.KEYWORDS:
        return None
    if iri.startswith("_:"):
        return state.bnode_for(iri)
    return (IRI, iri)


def _add_list(values: list, term, ctx: Context, state: _State, graph,
              in_list: bool = False) -> tuple:
    """Ordered array → rdf:first/rest/nil bnode chain ([v0.5.0] parser.py
    _add_list ~L330-380, D7; [spec] JLD-API §10.4 List Conversion).

    Order source of truth is ARRAY POSITION — the chain is built in one
    pass inside the UDF, never from row order (SURVEY.md §7 hard parts).
    """
    if in_list and not state.allow_ll:
        raise InvalidListOfLists(repr(values))
    items = []
    for v in _as_list(values, ctx):
        if isinstance(v, list) or _is_list_object(v):
            if isinstance(v, dict):
                _check_list_siblings(v, ctx)
            inner = v if isinstance(v, list) \
                else _as_list(v.get(keys.LIST, []), ctx)
            items.append(_add_list(inner, term, ctx, state, graph, in_list=True))
        else:
            obj = _to_object(v, term, ctx, state, graph, in_list=True)
            if obj is not None:
                items.append(obj)
    if not items:
        return (IRI, keys.RDF_NIL)
    bnodes = [state.fresh_bnode() for _ in items]
    for i, (bn, obj) in enumerate(zip(bnodes, items)):
        _emit(state, graph, bn, (IRI, keys.RDF_FIRST), obj)
        rest = bnodes[i + 1] if i + 1 < len(bnodes) else (IRI, keys.RDF_NIL)
        _emit(state, graph, bn, (IRI, keys.RDF_REST), rest)
    return bnodes[0]


def canonical_double(v: float) -> str:
    """XSD canonical lexical form of xsd:double ([spec] JLD-API §10.6
    'Data Round Tripping' / XSD 1.1 §3.3.5.2): mantissa in [1,10) with a
    mandatory fractional digit, 'E', exponent without leading zeros.
    P/R-sensitive detail (SURVEY.md §7 hard parts / H3). Non-zero values
    are cached (corpora repeat a small set of scores millions of times);
    ±0.0 stays outside the cache because 0.0 == -0.0 would collide keys
    while their canonical lexicals differ."""
    if v == 0:
        return "-0.0E0" if math.copysign(1.0, v) < 0 else "0.0E0"
    return _canonical_double_nonzero(v)


@functools.lru_cache(maxsize=4096)
def _canonical_double_nonzero(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "INF" if v > 0 else "-INF"
    mantissa, exp = f"{v:1.15E}".split("E")
    mantissa = mantissa.rstrip("0")
    if mantissa.endswith("."):
        mantissa += "0"
    return f"{mantissa}E{int(exp)}"


def _es6_number(x: float) -> str:
    """ECMAScript Number::toString for a finite double — the number
    serialization RFC 8785 (JCS) §3.2.2.3 mandates. Differs from
    Python's repr in exponent thresholds (ES6 stays decimal for
    1e-6 ≤ |x| < 1e21) and in integral doubles (1.0 → "1")."""
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite number in JSON literal: {x!r}")
    if x == 0.0:
        return "0"  # ES6: String(-0) is "0"
    if x == int(x) and abs(x) < 1e21:
        return str(int(x))
    sign = "-" if x < 0 else ""
    r = repr(abs(x))  # shortest round-trip digits
    if "e" in r:
        mant, exp_s = r.split("e")
        exp = int(exp_s)
    else:
        mant, exp = r, 0
    if "." in mant:
        dot = mant.index(".")
        digits = mant[:dot] + mant[dot + 1:]
    else:
        dot = len(mant)
        digits = mant
    n = dot + exp  # value = 0.digits × 10^n
    digits = digits.rstrip("0")
    while digits.startswith("0"):
        digits = digits[1:]
        n -= 1
    k = len(digits)
    if k <= n <= 21:
        out = digits + "0" * (n - k)
    elif 0 < n <= 21:
        out = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        out = "0." + "0" * (-n) + digits
    else:
        e = n - 1
        out = digits[0] + ("." + digits[1:] if k > 1 else "") \
            + "e" + ("+" if e >= 0 else "-") + str(abs(e))
    return sign + out


def canonical_json(v) -> str:
    """Canonical JSON for rdf:JSON literals per RFC 8785 (JCS), as
    [spec] JSON-LD 1.1 §10.6 step 10 ("canonical lexical form ...
    as defined in [JCS]") requires: ES6 number serialization (sweep 7:
    1.0 previously serialized as "1.0", not "1"), object keys sorted by
    UTF-16 code units, minimal separators/escapes, UTF-8."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _es6_number(v)
    if isinstance(v, list):
        return "[" + ",".join(canonical_json(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(),
                       key=lambda kv: str(kv[0]).encode("utf-16-be"))
        return "{" + ",".join(
            json.dumps(str(k), ensure_ascii=False) + ":"
            + canonical_json(val) for k, val in items) + "}"
    raise TypeError(f"not a JSON value: {type(v).__name__}")


def _to_object(v, term, ctx: Context, state: _State, graph,
               in_list: bool = False, from_map: bool = False):
    """Value → RDF term; recurses for node objects. [v0.5.0] parser.py
    _to_object (~L380-450, D8); [spec] JLD-API §10.6 Object to RDF."""
    t_type = term.type if term is not None and term.type is not UNDEF else None

    # @json-typed term: whole value becomes one rdf:JSON literal. Checked
    # BEFORE the null drop — null IS a JSON value ("null"^^rdf:JSON;
    # sweep 7: it was silently dropped), matching expansion step 13.4.7.1
    if t_type == keys.JSON:
        return (LIT, canonical_json(v), keys.RDF_JSON, None)

    if v is None:
        return None  # B3: null values dropped

    if isinstance(v, dict):
        # Probe with the node's own context loaded (aliased @value/@list
        # detection) but hand _add_to_graph the UNLOADED ctx: it loads
        # the node context itself, and loading twice is NOT idempotent
        # for a relative @base (sweep 6: "sub/" resolved twice gave
        # .../sub/sub/x).
        inner = ctx.load(v[keys.CONTEXT]) if keys.CONTEXT in v else ctx
        kmap = {k: inner.expand_key(k) for k in v}
        val_key = next((k for k, e in kmap.items() if e == keys.VALUE), None)
        if val_key is not None:
            return _value_object_to_term(v, kmap, val_key, term, inner,
                                         state)
        if _is_list_object(v) or any(e == keys.LIST for e in kmap.values()):
            _check_list_siblings(v, inner)
            lkey = next(k for k, e in kmap.items() if e == keys.LIST)
            return _add_list(_as_list(v[lkey], inner), term, inner, state,
                             graph, in_list=in_list)
        # Node object / node reference → recurse in the same graph (D2).
        return _add_to_graph(v, graph, ctx, state, from_map=from_map)

    if isinstance(v, str):
        if t_type == keys.ID:
            return _to_rdf_id(v, ctx, state)
        if t_type == keys.VOCAB:
            iri = ctx.expand_iri(v, vocab=True)
            if iri is None:
                return None
            return _iri_or_bnode(iri, state)
        if t_type == keys.NONE or t_type is None:
            lang = None
            if term is not None and term.language is not UNDEF:
                lang = term.language
            elif ctx.language:
                lang = ctx.language
            direction = _default_direction(term, ctx)
            if direction and state.rdf_direction == "i18n-datatype":
                return _i18n_literal(v, lang, direction)
            if direction and state.rdf_direction == "compound-literal" \
                    and state is not None:
                return _compound_literal(state, v, lang, direction)
            if lang:
                return (LIT, v, keys.RDF_LANGSTRING, lang)
            return (LIT, v, keys.XSD_STRING, None)
        return (LIT, v, t_type, None)  # datatype coercion

    # Native JSON scalars → canonical XSD lexicals ([spec] §10.6 steps 5-7).
    if isinstance(v, bool):
        dt = t_type if t_type and not t_type.startswith("@") else keys.XSD_BOOLEAN
        return (LIT, "true" if v else "false", dt, None)
    if isinstance(v, int):
        dt = t_type if t_type and not t_type.startswith("@") else keys.XSD_INTEGER
        lex = canonical_double(float(v)) if dt == keys.XSD_DOUBLE else str(v)
        return (LIT, lex, dt, None)
    if isinstance(v, float):
        if v.is_integer() and t_type == keys.XSD_INTEGER:
            return (LIT, str(int(v)), keys.XSD_INTEGER, None)
        dt = t_type if t_type and not t_type.startswith("@") else keys.XSD_DOUBLE
        return (LIT, canonical_double(v), dt, None)
    return None


def _default_direction(term, ctx: Context):
    """Effective base direction: term override, else context default
    ([spec] JSON-LD 1.1 §4.2.4)."""
    if term is not None and getattr(term, "direction", UNDEF) is not UNDEF:
        return term.direction
    return getattr(ctx, "direction", None)


def _i18n_literal(value: str, lang, direction) -> tuple:
    """Direction-carrying string → i18n-datatyped literal ([spec] JLD-API
    1.1 §10.6 step 12, rdfDirection="i18n-datatype"): datatype
    ``https://www.w3.org/ns/i18n#<lang>_<dir>`` (lang lowercase, may be
    empty), no language tag on the literal itself."""
    return (LIT, value, f"{keys.I18N_NS}{(lang or '').lower()}_{direction}",
            None)


def _compound_literal(state: _State, value: str, lang, direction) -> tuple:
    """Direction-carrying string → reified compound literal ([spec]
    JLD-API 1.1 §10.6 step 12, rdfDirection="compound-literal"): a fresh
    bnode with rdf:value / rdf:language (lowercase, when tagged) /
    rdf:direction, queued on state.pending so _emit lands them in the
    parent triple's graph."""
    bn = state.fresh_bnode()
    state.pending.append(
        (bn, (IRI, keys.RDF_NS + "value"),
         (LIT, value, keys.XSD_STRING, None)))
    if lang:
        state.pending.append(
            (bn, (IRI, keys.RDF_NS + "language"),
             (LIT, lang.lower(), keys.XSD_STRING, None)))
    state.pending.append(
        (bn, (IRI, keys.RDF_NS + "direction"),
         (LIT, direction, keys.XSD_STRING, None)))
    return bn


def _value_object_to_term(v: dict, kmap: dict, val_key: str, term,
                          ctx: Context, state: _State | None = None):
    """{"@value": ...} → literal ([spec] JLD-API §10.6 steps 8-13)."""
    value = v[val_key]
    type_key = next((k for k, e in kmap.items() if e == keys.TYPE), None)
    # [spec] §5.1 step 13.4.3 (sweep 6, mirrors expansion.py): a value
    # object admits only @value/@type/@language/@direction/@index (plus
    # a consumed local @context); @type never coexists with @language
    # or @direction; a language tag requires a string @value
    extra = [k for k, e in kmap.items()
             if _key_survives(e) and e not in _VALUE_OBJECT_KEYS]
    if extra:
        if any(kmap[k] == keys.ANNOTATION for k in extra):
            # allowed-position annotations are stripped by the parent
            # emission loop before this runs; one left over sits where
            # no base triple exists (e.g. inside @list) — JSON-LD-star
            # draft "invalid annotation"
            raise InvalidAnnotation("@annotation in a list/invalid position")
        raise InvalidValueObject(f"unexpected entries {extra!r}")
    _lk = next((k for k, e in kmap.items() if e == keys.LANG), None)
    _dk = next((k for k, e in kmap.items() if e == keys.DIRECTION), None)
    lang_present = _lk is not None and isinstance(v[_lk], str)
    dir_present = _dk is not None and isinstance(v[_dk], str)
    if type_key is not None and (lang_present or dir_present):
        raise InvalidValueObject("@type with @language/@direction")
    if lang_present and value is not None and not isinstance(value, str):
        # [spec] §5.1 step 13.4.11
        raise InvalidLanguageTaggedValue(repr(value))
    if type_key is not None and v[type_key] == keys.JSON:
        # BEFORE the null drop: {"@value": null, "@type": "@json"} is the
        # JSON literal "null"^^rdf:JSON ([spec] 1.1 §4.2.2), matching the
        # expansion path's preservation of @json-typed nulls
        return (LIT, canonical_json(value), keys.RDF_JSON, None)
    explicit_type = None
    if type_key is not None:
        # [spec] §5.1 step 13.4.4.4: a value object's @type must expand
        # to an IRI/bnode (validated BEFORE the null-@value drop, like
        # the expansion path; sweep 6: "@none" leaked as a datatype)
        t = v[type_key]
        if not isinstance(t, str):
            raise InvalidTypedValue(repr(t))
        explicit_type = ctx.expand_iri(t, vocab=True)
        if explicit_type is None or not (explicit_type.startswith("_:")
                                         or _ABS_IRI_RE.match(explicit_type)):
            raise InvalidTypedValue(repr(t))
    # @index validates BEFORE the null-@value drop ([spec] step 13.4.8
    # runs per-entry; sweep 35 differential: {"@index": null,
    # "@value": null} silently dropped while expansion errored)
    idx_key = next((k for k, e in kmap.items() if e == keys.INDEX), None)
    if idx_key is not None and not isinstance(v[idx_key], str):
        raise InvalidIndexValue(repr(v[idx_key]))
    # @language / @direction VALUE validation also precedes the null
    # drop ([spec] steps 13.4.5/13.4.6 run per entry; sweep 35)
    _lk2 = next((k for k, e in kmap.items() if e == keys.LANG), None)
    if _lk2 is not None and v[_lk2] is not None \
            and not isinstance(v[_lk2], str):
        raise InvalidLanguageTaggedString(repr(v[_lk2]))
    _dk2 = next((k for k, e in kmap.items() if e == keys.DIRECTION), None)
    if _dk2 is not None and v[_dk2] is not None \
            and v[_dk2] not in ("ltr", "rtl"):
        raise InvalidBaseDirection(repr(v[_dk2]))
    if value is None:
        return None  # B3
    if isinstance(value, (list, dict)):
        # [spec] 1.1 API expansion step 13.4.7.x: only @json-typed values
        # may be compound (handled above)
        raise InvalidValueObjectValue(repr(value))
    lang_key = next((k for k, e in kmap.items() if e == keys.LANG), None)
    if lang_key is not None and v[lang_key] is not None \
            and not isinstance(v[lang_key], str):
        # [spec] 1.1 API expansion step 13.4.5
        raise InvalidLanguageTaggedString(repr(v[lang_key]))
    dir_key = next((k for k, e in kmap.items() if e == keys.DIRECTION), None)
    i18n = state is not None and state.rdf_direction == "i18n-datatype"
    compound = state is not None \
        and state.rdf_direction == "compound-literal"
    # explicit value objects take ONLY their own @direction — defaults
    # (term/context) apply to raw strings via value expansion, not here
    direction = v[dir_key] if dir_key is not None else None
    if direction is not None and direction not in ("ltr", "rtl"):
        # [spec] §5.1 step 13.4.6 (sweep 6: mirrors expansion.py)
        raise InvalidBaseDirection(repr(direction))


    if lang_key is not None:
        lang = v[lang_key]
        if lang is None:
            # a NULL @language only suppresses language tagging — an
            # explicit @type still wins (sweep 6: the datatype was lost)
            if explicit_type is None:
                if isinstance(value, str) and i18n and direction:
                    return _i18n_literal(value, None, direction)  # i18n#_dir
                if isinstance(value, str) and compound and direction:
                    return _compound_literal(state, value, None, direction)
                return (LIT, _native_lex(value)[0], _native_lex(value)[1], None) \
                    if not isinstance(value, str) else (LIT, value, keys.XSD_STRING, None)
        elif isinstance(value, str):
            if i18n and direction:
                return _i18n_literal(value, lang, direction)
            if compound and direction:
                return _compound_literal(state, value, lang, direction)
            return (LIT, value, keys.RDF_LANGSTRING, lang.lower())

    if explicit_type:
        lex = value if isinstance(value, str) else _native_lex(value, explicit_type)[0]
        return (LIT, lex, explicit_type, None)

    if isinstance(value, str):
        # NO default-language/direction injection for explicit value
        # objects ([spec] JLD-API §13.4: value objects pass through; the
        # default language applies only in Value Expansion of raw
        # strings) — also what makes {"@value": "x"} round-trip under a
        # default-language context.
        if i18n and direction:
            return _i18n_literal(value, None, direction)
        if compound and direction:
            return _compound_literal(state, value, None, direction)
        return (LIT, value, keys.XSD_STRING, None)

    lex, dt = _native_lex(value)
    return (LIT, lex, dt, None)


def _native_lex(value, force_dt: str | None = None) -> tuple[str, str]:
    """Native scalar → (canonical lexical, default datatype)."""
    if isinstance(value, bool):
        return ("true" if value else "false"), (force_dt or keys.XSD_BOOLEAN)
    if isinstance(value, int):
        if force_dt == keys.XSD_DOUBLE:
            return canonical_double(float(value)), force_dt
        return str(value), (force_dt or keys.XSD_INTEGER)
    if isinstance(value, float):
        if force_dt == keys.XSD_INTEGER and value.is_integer():
            return str(int(value)), force_dt
        return canonical_double(value), (force_dt or keys.XSD_DOUBLE)
    return str(value), (force_dt or keys.XSD_STRING)
