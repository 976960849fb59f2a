"""JSON-LD flattening: expanded document → flat array of labeled nodes.

The reference's conformance suite ran ``flatten`` cases ([v0.5.0]
test/test_testsuite.py — SURVEY.md §5.1). Implemented from [spec] JSON-LD
1.1 Processing Algorithms and API §5.2 (Flattening) and §5.3 (Node Map
Generation): every node gets a stable identifier (fresh deterministic blank
node labels ``_:b0, _:b1, …`` in first-encounter order — the same
determinism argument as to-rdf's bnode replacement, SURVEY.md §4.3.1),
nested node objects are replaced by node references, properties of one
subject are merged across the document, and named graphs surface as
``{"@id": g, "@graph": [...]}`` wrapper nodes.

Semantic oracle used by the tests: ``to_rdf(flatten(doc)) ≅ to_rdf(doc)``
(bnode-isomorphism-aware) — flattening never changes the emitted graph.
"""

from __future__ import annotations

import json

from . import keys
from .context import Context
from .expansion import expand

DEFAULT = "@default"


class _Issuer:
    """Deterministic blank-node relabeler ([spec] JLD-API §1.6 'blank node
    identifier issuer'): every bnode — labeled or anonymous — gets a fresh
    ``_:bN`` in first-encounter order."""

    __slots__ = ("map", "n")

    def __init__(self):
        self.map: dict[str, str] = {}
        self.n = 0

    def issue(self, old: str | None = None) -> str:
        if old is not None:
            got = self.map.get(old)
            if got is not None:
                return got
        label = f"_:b{self.n}"
        self.n += 1
        if old is not None:
            self.map[old] = label
        return label


def flatten(data, context_data=None, base: str | None = None,
            registry: dict | None = None, ctx: Context | None = None,
            expanded: bool = False, compact_context=None):
    """Document (or pre-expanded form with ``expanded=True``) → flattened
    expanded form: a sorted array of labeled node objects.

    ``compact_context`` mirrors the W3C API's optional context argument
    ([spec] JLD-API §5.2 step 6 / JsonLdProcessor.flatten(input, context)):
    when given, the flattened array is compacted with it and returned as a
    single map whose @graph holds the nodes."""
    element = data if expanded else expand(
        data, context_data=context_data, base=base, registry=registry,
        ctx=ctx)
    node_map: dict[str, dict[str, dict]] = {DEFAULT: {}}
    issuer = _Issuer()
    _generate(element, node_map, issuer, DEFAULT, None, None, None)

    default_graph = node_map[DEFAULT]
    for graph_name in sorted(node_map):
        if graph_name == DEFAULT:
            continue
        entry = default_graph.setdefault(graph_name, {keys.ID: graph_name})
        graph_nodes = node_map[graph_name]
        entry[keys.GRAPH] = [
            graph_nodes[nid] for nid in sorted(graph_nodes)
            if set(graph_nodes[nid]) != {keys.ID}]
    flat = [default_graph[nid] for nid in sorted(default_graph)
            if set(default_graph[nid]) != {keys.ID}]
    if compact_context is None:
        return flat
    from .compact import compact as _compact
    out = _compact(flat, compact_context, base=base, registry=registry,
                   expanded=True, compact_arrays=False)
    if not isinstance(out, dict) or keys.CONTEXT in out and len(out) == 1:
        out = {keys.CONTEXT: compact_context, "@graph": []}
    return out


def _key(obj) -> str:
    return json.dumps(obj, sort_keys=True)


def _relabel_bnodes(obj, issuer: _Issuer):
    """Relabel every blank-node identifier inside a kept-verbatim
    JSON-LD-star fragment (an @annotation object or an embedded @id
    map) through the SAME issuer as the hoisted nodes, so a bnode
    shared between the fragment and the asserted graph stays one node
    after flattening."""
    if isinstance(obj, list):
        return [_relabel_bnodes(v, issuer) for v in obj]
    if not isinstance(obj, dict):
        return obj
    out = {}
    for k, v in obj.items():
        if k == keys.ID:
            if isinstance(v, dict):
                out[k] = _relabel_bnodes(v, issuer)
            elif isinstance(v, str) and v.startswith("_:"):
                out[k] = issuer.issue(v)
            else:
                out[k] = v
        elif k == keys.TYPE and isinstance(v, list):
            out[k] = [issuer.issue(t) if isinstance(t, str)
                      and t.startswith("_:") else t for t in v]
        else:
            out[k] = _relabel_bnodes(v, issuer)
    return out


def _append_unique(values: list, obj) -> None:
    k = _key(obj)
    if not any(_key(v) == k for v in values):
        values.append(obj)


def _generate(element, node_map, issuer: _Issuer, active_graph: str,
              active_subject: str | None, active_property: str | None,
              list_: list | None):
    """[spec] JLD-API §5.3 Node Map Generation. Returns the id of a node
    object (used to materialize @reverse forward edges)."""
    if isinstance(element, list):
        for item in element:
            _generate(item, node_map, issuer, active_graph, active_subject,
                      active_property, list_)
        return None
    if not isinstance(element, dict):
        return None

    graph = node_map.setdefault(active_graph, {})

    if isinstance(element.get(keys.TYPE), list):
        # node-object @type is an array; value-object @type is a string
        # (left untouched — it names a datatype, never a bnode).
        element = {**element, keys.TYPE: [
            issuer.issue(t) if t.startswith("_:") else t
            for t in element[keys.TYPE]]}

    if keys.VALUE in element:  # value object: attach, never a node
        if keys.ANNOTATION in element:
            element = {**element, keys.ANNOTATION: _relabel_bnodes(
                element[keys.ANNOTATION], issuer)}
        if list_ is not None:
            list_.append(element)
        elif active_subject is not None:
            vals = graph[active_subject].setdefault(active_property, [])
            _append_unique(vals, element)
        return None

    if keys.LIST in element:  # list object: recurse into a fresh list
        result = {keys.LIST: []}
        _generate(element[keys.LIST], node_map, issuer, active_graph,
                  active_subject, active_property, result[keys.LIST])
        if list_ is not None:
            list_.append(result)
        elif active_subject is not None:
            graph[active_subject].setdefault(
                active_property, []).append(result)
        return None

    # --- node object -------------------------------------------------------
    # JSON-LD-star: @annotation describes the EDGE — it rides on the
    # node REFERENCE in the parent's property array, never on the
    # hoisted node (bnode ids inside it relabel through the issuer)
    annotation = element.get(keys.ANNOTATION)
    raw_id = element.get(keys.ID)
    if isinstance(raw_id, dict):
        # embedded node (quoted-triple subject): the map IS the
        # identifier; key the node map by its canonical JSON
        node_id = _relabel_bnodes(raw_id, issuer)
        node_key = "\x00qt" + _key(node_id)
    elif raw_id is None or raw_id.startswith("_:"):
        node_id = node_key = issuer.issue(raw_id)
    else:
        node_id = node_key = raw_id
    node = graph.setdefault(node_key, {keys.ID: node_id})

    if active_subject is not None or list_ is not None:
        ref = {keys.ID: node_id}
        if annotation is not None:
            ref[keys.ANNOTATION] = _relabel_bnodes(annotation, issuer)
        if list_ is not None:
            list_.append(ref)
        else:
            vals = graph[active_subject].setdefault(active_property, [])
            _append_unique(vals, ref)

    for t in element.get(keys.TYPE, []):
        ts = node.setdefault(keys.TYPE, [])
        if t not in ts:
            ts.append(t)
    if keys.INDEX in element:
        node[keys.INDEX] = element[keys.INDEX]

    if keys.REV in element:
        # Materialize forward edges (o, p, s) — [spec] §5.3 step 6.3.
        for prop, values in element[keys.REV].items():
            p = issuer.issue(prop) if prop.startswith("_:") else prop
            for value in values:
                vid = _generate(value, node_map, issuer, active_graph,
                                None, None, None)
                if vid is not None:
                    vals = graph[vid].setdefault(p, [])
                    _append_unique(vals, {keys.ID: node_id})

    if keys.GRAPH in element:  # named graph keyed by this node's id
        _generate(element[keys.GRAPH], node_map, issuer, node_id,
                  None, None, None)
    if keys.INCLUDED in element:  # siblings in the SAME graph
        _generate(element[keys.INCLUDED], node_map, issuer, active_graph,
                  None, None, None)

    for prop in sorted(element):
        if prop in (keys.ID, keys.TYPE, keys.INDEX, keys.REV, keys.GRAPH,
                    keys.INCLUDED, keys.ANNOTATION):
            continue
        p = issuer.issue(prop) if prop.startswith("_:") else prop
        node.setdefault(p, [])
        _generate(element[prop], node_map, issuer, active_graph,
                  node_key, p, None)
    return node_id
