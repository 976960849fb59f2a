"""RDF quads → JSON-LD tree (the "from-rdf" / serialize algorithm) with
optional compaction.

Parity map (SURVEY.md §2.E, §3.2):
  E1 subject grouping   — [v0.5.0] serializer.py node-map build (~L110-180);
     [spec] JLD-API §10.5 Serialize RDF as JSON-LD.
  E2 predicate grouping + use_rdf_type — [v0.5.0] serializer.py (~L180-240).
  E3 list reassembly    — [v0.5.0] serializer.py (~L240-300).
  E4 auto_compact       — [v0.5.0] serializer.py (~L60-75); golden output
     [checkout] docs/jsonld-serializer.rst:28-39.
  C4 IRI compaction     — context.shrink_iri.

Signature parity: [v0.5.0] serializer.py from_rdf(graph, context_data,
base, use_native_types, use_rdf_type, auto_compact, startnode, index)
(~L40-70; [checkout] docs/jsonld-serializer.rst:49).

The same function body runs per-(graph, subject-partition) inside
``groupBy().applyInPandas`` in the Spark sink stage (SURVEY.md §2.J
compact_nodes) — this module stays Spark-free.
"""

from __future__ import annotations

import re

from . import keys
from .context import Context, split_iri
from .compact import _compact_element, _compact_id as _doc_compact_id
from .tordf import BNODE, IRI, LIT, QT


# XSD lexical spaces ([spec] XMLSchema-2 §3.3.13/§3.2.5) — Python's
# int()/float() are too lenient (whitespace, '_' separators, 'Infinity'),
# so validate before converting; sweep 16.
_XSD_INT_RE = re.compile(r"[+-]?[0-9]+\Z")
_XSD_DOUBLE_RE = re.compile(
    r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?\Z")


def _native(lex: str, dt: str):
    # [spec] JLD-API §10.5 RDF-to-Object: convert only when the lexical
    # form is a VALID xsd:integer/xsd:double; xsd:boolean converts only
    # the lexicals 'true'/'false' (not '1'/'0'). INF/-INF/NaN are valid
    # xsd:double lexicals but have no JSON number representation — keep
    # the typed string (pyld-compatible). Sweep 16.
    if dt == keys.XSD_INTEGER and _XSD_INT_RE.match(lex):
        return int(lex)
    if dt == keys.XSD_BOOLEAN:
        if lex == "true":
            return True
        if lex == "false":
            return False
    if dt == keys.XSD_DOUBLE and _XSD_DOUBLE_RE.match(lex):
        return float(lex)
    return None


def _annotation_maps(quads):
    """Partition RDF-star annotation quads (JSON-LD-star draft,
    from-RDF direction): a quad whose SUBJECT is a quoted triple whose
    base triple is asserted in the same graph re-nests as @annotation
    on that triple's object entry; one whose base is NOT asserted stays
    a node whose @id is an embedded node map. Returns
    ``(plain_quads, ann_map)`` where ann_map keys are
    ``(g, s, p, o)`` base quads and values are ``[(p2, o2), ...]``."""
    if not any(s[0] == QT for _, s, _, _ in quads):
        return quads, {}
    asserted = {(g, s, p, o) for g, s, p, o in quads}
    ann_map: dict = {}
    out = []
    for g, s, p, o in quads:
        if s[0] == QT and (g, *s[1]) in asserted:
            ann_map.setdefault((g, *s[1]), []).append((p, o))
        else:
            out.append((g, s, p, o))
    return out, ann_map


def _lit_repr(o):
    _, lex, dt, lang = o
    if lang:
        return {keys.VALUE: lex, keys.LANG: lang}
    if dt == keys.XSD_STRING or dt is None:
        return {keys.VALUE: lex}
    return {keys.VALUE: lex, keys.TYPE: dt}


def _embedded_id(t: tuple):
    """QT subject term → expanded embedded-node map for @id
    (tordf._embedded_triple's inverse)."""
    qs, qp, qo = t[1]
    es = _embedded_id(qs) if qs[0] == QT else _term_key(qs)
    if qp == (IRI, keys.RDF_TYPE) and qo[0] in (IRI, BNODE):
        return {keys.ID: es, keys.TYPE: [_term_key(qo)]}
    if qo[0] == QT:
        return {keys.ID: es, _term_key(qp): [{keys.ID: _embedded_id(qo)}]}
    od = _lit_repr(qo) if qo[0] == LIT else {keys.ID: _term_key(qo)}
    return {keys.ID: es, _term_key(qp): [od]}


def _term_key(t: tuple) -> str:
    return f"_:{t[1]}" if t[0] == BNODE else t[1]


def from_rdf(quads, context_data=None, base=None, use_native_types=False,
             use_rdf_type=False, auto_compact=False, registry=None,
             startnode=None, index=False, rdf_direction=None):
    """Quad tuples → JSON-LD object tree (compacted iff a context applies).

    Returns ``{"@context": ..., "@graph": [...]}`` when a context is in
    play, else a plain list of expanded node objects (top-level array form,
    matching the reference's default [checkout] README.md:49-63 which shows
    expanded output with full IRIs when no context is passed).

    Signature parity: [v0.5.0] serializer.py from_rdf(graph, context_data,
    base, use_native_types, use_rdf_type, auto_compact, startnode, index)
    (~L40-70; [checkout] docs/jsonld-serializer.rst:49). ``startnode``
    selects one subject (IRI/CURIE under the given context) and returns its
    node object alone; ``index=True`` returns the node map keyed by graph
    id ('@default' for the default graph) then subject id.
    """
    if rdf_direction not in (None, "i18n-datatype", "compound-literal"):
        # mirror to_rdf: fail loudly on unsupported/typo'd modes instead
        # of silently degrading to None behavior
        raise ValueError(f"unsupported rdfDirection: {rdf_direction!r}")
    quads, ann_map = _annotation_maps(list(quads))
    if auto_compact and context_data is None:
        context_data = derive_context(quads)
    ctx = Context(base=base, registry=registry)
    compact = context_data is not None
    if compact:
        ctx = ctx.load(context_data)

    # ---- E3: detect well-formed rdf lists --------------------------------
    firsts: dict[tuple, list] = {}
    rests: dict[tuple, list] = {}
    other_out: dict[tuple, int] = {}
    refs: dict[tuple, int] = {}
    for g, s, p, o in quads:
        skey = (g, s)
        if p == (IRI, keys.RDF_FIRST):
            firsts.setdefault(skey, []).append(o)
        elif p == (IRI, keys.RDF_REST):
            rests.setdefault(skey, []).append(o)
        else:
            other_out[skey] = other_out.get(skey, 0) + 1
        if o[0] == BNODE:
            refs[(g, o)] = refs.get((g, o), 0) + 1

    def is_list_node(g, t):
        k = (g, t)
        return (t[0] == BNODE and len(firsts.get(k, [])) == 1
                and len(rests.get(k, [])) == 1 and other_out.get(k, 0) == 0
                and refs.get(k, 0) == 1)

    list_member: set = set()
    list_chains: dict[tuple, list] = {}  # (g, head) -> [object terms]
    for g, s, p, o in quads:
        if p != (IRI, keys.RDF_REST) or not is_list_node(g, s):
            continue
        if o != (IRI, keys.RDF_NIL) and is_list_node(g, o):
            continue  # only chain tails start reconstruction below
    # walk chains from heads: heads are list nodes not pointed to by a rest
    rest_src = {}
    for g, s, p, o in quads:
        if p == (IRI, keys.RDF_REST) and is_list_node(g, s):
            rest_src[(g, o)] = s
    heads = [k for k in firsts
             if is_list_node(*k) and not (
                 k in rest_src and is_list_node(k[0], rest_src[k]))]
    for g, head in [k for k in heads]:
        chain, cur, ok = [], (g, head), True
        seen = set()
        while True:
            if cur in seen or not is_list_node(*cur):
                ok = False
                break
            seen.add(cur)
            chain.append(cur)
            nxt = rests[cur][0]
            if nxt == (IRI, keys.RDF_NIL):
                break
            cur = (g, nxt)
        if ok:
            list_chains[(g, head)] = [firsts[c][0] for c in chain]
            list_member.update(chain)

    # ---- compound literals (rdfDirection="compound-literal") -------------
    # [spec] JLD-API 1.1 §10.5 RDF-to-Object: a BLANK NODE subject with
    # an rdf:direction entry deserializes as a @value/@language/
    # @direction map; the node itself leaves the node map.
    compound: dict = {}
    if rdf_direction == "compound-literal":
        # A bnode deserializes as a compound literal ONLY when its
        # predicate set is a subset of {rdf:value, rdf:language,
        # rdf:direction}, single-valued, all-literal, and includes
        # rdf:direction — a bnode that merely CARRIES an rdf:direction
        # among other properties stays a node (ADVICE r04: we silently
        # dropped its other triples, and duplicate rdf:value kept an
        # arbitrary first).
        cpreds = (keys.RDF_NS + "value", keys.RDF_NS + "language",
                  keys.RDF_NS + "direction")
        cprops: dict = {}
        disq: set = set()
        for g, s, p, o in quads:
            if s[0] != BNODE:
                continue
            skey = (g, s)
            if p[0] == IRI and p[1] in cpreds and o[0] == LIT:
                slots = cprops.setdefault(skey, {})
                if p[1] in slots:
                    disq.add(skey)          # duplicate slot → real node
                else:
                    slots[p[1]] = o[1]
            else:
                disq.add(skey)              # foreign property → real node
        for skey, got in cprops.items():
            if skey in disq or keys.RDF_NS + "direction" not in got:
                continue
            vo = {keys.VALUE: got.get(keys.RDF_NS + "value", "")}
            if keys.RDF_NS + "language" in got:
                vo[keys.LANG] = got[keys.RDF_NS + "language"].lower()
            vo[keys.DIRECTION] = got[keys.RDF_NS + "direction"]
            compound[skey] = vo

    # ---- E1/E2: node map --------------------------------------------------
    nodes: dict[tuple, dict] = {}   # (g, subject term) -> node object
    graph_of: dict[tuple, str | None] = {}
    for g, s, p, o in quads:
        skey = (g, s)
        if skey in list_member or skey in compound:
            continue
        node = nodes.get(skey)
        if node is None:
            node = {keys.ID: _embedded_id(s) if s[0] == QT
                    else _term_key(s)}
            nodes[skey] = node
            graph_of[skey] = g
        annotated = (g, s, p, o) in ann_map
        if p == (IRI, keys.RDF_TYPE) and o[0] in (IRI, BNODE) \
                and not use_rdf_type and not annotated:
            # only IRI/bnode objects convert to @type; literal AND
            # triple-term objects stay property-form (sweep 35 fuzz:
            # a QT object leaked its raw tuple into @type)
            node.setdefault(keys.TYPE, []).append(_term_key(o))
            continue
        pred = _term_key(p)
        obj = _object_repr(g, o, ctx, compact, use_native_types, list_chains,
                           nodes, graph_of, rdf_direction, compound)
        if annotated:
            obj = dict(obj)
            obj[keys.ANNOTATION] = [_annotation_repr(
                g, s, p, o, ann_map, ctx, compact, use_native_types,
                list_chains, nodes, graph_of, rdf_direction, compound)]
        node.setdefault(("pred", pred), []).append(obj)

    # ---- assemble tree ----------------------------------------------------
    out_nodes = []
    # named graphs: nodes whose g is not None hang under their graph node
    by_graph: dict = {}
    for (g, s), node in nodes.items():
        by_graph.setdefault(g, []).append(((g, s), node))

    def finalize(node, skey):
        expanded = {keys.ID: node[keys.ID]}
        if keys.TYPE in node:
            expanded[keys.TYPE] = node[keys.TYPE]
        for k, vals in node.items():
            if isinstance(k, tuple) and k[0] == "pred":
                expanded[k[1]] = vals
        if not compact:
            return expanded
        # delegate to the document-level Compaction core ([spec] JLD-API
        # §6, jsonld/compact.py) — one implementation of term selection,
        # value compaction and container reconstruction for BOTH the
        # serializer and the standalone compact() API.
        return _compact_element(ctx, None, expanded, True)

    default_nodes = by_graph.get(None, [])
    named = {g: members for g, members in by_graph.items() if g is not None}

    finals = {}
    for g, members in by_graph.items():
        for skey, node in members:
            finals[skey] = finalize(node, skey)

    # attach named graphs under their naming node (if present in default)
    result_list = []
    default_ids = {nodes[skey][keys.ID]: skey
                   for skey, _ in default_nodes
                   if isinstance(nodes[skey][keys.ID], str)}
    consumed = set()
    for g, members in named.items():
        gid = _term_key(g)
        gkey = ctx.alias(keys.GRAPH) if compact else keys.GRAPH
        children = [finals[skey] for skey, _ in members]
        if gid in default_ids:
            finals[default_ids[gid]][gkey] = children
        else:
            idkey = ctx.alias(keys.ID) if compact else keys.ID
            result_list.append({
                idkey: _doc_compact_id(ctx, gid) if compact else gid,
                gkey: children})
        consumed.add(g)

    result_list = [finals[skey] for skey, _ in default_nodes] + result_list

    if index:
        # node map keyed by graph id then subject id ([v0.5.0] from_rdf
        # index kwarg): '@default' for the default graph.
        imap: dict = {}
        for g, members in by_graph.items():
            gid = "@default" if g is None else _term_key(g)
            bucket = imap.setdefault(gid, {})
            for skey, node in members:
                bucket[node[keys.ID]] = finals[skey]
        if compact:
            return {keys.CONTEXT: context_data, "@index": imap}
        return imap

    if startnode is not None:
        want = ctx.expand_iri(startnode, vocab=False) if compact \
            else startnode
        for g, members in by_graph.items():
            for skey, node in members:
                if node[keys.ID] in (want, startnode):
                    out = finals[skey]
                    if compact:
                        return {keys.CONTEXT: context_data, **out}
                    return out
        raise KeyError(f"startnode not in graph: {startnode!r}")

    if compact:
        ctx_out = context_data
        body = result_list[0] if len(result_list) == 1 else {
            ctx.alias(keys.GRAPH): result_list}
        if isinstance(body, dict):
            out = {keys.CONTEXT: ctx_out}
            out.update(body)
            return out
        return {keys.CONTEXT: ctx_out, ctx.alias(keys.GRAPH): body}
    return result_list


def _annotation_repr(g, s, p, o, ann_map, ctx, compact,
                     use_native_types, list_chains, nodes, graph_of,
                     rdf_direction=None, compound=None):
    """Build the expanded @annotation object for base quad (g,s,p,o):
    one map of {pred: [object reprs]}, recursing for annotations ON
    annotations (nested quoted subjects)."""
    qt = (QT, (s, p, o))
    out: dict = {}
    for p2, o2 in ann_map[(g, s, p, o)]:
        o_repr = _object_repr(g, o2, ctx, compact, use_native_types,
                              list_chains, nodes, graph_of,
                              rdf_direction, compound)
        if (g, qt, p2, o2) in ann_map:
            o_repr = dict(o_repr)
            o_repr[keys.ANNOTATION] = [_annotation_repr(
                g, qt, p2, o2, ann_map, ctx, compact, use_native_types,
                list_chains, nodes, graph_of, rdf_direction, compound)]
        out.setdefault(_term_key(p2), []).append(o_repr)
    return out


def _object_repr(g, o, ctx, compact, use_native_types, list_chains,
                 nodes, graph_of, rdf_direction=None, compound=None):
    if o[0] == QT:
        # quoted triple in OBJECT position → embedded-@id node reference
        # (sweep 35 fuzz: the raw term tuple leaked into the document as
        # {"@id": (kind, ...)}, which to_rdf rightly rejects)
        return {keys.ID: _embedded_id(o)}
    if compound and o[0] == BNODE and (g, o) in compound:
        return dict(compound[(g, o)])
    if o == (IRI, keys.RDF_NIL):
        # [spec] JLD-API §10.5 step 6: every object reference to rdf:nil
        # is a nil usage whose backwards walk (zero iterations here, the
        # chain cases are consumed by list_chains) replaces the reference
        # with an empty list — in ALL object positions: direct property
        # value, list member, and a malformed list node's rdf:rest.
        # @type position keeps the IRI (node-map step 5.4). Sweep 16.
        return {keys.LIST: []}
    if (g, o) in list_chains if o[0] == BNODE else False:
        members = list_chains[(g, o)]
        return {keys.LIST: [
            _object_repr(g, m, ctx, compact, use_native_types, list_chains,
                         nodes, graph_of, rdf_direction, compound)
            for m in members]}
    if o[0] == LIT:
        _, lex, dt, lang = o
        if rdf_direction == "i18n-datatype" and dt \
                and dt.startswith(keys.I18N_NS):
            # i18n:<lang>_<dir> → @language/@direction value object
            # ([spec] JLD-API 1.1 §10.5 with rdfDirection)
            tag, _, direction = dt[len(keys.I18N_NS):].partition("_")
            out = {keys.VALUE: lex}
            if tag:
                out[keys.LANG] = tag
            if direction:
                out[keys.DIRECTION] = direction
            return out
        if lang:
            return {keys.VALUE: lex, keys.LANG: lang}
        if dt == keys.XSD_STRING or dt is None:
            return {keys.VALUE: lex}
        if dt == keys.RDF_JSON:
            # rdf:JSON literal → parsed JSON value with "@type": "@json"
            # ([spec] JLD-API §10.5 step on JSON literals)
            import json as _json
            try:
                return {keys.VALUE: _json.loads(lex), keys.TYPE: keys.JSON}
            except ValueError:
                pass
        if use_native_types:
            nat = _native(lex, dt)
            if nat is not None:
                return {keys.VALUE: nat}
        return {keys.VALUE: lex, keys.TYPE: dt}
    return {keys.ID: _term_key(o)}


# Predicate/value compaction is delegated to jsonld/compact.py (single
# implementation shared with the standalone compact() API).


def derive_context(quads) -> dict:
    """E4 auto_compact: derive prefix map from predicate/type namespaces
    ([v0.5.0] serializer.py ~L60-75; golden shape
    [checkout] docs/jsonld-serializer.rst:28-39)."""
    namespaces = {}
    for g, s, p, o in quads:
        iris = [p[1]] if p[0] == IRI else []
        if p == (IRI, keys.RDF_TYPE) and o[0] == IRI:
            iris.append(o[1])
        for iri in iris:
            ns, name = split_iri(iri)
            if name:
                namespaces[ns] = None
    well_known = {
        keys.RDF_NS: "rdf",
        keys.XSD_NS: "xsd",
        "http://purl.org/dc/terms/": "dcterms",
        "http://www.w3.org/2000/01/rdf-schema#": "rdfs",
        "http://xmlns.com/foaf/0.1/": "foaf",
        "http://schema.org/": "schema",
    }
    ctx, n = {}, 0
    for ns in sorted(namespaces):
        if ns in well_known:
            ctx[well_known[ns]] = ns
        else:
            ctx[f"ns{n}"] = ns
            n += 1
    return ctx
