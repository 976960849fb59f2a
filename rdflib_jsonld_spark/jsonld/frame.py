"""JSON-LD 1.1 Framing — pure core (no Spark imports).

``frame(data, frame_doc)`` reshapes a document to the structure of a
frame: select nodes by @id / @type / property patterns, embed
referenced nodes per the @embed policy, optionally restrict output to
frame-listed properties (@explicit) and fill @default values.

[spec] JSON-LD 1.1 Framing, https://www.w3.org/TR/json-ld11-framing/
(Framing Algorithm §3.1, Frame Matching §3.2). The reference checkout
has no framing (tombstone; framing entered the ecosystem after v0.5.0)
— this is pipeline-extension breadth on the same pure core the other
document operations share, [spec]-cited per SURVEY.md §0.

v1 narrowings (documented):
- Without ``@graph`` in the frame, graphs are MERGED before matching
  (the spec's default for the common object-embed case). A top-level
  ``@graph`` in the frame triggers named-graph-scoped framing
  ([spec] Framing §4.3): an explicit ``@id`` selects that one named
  graph, a wildcard/absent ``@id`` frames every named graph; matching
  and embedding then stay INSIDE the selected graph (cross-graph
  references stay unembedded ``{"@id": ...}``), and each output node
  is ``{"@id": <graph>, "@graph": [framed...]}``. Properties the
  graph-name node carries in the default graph are not merged into
  the output (documented narrowing).
- The frame is interpreted directly (property keys expand through the
  frame's own @context; pattern values are ``{}`` wildcards, ``[]``
  match-none, value-object patterns, or nested frames) instead of
  running frame-expansion; ``@null``/``@preserve`` internals are not
  surfaced.
- Nested frames constrain *selection* by property presence and
  value-object patterns; deep recursive match-against-subframe is not
  applied during selection (it IS applied during embedding, which is
  where its output-shaping effect lives).

Flags follow the spec defaults: ``embed="@once"``, ``explicit=False``,
``require_all=False``, ``omit_default=False`` — each overridable per
call and per (sub)frame via @embed/@explicit/@requireAll/@omitDefault.
"""

from __future__ import annotations

from . import keys
from .errors import InvalidEmbedValue, InvalidFrame
from .context import Context
from .expansion import expand
from .flatten import DEFAULT, _Issuer, _append_unique, _generate

_FLAG_KEYS = ("@embed", "@explicit", "@requireAll", "@omitDefault",
              "@default")
_EMBED_MODES = ("@once", "@always", "@never")

# sentinel value object standing in for an explicit @null default
# ([spec] Framing §3.1: "@default": "@null" (or JSON null) emits the
# property with value null); restored to JSON null after compaction.
_NULL_MARK = "\x00@null"


def _embed_mode(v):
    """Normalize an @embed value ([spec] Framing §4.2: MUST be one of
    @always/@never/@once/true/false; true ≡ @once, false ≡ @never —
    sweep 28: booleans were rejected)."""
    if v is True:
        return "@once"
    if v is False:
        return "@never"
    if v not in _EMBED_MODES:
        raise InvalidEmbedValue(
            f"@embed must be one of {_EMBED_MODES} or true/false")
    return v


def _restore_nulls(obj):
    """Replace the @null-default sentinel with JSON null in framed
    output (both the expanded and the compacted shapes)."""
    if isinstance(obj, dict):
        if obj.get(keys.VALUE) == _NULL_MARK:
            return None
        return {k: _restore_nulls(v) for k, v in obj.items()}
    if isinstance(obj, list):
        out = [_restore_nulls(v) for v in obj]
        # compact_arrays turned [sentinel] into the bare sentinel before
        # we ran; a surviving singleton list of null stays a list
        return out
    if obj == _NULL_MARK:
        return None
    return obj


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _is_wildcard(v) -> bool:
    """``{}`` (or ``[{}]``, or a dict of only framing flags) matches
    anything present ([spec] §1.4 'wildcard')."""
    vs = _as_list(v)
    return len(vs) == 1 and isinstance(vs[0], dict) and not {
        k for k in vs[0] if k not in _FLAG_KEYS}


def _is_match_none(v) -> bool:
    return isinstance(v, list) and not v


def _merged_node_map(element) -> dict:
    """Expanded document → ONE node map with every graph merged
    ([spec] Framing §3.1 step 2 default: framing over the merged
    dataset). Reuses the flattening node-map generator."""
    node_map: dict[str, dict[str, dict]] = {DEFAULT: {}}
    _generate(element, node_map, _Issuer(), DEFAULT, None, None, None)
    merged: dict[str, dict] = {}
    for gname in sorted(node_map):
        for nid, node in node_map[gname].items():
            # nid is the node-map KEY; for JSON-LD-star embedded-@id
            # nodes it is a '\\x00qt'-prefixed canonical string, while
            # the node's real @id stays the embedded map (flatten.py)
            tgt = merged.setdefault(nid, {keys.ID: node[keys.ID]})
            for k, vs in node.items():
                if k == keys.ID:
                    continue
                acc = tgt.setdefault(k, [])
                for v in _as_list(vs):
                    if k == keys.TYPE:
                        if v not in acc:
                            acc.append(v)
                    else:
                        _append_unique(acc, v)
    return merged


class _FrameState:
    __slots__ = ("merged", "embedded", "explicit", "require_all",
                 "omit_default", "embed", "ctx")

    def __init__(self, merged, ctx, embed, explicit, require_all,
                 omit_default):
        self.merged = merged
        self.ctx = ctx
        self.embed = embed
        self.explicit = explicit
        self.require_all = require_all
        self.omit_default = omit_default
        self.embedded: set[str] = set()


def _flag(fr: dict, name: str, inherited):
    v = fr.get(name)
    if v is None:
        return inherited
    v = _as_list(v)[0]
    if isinstance(v, dict):
        v = v.get(keys.VALUE, inherited)
    return v


def _expand_frame(fr: dict, ctx: Context) -> dict:
    """Frame dict → {expanded key: raw frame value}; property keys go
    through the frame's own context, keywords normalize to canonical
    form, framing flags pass through untouched."""
    out: dict = {}
    for k, v in fr.items():
        if k == keys.CONTEXT:
            continue
        if k in _FLAG_KEYS:
            out[k] = v
            continue
        ek = ctx.expand_key(k)
        if ek is None:
            continue
        out[ek] = v
    return out


def _value_pattern_matches(pat: dict, val: dict, ctx: Context) -> bool:
    """Value-object pattern vs an expanded value object ([spec] §3.2:
    each of @value/@type/@language matches by wildcard, subset, or
    exact)."""
    if keys.VALUE not in val:
        return False
    for pk, nk in ((keys.VALUE, keys.VALUE), (keys.TYPE, keys.TYPE),
                   (keys.LANG, keys.LANG)):
        if pk not in pat:
            continue
        want = pat[pk]
        if _is_wildcard(want):
            if nk not in val:
                return False
            continue
        wants = _as_list(want)
        if pk == keys.TYPE:
            wants = [ctx.expand_iri(w, vocab=True) if isinstance(w, str)
                     else w for w in wants]
        got = val.get(nk)
        if pk == keys.LANG and isinstance(got, str):
            got = got.lower()
            wants = [w.lower() if isinstance(w, str) else w
                     for w in wants]
        if got not in wants:
            return False
    return True


def _property_matches(node: dict, prop: str, pat, ctx: Context) -> bool:
    present = bool(node.get(prop))
    if _is_match_none(pat):
        return not present
    if not present:
        return False
    if _is_wildcard(pat):
        return True
    # [spec] §3.2: a list object matches when any of its ITEMS match
    # the value pattern (sweep 28: patterns never looked inside @list)
    flat = []
    for v in node[prop]:
        if isinstance(v, dict) and keys.LIST in v:
            flat.extend(x for x in v[keys.LIST] if isinstance(x, dict))
        elif isinstance(v, dict):
            flat.append(v)
    pats = _as_list(pat)
    for p in pats:
        if isinstance(p, dict) and keys.VALUE in p:
            if any(_value_pattern_matches(p, v, ctx) for v in flat):
                return True
        else:
            # nested frame: presence selects; the subframe shapes the
            # embed (v1 narrowing documented in the module docstring)
            return True
    return False


def _matches(node: dict, fr: dict, state: _FrameState,
             require_all: bool) -> bool:
    """Frame Matching ([spec] §3.2), over an expanded frame dict."""
    checks: list[bool] = []
    ids = fr.get(keys.ID)
    if ids is not None and not _is_wildcard(ids) \
            and not _is_match_none(ids):
        want = [state.ctx.expand_iri(i, vocab=False)
                if isinstance(i, str) else i for i in _as_list(ids)]
        if node.get(keys.ID) not in want:
            return False
        checks.append(True)
    types = fr.get(keys.TYPE)
    if types is not None:
        nts = node.get(keys.TYPE) or []
        if _is_match_none(types):
            if nts:
                return False
            checks.append(True)
        elif _is_wildcard(types):
            if not nts:
                return False
            checks.append(True)
        else:
            want = {state.ctx.expand_iri(t, vocab=True)
                    for t in _as_list(types) if isinstance(t, str)}
            if not want & set(nts):
                return False
            checks.append(True)
    props = {k: v for k, v in fr.items()
             if k not in (keys.ID, keys.TYPE) and not k.startswith("@")}
    if not props:
        return True if checks or not fr else True
    results = []
    for p, pat in props.items():
        has_default = any(isinstance(x, dict) and "@default" in x
                          for x in _as_list(pat))
        if has_default:
            results.append(True)
            continue
        results.append(_property_matches(node, p, pat, state.ctx))
    if require_all:
        return all(results)
    # requireAll=false: matching on @id/@type alone suffices even when a
    # (default-less) frame property is absent from the node ([spec]
    # framing §3.2 step 2.5 — ANY of id/type/property matches; the
    # r03 sweep-6 fix: {"@type": T, "p": {}} + @omitDefault dropped
    # type-matching nodes that merely lacked p)
    return any(results) or not results or bool(checks)


def _sub_frame(pat) -> dict:
    for p in _as_list(pat):
        if isinstance(p, dict):
            return p
    return {}


def _embed_node(nid: str, fr: dict, state: _FrameState,
                ancestors: frozenset, embed_mode: str,
                explicit: bool, omit_default: bool) -> dict:
    node = state.merged.get(nid)
    if node is None:
        return {keys.ID: nid}
    # node-map KEY vs real @id: embedded-@id (JSON-LD-star) nodes key
    # by a canonical string but their @id is the embedded map
    out: dict = {keys.ID: node.get(keys.ID, nid)}
    if node.get(keys.TYPE):
        out[keys.TYPE] = list(node[keys.TYPE])
    frame_props = {k for k in fr if not k.startswith("@")}
    for p in sorted(k for k in node if k not in (keys.ID, keys.TYPE)):
        if explicit and p not in frame_props:
            continue
        sub = _sub_frame(fr.get(p))
        mode = _embed_mode(_flag(sub, "@embed", embed_mode))
        sub_explicit = bool(_flag(sub, "@explicit", explicit))
        sub_omit = bool(_flag(sub, "@omitDefault", omit_default))
        sub_x = _expand_frame(sub, state.ctx) if sub else {}
        out[p] = [_embed_value(v, sub_x, state, ancestors | {nid},
                               mode, sub_explicit, sub_omit)
                  for v in node[p]]
    for p in sorted(frame_props - set(node)):
        # [spec] §3.1 default filling: the PROPERTY frame's own
        # @omitDefault overrides the inherited flag in either direction
        # (sweep 15: {"@default": x, "@omitDefault": true} still filled)
        pat = next((x for x in _as_list(fr[p]) if isinstance(x, dict)),
                   None)
        if pat is None or bool(_flag(pat, "@omitDefault", omit_default)):
            continue
        if "@default" in pat:
            dv = pat["@default"]
            # [spec] §3.1: an explicit @null (or JSON null) default
            # emits the property with value null (sweep 28)
            if dv is None or dv == "@null":
                out[p] = [{keys.VALUE: _NULL_MARK}]
            else:
                out[p] = [dv if isinstance(dv, dict)
                          else {keys.VALUE: dv}]
    _embed_reverse(fr, nid, out, state, ancestors, embed_mode,
                   explicit, omit_default)
    return out


def _embed_reverse(fr: dict, nid: str, out: dict, state: _FrameState,
                   ancestors: frozenset, embed_mode: str,
                   explicit: bool, omit_default: bool) -> None:
    """Reverse framing ([spec] Framing §3.1 step 4.7.4): a frame's
    ``@reverse`` map embeds, per reverse property, every node that
    REFERENCES the current node via that property (sweep 28: @reverse
    in frames was silently ignored — the silent-drop class)."""
    rev = next((r for r in _as_list(fr.get(keys.REV))
                if isinstance(r, dict)), None)
    if not rev:
        return
    rout: dict = {}
    for rk, rpat in rev.items():
        rprop = state.ctx.expand_key(rk)
        if rprop is None or rprop.startswith("@"):
            continue
        sub = _sub_frame(rpat)
        mode = _embed_mode(_flag(sub, "@embed", embed_mode))
        sub_explicit = bool(_flag(sub, "@explicit", explicit))
        sub_omit = bool(_flag(sub, "@omitDefault", omit_default))
        sub_x = _expand_frame(sub, state.ctx) if sub else {}
        refs = []
        for oid in sorted(state.merged):
            for vv in _as_list(state.merged[oid].get(rprop)):
                items = vv[keys.LIST] if isinstance(vv, dict) \
                    and keys.LIST in vv else [vv]
                if any(isinstance(x, dict) and x.get(keys.ID) == nid
                       for x in items):
                    refs.append(oid)
                    break
        vals = [_embed_value({keys.ID: oid}, sub_x, state,
                             ancestors | {nid}, mode, sub_explicit,
                             sub_omit) for oid in refs]
        if vals:
            rout[rprop] = vals
    if rout:
        out[keys.REV] = rout


def _embed_value(v, sub: dict, state: _FrameState, ancestors: frozenset,
                 mode: str, explicit: bool, omit_default: bool):
    if isinstance(v, dict) and keys.LIST in v:
        return {keys.LIST: [
            _embed_value(m, sub, state, ancestors, mode, explicit,
                         omit_default) for m in v[keys.LIST]]}
    # JSON-LD-star: an @annotation rides the EDGE — it must neither
    # block embedding of the referenced node nor be lost (r05 sweep:
    # an annotated reference silently skipped embedding)
    annotation = None
    if isinstance(v, dict) and keys.ANNOTATION in v \
            and set(v) == {keys.ID, keys.ANNOTATION} \
            and isinstance(v.get(keys.ID), str):
        annotation = v[keys.ANNOTATION]
        v = {keys.ID: v[keys.ID]}

    def _with_ann(out):
        if annotation is not None and isinstance(out, dict):
            out = dict(out)
            out[keys.ANNOTATION] = annotation
        return out

    if not (isinstance(v, dict) and set(v) == {keys.ID}):
        return v                       # value object / literal
    tid = v[keys.ID]
    if not isinstance(tid, str):       # embedded-@id node (quoted triple)
        return _with_ann({keys.ID: tid})
    if tid not in state.merged or mode == "@never" or tid in ancestors:
        return _with_ann({keys.ID: tid})
    if mode == "@once" and tid in state.embedded:
        return _with_ann({keys.ID: tid})
    state.embedded.add(tid)
    return _with_ann(_embed_node(tid, sub, state, ancestors, mode,
                                 explicit, omit_default))


def _frame_named_graphs(expanded, fx: dict, fctx: Context, embed: str,
                        explicit: bool, require_all: bool,
                        omit_default: bool) -> list:
    """Named-graph-scoped framing ([spec] Framing §4.3): a top-level
    ``@graph`` in the frame selects named graph(s) — explicit ``@id``
    picks that graph, wildcard/absent frames every named graph —
    and the inner frame matches/embeds WITHIN each selected graph
    (cross-graph references stay as bare ``{"@id": ...}``). Output is
    one ``{"@id": <graph>, "@graph": [framed...]}`` node per graph."""
    node_map: dict[str, dict[str, dict]] = {DEFAULT: {}}
    _generate(expanded, node_map, _Issuer(), DEFAULT, None, None, None)
    ids = fx.get(keys.ID)
    if _is_match_none(ids):
        return []
    if ids is None or _is_wildcard(ids):
        gnames = sorted(g for g in node_map if g != DEFAULT)
    else:
        want = [fctx.expand_iri(i, vocab=False) if isinstance(i, str)
                else i for i in _as_list(ids)]
        gnames = sorted(g for g in node_map
                        if g != DEFAULT and g in want)
    inner_raw = next((g for g in _as_list(fx[keys.GRAPH])
                      if isinstance(g, dict)), {})
    g_embed = _embed_mode(_flag(inner_raw, "@embed", embed))
    g_explicit = bool(_flag(inner_raw, "@explicit", explicit))
    g_require_all = bool(_flag(inner_raw, "@requireAll", require_all))
    g_omit = bool(_flag(inner_raw, "@omitDefault", omit_default))
    inner_x = _expand_frame(inner_raw, fctx)
    framed = []
    for gname in gnames:
        gmap = node_map.get(gname, {})
        state = _FrameState(gmap, fctx, g_embed, g_explicit,
                            g_require_all, g_omit)
        matched = [nid for nid in sorted(gmap)
                   if _matches(gmap[nid], inner_x, state,
                               g_require_all)]
        body = []
        for nid in matched:
            state.embedded.add(nid)
            body.append(_embed_node(nid, inner_x, state, frozenset(),
                                    g_embed, g_explicit, g_omit))
        framed.append({keys.ID: gname, keys.GRAPH: body})
    return framed


def frame(data, frame_doc, *, base: str | None = None,
          registry: dict | None = None, embed: str = "@once",
          explicit: bool = False, require_all: bool = False,
          omit_default: bool = False, compact_output: bool = True,
          ctx: Context | None = None, frame_ctx: Context | None = None):
    """Frame ``data`` by ``frame_doc`` ([spec] Framing Algorithm §3.1).

    Returns the compacted framed document ``{"@context": ...,
    "@graph": [...]}`` (or the expanded framed node array with
    ``compact_output=False``). Top-level frame flags override the
    keyword defaults; per-subframe flags override those.

    ``ctx`` / ``frame_ctx`` short-circuit context resolution for the
    input document / the frame with pre-resolved Contexts — the
    per-executor fast path the Spark document stages use (same pattern
    as expand/compact/flatten).
    """
    if not isinstance(frame_doc, dict):
        raise InvalidFrame("frame must be a map")
    ctx_data = frame_doc.get(keys.CONTEXT)
    if frame_ctx is not None:
        fctx = frame_ctx
    else:
        fctx = Context(base=base, registry=registry or {})
        if ctx_data is not None:
            fctx = fctx.load(ctx_data)
    embed = _embed_mode(_flag(frame_doc, "@embed", embed))
    explicit = bool(_flag(frame_doc, "@explicit", explicit))
    require_all = bool(_flag(frame_doc, "@requireAll", require_all))
    omit_default = bool(_flag(frame_doc, "@omitDefault", omit_default))

    expanded = expand(data, base=base, registry=registry, ctx=ctx)
    fx = _expand_frame(frame_doc, fctx)
    if keys.GRAPH in fx:
        framed = _frame_named_graphs(expanded, fx, fctx, embed,
                                     explicit, require_all,
                                     omit_default)
    else:
        merged = _merged_node_map(expanded)
        state = _FrameState(merged, fctx, embed, explicit, require_all,
                            omit_default)
        matched = [nid for nid in sorted(merged)
                   if _matches(merged[nid], fx, state, require_all)]
        framed = []
        for nid in matched:
            state.embedded.add(nid)
            framed.append(_embed_node(nid, fx, state, frozenset(),
                                      embed, explicit, omit_default))
    if not compact_output:
        return _restore_nulls(framed)
    from .compact import compact as _compact
    out = _compact(framed, ctx_data, base=base, registry=registry,
                   expanded=True, compact_arrays=True)
    if isinstance(out, dict) and keys.GRAPH not in out \
            and fctx.alias(keys.GRAPH) not in out:
        body = {k: v for k, v in out.items() if k != keys.CONTEXT}
        out = {fctx.alias(keys.GRAPH): [body] if body else []}
        if ctx_data is not None:
            out = {keys.CONTEXT: ctx_data, **out}
    return _restore_nulls(out)
