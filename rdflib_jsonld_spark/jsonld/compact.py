"""JSON-LD compaction: expanded document + context → compact document.

The reference's conformance suite ran ``compact`` cases and its serializer
exposed the same semantics through ``from_rdf(..., auto_compact)``
([v0.5.0] test/test_compaction.py, serializer.py — SURVEY.md §5.1, §2.E).
This module is the document-level algorithm from [spec] JSON-LD 1.1
Processing Algorithms and API §6 (Compaction, IRI Compaction, Value
Compaction), built on the same ``Context`` reverse index as the serializer
(C4: ``shrink_iri`` / ``find_term``).

Semantic oracle used by the tests: for any context C,
``to_rdf(compact(doc, C), C) ≅ to_rdf(doc)`` — compaction changes the
spelling of a document, never its graph.
"""

from __future__ import annotations

from . import keys
from .context import Context, UNDEF
from .expansion import expand


def compact(data, context_data=None, base: str | None = None,
            registry: dict | None = None, expanded: bool = False,
            compact_arrays: bool = True, ctx: Context | None = None):
    """Document (or pre-expanded form) + context → compacted document.

    Returns a single map; multiple top-level nodes land under ``@graph``
    (aliased if the context aliases it) — [spec] JLD-API §6.1 step 8-9.
    ``ctx`` short-circuits context resolution with a pre-resolved (e.g.
    broadcast) Context — the per-executor fast path (SURVEY.md §1.2);
    ``context_data`` is then only embedded, not re-resolved.
    """
    element = data if expanded else expand(
        data, base=base, registry=registry)
    if ctx is None:
        ctx = Context(base=base, registry=registry)
        if context_data is not None:
            ctx = ctx.load(context_data)

    result = _compact_element(ctx, None, element, compact_arrays)
    if isinstance(result, list):
        if not result:
            result = {}
        elif len(result) == 1 and compact_arrays:
            result = result[0]
        else:
            result = {ctx.alias(keys.GRAPH): result}
    if not isinstance(result, dict):
        result = {ctx.alias(keys.VALUE): result}
    if context_data not in (None, {}, []):
        result = {keys.CONTEXT: context_data, **result}
    return result


# ---------------------------------------------------------------------------

def _compact_element(ctx: Context, term, element, compact_arrays: bool,
                     from_map: bool = False):
    """[spec] §6.1 Compaction Algorithm over expanded-form values.
    ``from_map`` marks direct entries of container maps — the step-2
    previous-context revert is skipped for them, mirroring expansion's
    from-map flag (sweep 33: compaction applied no scoped contexts)."""
    if isinstance(element, list):
        out = [_compact_element(ctx, term, item, compact_arrays,
                                from_map=from_map)
               for item in element]
        keep_array = (term is not None
                      and (keys.SET in term.container
                           or keys.LIST in term.container))
        if compact_arrays and len(out) == 1 and not keep_array:
            return out[0]
        if term is not None and term.type == keys.JSON and len(out) == 1:
            # the raw JSON IS the term value ([spec] expansion step
            # 13.6 reads the WHOLE key value as one @json literal): a
            # kept single-value wrapper would re-expand as one array
            # literal — collapse it even under compact_arrays=False
            # (sweep 35; found by the 1500-example compact fuzz via
            # flatten's compact_arrays=False path)
            return out[0]
        return out
    if not isinstance(element, dict):
        return element

    # Non-propagating scoped-context revert ([spec] §6.1 step 2, the
    # compaction mirror of expansion step 8): a pending type-scoped
    # context drops on entry to a nested element unless it is a value
    # object or a subject reference.
    if ctx.previous is not None and not from_map:
        is_subject_ref = keys.ID in element and set(element) <= {keys.ID}
        if keys.VALUE not in element and not is_subject_ref:
            ctx = ctx.previous

    if keys.VALUE in element:
        return _compact_value(ctx, term, element)

    if keys.LIST in element and set(element) <= {keys.LIST, keys.INDEX}:
        items = [_compact_element(ctx, term, v, compact_arrays)
                 for v in element[keys.LIST]]
        if term is not None and keys.LIST in term.container \
                and keys.INDEX not in element:
            if term.type == keys.JSON and len(items) == 1:
                # inverse of steps 13.6+13.11: the single member's raw
                # JSON is the term value, NOT array-wrapped (sweep 12)
                return items[0]
            return items  # container folds the list wrapper away
        out = {ctx.alias(keys.LIST): items}
        if keys.INDEX in element:
            out[ctx.alias(keys.INDEX)] = element[keys.INDEX]
        return out

    # node object / node reference
    if keys.ID in element and set(element) == {keys.ID}:
        if isinstance(element[keys.ID], dict):
            # JSON-LD-star embedded node reference
            return {ctx.alias(keys.ID): _compact_element(
                ctx, None, element[keys.ID], compact_arrays)}
        compacted_id = _compact_id(ctx, element[keys.ID])
        if term is not None and term.type == keys.ID:
            return compacted_id
        if term is not None and term.type == keys.VOCAB:
            return ctx.shrink_iri(element[keys.ID])
        return {ctx.alias(keys.ID): compacted_id}

    # Type-scoped contexts ([spec] §6.1 step 9; 1.1 §4.1.8): each of the
    # node's compacted @type terms applies its scoped context, in
    # lexicographic order, before the entry loop — so term selection for
    # the node's own properties sees the scoped definitions (sweep 33).
    if keys.TYPE in element:
        tnames = [ctx.shrink_iri(t) for t in element[keys.TYPE]
                  if isinstance(t, str)]
        ctx = ctx.subcontext_for_type(tnames)

    result: dict = {}
    for key in element:
        values = element[key]
        if key == keys.ID:
            # a dict @id is a JSON-LD-star embedded node — it compacts
            # like a (one-property) node object
            result[ctx.alias(keys.ID)] = (
                _compact_element(ctx, None, values, compact_arrays)
                if isinstance(values, dict) else _compact_id(ctx, values))
            continue
        if key == keys.ANNOTATION:
            # JSON-LD-star draft: annotation objects compact like node
            # objects (they have no @id); single maps unwrap
            anns = [_compact_element(ctx, None, v, compact_arrays)
                    for v in values]
            result[ctx.alias(keys.ANNOTATION)] = \
                anns[0] if len(anns) == 1 and compact_arrays else anns
            continue
        if key == keys.TYPE:
            types = [ctx.shrink_iri(t) for t in values]
            result[ctx.alias(keys.TYPE)] = \
                types[0] if len(types) == 1 and compact_arrays else types
            continue
        if key == keys.INDEX:
            result[ctx.alias(keys.INDEX)] = values
            continue
        if key == keys.GRAPH:
            inner = [_compact_element(ctx, None, v, compact_arrays)
                     for v in values]
            result[ctx.alias(keys.GRAPH)] = inner
            continue
        if key == keys.INCLUDED:
            result[ctx.alias(keys.INCLUDED)] = [
                _compact_element(ctx, None, v, compact_arrays)
                for v in values]
            continue
        if key == keys.REV:
            rev_out: dict = {}
            for p, vs in values.items():
                rterm = _select_reverse_term(ctx, p)
                if rterm is not None:
                    result[rterm.name] = _compact_property_values(
                        ctx, rterm, vs, compact_arrays)
                else:
                    rev_out[ctx.shrink_iri(p)] = _compact_property_values(
                        ctx, None, vs, compact_arrays)
            if rev_out:
                result[ctx.alias(keys.REV)] = rev_out
            continue
        if key == keys.LIST:
            result[ctx.alias(keys.LIST)] = [
                _compact_element(ctx, None, v, compact_arrays)
                for v in values]
            continue

        # --- regular property ---
        # [spec] §6.1 step 12: term selection runs PER VALUE (IRI
        # compaction with the value argument) — a typed value and a
        # plain value of the same property may compact to different
        # terms. Values grouping to the same term keep their order.
        groups: list[tuple[object, list]] = []
        by_term: dict = {}
        for v in values:
            pterm = _select_term(ctx, key, [v])
            gid = pterm.name if pterm is not None else None
            if gid not in by_term:
                by_term[gid] = (pterm, [])
                groups.append(by_term[gid])
            by_term[gid][1].append(v)
        for pterm, vs in groups:
            if pterm is not None and pterm.type == keys.JSON \
                    and len(vs) > 1:
                # each literal matches the @json term alone, but the
                # merged array would re-expand as ONE literal of the
                # whole array (step 13.6) — fall back to the IRI key
                pterm = None
            if pterm is not None and keys.LIST in pterm.container \
                    and len(vs) > 1:
                # same class for @list containers (sweep 35, found by
                # the compact fuzz via a flattened self-reference): two
                # list values under one @list-container key re-expand
                # as ONE nested list — fall back to the IRI key, where
                # each keeps its explicit {"@list": ...} wrapper
                pterm = None
            if pterm is not None:
                pkey = pterm.name
            else:
                pkey = ctx.shrink_iri(key)
                fallback = ctx.terms.get(pkey)
                if fallback is not None and (fallback.container
                                             or fallback.type is not UNDEF):
                    # the only term for this IRI was REJECTED (shape
                    # mismatch); its name would re-expand with coercions
                    # that change the graph — spell the key as an
                    # absolute IRI instead
                    pkey = key
            compacted = _compact_property_values(ctx, pterm, vs,
                                                 compact_arrays)
            if pkey in result:  # two groups/IRIs on one key: merge arrays
                prev = result[pkey]
                prev = prev if isinstance(prev, list) else [prev]
                new = compacted if isinstance(compacted, list) \
                    else [compacted]
                result[pkey] = prev + new
            else:
                result[pkey] = compacted
    return result


def _compact_property_values(ctx: Context, term, values: list,
                             compact_arrays: bool):
    """Reshape a property's expanded values per the chosen term's
    @container ([spec] §6.1 steps 12.8)."""
    container = term.container if term is not None else set()

    # Property-scoped context ([spec] §6.1 step 5 / 1.1 §4.1.9): the
    # selected term's local context governs the compaction of its
    # values AND its container-map keys — the inverse of expansion's
    # parent-side subcontext_for_term (sweep 33).
    if term is not None and term.context is not UNDEF:
        ctx = ctx.subcontext_for_term(term.name)

    if keys.GRAPH in container and values and all(
            isinstance(v, dict) and keys.GRAPH in v for v in values):
        # [spec] §6.1 steps 12.8.7-9: graph containers fold the @graph
        # wrapper away — simple containers inline the graph content,
        # @graph+@id / @graph+@index key a map (absent key → @none).
        def g_content(v):
            inner = [_compact_element(ctx, None, n, compact_arrays,
                                      from_map=True)
                     for n in v[keys.GRAPH]]
            return inner[0] if len(inner) == 1 and compact_arrays \
                else inner

        # Map keys carry exactly ONE component; an entry with extra
        # structure (@index on a [@graph,@id] entry, @id — the graph
        # NAME — on a [@graph,@index] entry) cannot re-expand from the
        # map and falls through to the explicit wrapper (sweep 22b).
        if keys.ID in container and all(
                set(v) <= {keys.GRAPH, keys.ID} for v in values):
            gmap: dict = {}
            for v in values:
                k = _compact_id(ctx, v[keys.ID]) if keys.ID in v \
                    else keys.NONE
                gmap.setdefault(k, []).append(g_content(v))
            return {k: vs[0] if len(vs) == 1 else vs
                    for k, vs in gmap.items()}
        if keys.INDEX in container and keys.ID not in container and all(
                set(v) <= {keys.GRAPH, keys.INDEX} for v in values):
            gmap = {}
            for v in values:
                gmap.setdefault(v.get(keys.INDEX, keys.NONE), []) \
                    .append(g_content(v))
            return {k: vs[0] if len(vs) == 1 else vs
                    for k, vs in gmap.items()}
        if all(set(v) <= {keys.GRAPH} for v in values):
            out: list = []
            for v in values:
                inner = [_compact_element(ctx, None, n, compact_arrays)
                         for n in v[keys.GRAPH]]
                out.extend(inner)
            return out[0] if len(out) == 1 and compact_arrays else out
        # a graph object carrying @id/@index under a simple @graph
        # container keeps its explicit wrapper (falls through)

    # Map containers key entries missing the component under @none
    # ([spec] §6.1 steps 12.8.6/12.8.8-9) — guards stay conservative so
    # a map can never silently drop @type/@index/@list structure. A
    # language-map entry re-expands with the context DEFAULT @direction,
    # so an item may carry @direction only when it EQUALS that default.
    if keys.LANG in container and values \
            and all(_lang_map_ok(v, ctx) for v in values):
        lmap: dict = {}
        for v in values:
            lang = v.get(keys.LANG, keys.NONE)
            lmap.setdefault(lang, []).append(v[keys.VALUE])
        return {lang: vs[0] if len(vs) == 1 and compact_arrays else vs
                for lang, vs in lmap.items()}

    if keys.INDEX in container and values \
            and not (term is not None and term.type == keys.JSON) \
            and all(isinstance(v, dict) for v in values):
        # the @json guard: re-expansion applies step 13.6 BEFORE map
        # unfolding, so an index map under a @json-typed term would be
        # read back as literal JSON content (sweep 12)
        imap: dict = {}
        for v in values:
            stripped = {k: x for k, x in v.items() if k != keys.INDEX}
            imap.setdefault(v.get(keys.INDEX, keys.NONE), []).append(
                _compact_element(ctx, term, stripped, compact_arrays,
                                 from_map=True))
        return {idx: vs[0] if len(vs) == 1 and compact_arrays else vs
                for idx, vs in imap.items()}

    if keys.TYPE in container and values \
            and all(isinstance(v, dict) and keys.VALUE not in v
                    and keys.LIST not in v for v in values):
        tmap: dict = {}
        for v in values:
            vtypes = v.get(keys.TYPE) or []
            first, rest_types = (vtypes[0], vtypes[1:]) if vtypes \
                else (None, [])
            node = {k: x for k, x in v.items() if k != keys.TYPE}
            if rest_types:
                node[keys.TYPE] = rest_types
            tkey = ctx.shrink_iri(first) if first is not None else keys.NONE
            tmap.setdefault(tkey, []).append(
                _compact_element(ctx, None, node, compact_arrays,
                                 from_map=True))
        return {t: vs[0] if len(vs) == 1 and compact_arrays else vs
                for t, vs in tmap.items()}

    if keys.ID in container and values \
            and all(isinstance(v, dict) and keys.VALUE not in v
                    and keys.LIST not in v for v in values):
        idmap: dict = {}
        for v in values:
            node = {k: x for k, x in v.items() if k != keys.ID}
            ikey = _compact_id(ctx, v[keys.ID]) if keys.ID in v \
                else keys.NONE
            idmap.setdefault(ikey, []).append(
                _compact_element(ctx, None, node, compact_arrays,
                                 from_map=True)
                if node else {})
        return {i: vs[0] if len(vs) == 1 and compact_arrays else vs
                for i, vs in idmap.items()}

    if keys.LIST in container and len(values) == 1 \
            and isinstance(values[0], dict) \
            and set(values[0]) <= {keys.LIST, keys.INDEX}:
        return _compact_element(ctx, term, values[0], compact_arrays)

    return _compact_element(ctx, term, values, compact_arrays)


def _compact_value(ctx: Context, term, vobj: dict):
    """[spec] §6.2 Value Compaction."""
    t_type = term.type if term is not None and term.type is not UNDEF \
        else None
    t_lang = term.language if term is not None \
        and term.language is not UNDEF else ctx.language
    t_dir = term.direction if term is not None \
        and term.direction is not UNDEF else getattr(ctx, "direction", None)

    vobj = dict(vobj)
    index = vobj.pop(keys.INDEX, None)
    annotation = vobj.pop(keys.ANNOTATION, None)  # JSON-LD-star draft
    value = vobj.get(keys.VALUE)
    vdir = vobj.get(keys.DIRECTION)

    out = None
    if keys.TYPE in vobj:
        vtype = vobj[keys.TYPE]
        if vtype == t_type or (vtype == keys.JSON and t_type == keys.JSON):
            out = value
        else:
            out = {ctx.alias(keys.TYPE):
                   vtype if vtype == keys.JSON else ctx.shrink_iri(vtype),
                   ctx.alias(keys.VALUE): value}
    elif keys.LANG in vobj:
        same_dir = (vdir or None) == (t_dir or None)
        if isinstance(t_lang, str) and vobj[keys.LANG] == t_lang.lower() \
                and same_dir:
            out = value
        else:
            out = {ctx.alias(keys.LANG): vobj[keys.LANG],
                   ctx.alias(keys.VALUE): value}
            if vdir is not None:
                out[ctx.alias(keys.DIRECTION)] = vdir
    elif vdir is not None:
        # @direction without @language (ADVICE r01: was silently dropped)
        if vdir == (t_dir or None) and not (t_lang or t_type):
            out = value  # re-expansion restores the same default direction
        else:
            out = {ctx.alias(keys.VALUE): value,
                   ctx.alias(keys.DIRECTION): vdir}
    else:
        # plain value: bare only if re-expansion adds nothing back
        # (a default @language, a coercion type, OR a default @direction)
        if isinstance(value, str) and (t_lang or t_type or t_dir):
            out = {ctx.alias(keys.VALUE): value}
        elif not isinstance(value, str) and _native_redundant(value, t_type):
            out = value
        elif not isinstance(value, str) and t_type is None:
            out = value
        else:
            out = value if t_type is None and not t_lang \
                else {ctx.alias(keys.VALUE): value}
    if index is not None:
        if not isinstance(out, dict):
            out = {ctx.alias(keys.VALUE): out}
        out[ctx.alias(keys.INDEX)] = index
    if annotation is not None:
        # an annotated value can never scalar-reduce — the edge
        # annotation must survive compaction (JSON-LD-star draft)
        if not isinstance(out, dict):
            out = {ctx.alias(keys.VALUE): out}
        anns = [_compact_element(ctx, None, a, True) for a in annotation]
        out[ctx.alias(keys.ANNOTATION)] = anns[0] if len(anns) == 1 \
            else anns
    return out


def _native_redundant(value, t_type) -> bool:
    """True when a bare native scalar re-expands to the same typed value
    object under the term's coercion ([spec] §6.2 'data round tripping')."""
    return False  # conservative: natives under typed terms stay wrapped


def _lang_map_ok(v, ctx: Context) -> bool:
    """True when a value may live inside a language map without losing
    or gaining information on re-expansion: a value object carrying at
    most @language plus a @direction that matches the context default
    (entries re-expand WITH that default)."""
    return (isinstance(v, dict) and keys.VALUE in v
            and set(v) <= {keys.VALUE, keys.LANG, keys.DIRECTION}
            and v.get(keys.DIRECTION) == ctx.direction)


def _compact_id(ctx: Context, iri: str) -> str:
    """IRI in @id position → CURIE or base-relative spelling; @vocab does
    NOT apply ([spec] §6.3 IRI Compaction with vocab=false)."""
    if iri.startswith("_:"):
        return iri
    _, prefixes = ctx._reverse_index()
    for pid, pname in prefixes:
        if iri.startswith(pid) and len(iri) > len(pid):
            suffix = iri[len(pid):]
            if suffix.startswith("//"):
                # 'p://x' re-expands verbatim as an IRI, not a CURIE
                # ([spec] §5.2 step 6.2; sweep 22) — try a shorter prefix
                continue
            return f"{pname}:{suffix}"
    return iri


def _select_term(ctx: Context, iri: str, values: list):
    """Pick the most specific term for (iri, value shapes) — a pragmatic
    Term Selection ([spec] §6.4): container match > type/language match >
    plain term; shortest name breaks ties."""
    all_values = bool(values)
    all_lists = all_values and all(
        isinstance(v, dict) and set(v) <= {keys.LIST, keys.INDEX}
        for v in values)
    all_lang = all_values and all(
        _lang_map_ok(v, ctx) and keys.LANG in v for v in values)
    lang_noneable = all_values and all(
        _lang_map_ok(v, ctx) for v in values)
    all_indexed = all_values and all(
        isinstance(v, dict) and keys.INDEX in v for v in values)

    def score(term) -> tuple | None:
        if term.id != iri or term.reverse:
            return None
        s = 0
        if keys.LIST in term.container:
            if not all_lists:
                return None
            s += 8
        if keys.LANG in term.container:
            if all_lang:
                s += 8
            elif lang_noneable:
                s += 4  # absent languages key under @none (12.8.6)
            else:
                return None
        if keys.INDEX in term.container \
                and keys.GRAPH not in term.container:
            if all_indexed:
                s += 8
            elif all_values and all(isinstance(v, dict) for v in values):
                s += 4  # absent indexes key under @none (12.8.8)
            else:
                return None
        graph_container = keys.GRAPH in term.container
        if graph_container:
            if not all(isinstance(v, dict) and keys.GRAPH in v
                       for v in values):
                return None
            s += 8
        if keys.TYPE in term.container:
            if all_values and all(
                    isinstance(v, dict) and v.get(keys.TYPE)
                    for v in values):
                s += 8
            elif all_values and all(
                    isinstance(v, dict) and keys.VALUE not in v
                    and keys.LIST not in v for v in values):
                s += 4  # untyped nodes key under @none (12.8.9)
            else:
                return None
        if keys.ID in term.container and not graph_container:
            # (@graph+@id maps key absent ids under @none — no presence
            # requirement there)
            if all_values and all(
                    isinstance(v, dict) and keys.ID in v for v in values):
                s += 8
            elif all_values and all(
                    isinstance(v, dict) and keys.VALUE not in v
                    and keys.LIST not in v for v in values):
                s += 4  # anonymous nodes key under @none (12.8.9)
            else:
                return None
        if term.type is not UNDEF and term.type is not None:
            if not _type_matches(term.type, values):
                return None
            s += 4
        if term.language is not UNDEF and isinstance(term.language, str):
            if not (all_values and all(
                    isinstance(v, dict)
                    and v.get(keys.LANG) == term.language.lower()
                    for v in values)):
                return None
            s += 2
        return (s, -len(term.name))

    best, best_score = None, None
    for term in ctx.terms.values():
        sc = score(term)
        if sc is None:
            continue
        if best_score is None or sc > best_score:
            best, best_score = term, sc
    return best


def _type_matches(t_type, values: list) -> bool:
    if not values:
        return False
    if t_type == keys.JSON:
        # Re-expansion applies step 13.6 to the term's WHOLE value, so a
        # @json term is only recoverable for exactly one JSON literal —
        # bare, or alone inside one index-less list object (sweep 12)
        if len(values) != 1:
            return False
        v = values[0]
        if isinstance(v, dict) and set(v) == {keys.LIST}:
            members = v[keys.LIST]
            if len(members) != 1:
                return False
            v = members[0]
        return (isinstance(v, dict) and keys.VALUE in v
                and v.get(keys.TYPE) == keys.JSON
                and keys.INDEX not in v)
    for v in values:
        if not isinstance(v, dict):
            return False
        if t_type == keys.ID:
            if set(v) != {keys.ID}:
                return False
        elif t_type == keys.VOCAB:
            if set(v) != {keys.ID}:
                return False
        elif v.get(keys.TYPE) != t_type:
            return False
    return True


def _select_reverse_term(ctx: Context, iri: str):
    best = None
    for term in ctx.terms.values():
        if term.reverse and term.id == iri:
            if best is None or len(term.name) < len(best.name):
                best = term
    return best
