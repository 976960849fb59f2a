"""Active-context processing: term definitions, IRI expansion & compaction.

Parity map (SURVEY.md §2.C):
  C1 load/merge/null-reset/cycle-detect  — [v0.5.0] context.py Context.load/
     _prep_sources/_fetch_context (~L120-230); [spec] JLD-API §6.1.
  C2 term definitions                    — [v0.5.0] context.py _read_term/
     add_term (~L230-330); [spec] JLD-API §6.2.
  C3 IRI expansion                       — [v0.5.0] context.py resolve_iri/
     expand/_rec_expand (~L330-420); [spec] JLD-API §6.3.
  C4 IRI compaction                      — [v0.5.0] context.py shrink_iri/
     to_symbol/find_term (~L420-500); [spec] JLD-API §6.4.
  C5 scoped contexts (@propagate)        — [v0.5.0] context.py subcontext/
     get_context_for_term (~L60-120); [spec] JSON-LD 1.1 §4.1.8-4.1.9.
  C6 default @language/@direction        — [v0.5.0] context.py language attr.

Remote contexts are resolved from an in-memory *registry* dict instead of
HTTP (semantic narrowing documented in SURVEY.md §7: no per-row network at
scale; A7/C1). Everything here is pure and picklable so a resolved Context
can be broadcast to executors (SURVEY.md §1.2).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit

import json as _json
import re as _re

from . import keys
from .errors import (ContextNotAvailable, InvalidBaseDirection,
                     InvalidBaseIRI, InvalidContainerMapping,
                     InvalidContext, InvalidDefaultLanguage,
                     InvalidImportValue,
                     InvalidIRIMapping, InvalidKeywordAlias,
                     InvalidLanguageMapping, InvalidPrefixValue,
                     InvalidPropagateValue, InvalidReverseProperty,
                     InvalidTermDefinition, InvalidTypeMapping,
                     InvalidVersionValue,
                     InvalidVocabMapping, ProtectedTermRedefinition,
                     RecursiveContextInclusion)


class _Undef:
    """Sentinel distinguishing 'not set' from explicit null in term defs."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "UNDEF"


UNDEF = _Undef()

#: "has the form of a keyword": "@" followed by one or more ALPHA
#: ([spec] 1.1 API §4.2.2 step 5 / §4.2.3 IRI-expansion step 3) — such
#: terms/values are ignored (definition) or expand to null (use).
_KEYWORD_FORM_RE = _re.compile(r"@[A-Za-z]+$")


class Term:
    """A term definition ([spec] JLD-API §6.2; [v0.5.0] context.py Term).

    ``type``/``language`` use UNDEF for "inherit default"; explicit JSON
    ``null`` becomes Python ``None`` (meaning "suppress default").
    """

    __slots__ = (
        "name", "id", "type", "container", "language", "direction",
        "reverse", "prefix", "protected", "context", "propagate",
        "index",
    )

    def __init__(self, name, id=None, type=UNDEF, container=None,
                 language=UNDEF, direction=UNDEF, reverse=False,
                 prefix=False, protected=False, context=UNDEF,
                 propagate=True, index=None):
        self.name = name
        self.id = id
        self.type = type
        self.container = container or set()
        self.language = language
        self.direction = direction
        self.reverse = reverse
        self.prefix = prefix
        self.protected = protected
        self.context = context  # property-scoped context ([spec] 1.1 §4.1.9)
        self.propagate = propagate
        self.index = index      # property-based indexing ([spec] 1.1 §4.6.3)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Term({self.name!r} -> {self.id!r})"


def _has_scheme(value: str) -> bool:
    """True if ``value`` looks like an absolute IRI or CURIE (has a scheme
    part before ':' that is not a relative-path segment)."""
    i = value.find(":")
    if i <= 0:
        return False
    head = value[:i]
    return all(c.isalnum() or c in "+-._" for c in head)


def norm_url(base: str | None, url: str) -> str:
    """RFC-3986 join+normalize of ``url`` against ``base``.

    Parity: [v0.5.0] util.py norm_url (~L35-55), SURVEY.md §2.A6. Built on
    urllib.parse (public stdlib) rather than hand-rolled path merging.
    """
    if not base:
        return url
    joined = urljoin(base, url)
    # RFC 3986 §5.3 keeps an EMPTY fragment/query from the reference
    # ("doc#" resolves to <...doc#>, not <...doc>); urljoin strips both
    # (sweep 9: @vocab "#" lost its trailing '#', fusing vocab and name).
    if url.endswith("#") and not joined.endswith("#"):
        joined += "#"
    elif url.endswith("?") and not joined.endswith("?"):
        joined += "?"
    return joined


def split_iri(iri: str) -> tuple[str, str | None]:
    """Split an IRI at the last ``#``, ``/`` or ``:`` into (namespace, name).

    Parity: [v0.5.0] util.py split_iri (~L5-15), SURVEY.md §2.A8. Used for
    prefix discovery in auto-compaction (E4).
    """
    if iri and iri[-1] in "#/:":
        return iri, None  # pure namespace IRI: no local name
    for sep in ("#", "/"):
        i = iri.rfind(sep)
        if i > -1 and i < len(iri) - 1:
            return iri[: i + 1], iri[i + 1:]
    i = iri.rfind(":")
    if i > -1:
        return iri[: i + 1], iri[i + 1:]
    return iri, None


class Context:
    """Resolved active context; immutable-by-convention and picklable.

    Instances are resolved once on the driver and broadcast to executors
    (SURVEY.md §1.2 '@context → broadcast dict'). All lookups are O(1) dict
    probes, mirroring the reference's only optimization ([v0.5.0], SURVEY.md
    §4.1: term-lookup dicts).
    """

    def __init__(self, base: str | None = None, registry: dict | None = None):
        self.base = base
        self.doc_base = base
        self.vocab: str | None = None
        self.language: str | None = None
        self.direction: str | None = None
        self.version: float = 1.1
        self.terms: dict[str, Term] = {}
        self.aliases: dict[str, str] = {}  # keyword -> list of aliases
        self.alias_of: dict[str, str] = {}  # alias term -> keyword
        self.propagate = True
        # Non-propagating scoped context support ([spec] 1.1 §4.1.8): when
        # set, nested node objects revert to this context on entry.
        self.previous: "Context | None" = None
        # Offline replacement for remote fetch: IRI -> parsed context value.
        self.registry = registry or {}
        self._rev_terms: dict | None = None  # compaction index cache (C4)
        # hot-path memos (C3): vocabularies are tiny and repeat across
        # millions of documents against one broadcast context — ~45% of
        # kernel time is IRI/key expansion without these (profiled).
        # Bounded so adversarial unbounded @id sets can't grow them.
        self._key_memo: dict[str, str | None] = {}
        self._iri_memo_v: dict[str, str | None] = {}
        self._iri_memo_d: dict[str, str | None] = {}
        # node-shape memo: documents in a corpus share a handful of key
        # tuples; expanding the whole tuple once skips per-key dict probes
        self._kmap_memo: dict[tuple, tuple] = {}
        # context-load memo: corpora repeat the same @context value on
        # every document (a registry IRI or one small dict) — resolving
        # it once per worker instead of once per document removed ~44%%
        # of kernel time (profiled r02). Cached instances are shared, so
        # anything that needs to MUTATE a loaded context (the scoped
        # previous-context marker) copies first.
        self._ctx_memo: dict[str, "Context"] = {}

    # -- C1: context processing ------------------------------------------

    def load(self, source, remote_chain: frozenset = frozenset(),
             override_protected: bool = False) -> "Context":
        """Process a local context (value of ``@context``) and return a NEW
        Context — the original is never mutated so scoped contexts (C5) can
        branch. [spec] JLD-API §6.1; [v0.5.0] context.py load (~L120-230).
        ``override_protected`` is the §4.1 flag property-scoped contexts
        pass so they may redefine protected terms (1.1 §4.1.11 exception).
        """
        memo_key = None
        if not override_protected and not remote_chain:
            if isinstance(source, str):
                memo_key = source
            elif isinstance(source, dict):
                try:
                    memo_key = _json.dumps(source, sort_keys=True)
                except (TypeError, ValueError):
                    memo_key = None
            if memo_key is not None:
                got = self._ctx_memo.get(memo_key)
                if got is not None:
                    return got
        sources = source if isinstance(source, list) else [source]
        ctx = self._copy()
        for src in sources:
            ctx._load_one(src, remote_chain, override_protected)
        ctx._rev_terms = None
        if memo_key is not None and len(self._ctx_memo) < 64:
            self._ctx_memo[memo_key] = ctx
        return ctx

    def _copy(self) -> "Context":
        new = Context.__new__(Context)
        new.base = self.base
        new.doc_base = self.doc_base
        new.vocab = self.vocab
        new.language = self.language
        new.direction = self.direction
        new.version = self.version
        new.terms = dict(self.terms)
        new.aliases = dict(self.aliases)
        new.alias_of = dict(self.alias_of)
        new.propagate = self.propagate
        new.previous = self.previous
        new.registry = self.registry
        new._rev_terms = None
        new._key_memo = {}
        new._iri_memo_v = {}
        new._iri_memo_d = {}
        new._kmap_memo = {}
        new._ctx_memo = {}
        return new

    def _load_one(self, src, remote_chain: frozenset,
                  override_protected: bool = False) -> None:
        if src is None:
            # null resets to the initial context ([spec] §6.1 step 5.1) —
            # but cannot clear protected terms (§6.1 step 5.1.1).
            if any(t.protected for t in self.terms.values()):
                from .errors import InvalidContextNullification
                raise InvalidContextNullification(
                    sorted(n for n, t in self.terms.items() if t.protected)[0])
            base, registry = self.doc_base, self.registry
            self.__init__(base=base, registry=registry)
            return
        if isinstance(src, str):
            iri = norm_url(self.base, src)
            if iri in remote_chain:
                raise RecursiveContextInclusion(iri)
            if iri not in self.registry:
                raise ContextNotAvailable(iri)
            fetched = self.registry[iri]
            if isinstance(fetched, dict) and keys.CONTEXT in fetched:
                fetched = fetched[keys.CONTEXT]
            inner = fetched if isinstance(fetched, list) else [fetched]
            for item in inner:
                self._load_one(item, remote_chain | {iri}, override_protected)
            return
        if not isinstance(src, dict):
            raise InvalidContext(repr(src))

        if keys.IMPORT in src:  # [spec] 1.1 §6.1 step 5.6
            imp = src[keys.IMPORT]
            if not isinstance(imp, str):  # step 5.6.1
                raise InvalidImportValue(repr(imp))
            iri = norm_url(self.base, imp)
            if iri not in self.registry:
                raise ContextNotAvailable(iri)
            merged = dict(self.registry[iri].get(keys.CONTEXT, self.registry[iri]))
            merged.update({k: v for k, v in src.items() if k != keys.IMPORT})
            src = merged

        if keys.VERSION in src:
            ver = src[keys.VERSION]
            if ver != 1.1 or isinstance(ver, (bool, str)):
                # [spec] §6.1 step 5.5.1: @version must be the NUMBER
                # 1.1 — 1.0, "1.1", etc. are errors (sweep 9: silently
                # accepted)
                raise InvalidVersionValue(repr(ver))
            self.version = float(ver)
        if keys.BASE in src:
            b = src[keys.BASE]
            if b is not None and not isinstance(b, str):
                # [spec] §6.1 step 5.7.2
                raise InvalidBaseIRI(repr(b))
            self.base = norm_url(self.base, b) if b else None
        if keys.VOCAB in src:
            v = src[keys.VOCAB]
            if v is not None and not isinstance(v, str):
                # [spec] §6.1 step 5.8.2
                raise InvalidVocabMapping(repr(v))
            if v is None:
                self.vocab = None
            elif not v:
                self.vocab = self.base  # 1.1: "" = document base
            else:
                # @vocab may itself be a term/CURIE/relative ([spec] §6.1
                # 5.8.3: expanded with vocab=true AND document-relative —
                # sweep 7: a relative @vocab was silently ignored, making
                # every vocab-mapped property vanish)
                expanded = self.expand_iri(v, vocab=True)
                if expanded is None and self.base \
                        and not _KEYWORD_FORM_RE.match(v):
                    expanded = norm_url(self.base, v)
                if expanded is None:
                    raise InvalidVocabMapping(repr(v))
                self.vocab = expanded
        if keys.LANG in src:
            lang = src[keys.LANG]
            if lang is not None and not isinstance(lang, str):
                # [spec] §6.1 step 5.9.2 (sweep 9: silently nulled)
                raise InvalidDefaultLanguage(repr(lang))
            self.language = lang.lower() if isinstance(lang, str) else None
        if keys.DIRECTION in src:
            d = src[keys.DIRECTION]
            if d is not None and d not in ("ltr", "rtl"):
                # [spec] 1.1 API context processing step 5.10.3
                raise InvalidBaseDirection(repr(d))
            self.direction = d
        if keys.PROPAGATE in src:
            if not isinstance(src[keys.PROPAGATE], bool):
                # [spec] §6.1 step 5.11.2
                raise InvalidPropagateValue(repr(src[keys.PROPAGATE]))
            self.propagate = src[keys.PROPAGATE]

        protected_default = bool(src.get(keys.PROTECTED, False))
        handled = {keys.BASE, keys.VOCAB, keys.LANG, keys.DIRECTION,
                   keys.VERSION, keys.PROPAGATE, keys.PROTECTED, keys.IMPORT}
        # Two passes so CURIE prefixes defined later in the same context
        # still resolve ([spec] §6.2 recursion via 'dependencies'): first
        # register raw ids, then build full Terms.
        pending = {k: v for k, v in src.items() if k not in handled}
        for name, dfn in pending.items():
            self._read_term(src, name, dfn, protected_default,
                            override_protected)
        # any expansion memoized mid-load (e.g. for @vocab resolution) is
        # stale once new terms land — drop all memos after each mutation
        self._key_memo.clear()
        self._iri_memo_v.clear()
        self._iri_memo_d.clear()
        self._kmap_memo.clear()

    # -- C2: term definitions --------------------------------------------

    def _read_term(self, local_src: dict, name: str, dfn,
                   protected_default: bool = False,
                   override_protected: bool = False) -> None:
        """Create one term definition. [spec] JLD-API §6.2;
        [v0.5.0] context.py _read_term/add_term (~L230-330)."""
        if name in keys.KEYWORDS:
            return
        if name == "":
            # [spec] 1.1 API Create Term Definition step 2: the empty
            # string is an invalid term definition
            raise InvalidTermDefinition('term "" (empty string)')
        if _KEYWORD_FORM_RE.match(name):
            # [spec] 1.1 API Create Term Definition step 5: terms with
            # the FORM of a keyword ("@"1*ALPHA) are ignored
            return
        prev = self.terms.get(name)
        if prev is not None and prev.protected and not override_protected:
            # [spec] 1.1 §6.2 step 5: protected terms refuse redefinition
            # (identical re-declaration is permitted)
            if not self._same_definition(prev, dfn):
                raise ProtectedTermRedefinition(name)
        if dfn is None or (isinstance(dfn, dict) and dfn.get(keys.ID, UNDEF) is None):
            # null term: explicitly decouple from @vocab ([spec] §6.2 step 3)
            self.terms[name] = Term(name, id=None)
            self.alias_of.pop(name, None)
            return
        if isinstance(dfn, str):
            if dfn in keys.KEYWORDS:  # keyword alias ([spec] §6.2 step 14)
                if dfn == keys.CONTEXT:
                    # [spec] §6.2: aliasing @context is not permitted
                    # (sweep 9: the alias was silently registered)
                    raise InvalidKeywordAlias(name)
                self.alias_of[name] = dfn
                self.aliases[dfn] = name
                return
            if _KEYWORD_FORM_RE.match(dfn):
                # [spec] §6.2 step 14.2.2: an @id with the FORM of a
                # keyword (but not a keyword) is ignored with a warning —
                # sweep 7: the term previously minted a bogus "@foo"
                # property in expanded output
                return
            iri = self._expand_term_iri(local_src, dfn)
            self.terms[name] = Term(
                name, id=iri,
                prefix=_is_prefix_like(name, iri),
                protected=protected_default,
            )
            return
        if not isinstance(dfn, dict):
            raise InvalidContext(f"{name}: {dfn!r}")

        rev = False
        if keys.REV in dfn:
            if not isinstance(dfn[keys.REV], str):
                # [spec] §6.2 step 14.1
                raise InvalidIRIMapping(f"{name}: @reverse {dfn[keys.REV]!r}")
            iri = self._expand_term_iri(local_src, dfn[keys.REV])
            rev = True
        elif keys.ID in dfn:
            idval = dfn[keys.ID]
            if idval is not None and not isinstance(idval, str):
                # [spec] §6.2 step 13.2 (null handled earlier)
                raise InvalidIRIMapping(f"{name}: @id {idval!r}")
            if idval in keys.KEYWORDS and idval != keys.TYPE:
                if idval == keys.CONTEXT:
                    # [spec] §6.2: aliasing @context is not permitted
                    raise InvalidKeywordAlias(name)
                self.alias_of[name] = idval
                self.aliases[idval] = name
                return
            if isinstance(idval, str) and _KEYWORD_FORM_RE.match(idval):
                return  # [spec] §6.2 step 14.2.2 (see string form above)
            iri = self._expand_term_iri(local_src, idval)
        else:
            # No @id: simple term whose IRI comes from @vocab or, if the
            # name is itself CURIE-shaped, from the prefix ([spec] §6.2 18).
            if ":" in name:
                iri = self._expand_term_iri(local_src, name)
            elif self.vocab:
                iri = self.vocab + name
            else:
                iri = None

        container = dfn.get(keys.CONTAINER)
        if container is None:
            members = []
        elif isinstance(container, list):
            members = container
        else:
            members = [container]
        if not all(isinstance(c, str) for c in members):
            # [spec] §6.2 step 19 — validate BEFORE set-building
            # (sweep 36: a dict member raised a raw unhashable-type
            # TypeError instead of the documented error)
            raise InvalidContainerMapping(f"{name}: {container!r}")
        cset = set(members)
        _VALID_CONTAINERS = {keys.LIST, keys.SET, keys.INDEX, keys.LANG,
                             keys.ID, keys.TYPE, keys.GRAPH}
        if not cset <= _VALID_CONTAINERS:
            # [spec] §6.2 step 19
            raise InvalidContainerMapping(f"{name}: {container!r}")
        if keys.REV in dfn and not cset <= {keys.SET, keys.INDEX}:
            # [spec] §6.2 step 13.5: reverse terms allow only @set/@index
            raise InvalidReverseProperty(f"{name}: {container!r}")

        typ = UNDEF
        if keys.TYPE in dfn:
            t = dfn[keys.TYPE]
            if not isinstance(t, str):
                # [spec] §6.2 step 17.1: the type mapping must be a
                # string (sweep 36: a list crashed IRI expansion raw)
                raise InvalidTypeMapping(f"{name}: {t!r}")
            if t in (keys.ID, keys.VOCAB, keys.JSON, keys.NONE):
                typ = t
            else:
                typ = self._expand_term_iri(local_src, t)

        lang = UNDEF
        if keys.LANG in dfn:
            raw = dfn[keys.LANG]
            if raw is not None and not isinstance(raw, str):
                # [spec] §6.2 step 16.1 (sweep 9: silently nulled)
                raise InvalidLanguageMapping(f"{name}: {raw!r}")
            lang = raw.lower() if isinstance(raw, str) else None

        direction = UNDEF
        if keys.DIRECTION in dfn:
            direction = dfn[keys.DIRECTION]
            if direction is not None and direction not in ("ltr", "rtl"):
                raise InvalidBaseDirection(repr(direction))

        index = None
        if keys.INDEX in dfn:
            # property-based data indexing ([spec] 1.1 §4.6.3; §6.1
            # create-term-definition step 20): a string naming the index
            # property, valid only alongside @container:@index
            index = dfn[keys.INDEX]
            if not isinstance(index, str) or keys.INDEX not in cset:
                raise InvalidTermDefinition(
                    f"{name}: @index must be a string and requires "
                    f"@container:@index")

        if keys.PREFIX in dfn:
            # [spec] §6.2 step 12 (sweep 9: all three were silently
            # coerced/ignored before)
            pval = dfn[keys.PREFIX]
            if ":" in name or "/" in name:
                # 12: @prefix is only valid on terms that are not
                # compact IRIs / paths
                raise InvalidTermDefinition(f"{name}: @prefix on a term "
                                            f"containing ':' or '/'")
            if not isinstance(pval, bool):
                raise InvalidPrefixValue(f"{name}: {pval!r}")
            if pval and iri in keys.KEYWORDS:
                # 12.3: a prefix must not map to a keyword
                raise InvalidTermDefinition(f"{name}: @prefix true on a "
                                            f"keyword mapping")
        self.terms[name] = Term(
            name, id=iri, type=typ, container=cset, language=lang,
            direction=direction, reverse=rev,
            prefix=bool(dfn.get(keys.PREFIX, _is_prefix_like(name, iri))),
            protected=bool(dfn.get(keys.PROTECTED, protected_default)),
            context=dfn.get(keys.CONTEXT, UNDEF),
            propagate=bool(dfn.get(keys.PROPAGATE, True)),
            index=index,
        )

    def _same_definition(self, prev: Term, dfn) -> bool:
        """True when a re-declaration is semantically identical to the
        existing protected term (the only permitted 'redefinition')."""
        if isinstance(dfn, str):
            return (self._expand_term_iri({}, dfn) == prev.id
                    and prev.type is UNDEF and not prev.container)
        if not isinstance(dfn, dict):
            return False
        iri = dfn.get(keys.ID)
        if isinstance(iri, str):
            iri = self._expand_term_iri({}, iri)
        typ = dfn.get(keys.TYPE, UNDEF)
        if isinstance(typ, str) and typ not in (keys.ID, keys.VOCAB,
                                                keys.JSON, keys.NONE):
            typ = self._expand_term_iri({}, typ)
        container = dfn.get(keys.CONTAINER)
        cset = set(container) if isinstance(container, list) else \
            ({container} if container else set())
        return (iri == prev.id and typ == prev.type
                and cset == prev.container)

    def _expand_term_iri(self, local_src: dict, value: str,
                         defining: frozenset = frozenset()) -> str | None:
        """Expand an IRI inside a term definition, allowing forward
        references to prefixes defined in the same local context.
        ``defining`` carries the prefixes currently being resolved so a
        dependency cycle raises the spec's "cyclic IRI mapping" error
        ([spec] 1.1 API create term definition step 4) instead of
        recursing forever."""
        if value in keys.KEYWORDS:
            return value
        if not isinstance(value, str):
            return None
        if value.startswith("_:"):
            return value
        if ":" in value and _has_scheme(value):
            prefix, suffix = value.split(":", 1)
            if not suffix.startswith("//"):
                resolved = self._resolve_prefix(local_src, prefix, defining)
                if resolved:
                    return resolved + suffix
            return value
        if value in local_src or value in self.terms:
            resolved = self._resolve_prefix(local_src, value, defining)
            if resolved:
                return resolved
        if self.vocab:
            return self.vocab + value
        return value

    def _resolve_prefix(self, local_src: dict, prefix: str,
                        defining: frozenset = frozenset()) -> str | None:
        term = self.terms.get(prefix)
        if term is not None and term.id and prefix not in local_src:
            return term.id
        if prefix in defining:
            from .errors import CyclicIRIMapping
            raise CyclicIRIMapping(prefix)
        raw = local_src.get(prefix)
        defining = defining | {prefix}
        if isinstance(raw, str):
            return self._expand_term_iri(local_src, raw, defining)
        if isinstance(raw, dict) and isinstance(raw.get(keys.ID), str):
            return self._expand_term_iri(local_src, raw[keys.ID], defining)
        if term is not None and term.id:
            return term.id
        return None

    # -- C5: scoped contexts ----------------------------------------------

    def _scoped_propagate(self, local, default: bool) -> bool:
        """Effective @propagate of a scoped context VALUE: inline dicts
        carry it directly; registry-IRI contexts are consulted in the
        registry (the fetched document's outermost @context dict); for an
        ARRAY-valued scoped context any member's explicit @propagate wins
        (ADVICE r02: ``[{"@propagate": false}, ...]`` must revert)."""
        v = self._explicit_propagate(local)
        return default if v is None else v

    def _explicit_propagate(self, local):
        if isinstance(local, str):
            fetched = self.registry.get(norm_url(self.base, local))
            if isinstance(fetched, dict):
                inner = fetched.get(keys.CONTEXT, fetched)
                if isinstance(inner, dict) and keys.PROPAGATE in inner:
                    return bool(inner[keys.PROPAGATE])
            return None
        if isinstance(local, dict) and keys.PROPAGATE in local:
            return bool(local[keys.PROPAGATE])
        if isinstance(local, (list, tuple)):
            for item in local:
                v = self._explicit_propagate(item)
                if v is not None:
                    return v
        return None

    def subcontext_for_term(self, term_name: str, remote_chain=frozenset()) -> "Context":
        """Property-scoped context ([spec] 1.1 §4.1.9): processed with
        override-protected true (§4.1.11 exception) and @propagate
        defaulting to TRUE — nested nodes keep these terms unless the
        scoped context says @propagate: false."""
        term = self.terms.get(term_name)
        if term is None or term.context is UNDEF:
            return self
        new = self.load(term.context, remote_chain, override_protected=True)
        # [spec] §4.1 step 3: previous is set only if not already present
        # (an inherited previous from an outer non-propagating scope wins)
        if not self._scoped_propagate(term.context, True) \
                and new.previous is None:
            new = new._copy()  # never mutate a (possibly memoized) instance
            new.previous = self
        return new

    def subcontext_for_type(self, type_iri_terms) -> "Context":
        """Type-scoped context: applied for each of the node's @type terms
        in lexicographic order ([spec] 1.1 §4.1.8 / JLD-API §7 step 9).
        @propagate defaults to FALSE for type-scoped contexts — the terms
        apply to the typed node itself; nested node objects revert to the
        pre-type context (``previous``) on entry."""
        ctx = self
        pending_prev = None
        for tname in sorted(type_iri_terms):
            term = ctx.terms.get(tname)
            if term is not None and term.context is not UNDEF:
                base_ctx = ctx
                ctx = ctx.load(term.context)
                # [spec] §4.1 step 3: the FIRST non-propagating load in
                # the chain pins previous (later propagate:true loads do
                # not clear it — "does not already have a previous")
                if pending_prev is None and ctx.previous is None \
                        and not self._scoped_propagate(term.context, False):
                    pending_prev = base_ctx
        if pending_prev is not None and ctx.previous is None:
            ctx = ctx._copy()  # never mutate a (possibly memoized) instance
            ctx.previous = pending_prev
        return ctx

    # -- keyword aliases ----------------------------------------------------

    def expand_keys(self, key_tuple: tuple) -> tuple:
        """Expand a whole node's key tuple at once (memoized per shape —
        the per-document hot path of the expansion kernel)."""
        memo = self._kmap_memo
        got = memo.get(key_tuple)
        if got is None:
            got = tuple(self.expand_key(k) for k in key_tuple)
            if len(memo) < 2048:
                memo[key_tuple] = got
        return got

    def expand_key(self, key: str) -> str | None:
        """Map a node key to a keyword (via alias) or an IRI; None if the
        key does not expand (B2: such keys are dropped)."""
        memo = self._key_memo
        if key in memo:
            return memo[key]
        if key in keys.KEYWORDS:
            out = key
        else:
            out = self.alias_of.get(key)
            if out is None:
                out = self.expand_iri(key, vocab=True)
        if len(memo) < 8192:
            memo[key] = out
        return out

    # -- C3: IRI expansion --------------------------------------------------

    def expand_iri(self, value, vocab: bool = False) -> str | None:
        """Term/CURIE/relative-IRI → absolute IRI ([spec] JLD-API §6.3;
        [v0.5.0] context.py resolve_iri/_rec_expand ~L330-420).

        ``vocab=True`` for predicate/type position (term map + @vocab apply);
        ``vocab=False`` for @id position (document-relative).
        """
        if not isinstance(value, str):
            return None
        memo = self._iri_memo_v if vocab else self._iri_memo_d
        if value in memo:
            return memo[value]
        out = self._expand_iri_uncached(value, vocab)
        if len(memo) < 8192:
            memo[value] = out
        return out

    def _expand_iri_uncached(self, value: str, vocab: bool) -> str | None:
        if value in keys.KEYWORDS:
            return value
        if _KEYWORD_FORM_RE.match(value):
            # keyword-FORM but not a keyword → null ([spec] 1.1 API IRI
            # expansion step 3); drops "@foo" keys/values instead of
            # minting IRIs for them
            return None
        if value.startswith("_:"):
            return value
        if vocab:
            term = self.terms.get(value)
            if term is not None:
                return term.id  # may be None (explicitly decoupled term)
        if ":" in value and _has_scheme(value):
            prefix, suffix = value.split(":", 1)
            if not suffix.startswith("//"):
                pterm = self.terms.get(prefix)
                if pterm is not None and pterm.id and pterm.prefix:
                    return pterm.id + suffix
            return value  # absolute IRI
        if vocab and self.vocab:
            return self.vocab + value
        if not vocab and self.base:
            return norm_url(self.base, value)
        if vocab:
            return None  # not IRI-mapped and no @vocab → dropped (B2)
        return value

    # -- C4: IRI compaction ---------------------------------------------------

    def _reverse_index(self):
        if self._rev_terms is None:
            exact: dict[str, str] = {}
            prefixes: list[tuple[str, str]] = []
            for name, term in self.terms.items():
                if not term.id or term.reverse:
                    continue
                # plain terms (no type/container baggage) win exact matches
                if term.id not in exact or (term.type is UNDEF and not term.container):
                    if term.id not in exact or _plainer(term, self.terms.get(exact[term.id])):
                        exact[term.id] = name
                if term.prefix:
                    prefixes.append((term.id, name))
            prefixes.sort(key=lambda kv: -len(kv[0]))  # longest prefix wins
            self._rev_terms = (exact, prefixes)
        return self._rev_terms

    def shrink_iri(self, iri: str) -> str:
        """IRI → shortest symbol: exact term first, then the SHORTEST of
        @vocab-relative vs prefix CURIE (vocab wins ties), else absolute.
        [spec] JLD-API §6.4 (candidates ranked by length); [v0.5.0]
        context.py shrink_iri/to_symbol (~L420-500)."""
        exact, prefixes = self._reverse_index()
        name = exact.get(iri)
        if name is not None:
            return name
        candidates: list[tuple[int, int, str]] = []  # (len, priority, sym)
        if self.vocab and iri.startswith(self.vocab) \
                and len(iri) > len(self.vocab):
            sym = iri[len(self.vocab):]
            # A candidate is usable only if it re-expands to iri
            # ([spec] §6.3 IRI Compaction step 19): a colon sends the
            # string down the CURIE/absolute-IRI path, '@...' reads as
            # a keyword, and a term definition for the suffix shadows
            # the vocab mapping (sweep 22 — all graph-changing).
            t = self.terms.get(sym)
            if ":" not in sym and not sym.startswith("@") \
                    and (t is None or t.id == iri):
                candidates.append((len(sym), 0, sym))
        for pid, pname in prefixes:
            if iri.startswith(pid) and len(iri) > len(pid):
                suffix = iri[len(pid):]
                if suffix.startswith("//"):
                    # re-expansion returns 'p://x' verbatim as an IRI
                    # ([spec] §5.2 step 6.2)
                    continue
                sym = f"{pname}:{suffix}"
                t = self.terms.get(sym)
                if t is not None and t.id != iri:
                    # a term definition for the full CURIE spelling
                    # shadows prefix resolution ([spec] §6.3 step 20.3);
                    # a shorter prefix may still yield a usable CURIE,
                    # so keep scanning instead of breaking
                    continue
                candidates.append((len(sym), 1, sym))
        if candidates:
            return min(candidates)[2]
        return iri

    def alias(self, keyword: str) -> str:
        """The document-facing spelling of a keyword (honors aliases)."""
        return self.aliases.get(keyword, keyword)

    def find_term(self, iri: str, container: str | None = None,
                  type_: object = UNDEF, language: object = UNDEF):
        """Most specific term for (iri, container/type/language) — used by
        compaction to pick coercing terms. [v0.5.0] context.py find_term."""
        best = None
        for term in self.terms.values():
            if term.id != iri or term.reverse:
                continue
            if container and container not in term.container:
                continue
            if not container and term.container:
                continue
            if type_ is not UNDEF and term.type != type_:
                continue
            if language is not UNDEF and term.language != language:
                continue
            if best is None or len(term.name) < len(best.name):
                best = term
        return best


def _plainer(a: Term, b: Term | None) -> bool:
    if b is None:
        return True
    return (a.type is UNDEF and not a.container) and not (
        b.type is UNDEF and not b.container)


def _is_prefix_like(name: str, iri: str | None) -> bool:
    """Simple string terms ending in a gen-delim act as prefixes
    ([spec] 1.1 §6.2 step 20: 'simple term' prefix rule)."""
    return bool(iri) and ":" not in name and iri[-1] in ":/?#[]@;,="


def _initial_urlsplit_check(value: str) -> bool:  # pragma: no cover
    return bool(urlsplit(value).scheme)
