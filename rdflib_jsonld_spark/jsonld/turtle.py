"""Turtle / TriG source + sink (pure core).

Turtle is the serialization most public RDF is actually published in; the
reference's rdflib host ships a Turtle parser/serializer and the checkout's
own README demonstrates graph output via ``serialize(format='n3')``
([checkout] README.md:55 — n3 is rdflib's Turtle-compatible surface), so a
user switching from the reference stack expects to read and write it.
This module implements the subset of [spec] RDF 1.1 Turtle (W3C Rec
2014-02-25) and RDF 1.1 TriG (W3C Rec 2014-02-25) that covers that use:

parser
    ``@prefix``/``@base`` + SPARQL-style ``PREFIX``/``BASE`` directives,
    IRIREF with numeric escapes, prefixed names (incl. ``%``-encoded and
    ``\\``-escaped PN_LOCAL), ``a``, ``;``/``,`` elision, blank node
    labels and anonymous ``[...]`` property lists, collections
    ``( ... )`` (rdf:first/rest chains, D7 semantics), all four string
    quote forms with ECHAR/UCHAR escapes, language tags, ``^^`` datatypes,
    bare numeric (integer/decimal/double) and boolean abbreviations, and
    — for TriG — ``GRAPH`` blocks, labeled ``<g> { ... }`` blocks and the
    anonymous ``{ ... }`` default-graph block.

serializer
    deterministic (sorted) output: ``@prefix`` header, subject grouping
    with ``;``/``,`` elision, ``a`` for rdf:type, literal abbreviation
    only where the lexical form is round-trip-exact. TriG wraps each
    named graph in a sorted block.

Terms use the tuple encoding of :mod:`rdflib_jsonld_spark.jsonld.tordf`
((kind, ...) with kind ∈ {iri, bnode, lit}); quads are ``(g, s, p, o)``
exactly as :mod:`.nquads` produces, so the Spark faces, the comparator
and the golden corpus all interoperate. Blank-node labels reuse the
N-Quads sentinel codec (:func:`.nquads.encode_label`) so lineage-salted
pipeline labels survive the grammar and foreign labels pass through
untouched.

RDF-star: quoted triples ``<< s p o >>`` (nested to any depth) and
annotation blocks ``{| … |}`` parse to the ``(qt, (s, p, o))`` term
encoding; the serializer emits quoted spellings back.

Deliberate narrowings (documented): no ``\\u`` surrogate-pair joining
beyond Python's ``chr``; no ``@forAll``/``@forSome`` (N3-only).
"""

from __future__ import annotations

import re

from . import keys
from .context import norm_url
from .nquads import QT, decode_label, encode_label, term_to_nq
from .tordf import BNODE, IRI, LIT

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

XSD = "http://www.w3.org/2001/XMLSchema#"


class TurtleParseError(ValueError):
    """Malformed Turtle/TriG input; carries a character offset."""

    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} at offset {pos}")
        self.pos = pos


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

#: One master regex, longest-match alternatives first.  PN_LOCAL here is the
#: practical subset: PN_CHARS plus '.' interior, '%XX' encodings and
#: backslash escapes of the spec's PN_LOCAL_ESC set.
_PN_LOCAL = r"(?:[0-9A-Za-z_:]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?#@%]|[\u00C0-\uFFFF])(?:[-0-9A-Za-z_:\u00B7\u00C0-\uFFFF]|\.(?=[-0-9A-Za-z_:%\\\u00C0-\uFFFF])|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?#@%])*"

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iriref><(?:[^<>"{}|^`\\\x00-\x20]
                    |\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
    | (?P<str_long_dq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<str_long_sq>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<str_dq>"(?:[^"\\\n\r]|\\.)*")
    | (?P<str_sq>'(?:[^'\\\n\r]|\\.)*')
    | (?P<bnode>_:(?:[0-9A-Za-z_\u00C0-\uFFFF])(?:[-0-9A-Za-z_\u00B7\u00C0-\uFFFF]|\.(?=[-0-9A-Za-z_\u00C0-\uFFFF]))*)
    | (?P<prefix_dir>@prefix(?![-0-9A-Za-z_])|[Pp][Rr][Ee][Ff][Ii][Xx](?![-0-9A-Za-z_:]))
    | (?P<base_dir>@base(?![-0-9A-Za-z_])|[Bb][Aa][Ss][Ee](?![-0-9A-Za-z_:]))
    | (?P<langtag>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<double>[+-]?(?:[0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+)
    | (?P<decimal>[+-]?[0-9]*\.[0-9]+)
    | (?P<integer>[+-]?[0-9]+)
    | (?P<punct><<|>>|\{\||\|\}|\^\^|;|,|\.|\[|\]|\(|\)|\{|\})
    | (?P<pname>(?:[A-Za-z_\u00C0-\uFFFF][-0-9A-Za-z_.\u00B7\u00C0-\uFFFF]*)?:(?:"""
    + _PN_LOCAL
    + r""")?)
    | (?P<keyword>(?:a|true|false|[Gg][Rr][Aa][Pp][Hh])(?![-0-9A-Za-z_:]))
    """,
    re.VERBOSE,
)

# "a" / true / false / GRAPH would also match <pname>'s prefix part only if
# followed by ':'; pname requires the colon, so plain words fall through to
# keyword.  But the regex alternation tries pname BEFORE keyword — a bare
# word with no colon fails pname and reaches keyword, which is what we want.

_STRING_GROUPS = {
    "str_long_dq": 3,
    "str_long_sq": 3,
    "str_dq": 1,
    "str_sq": 1,
}

_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}


def _unescape_string(body: str, pos: int) -> str:
    out, i, n = [], 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise TurtleParseError("dangling escape", pos)
        e = body[i + 1]
        if e in _ECHAR:
            out.append(_ECHAR[e])
            i += 2
        elif e == "u":
            out.append(chr(int(body[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(body[i + 2:i + 10], 16)))
            i += 10
        else:
            raise TurtleParseError(f"bad escape \\{e}", pos)
    return "".join(out)


def _unescape_iri(body: str, pos: int) -> str:
    if "\\" not in body:
        return body
    out, i, n = [], 0, len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n and body[i + 1] in "uU":
            width = 6 if body[i + 1] == "u" else 10
            out.append(chr(int(body[i + 2:i + width], 16)))
            i += width
        else:
            out.append(c)
            i += 1
    return "".join(out)


_PN_UNESC_RE = re.compile(r"\\([-_~.!$&'()*+,;=/?#@%])")


class _Tokens:
    """Token stream with one-token lookahead."""

    __slots__ = ("text", "pos", "_tok")

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self._tok = None  # (kind, value, startpos)

    def _lex(self):
        text, pos = self.text, self.pos
        while True:
            if pos >= len(text):
                return ("eof", "", pos), pos
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise TurtleParseError(
                    f"unrecognized input {text[pos:pos + 24]!r}", pos)
            kind = m.lastgroup
            if kind == "ws":
                pos = m.end()
                continue
            self.pos = pos  # record token start for error messages
            return (kind, m.group(kind), pos), m.end()

    def peek(self):
        if self._tok is None:
            self._tok = self._lex()
        return self._tok[0]

    def next(self):
        tok = self.peek()
        if tok[0] != "eof":
            self.pos = self._tok[1]
        self._tok = None
        return tok

    def expect(self, kind: str, value: str | None = None):
        tok = self.next()
        if tok[0] != kind or (value is not None and tok[1] != value):
            raise TurtleParseError(
                f"expected {value or kind}, got {tok[1]!r}", tok[2])
        return tok


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, text: str, base: str | None, bnode_prefix: str):
        self.toks = _Tokens(text)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.bnode_prefix = bnode_prefix
        self.counter = 0
        self.label_map: dict[str, str] = {}
        self.quads: list = []
        self.graph = None  # active TriG graph term or None

    # -- term helpers -------------------------------------------------
    def _fresh_bnode(self):
        label = f"{self.bnode_prefix}{self.counter}"
        self.counter += 1
        return (BNODE, label)

    def _labeled_bnode(self, token: str):
        raw = decode_label(token[2:])
        got = self.label_map.get(raw)
        if got is None:
            # keep foreign labels readable but doc-scoped via the prefix
            got = f"{self.bnode_prefix}l/{raw}" if self.bnode_prefix else raw
            self.label_map[raw] = got
        return (BNODE, got)

    def _resolve(self, iri: str) -> str:
        if self.base is None:
            return iri
        return norm_url(self.base, iri)

    def _pname_to_iri(self, tok_val: str, pos: int) -> str:
        pfx, _, local = tok_val.partition(":")
        # PN_LOCAL may itself contain ':' — partition at the FIRST colon is
        # correct because the prefix part cannot contain one.
        if pfx not in self.prefixes:
            raise TurtleParseError(f"undefined prefix {pfx!r}", pos)
        local = _PN_UNESC_RE.sub(r"\1", local)
        return self.prefixes[pfx] + local

    # -- grammar ------------------------------------------------------
    def parse(self):
        while True:
            tok = self.toks.peek()
            if tok[0] == "eof":
                return self.quads
            if tok[0] == "prefix_dir":
                self._directive_prefix()
            elif tok[0] == "base_dir":
                self._directive_base()
            elif tok[0] == "keyword" and tok[1].upper() == "GRAPH":
                self._graph_block()
            elif tok[0] == "punct" and tok[1] == "{":
                self._graph_body(None)
            else:
                # TriG labeled block or plain triples: parse the first term,
                # then look for '{'. labelOrSubject ::= iri | BlankNode
                # ([spec] TriG §2.2 grammar [3g]/[7g] — sweep 30: bnode
                # and ANON graph labels were rejected).
                if tok[0] in ("iriref", "pname", "bnode"):
                    save = (self.toks.pos, self.toks._tok)
                    term = self._iri_or_bnode_term()
                    nxt = self.toks.peek()
                    if nxt[0] == "punct" and nxt[1] == "{":
                        self._graph_body(term)
                        continue
                    self.toks.pos, self.toks._tok = save
                elif tok[0] == "punct" and tok[1] == "[":
                    save = (self.toks.pos, self.toks._tok)
                    self.toks.next()
                    nxt = self.toks.peek()
                    if nxt[0] == "punct" and nxt[1] == "]":
                        self.toks.next()
                        after = self.toks.peek()
                        if after[0] == "punct" and after[1] == "{":
                            self._graph_body(self._fresh_bnode())
                            continue
                    self.toks.pos, self.toks._tok = save
                self._triples()
                self.toks.expect("punct", ".")

    def _directive_prefix(self):
        d = self.toks.next()
        pn = self.toks.expect("pname")
        if not pn[1].endswith(":") or pn[1].count(":") != 1:
            raise TurtleParseError("bad prefix declaration", pn[2])
        iri_tok = self.toks.expect("iriref")
        iri = self._resolve(_unescape_iri(iri_tok[1][1:-1], iri_tok[2]))
        self.prefixes[pn[1][:-1]] = iri
        if d[1] == "@prefix":
            self.toks.expect("punct", ".")

    def _directive_base(self):
        d = self.toks.next()
        iri_tok = self.toks.expect("iriref")
        self.base = self._resolve(_unescape_iri(iri_tok[1][1:-1], iri_tok[2]))
        if d[1] == "@base":
            self.toks.expect("punct", ".")

    def _graph_block(self):
        self.toks.next()  # the GRAPH keyword (case-insensitive)
        name = self._iri_or_bnode_term()
        self._graph_body(name)

    def _graph_body(self, name):
        prev = self.graph
        self.graph = name
        self.toks.expect("punct", "{")
        while True:
            tok = self.toks.peek()
            if tok[0] == "punct" and tok[1] == "}":
                self.toks.next()
                break
            self._triples()
            tok = self.toks.peek()
            if tok[0] == "punct" and tok[1] == ".":
                self.toks.next()
        self.graph = prev

    def _iri_term(self):
        tok = self.toks.next()
        if tok[0] == "iriref":
            return (IRI, self._resolve(_unescape_iri(tok[1][1:-1], tok[2])))
        if tok[0] == "pname":
            return (IRI, self._pname_to_iri(tok[1], tok[2]))
        raise TurtleParseError(f"expected IRI, got {tok[1]!r}", tok[2])

    def _iri_or_bnode_term(self):
        tok = self.toks.peek()
        if tok[0] == "bnode":
            self.toks.next()
            return self._labeled_bnode(tok[1])
        return self._iri_term()

    def _triples(self):
        tok = self.toks.peek()
        if tok[0] == "punct" and tok[1] == "[":
            subj = self._bnode_property_list()
            nxt = self.toks.peek()
            if not (nxt[0] == "punct" and nxt[1] in ".;"):
                self._predicate_object_list(subj)
            return
        if tok[0] == "punct" and tok[1] == "(":
            subj = self._collection()
            self._predicate_object_list(subj)
            return
        if tok[0] == "punct" and tok[1] == "<<":
            subj = self._quoted_triple()
            self._predicate_object_list(subj)
            return
        subj = self._iri_or_bnode_term()
        self._predicate_object_list(subj)

    def _predicate_object_list(self, subj):
        while True:
            tok = self.toks.peek()
            if tok[0] == "keyword" and tok[1] == "a":
                self.toks.next()
                pred = (IRI, RDF_TYPE)
            else:
                pred = self._iri_term()
            while True:
                obj = self._object()
                self.quads.append((self.graph, subj, pred, obj))
                tok = self.toks.peek()
                if tok[0] == "punct" and tok[1] == "{|":
                    # Turtle-star annotation: the asserted triple is ALSO
                    # quoted as the subject of the annotation block
                    # ([spec] RDF 1.2 Turtle WD, annotation syntax)
                    self.toks.next()
                    self._predicate_object_list((QT, (subj, pred, obj)))
                    self.toks.expect("punct", "|}")
                    tok = self.toks.peek()
                if tok[0] == "punct" and tok[1] == ",":
                    self.toks.next()
                    continue
                break
            tok = self.toks.peek()
            if tok[0] == "punct" and tok[1] == ";":
                # consecutive ';' and a trailing ';' before '.'/']'/'}'
                # are both legal — swallow the run, then decide
                while True:
                    self.toks.next()
                    nxt = self.toks.peek()
                    if not (nxt[0] == "punct" and nxt[1] == ";"):
                        break
                if nxt[0] == "punct" and nxt[1] in (".", "]", "}", "|}"):
                    return
                continue
            return

    def _quoted_triple(self):
        """'<< qtSubject verb qtObject >>' → ("qt", (s, p, o)) term
        ([spec] RDF 1.2 Turtle WD / RDF-star CG report; quoted triples
        nest, collections/property-lists are not qt terms)."""
        self.toks.expect("punct", "<<")
        s = self._qt_term(subject=True)
        tok = self.toks.peek()
        if tok[0] == "keyword" and tok[1] == "a":
            self.toks.next()
            pred = (IRI, RDF_TYPE)
        else:
            pred = self._iri_term()
        o = self._qt_term(subject=False)
        self.toks.expect("punct", ">>")
        return (QT, (s, pred, o))

    def _qt_term(self, subject: bool):
        tok = self.toks.peek()
        if tok[0] == "punct" and tok[1] == "<<":
            return self._quoted_triple()
        if tok[0] == "bnode":
            self.toks.next()
            return self._labeled_bnode(tok[1])
        if tok[0] in ("iriref", "pname"):
            return self._iri_term()
        if subject:
            raise TurtleParseError(
                f"quoted-triple subject must be IRI/bnode/quoted triple, "
                f"got {tok[1]!r}", tok[2])
        return self._literal()

    def _object(self):
        tok = self.toks.peek()
        if tok[0] == "punct" and tok[1] == "<<":
            return self._quoted_triple()
        if tok[0] == "punct" and tok[1] == "[":
            return self._bnode_property_list()
        if tok[0] == "punct" and tok[1] == "(":
            return self._collection()
        if tok[0] == "bnode":
            self.toks.next()
            return self._labeled_bnode(tok[1])
        if tok[0] in ("iriref", "pname"):
            return self._iri_term()
        return self._literal()

    def _bnode_property_list(self):
        self.toks.expect("punct", "[")
        node = self._fresh_bnode()
        tok = self.toks.peek()
        if not (tok[0] == "punct" and tok[1] == "]"):
            self._predicate_object_list(node)
        self.toks.expect("punct", "]")
        return node

    def _collection(self):
        self.toks.expect("punct", "(")
        items = []
        while True:
            tok = self.toks.peek()
            if tok[0] == "punct" and tok[1] == ")":
                self.toks.next()
                break
            items.append(self._object())
        if not items:
            return (IRI, RDF_NIL)
        nodes = [self._fresh_bnode() for _ in items]
        for i, (node, item) in enumerate(zip(nodes, items)):
            self.quads.append((self.graph, node, (IRI, RDF_FIRST), item))
            rest = nodes[i + 1] if i + 1 < len(nodes) else (IRI, RDF_NIL)
            self.quads.append((self.graph, node, (IRI, RDF_REST), rest))
        return nodes[0]

    def _literal(self):
        tok = self.toks.next()
        kind, val, pos = tok
        if kind in _STRING_GROUPS:
            strip = _STRING_GROUPS[kind]
            lex = _unescape_string(val[strip:-strip], pos)
            nxt = self.toks.peek()
            if nxt[0] == "langtag":
                self.toks.next()
                return (LIT, lex, keys.RDF_LANGSTRING, nxt[1][1:].lower())
            if nxt[0] == "punct" and nxt[1] == "^^":
                self.toks.next()
                dt = self._iri_term()
                return (LIT, lex, dt[1], None)
            return (LIT, lex, keys.XSD_STRING, None)
        if kind == "integer":
            return (LIT, val, XSD + "integer", None)
        if kind == "decimal":
            return (LIT, val, XSD + "decimal", None)
        if kind == "double":
            return (LIT, val, XSD + "double", None)
        if kind == "keyword" and val in ("true", "false"):
            return (LIT, val, XSD + "boolean", None)
        raise TurtleParseError(f"expected object term, got {val!r}", pos)


def parse(text: str, base: str | None = None,
          bnode_prefix: str = "ttl/") -> list:
    """Parse a Turtle or TriG document → list of ``(g, s, p, o)`` quad
    tuples (``g`` is ``None`` in the default graph). ``bnode_prefix``
    scopes anonymous/labeled bnodes to the document so multi-file reads
    never collide (D11 determinism — SURVEY.md §1.2)."""
    return _Parser(text, base, bnode_prefix).parse()


# ---------------------------------------------------------------------------
# serializer
# ---------------------------------------------------------------------------

_BARE_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_BARE_DEC_RE = re.compile(r"^[+-]?[0-9]*\.[0-9]+$")
_BARE_DOUBLE_RE = re.compile(
    r"^[+-]?(?:[0-9]+\.[0-9]*|\.?[0-9]+)[eE][+-]?[0-9]+$")
_LOCAL_SAFE_RE = re.compile(r"^[A-Za-z_][-0-9A-Za-z_]*$")


def _escape_turtle_string(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def _shorten(iri: str, rev: list) -> str | None:
    """Longest-namespace-match prefixed name, only when the local part is
    grammar-safe without escapes (conservative, round-trip-exact)."""
    for ns, pfx in rev:
        if iri.startswith(ns):
            local = iri[len(ns):]
            if local == "" or _LOCAL_SAFE_RE.match(local):
                return f"{pfx}:{local}"
    return None


def _term_to_turtle(t: tuple, rev: list) -> str:
    kind = t[0]
    if kind == QT:
        s, p, o = t[1]
        p_txt = "a" if p == (IRI, RDF_TYPE) else _term_to_turtle(p, rev)
        return (f"<< {_term_to_turtle(s, rev)} {p_txt} "
                f"{_term_to_turtle(o, rev)} >>")
    if kind == IRI:
        # NOTE: rdf:nil is NOT abbreviated to "()" — the collection form
        # is only grammatical in subject/object position, and a graph
        # name or predicate of rdf:nil (found by the hypothesis
        # round-trip) must stay an IRI term. "<...>"/prefixed round-trips
        # identically in every position.
        short = _shorten(t[1], rev)
        return short if short is not None else term_to_nq(t)
    if kind == BNODE:
        return f"_:{encode_label(t[1])}"
    lex, dt, lang = t[1], t[2], t[3]
    if lang:
        return f'"{_escape_turtle_string(lex)}"@{lang}'
    if dt == XSD + "integer" and _BARE_INT_RE.match(lex):
        return lex
    if dt == XSD + "decimal" and _BARE_DEC_RE.match(lex):
        return lex
    if dt == XSD + "double" and _BARE_DOUBLE_RE.match(lex):
        return lex
    if dt == XSD + "boolean" and lex in ("true", "false"):
        return lex
    q = f'"{_escape_turtle_string(lex)}"'
    if dt and dt != keys.XSD_STRING:
        short = _shorten(dt, rev)
        return f"{q}^^{short}" if short else f"{q}^^<{dt}>"
    return q


def _okey(t):
    """None-safe total order over term tuples (sweep 35: sorting a
    None-lang literal against a tagged one raised TypeError)."""
    if t is None:
        return ""
    if isinstance(t, tuple):
        return tuple(_okey(x) for x in t)
    return t


def _triples_block(triples, rev: list) -> list:
    """Sorted subject-grouped ``;``/``,``-elided statement lines."""
    by_subj: dict = {}
    for s, p, o in triples:
        by_subj.setdefault(s, {}).setdefault(p, set()).add(o)
    lines = []
    for s in sorted(by_subj, key=_okey):
        s_txt = _term_to_turtle(s, rev)
        preds = by_subj[s]

        def pred_key(p):
            return (p[1] != RDF_TYPE, p[1])

        parts = []
        for p in sorted(preds, key=pred_key):
            p_txt = "a" if p[1] == RDF_TYPE else _term_to_turtle(p, rev)
            objs = sorted(preds[p], key=_okey)
            o_txt = ", ".join(_term_to_turtle(o, rev) for o in objs)
            parts.append(f"{p_txt} {o_txt}")
        lines.append(f"{s_txt} " + " ;\n        ".join(parts) + " .")
    return lines


def _header(prefixes: dict) -> list:
    return [f"@prefix {p}: <{ns}> ." for p, ns in sorted(prefixes.items())]


def _rev_index(prefixes: dict) -> list:
    # longest namespace first so the longest match wins
    return sorted(((ns, p) for p, ns in prefixes.items()),
                  key=lambda x: -len(x[0]))


DEFAULT_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": XSD,
}


def serialize(quads, prefixes: dict | None = None) -> str:
    """Default-graph triples → deterministic Turtle text. Named-graph rows
    are rejected (use :func:`serialize_trig`)."""
    prefixes = dict(prefixes or DEFAULT_PREFIXES)
    rev = _rev_index(prefixes)
    triples = []
    for g, s, p, o in quads:
        if g is not None:
            raise ValueError("named-graph quad in Turtle output; use TriG")
        triples.append((s, p, o))
    out = _header(prefixes)
    if out and triples:
        out.append("")
    out.extend(_triples_block(triples, rev))
    return "\n".join(out) + ("\n" if out else "")


def serialize_trig(quads, prefixes: dict | None = None) -> str:
    """Quads → deterministic TriG: default-graph block first, then one
    ``GRAPH`` block per named graph, sorted by graph term."""
    prefixes = dict(prefixes or DEFAULT_PREFIXES)
    rev = _rev_index(prefixes)
    by_graph: dict = {}
    for g, s, p, o in quads:
        by_graph.setdefault(g, []).append((s, p, o))
    out = _header(prefixes)
    default = by_graph.pop(None, None)
    if default:
        if out:
            out.append("")
        out.extend(_triples_block(default, rev))
    for g in sorted(by_graph, key=_okey):
        if out:
            out.append("")
        out.append(f"GRAPH {_term_to_turtle(g, rev)} {{")
        out.extend("    " + ln for ln in _triples_block(by_graph[g], rev))
        out.append("}")
    return "\n".join(out) + ("\n" if out else "")
