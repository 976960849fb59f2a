"""N-Quads serialization + a small parser for golden fixtures.

The reference's test suite compared emitted triples against ``.nq`` golden
files ([v0.5.0] test/test_testsuite.py, SURVEY.md §5.1); this module gives
the rebuild the same round-trip: quad tuples ↔ N-Quads lines per
[spec] RDF 1.1 N-Quads (W3C Rec 2014-02-25).
"""

from __future__ import annotations

import hashlib
import re

from . import keys
from .tordf import BNODE, IRI, LIT, QT  # noqa: F401

_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}
# full ECHAR set ([spec] N-Quads §2.3: [tbnrf"'\]) — the writer only ever
# emits the five above (raw \b/\f bytes are grammar-legal in
# STRING_LITERAL_QUOTE), but the reader must accept all seven; sweep 17.
_UNESCAPES = {"\\\\": "\\", '\\"': '"', "\\n": "\n", "\\r": "\r",
              "\\t": "\t", "\\b": "\b", "\\f": "\f", "\\'": "'"}


def _escape(s: str) -> str:
    return "".join(_ESCAPES.get(c, c) for c in s)


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            pair = s[i:i + 2]
            if pair in _UNESCAPES:
                out.append(_UNESCAPES[pair])
                i += 2
                continue
            if pair == "\\u":
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if pair == "\\U":
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(s[i])
        i += 1
    return "".join(out)


_LABEL_ENC = {"_": "__", "/": "_s", "#": "_h", ":": "_c", ".": "_d"}
#: PN_CHARS ([spec] N-Quads §5 / Turtle §6.5) plus the four chars the
#: table escapes — a label containing anything OUTSIDE this set cannot
#: be made grammar-safe by the table and is hashed instead. Shared with
#: the JVM twin (sources.nquads_io) so both encoders agree exactly.
_PN_CHARS = ("0-9A-Za-z_\\-\u00B7\u00C0-\u00D6\u00D8-\u00F6"
             "\u00F8-\u02FF\u0300-\u036F\u0370-\u037D\u037F-\u1FFF"
             "\u200C-\u200D\u203F-\u2040\u2070-\u218F\u2C00-\u2FEF"
             "\u3001-\uD7FF\uF900-\uFDCF\uFDF0-\uFFFD")
LABEL_ILLEGAL_PATTERN = ("[^" + _PN_CHARS + "/#:."
                         + chr(0x10000) + "-" + chr(0xEFFFF) + "]")
_LABEL_ILLEGAL_RE = re.compile(LABEL_ILLEGAL_PATTERN)
_LABEL_DEC = {"_": "_", "s": "/", "h": "#", "c": ":", "d": "."}
_DEC_RE = re.compile(r"_([_shcd])")

#: Sentinel marking labels THIS sink encoded. The body encoding maps "_" to
#: "__" and / # : . to _s/_h/_c/_d, so a body it produces can never begin
#: with "_e" — the sentinel is unambiguous against our own output, and
#: foreign grammar-legal labels (e.g. "_:b_d1") now pass through untouched
#: instead of being silently rewritten and merged with a different label.
LABEL_SENTINEL = "_e"


def encode_label(label: str) -> str:
    """Injective map of pipeline bnode labels (which carry ``/ # : .``
    lineage salts — SURVEY.md §1.2/D11) onto the grammar N-Quads allows
    for BLANK_NODE_LABEL ([spec] N-Quads §5, PN_CHARS), prefixed with the
    sentinel so the reader only ever decodes labels this writer made.

    A label with any OTHER grammar-illegal character (space, quotes,
    … — reachable through foreign documents' blank node identifiers)
    is deterministically RELABELED to ``_x`` + md5-prefix instead of
    being emitted raw as an unparseable label (sweep 27). Relabeling a
    bnode is sound — labels carry no RDF semantics — and the hashed
    form is stable across partitions and runs. ``_x`` is unambiguous:
    the table never emits it ('_' always encodes to '__')."""
    if _LABEL_ILLEGAL_RE.search(label):
        digest = hashlib.md5(label.encode("utf-8")).hexdigest()[:16]
        return LABEL_SENTINEL + "_x" + digest
    return LABEL_SENTINEL + "".join(_LABEL_ENC.get(c, c) for c in label)


def decode_label(label: str) -> str:
    """Inverse of :func:`encode_label` on sentinel-carrying labels; any
    other label is externally authored and passes through untouched."""
    if not label.startswith(LABEL_SENTINEL):
        return label
    return _DEC_RE.sub(lambda m: _LABEL_DEC[m.group(1)],
                       label[len(LABEL_SENTINEL):])


#: QT ("qt") canonically lives in tordf.py with the other term kinds;
#: re-exported here for the existing import surface (operators/star.py).


def term_to_nq(t: tuple) -> str:
    kind = t[0]
    if kind == IRI:
        return f"<{t[1]}>"
    if kind == BNODE:
        return f"_:{encode_label(t[1])}"
    if kind == QT:
        s, p, o = t[1]
        return f"<< {term_to_nq(s)} {term_to_nq(p)} {term_to_nq(o)} >>"
    _, lex, dt, lang = t
    base = f'"{_escape(lex)}"'
    if lang:
        return f"{base}@{lang}"
    if dt and dt != keys.XSD_STRING:
        return f"{base}^^<{dt}>"
    return base


def quad_to_nq(q: tuple) -> str:
    g, s, p, o = q
    parts = [term_to_nq(s), term_to_nq(p), term_to_nq(o)]
    if g is not None:
        parts.append(term_to_nq(g))
    return " ".join(parts) + " ."


def serialize(quads) -> str:
    return "\n".join(sorted(quad_to_nq(q) for q in quads)) + "\n" if quads else ""


# BLANK_NODE_LABEL may contain '.' internally but not trailing ([spec]
# N-Quads §5) — lazy match + lookahead leaves terminating dot(s) to the
# statement grammar (sweep 17: '_:b0.' used to yield label 'b0.' and eat
# the final dot). LANGTAG per the spec production (must start alpha).
_TERM_RE = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | _:(?P<bnode>[^\s<">]+?)(?=\.+(?:\s|$)|\s|>|$)
      | "(?P<lit>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*))?
    )""",
    re.VERBOSE,
)


def parse_term(text: str, pos: int = 0, decode: bool = True):
    # RDF-star quoted triple: '<< term term term >>', recursive.
    # ``decode=False`` keeps sentinel-shaped bnode labels raw — the
    # distributed reader's decode_labels=False contract (ADVICE r04:
    # the '<<' slow path decoded unconditionally while the fast path
    # honoured the flag, splitting one foreign label into two terms).
    ws = pos
    while ws < len(text) and text[ws].isspace():
        ws += 1
    if text.startswith("<<", ws):
        # both star spellings parse: '<< s p o >>' (quoted triple, the
        # pipeline interchange form) and '<<( s p o )>>' (N-Triples 1.2
        # triple term, what canonical_nquads emits — sweep 35: our own
        # canonical output was unreadable by our own parser)
        p1 = ws + 2
        paren = text.startswith("(", p1)
        if paren:
            p1 += 1
        s, p2 = parse_term(text, p1, decode)
        p, p2 = parse_term(text, p2, decode)
        o, p2 = parse_term(text, p2, decode)
        while p2 < len(text) and text[p2].isspace():
            p2 += 1
        if paren:
            if not text.startswith(")", p2):
                raise ValueError(f"unterminated triple term at {ws}: "
                                 f"{text[ws:ws+40]!r}")
            p2 += 1
            while p2 < len(text) and text[p2].isspace():
                p2 += 1
        if not text.startswith(">>", p2):
            raise ValueError(f"unterminated quoted triple at {ws}: "
                             f"{text[ws:ws+40]!r}")
        return (QT, (s, p, o)), p2 + 2
    m = _TERM_RE.match(text, pos)
    if not m:
        raise ValueError(f"bad N-Quads term at {pos}: {text[pos:pos+40]!r}")
    if m.group("iri") is not None:
        return (IRI, _unescape(m.group("iri"))), m.end()
    if m.group("bnode") is not None:
        label = m.group("bnode")
        return (BNODE, decode_label(label) if decode else label), m.end()
    lex = _unescape(m.group("lit"))
    dt, lang = m.group("dt"), m.group("lang")
    if lang:
        return (LIT, lex, keys.RDF_LANGSTRING, lang.lower()), m.end()
    # UCHAR is legal in every IRIREF, the datatype position included
    return (LIT, lex, _unescape(dt) if dt else keys.XSD_STRING, None), m.end()


def parse_line(line: str, decode: bool = True):
    """One N-Quads statement → quad tuple (graph=None for triples).

    Validates the full statement grammar (sweep 17): the final '.' is
    required, only a comment may follow it, and anything else after the
    terms raises instead of being silently accepted.
    """
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    s, pos = parse_term(line, 0, decode)
    p, pos = parse_term(line, pos, decode)
    o, pos = parse_term(line, pos, decode)
    g = None
    rest = line[pos:].lstrip()
    if rest and not rest.startswith("."):
        g, pos = parse_term(line, pos, decode)
        rest = line[pos:].lstrip()
    if not rest.startswith("."):
        raise ValueError(f"missing final '.' in N-Quads statement: {line!r}")
    tail = rest[1:].lstrip()
    if tail and not tail.startswith("#"):
        raise ValueError(f"trailing content after '.': {tail!r}")
    return (g, s, p, o)


def parse(text_or_lines) -> list:
    # EOL is [#xD#xA]+ ([spec] N-Quads §5 grammar) — NOT str.splitlines,
    # which also splits on \v \f U+0085 U+2028 U+2029 U+001C-1E, all of
    # which are grammar-LEGAL raw inside STRING_LITERAL_QUOTE (sweep 35
    # text-loop fuzz: a literal carrying U+0085 split mid-statement)
    lines = re.split("[\r\n]+", text_or_lines) \
        if isinstance(text_or_lines, str) else text_or_lines
    out = []
    for ln in lines:
        q = parse_line(ln)
        if q is not None:
            out.append(q)
    return out
