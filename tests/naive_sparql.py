"""Naive SPARQL 1.1 evaluator — a TEST-ONLY oracle for the random-query
differential (sweep 37), written independently from the spec the same way
the pure mini-expander oracles the JSON-LD side (SURVEY §0 implication).

Scope: the algebra subset the fuzz generator emits — BGP / Join /
LeftJoin (OPTIONAL) / Union / Minus / Filter / Extend (BIND) / Graph /
inline VALUES, expression semantics per [spec] SPARQL 1.1 §17 (EBV
§17.2.2, operator mapping §17.3 + XPath promotion, function library
§17.4), and SELECT with DISTINCT / expression projection / GROUP BY
aggregates §18.5.  Deliberately list-based and quadratic: clarity over
speed; inputs are ≤ dozens of quads.

Term model (matches the generator, NOT the engine's encoding):

    ('iri', value)
    ('bnode', label)                       # label without '_:'
    ('lit', lexical, datatype_or_None, lang_or_None)

A simple literal carries datatype None, lang None; per SPARQL 1.1 /
RDF 1.1 it is the same term as ``xsd:string`` — callers should
normalize before comparing.  Solutions are dicts var→term (unbound
vars simply absent).  Expression type errors raise ``ExprError``.
"""
from __future__ import annotations

import math
import re
from fractions import Fraction

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
LANGSTRING = RDF + "langString"

_INT_DTS = {
    XSD + "integer", XSD + "long", XSD + "int", XSD + "short",
    XSD + "byte", XSD + "nonNegativeInteger", XSD + "nonPositiveInteger",
    XSD + "negativeInteger", XSD + "positiveInteger",
    XSD + "unsignedLong", XSD + "unsignedInt", XSD + "unsignedShort",
    XSD + "unsignedByte",
}
NUMERIC_DTS = _INT_DTS | {XSD + "decimal", XSD + "double", XSD + "float"}

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_DEC_RE = re.compile(r"^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)$")
_DBL_RE = re.compile(
    r"^(?:[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?"
    r"|[+-]?INF|NaN)$")


class ExprError(Exception):
    """SPARQL expression type error ([spec] §17.2)."""


def is_lit(t):
    return t is not None and t[0] == "lit"


def _numeric_class(dt):
    """'integer' | 'decimal' | 'float' | 'double' for numeric datatypes
    (derived integer types collapse to 'integer'), else None."""
    if dt in _INT_DTS:
        return "integer"
    if dt == XSD + "decimal":
        return "decimal"
    if dt == XSD + "float":
        return "float"
    if dt == XSD + "double":
        return "double"
    return None


def numeric_value(t):
    """(class, value) of a numeric literal; ExprError if the term is
    not a numeric literal or its lexical form is invalid."""
    if not is_lit(t) or t[3] is not None:
        raise ExprError("not numeric")
    cls = _numeric_class(t[2])
    if cls is None:
        raise ExprError("not numeric")
    lex = t[1]
    if cls == "integer":
        if not _INT_RE.match(lex):
            raise ExprError("ill-formed integer")
        return cls, int(lex)
    if cls == "decimal":
        if not _DEC_RE.match(lex):
            raise ExprError("ill-formed decimal")
        return cls, Fraction(lex)
    if not _DBL_RE.match(lex):
        raise ExprError("ill-formed " + cls)
    if lex == "INF" or lex == "+INF":
        return cls, math.inf
    if lex == "-INF":
        return cls, -math.inf
    if lex == "NaN":
        return cls, math.nan
    return cls, float(lex)


def _bool_value(t):
    """Value of an xsd:boolean literal; ExprError if ill-formed."""
    if t[1] in ("true", "1"):
        return True
    if t[1] in ("false", "0"):
        return False
    raise ExprError("ill-formed boolean")


def is_string_lit(t):
    """Simple, xsd:string, or language-tagged literal ([spec]
    'string literal')."""
    return is_lit(t) and (
        t[3] is not None or t[2] is None or t[2] == XSD + "string")


def ebv(t):
    """Effective boolean value [spec] §17.2.2."""
    if t is None or not is_lit(t):
        raise ExprError("EBV of non-literal")
    lex, dt, lang = t[1], t[2], t[3]
    if lang is None and dt == XSD + "boolean":
        try:
            return _bool_value(t)
        except ExprError:
            return False          # ill-formed boolean → false
    if lang is None and _numeric_class(dt):
        try:
            _, v = numeric_value(t)
        except ExprError:
            return False          # ill-formed numeric → false
        return not (v != v or v == 0)   # NaN or zero → false
    if lang is not None or dt is None or dt == XSD + "string":
        return len(lex) > 0
    raise ExprError("EBV undefined for datatype " + str(dt))


def _promote(a, b):
    """XPath numeric promotion of two (class, value) pairs → (class,
    value, value) with both values in the promoted representation."""
    order = {"integer": 0, "decimal": 1, "float": 2, "double": 3}
    cls = max(a[0], b[0], key=order.get)
    av, bv = a[1], b[1]
    if cls in ("float", "double"):
        av, bv = float(av), float(bv)
    elif cls == "decimal":
        av, bv = Fraction(av), Fraction(bv)
    return cls, av, bv


def same_term(a, b):
    """RDF term identity (simple literal ≡ xsd:string per RDF 1.1)."""
    return _canon_term(a) == _canon_term(b)


def _canon_term(t):
    if is_lit(t) and t[3] is None and t[2] == XSD + "string":
        return ("lit", t[1], None, None)
    if is_lit(t) and t[3] is not None:
        # lang tags are case-insensitive (RDF 1.1 Concepts §3.3); a
        # tagged literal's datatype IS rdf:langString — the explicit
        # and implicit spellings are one term (sweep 39)
        return ("lit", t[1], None, t[3].lower())
    return t


def eq_terms(a, b):
    """'=' per the §17.3 operator mapping with the RDFterm-equal
    fallback: value comparison where a mapping row applies, term
    identity otherwise; type error when both are literals that are
    neither value-comparable nor identical."""
    try:
        return cmp_terms(a, b) == 0
    except ExprError:
        pass
    if same_term(a, b):
        return True
    if is_lit(a) and is_lit(b):
        raise ExprError("literal = literal not comparable")
    return False


def cmp_terms(a, b):
    """Three-way value comparison per the §17.3 operator mapping rows:
    numeric/numeric, string/string (simple or xsd:string, codepoint),
    boolean/boolean.  Everything else is a type error (the generator
    emits no dateTimes)."""
    if is_lit(a) and is_lit(b) and a[3] is None and b[3] is None:
        ca, cb = _numeric_class(a[2]), _numeric_class(b[2])
        if ca and cb:
            _, av, bv = _promote(numeric_value(a)[:2],
                                 numeric_value(b)[:2])
            if av != av or bv != bv:        # NaN: only != holds
                raise ExprError("NaN compare")
            return 0 if av == bv else (-1 if av < bv else 1)
        sa = a[2] is None or a[2] == XSD + "string"
        sb = b[2] is None or b[2] == XSD + "string"
        if sa and sb:
            return 0 if a[1] == b[1] else (-1 if a[1] < b[1] else 1)
        if a[2] == XSD + "boolean" and b[2] == XSD + "boolean":
            av, bv = _bool_value(a), _bool_value(b)
            return 0 if av == bv else (-1 if av < bv else 1)
    raise ExprError("terms not value-comparable")


def _arith(op, a, b):
    na, nb = numeric_value(a), numeric_value(b)
    if op == "/":
        cls, av, bv = _promote(na, nb)
        if cls == "integer":
            cls, av, bv = "decimal", Fraction(av), Fraction(bv)
        if bv == 0 and cls == "decimal":
            raise ExprError("decimal division by zero")
        if cls == "decimal":
            v = av / bv
        else:
            try:
                v = av / bv
            except ZeroDivisionError:       # float 0.0/0.0 etc.
                v = math.nan if av != av or av == 0 else math.copysign(
                    math.inf, av) * math.copysign(1.0, bv)
        return _num_lit(cls, v)
    cls, av, bv = _promote(na, nb)
    v = {"+": lambda: av + bv, "-": lambda: av - bv,
         "*": lambda: av * bv}[op]()
    return _num_lit(cls, v)


def _num_lit(cls, v):
    """Build a numeric literal term from a computed value, with the
    canonical-ish lexical form used for comparison-by-value anyway."""
    dt = {"integer": XSD + "integer", "decimal": XSD + "decimal",
          "float": XSD + "float", "double": XSD + "double"}[cls]
    if cls == "integer":
        lex = str(int(v))
    elif cls == "decimal":
        f = Fraction(v)
        lex = str(f.numerator / f.denominator) if f.denominator != 1 \
            else str(f.numerator)
    else:
        if v != v:
            lex = "NaN"
        elif v == math.inf:
            lex = "INF"
        elif v == -math.inf:
            lex = "-INF"
        else:
            lex = repr(float(v))
    return ("lit", lex, dt, None)


def _str_lit(s, like=None):
    """Simple literal, or one carrying ``like``'s lang/xsd:string
    typing (the 'derived' typing of §17.4.3 string functions)."""
    if like is not None and like[3] is not None:
        return ("lit", s, like[2], like[3])
    if like is not None and like[2] == XSD + "string":
        return ("lit", s, XSD + "string", None)
    return ("lit", s, None, None)


def _arg_compat(a, b):
    """Two-argument string-function compatibility [spec] §17.4.3.1.2."""
    if not is_string_lit(a) or not is_string_lit(b):
        return False
    if b[3] is None:
        return True
    return a[3] is not None and a[3].lower() == b[3].lower()


_FLAG_RE = re.compile(r"^[smix]*$")


def _xpath_regex(text, pat, flags):
    if not _FLAG_RE.match(flags):
        raise ExprError("invalid regex flags")
    f = 0
    for c, v in (("s", re.S), ("m", re.M), ("i", re.I), ("x", re.X)):
        if c in flags:
            f |= v
    try:
        return re.compile(pat, f)
    except re.error:
        raise ExprError("invalid regex pattern")


def _fn_round(cls, v):
    if cls in ("float", "double"):
        if v != v or math.isinf(v):
            return v
        return float(math.floor(v + 0.5))   # ties toward +INF (fn:round)
    if cls == "decimal":
        return Fraction(math.floor(v + Fraction(1, 2)))
    return v


class _Unbound(Exception):
    """Internal: variable not bound (distinct from a type error only
    inside BOUND/COALESCE handling)."""


#: sentinel for "the spec leaves this cell implementation-defined —
#: the differential must not compare it" (MIN/MAX over mixed kinds)
UNDEFINED = ("__undefined__",)


class ImplDefined(Exception):
    """The seed's outcome is implementation-defined (e.g. an UNDEFINED
    aggregate cell feeding a join) — the differential skips it."""


def _free_vars(e):
    """Variables mentioned by an expression AST node."""
    if not isinstance(e, tuple):
        return set()
    if e[0] == "var":
        return {e[1]}
    if e[0] in ("lit", "exists"):
        return set()
    out = set()
    for a in e[2:]:
        out |= _free_vars(a)
    return out


def _substr(source, start, length=None):
    """fn:substring semantics: 1-based, positions p with
    round(start) <= p < round(start)+round(length)."""
    s = source
    st = _fn_round("double", float(start))
    if length is None:
        lo, hi = st, math.inf
    else:
        ln = _fn_round("double", float(length))
        lo, hi = st, st + ln
    return "".join(ch for i, ch in enumerate(s, start=1)
                   if lo <= i < hi)


def lang_matches(tag, rng):
    """langMatches basic filtering (RFC 4647 §3.3.1)."""
    if rng == "*":
        return tag != ""
    t, r = tag.lower().split("-"), rng.lower().split("-")
    if len(r) > len(t):
        return False
    return t[: len(r)] == r


class Evaluator:
    """Evaluate the fuzz generator's algebra over an in-memory quad
    list.  ``quads`` is a list of (graph_term_or_None, s, p, o)."""

    def __init__(self, quads):
        self.quads = list(quads)

    # --- expressions -------------------------------------------------

    def expr(self, e, sol):
        kind = e[0]
        if kind == "var":
            if e[1] not in sol:
                raise _Unbound(e[1])
            return sol[e[1]]
        if kind == "lit":
            return e[1]
        if kind == "exists":
            _, positive, group = e
            hit = any(True for _ in self._eval_compat(group, sol))
            return _bool(hit if positive else not hit)
        if kind == "op":
            return self._op(e[1], e[2:], sol)
        if kind == "fn":
            return self._fn(e[1], e[2:], sol)
        raise AssertionError(e)

    def _ev(self, e, sol):
        """Evaluate to a term; unbound var is a type error here."""
        try:
            return self.expr(e, sol)
        except _Unbound:
            raise ExprError("unbound variable")

    def _op(self, op, args, sol):
        if op == "!":
            return _bool(not self._ebv(args[0], sol))
        if op == "&&":
            # [spec] §17.2/17.4.1.5: error ∧ false = false
            l = self._try_ebv(args[0], sol)
            r = self._try_ebv(args[1], sol)
            if l is False or r is False:
                return _bool(False)
            if isinstance(l, ExprError):
                raise l
            if isinstance(r, ExprError):
                raise r
            return _bool(True)
        if op == "||":
            l = self._try_ebv(args[0], sol)
            r = self._try_ebv(args[1], sol)
            if l is True or r is True:
                return _bool(True)
            if isinstance(l, ExprError):
                raise l
            if isinstance(r, ExprError):
                raise r
            return _bool(False)
        a = self._ev(args[0], sol)
        if op == "u-":
            cls, v = numeric_value(a)
            return _num_lit(cls, -v)
        b = self._ev(args[1], sol)
        if op in ("+", "-", "*", "/"):
            return _arith(op, a, b)
        if op == "=":
            return _bool(eq_terms(a, b))
        if op == "!=":
            return _bool(not eq_terms(a, b))
        rel = cmp_terms(a, b)
        return _bool({"<": rel < 0, "<=": rel <= 0,
                      ">": rel > 0, ">=": rel >= 0}[op])

    def _ebv(self, e, sol):
        return ebv(self._ev(e, sol))

    def _try_ebv(self, e, sol):
        try:
            return self._ebv(e, sol)
        except ExprError as err:
            return err

    def _fn(self, name, args, sol):
        if name == "BOUND":
            var = args[0][1]
            return _bool(var in sol and sol[var] is not None)
        if name == "COALESCE":
            for a in args:
                try:
                    return self._ev(a, sol)
                except ExprError:
                    continue
            raise ExprError("COALESCE: no value")
        if name == "IF":
            return self._ev(args[1] if self._ebv(args[0], sol)
                            else args[2], sol)
        vals = [self._ev(a, sol) for a in args]
        return self._fn_strict(name, vals)

    def _fn_strict(self, name, v):
        if name == "SAMETERM":
            return _bool(same_term(v[0], v[1]))
        if name == "STR":
            t = v[0]
            if t[0] == "iri":
                return ("lit", t[1], None, None)
            if is_lit(t):
                return ("lit", t[1], None, None)
            raise ExprError("STR of bnode")
        if name == "LANG":
            if not is_lit(v[0]):
                raise ExprError("LANG of non-literal")
            return ("lit", v[0][3] or "", None, None)
        if name == "DATATYPE":
            t = v[0]
            if not is_lit(t):
                raise ExprError("DATATYPE of non-literal")
            if t[3] is not None:
                return ("iri", LANGSTRING)
            return ("iri", t[2] or XSD + "string")
        if name == "ISIRI" or name == "ISURI":
            return _bool(v[0][0] == "iri")
        if name == "ISBLANK":
            return _bool(v[0][0] == "bnode")
        if name == "ISLITERAL":
            return _bool(is_lit(v[0]))
        if name == "ISNUMERIC":
            try:
                numeric_value(v[0])
                return _bool(True)
            except ExprError:
                return _bool(False)
        if name == "IRI":
            t = v[0]
            if t[0] == "iri":
                return t
            if is_lit(t) and (t[2] in (None, XSD + "string")
                              and t[3] is None):
                return ("iri", t[1])
            raise ExprError("IRI() argument")
        if name == "STRDT":
            a, dt = v
            if not (is_lit(a) and a[2] in (None, XSD + "string")
                    and a[3] is None):
                # RDF 1.1: "x"^^xsd:string IS the simple literal "x"
                raise ExprError("STRDT needs a simple literal")
            if dt[0] != "iri":
                raise ExprError("STRDT datatype")
            return ("lit", a[1], dt[1], None)
        if name == "STRLANG":
            a, lg = v
            if not (is_lit(a) and a[2] in (None, XSD + "string")
                    and a[3] is None):
                # RDF 1.1: "x"^^xsd:string IS the simple literal "x"
                raise ExprError("STRLANG needs a simple literal")
            if not (is_lit(lg) and lg[2] in (None, XSD + "string")
                    and lg[3] is None):
                raise ExprError("STRLANG lang")
            if lg[1] == "":
                raise ExprError("STRLANG empty tag")
            return ("lit", a[1], None, lg[1])
        if name == "LANGMATCHES":
            tag, rng = v
            if not (is_lit(tag) and is_lit(rng)):
                raise ExprError("LANGMATCHES args")
            return _bool(lang_matches(tag[1], rng[1]))
        # --- string library: first argument must be a string literal
        if name in ("STRLEN", "UCASE", "LCASE", "ENCODE_FOR_URI",
                    "MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
            t = v[0]
            if not is_string_lit(t):
                raise ExprError(name + " argument")
            s = t[1]
            if name == "STRLEN":
                return ("lit", str(len(s)), XSD + "integer", None)
            if name == "UCASE":
                return _str_lit(s.upper(), like=t)
            if name == "LCASE":
                return _str_lit(s.lower(), like=t)
            if name == "ENCODE_FOR_URI":
                from urllib.parse import quote
                return ("lit", quote(s, safe="~-._"), None, None)
            import hashlib
            if t[3] is not None:
                raise ExprError("hash of lang-tagged literal")
            h = {"MD5": hashlib.md5, "SHA1": hashlib.sha1,
                 "SHA256": hashlib.sha256, "SHA384": hashlib.sha384,
                 "SHA512": hashlib.sha512}[name]
            return ("lit", h(s.encode("utf-8")).hexdigest(), None, None)
        if name in ("CONTAINS", "STRSTARTS", "STRENDS",
                    "STRBEFORE", "STRAFTER"):
            a, b = v
            if not _arg_compat(a, b):
                raise ExprError(name + " incompatible arguments")
            if name == "CONTAINS":
                return _bool(b[1] in a[1])
            if name == "STRSTARTS":
                return _bool(a[1].startswith(b[1]))
            if name == "STRENDS":
                return _bool(a[1].endswith(b[1]))
            if name == "STRBEFORE":
                if b[1] == "":
                    return _str_lit("", like=a)
                i = a[1].find(b[1])
                return _str_lit(a[1][:i], like=a) if i >= 0 \
                    else ("lit", "", None, None)
            if b[1] == "":
                return _str_lit(a[1], like=a)
            i = a[1].find(b[1])
            return _str_lit(a[1][i + len(b[1]):], like=a) if i >= 0 \
                else ("lit", "", None, None)
        if name == "SUBSTR":
            t = v[0]
            if not is_string_lit(t):
                raise ExprError("SUBSTR argument")
            nums = [numeric_value(x)[1] for x in v[1:]]
            return _str_lit(_substr(t[1], *nums), like=t)
        if name == "CONCAT":
            for t in v:
                if not is_string_lit(t):
                    raise ExprError("CONCAT argument")
            s = "".join(t[1] for t in v)
            if v and all(t[3] is not None for t in v) and len(
                    {t[3].lower() for t in v}) == 1:
                return ("lit", s, None, v[0][3])
            if v and all(t[2] == XSD + "string" and t[3] is None
                         for t in v):
                return ("lit", s, XSD + "string", None)
            return ("lit", s, None, None)
        if name in ("REGEX", "REPLACE"):
            t = v[0]
            if not is_string_lit(t):
                raise ExprError(name + " text argument")
            pat = v[1]
            if not is_string_lit(pat):
                raise ExprError(name + " pattern")
            if name == "REGEX":
                flags = v[2][1] if len(v) > 2 else ""
                rx = _xpath_regex(t[1], pat[1], flags)
                return _bool(rx.search(t[1]) is not None)
            repl = v[2]
            if not is_string_lit(repl):
                raise ExprError("REPLACE replacement")
            flags = v[3][1] if len(v) > 3 else ""
            rx = _xpath_regex(t[1], pat[1], flags)
            return _str_lit(rx.sub(repl[1].replace("\\", "\\\\"), t[1]),
                            like=t)
        if name in ("ABS", "CEIL", "FLOOR", "ROUND"):
            cls, val = numeric_value(v[0])
            if name == "ABS":
                out = abs(val)
            elif name == "ROUND":
                out = _fn_round(cls, val)
            else:
                if cls in ("float", "double") and (
                        val != val or math.isinf(val)):
                    out = val
                else:
                    out = math.ceil(val) if name == "CEIL" \
                        else math.floor(val)
                    if cls in ("float", "double"):
                        out = float(out)
                    elif cls == "decimal":
                        out = Fraction(out)
            return _num_lit(cls, out)
        raise AssertionError("naive oracle: unknown function " + name)

    # --- algebra -----------------------------------------------------

    def eval(self, node, graph=None):
        """Evaluate an algebra node to a list of solution dicts.
        ``graph`` — None = default graph, term = that named graph,
        ('var', v) handled by the 'graph' node itself."""
        kind = node[0]
        if kind == "bgp":
            return self._bgp(node[1], graph)
        if kind == "join":
            out = []
            for a in self.eval(node[1], graph):
                for b in self.eval(node[2], graph):
                    m = _merge(a, b)
                    if m is not None:
                        out.append(m)
            return out
        if kind == "optional":
            cond = node[3] if len(node) > 3 else None
            out = []
            for a in self.eval(node[1], graph):
                hit = False
                for b in self.eval(node[2], graph):
                    m = _merge(a, b)
                    if m is None:
                        continue
                    if cond is not None and not self._filter_pass(
                            cond, m):
                        continue
                    out.append(m)
                    hit = True
                if not hit:
                    out.append(dict(a))
            return out
        if kind == "union":
            return (self.eval(node[1], graph)
                    + self.eval(node[2], graph))
        if kind == "minus":
            rights = self.eval(node[2], graph)
            out = []
            for a in self.eval(node[1], graph):
                drop = False
                for b in rights:
                    shared = set(a) & set(b)
                    if not shared:
                        continue    # disjoint domains never exclude
                    if all(same_term(a[v], b[v]) for v in shared):
                        drop = True
                        break
                if not drop:
                    out.append(a)
            return out
        if kind == "filter":
            return [s for s in self.eval(node[2], graph)
                    if self._filter_pass(node[1], s)]
        if kind == "bind":
            out = []
            for s in self.eval(node[3], graph):
                s = dict(s)
                try:
                    s[node[2]] = self._ev(node[1], s)
                except ExprError:
                    pass            # error → var stays unbound
                out.append(s)
            return out
        if kind == "values":
            _, names, rows, sub = node
            table = [{n: t for n, t in zip(names, row) if t is not None}
                     for row in rows]
            out = []
            for a in self.eval(sub, graph):
                for b in table:
                    m = _merge(a, b)
                    if m is not None:
                        out.append(m)
            return out
        if kind == "graph":
            target = node[1]
            if target[0] == "var":
                names = sorted({q[0] for q in self.quads
                                if q[0] is not None})
                out = []
                for g in names:
                    for s in self.eval(node[2], g):
                        m = _merge(s, {target[1]: g})
                        if m is not None:
                            out.append(m)
                return out
            # pass the TERM tuple — _bgp compares with same_term
            # against the quad's graph tuple (a raw string never
            # matched, so every constant-GRAPH group came back empty)
            return self.eval(node[2], target)
        if kind == "subselect":
            # [spec] §18.2.2.9 ToMultiSet(SubSelect): the subquery
            # evaluates bottom-up against the dataset (inheriting the
            # active GRAPH scope), its solution modifiers apply, and
            # only its projected variables join the enclosing group.
            sub = node[1]
            gb = sub.get("group")
            if gb is not None:
                gb = ([("var", k) for k in gb[0]], gb[1])
            rows = self.select(sub["where"], sub["project"],
                               distinct=sub.get("distinct", False),
                               group_by=gb,
                               having=sub.get("having"),
                               graph=graph)
            out = []
            for r in rows:
                if any(v is UNDEFINED or v == UNDEFINED
                       for v in r.values()):
                    raise ImplDefined("subselect UNDEFINED cell")
                out.append({k: v for k, v in r.items()
                            if v is not None})
            return out
        raise AssertionError(node)

    def _eval_compat(self, group, sol):
        """EXISTS semantics: evaluate the group, keep solutions
        compatible with ``sol`` (substitute-free approximation that is
        exact for the generator's EXISTS bodies: plain BGPs)."""
        for s in self.eval(group):
            if _merge(sol, s) is not None:
                yield s

    def _filter_pass(self, expr, sol):
        try:
            return ebv(self._ev(expr, sol))
        except ExprError:
            return False

    def _bgp(self, triples, graph):
        """graph=None matches the UNION of all graphs — the engine's
        rdflib-ConjunctiveGraph-parity convention (a pattern with no
        GRAPH keyword sees every quad; tests/test_sparql_text.py's
        fixed-graph expectations pin it).  graph=term restricts to that
        named graph.  A predicate position may hold a property-path
        AST (kind in _PATH_KINDS) instead of a term."""
        sols = [{}]
        for pat in triples:
            if pat[1][0] in _PATH_KINDS:
                pairs = self.eval_path(pat[1], graph)
                if _path_nullable(pat[1]):
                    # zero-length over a CONSTANT endpoint matches the
                    # constant unconditionally, graph membership not
                    # required ([spec] §18.4 ZeroLengthPath; engine
                    # sweep 21)
                    for c in (pat[0], pat[2]):
                        if c[0] != "var":
                            pairs = pairs | {(_canon_term(c),
                                              _canon_term(c))}
                nxt = []
                for sol in sols:
                    for x, y in pairs:
                        m = _match_triple((pat[0], None, pat[2]),
                                          (None, x, None, y), sol)
                        if m is not None:
                            nxt.append(m)
                sols = nxt
                continue
            nxt = []
            for sol in sols:
                for q in self.quads:
                    if graph is not None and (
                            q[0] is None
                            or not same_term(q[0], graph)):
                        continue
                    m = _match_triple(pat, q, sol)
                    if m is not None:
                        nxt.append(m)
            sols = nxt
        return sols

    # --- property paths ([spec] §9 / §18.4) ---------------------------

    def _graph_quads(self, graph):
        return [q for q in self.quads
                if graph is None or (q[0] is not None
                                     and same_term(q[0], graph))]

    def _graph_nodes(self, graph):
        """All subject/object terms of the active graph(s) — the
        zero-length path universe (engine convention: literals
        included)."""
        out = set()
        for q in self._graph_quads(graph):
            out.add(_canon_term(q[1]))
            out.add(_canon_term(q[3]))
        return out

    def eval_path(self, path, graph):
        """DISTINCT set of (src, dst) canonical term pairs the path
        connects — mirroring the engine's documented set-based path
        evaluation (operators/paths.py header: no duplicate solutions
        from multiple routes; closures per [spec] §18.4 ALP)."""
        k = path[0]
        if k == "link":
            return {(_canon_term(q[1]), _canon_term(q[3]))
                    for q in self._graph_quads(graph)
                    if q[2] == ("iri", path[1])}
        if k == "inv":
            return {(y, x) for x, y in self.eval_path(path[1], graph)}
        if k == "seq":
            acc = self.eval_path(path[1], graph)
            for part in path[2:]:
                nx = self.eval_path(part, graph)
                acc = {(x, z) for x, y1 in acc for y2, z in nx
                       if y1 == y2}
            return acc
        if k == "alt":
            out = set()
            for part in path[1:]:
                out |= self.eval_path(part, graph)
            return out
        if k == "zom":
            return _pairs_closure(self.eval_path(path[1], graph)) \
                | {(t, t) for t in self._graph_nodes(graph)}
        if k == "oom":
            return _pairs_closure(self.eval_path(path[1], graph))
        if k == "zoo":
            return self.eval_path(path[1], graph) \
                | {(t, t) for t in self._graph_nodes(graph)}
        if k == "nps":
            banned = set(path[1])
            return {(_canon_term(q[1]), _canon_term(q[3]))
                    for q in self._graph_quads(graph)
                    if q[2][1] not in banned}
        if k == "npsx":
            # surface negated property set with mixed members:
            # !(a|^b) ≡ alt(nps({a}), inv(nps({b}))) — the spec's own
            # algebra translation ([spec] §18.2.2.3); a group with only
            # inverse members has no forward component
            fwd, rev = path[1], path[2]
            out = set()
            if fwd:
                out |= self.eval_path(("nps", fwd), graph)
            if rev:
                out |= {(y, x) for x, y
                        in self.eval_path(("nps", rev), graph)}
            return out
        raise AssertionError(path)

    # --- SELECT ------------------------------------------------------

    def select(self, where, project, distinct=False, group_by=None,
               having=None, graph=None):
        """project: list of ('var', name) or (expr, alias).
        group_by: None, or (keys, aggs) with keys = list of ('var',
        name) / (expr, alias) and project referring to keys by alias
        and to aggregates via ('agg', alias); aggs = dict alias →
        (fname, distinct, expr_or_None[, sep]).
        having: list of ('agg_cmp', (fname, distinct, expr), op,
        const_expr) or ('expr', expr) constraints applied to the
        grouped rows ([spec] §18.2.4.4, before projection)."""
        sols = self.eval(where, graph)
        if group_by is not None:
            sols = self._group(sols, *group_by, having=having)
        rows = []
        for s in sols:
            row = {}
            for item in project:
                if item[0] in ("var", "agg"):
                    # 'agg' aliases were materialized by _group and sit
                    # in the solution row like any variable
                    row[item[1]] = _canon_term(s.get(item[1]))
                else:
                    expr, alias = item
                    try:
                        row[alias] = _canon_term(self._ev(expr, s))
                    except ExprError:
                        row[alias] = None
            rows.append(row)
        if distinct:
            seen, uniq = set(), []
            for r in rows:
                k = tuple(sorted((k, repr(v)) for k, v in r.items()))
                if k not in seen:
                    seen.add(k)
                    uniq.append(r)
            rows = uniq
        return rows

    def _having_pass(self, constraint, row, members):
        """One HAVING constraint over a grouped row.  agg_cmp computes
        a fresh aggregate over the group's members and compares it;
        expr runs EBV over the row (group keys + agg aliases).  Errors
        and unbound aggregates drop the group ([spec] §18.2.4.4 —
        HAVING is a Filter over the aggregated solutions)."""
        if constraint[0] == "agg_cmp":
            _, (fname, dis, expr), op, rhs = constraint
            val = self._agg(fname, dis, expr, members)
            if val is None:
                return False
            if val is UNDEFINED or val == UNDEFINED:
                raise ImplDefined("HAVING over impl-defined aggregate")
            try:
                rv = self._ev(rhs, row)
                if op in ("=", "!="):
                    hit = eq_terms(val, rv)
                    return hit if op == "=" else not hit
                rel = cmp_terms(val, rv)
                return {"<": rel < 0, "<=": rel <= 0,
                        ">": rel > 0, ">=": rel >= 0}[op]
            except ExprError:
                return False
        return self._filter_pass(constraint[1], row)

    def _group(self, sols, keys, aggs, having=None):
        groups = {}
        for s in sols:
            kvals = []
            for item in keys:
                if item[0] == "var":
                    kvals.append((item[1],
                                  _canon_term(s.get(item[1]))))
                else:
                    expr, alias = item
                    try:
                        kvals.append((alias,
                                      _canon_term(self._ev(expr, s))))
                    except ExprError:
                        kvals.append((alias, None))
            groups.setdefault(tuple((k, repr(v)) for k, v in kvals),
                              ([dict(kvals)], []))[1].append(s)
        if not groups and not keys:
            groups[()] = ([{}], [])        # §18.3: one empty group
        out = []
        for _, (keyrow, members) in groups.items():
            row = dict(keyrow[0])
            row["__members__"] = members
            out.append(row)
        # aggregates are computed lazily by select() via ('agg', ...)
        self._aggs = aggs
        result = []
        for row in out:
            members = row.pop("__members__")
            for alias, spec in aggs.items():
                fname, dis, expr = spec[:3]
                sep = spec[3] if len(spec) > 3 else " "
                row[alias] = self._agg(fname, dis, expr, members,
                                       sep=sep)
            if having and not all(self._having_pass(h, row, members)
                                  for h in having):
                continue
            result.append(row)
        return result

    def _agg(self, fname, distinct, expr, members, sep=" "):
        """Aggregate semantics per [spec] §18.5 with the engine's two
        DOCUMENTED deviations mirrored (solutions.py module docstring /
        sweep 20): unbound elements are SKIPPED (not a poisoning type
        error) for every set function, and only a BOUND non-numeric
        element errors SUM/AVG to unbound.  MIN/MAX over groups with
        value-incomparable pairs return UNDEFINED — the spec's ORDER BY
        ordering leaves cross-kind relative order implementation-
        defined, so the differential skips those cells."""
        if fname == "COUNT" and expr is None:      # COUNT(*)
            if distinct:
                seen = {tuple(sorted((k, repr(_canon_term(v)))
                                     for k, v in s.items()))
                        for s in members}
                return ("lit", str(len(seen)), XSD + "integer", None)
            return ("lit", str(len(members)), XSD + "integer", None)
        free = _free_vars(expr)
        vals, errored = [], False
        for s in members:
            if any(v not in s for v in free):
                continue            # unbound element → skipped
            try:
                vals.append(_canon_term(self._ev(expr, s)))
            except ExprError:
                errored = True
        if distinct:
            seen, uniq = set(), []
            for v in vals:
                if repr(v) not in seen:
                    seen.add(repr(v))
                    uniq.append(v)
            vals = uniq
        if fname == "COUNT":
            # errors produce no value → not counted (SQL NULL parity;
            # [spec] counts the multiset cardinality)
            return ("lit", str(len(vals)), XSD + "integer", None)
        if fname == "GROUP_CONCAT":
            # [spec] §18.5.1.7 leaves element order implementation-
            # defined; the engine (solutions.py _agg_col) SORTS the
            # cast strings before joining, so the oracle mirrors that
            # documented deterministic choice.  DISTINCT dedups on the
            # cast string (collect_set of strings), not on terms.
            parts = [_term_str(v) for v in vals]
            if distinct:
                parts = sorted(set(parts))
            else:
                parts = sorted(parts)
            return ("lit", sep.join(parts), None, None)
        if errored and fname in ("SUM", "AVG"):
            return None     # error-poisoned aggregate → unbound
        if fname in ("SUM", "AVG"):
            if not vals:
                return ("lit", "0", XSD + "integer", None)
            try:
                nums = [numeric_value(v) for v in vals]
            except ExprError:
                return None
            cls, total = nums[0]
            for c2, v2 in nums[1:]:
                cls, a, b = _promote((cls, total), (c2, v2))
                total = a + b
            if fname == "AVG":
                n = ("integer", len(nums))
                cls2, a, b = _promote((cls, total), n)
                if cls2 == "integer":
                    cls2, a, b = "decimal", Fraction(a), Fraction(b)
                return _num_lit(cls2, a / b)
            return _num_lit(cls, total)
        if fname in ("MIN", "MAX"):
            if errored:
                return UNDEFINED    # ill-formed values order impl-defined
            if not vals:
                return None
            try:
                best = vals[0]
                for v in vals[1:]:
                    rel = cmp_terms(v, best)
                    if (rel < 0) if fname == "MIN" else (rel > 0):
                        best = v
                # every pair must be mutually comparable, or the order
                # (hence the extreme) is implementation-defined
                for i in range(len(vals)):
                    for j in range(i + 1, len(vals)):
                        cmp_terms(vals[i], vals[j])
                return best
            except ExprError:
                return UNDEFINED
        raise AssertionError(fname)


def _bool(v):
    return ("lit", "true" if v else "false", XSD + "boolean", None)


def _term_str(t):
    """The engine's cast-to-string of a solution column cell: lexical
    form for literals, the IRI string, '_:label' for bnodes."""
    if t[0] == "iri":
        return t[1]
    if t[0] == "bnode":
        return "_:" + t[1]
    return t[1]


_PATH_KINDS = {"link", "inv", "seq", "alt", "zom", "oom", "zoo", "nps",
               "npsx"}


def _path_nullable(path):
    """Can the path match a zero-length walk?"""
    k = path[0]
    if k in ("zom", "zoo"):
        return True
    if k == "inv":
        return _path_nullable(path[1])
    if k == "seq":
        return all(_path_nullable(p) for p in path[1:])
    if k == "alt":
        return any(_path_nullable(p) for p in path[1:])
    return False


def _pairs_closure(pairs):
    """Transitive closure of a pair set (BFS per distinct source)."""
    adj = {}
    for x, y in pairs:
        adj.setdefault(x, set()).add(y)
    out = set()
    for x in adj:
        seen = set()
        stack = list(adj[x])
        while stack:
            y = stack.pop()
            if y in seen:
                continue
            seen.add(y)
            stack.extend(adj.get(y, ()))
        out |= {(x, y) for y in seen}
    return out


_KIND_RANK = {"bnode": 1, "iri": 2, "lit": 3}


def ord_cmp(a, b):
    """Three-way ORDER BY comparison per [spec] SPARQL 1.1 §15.1, or
    None where the relative order is implementation-defined.  Kind
    order: unbound < blank node < IRI < literal; IRIs compare as
    simple literals (codepoint); literals compare by the §17.3
    operator mapping where a row applies.  Blank-vs-blank order and
    value-incomparable literal pairs (different lang tags, unknown
    datatypes, ill-formed numerics) are implementation-defined —
    the differential treats those pairs as unconstrained."""
    if a is None and b is None:
        return 0
    if a is None:
        return -1
    if b is None:
        return 1
    ra, rb = _KIND_RANK[a[0]], _KIND_RANK[b[0]]
    if ra != rb:
        return -1 if ra < rb else 1
    if a[0] == "iri":
        return 0 if a[1] == b[1] else (-1 if a[1] < b[1] else 1)
    if a[0] == "bnode":
        return 0 if a[1] == b[1] else None
    if same_term(a, b):
        return 0
    try:
        return cmp_terms(a, b)
    except ExprError:
        return None


def _merge(a, b):
    out = dict(a)
    for k, v in b.items():
        if k in out:
            if not same_term(out[k], v):
                return None
        else:
            out[k] = v
    return out


def _match_triple(pat, quad, sol):
    out = dict(sol)
    for pos, term in zip(pat, quad[1:]):
        if isinstance(pos, tuple) and pos[0] == "var":
            name = pos[1]
            if name in out:
                if not same_term(out[name], term):
                    return None
            else:
                out[name] = term
        else:
            if not same_term(pos, term):
                return None
    return out
