"""SPARQL query-results serialization: JSON / XML / CSV / TSV.

Parity target: rdflib's ``Graph.query(...).serialize(format=...)``
surface that a migrating reference user relies on next to the JSON-LD
parser/serializer plugins ([v0.5.0] the reference delegates to rdflib's
result serializers; formats per the W3C specs):

- [spec] SPARQL 1.1 Query Results JSON Format (``to_json``)
- [spec] SPARQL Query Results XML Format, 2nd ed. (``to_xml``)
- [spec] SPARQL 1.1 Query Results CSV and TSV Formats (``to_csv`` /
  ``to_tsv``)

Input is the DataFrame returned by ``operators.sparql.sparql``:

- SELECT: one column per projected variable. Run the query with
  ``keep_types=True`` for exact term typing — the ``__typ_*``
  companion columns then ride along and these serializers read them.
  Without companions, terms are typed by the engine-wide shape
  convention (``_:`` prefix → bnode, scheme-prefixed → IRI, otherwise
  plain literal; non-string Spark columns → typed literals from the
  Spark dtype). That loses xsd datatypes on lexical columns —
  documented, not silent.
- ASK: the single-row boolean ``ask`` column maps to the formats'
  boolean result shape.
- CONSTRUCT/DESCRIBE return GRAPHS, not solution tables — serialize
  those with sources/nquads_io or the JSON-LD serializer instead
  (a ValueError here points the caller there).

Scale posture: the four ``to_*`` functions collect to the driver —
they exist for API parity and are bounded by the query's LIMIT, like
any single-document serialization. ``write_results`` is the
distributed path: the same term encoding evaluated as Spark column
expressions (JVM codegen, no Python in the row path) and written with
the parallel text/CSV writers, one results row per line.
"""
from __future__ import annotations

import json
import re as _re
from xml.sax.saxutils import escape as _sax_escape
from xml.sax.saxutils import quoteattr as _sax_quoteattr

#: chars with NO representation in XML 1.0 (not even as &#x..;):
#: C0 controls minus \t\n\r, surrogates, U+FFFE/U+FFFF ([spec] XML 1.0
#: §2.2 Char). Sweep 34: the writer emitted them raw, producing
#: non-well-formed output any downstream parser rejects — they are
#: substituted with U+FFFD (documented lossy policy; JSON/CSV/TSV
#: escape or carry them losslessly, use those formats for such data).
_XML_ILLEGAL = _re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def escape(s: str) -> str:
    return _sax_escape(_XML_ILLEGAL.sub("�", s))


def quoteattr(s: str) -> str:
    return _sax_quoteattr(_XML_ILLEGAL.sub("�", s))

from pyspark.sql import DataFrame, functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"
_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"
#: Spark dtype → xsd datatype for non-string result columns
#: (aggregate outputs, GROUP BY expression keys)
_DTYPE_XSD = {
    "bigint": XSD + "integer", "int": XSD + "integer",
    "smallint": XSD + "integer", "tinyint": XSD + "integer",
    "double": XSD + "double", "float": XSD + "float",
    "boolean": XSD + "boolean", "date": XSD + "date",
    "timestamp": XSD + "dateTime",
}


def _is_ask(df: DataFrame) -> bool:
    return [c for c in df.columns] == ["ask"]


def _check_solutions(df: DataFrame) -> list[str]:
    if set(df.columns) >= {"s", "p", "o_value", "o_kind"}:
        raise ValueError(
            "got a graph (CONSTRUCT/DESCRIBE) result — serialize it "
            "with sources.nquads_io / the JSON-LD serializer")
    return [c for c in df.columns if not c.startswith("__typ_")]


def _term_struct(df: DataFrame, var: str):
    """(value, kind, lang, datatype) struct column for one variable."""
    dtypes = dict(df.dtypes)
    have = set(df.columns)
    v = F.col(var)
    if dtypes.get(var, "string") != "string":
        base = dtypes[var].split("(")[0]
        if base.startswith("decimal"):
            base = "decimal"
        dt = _DTYPE_XSD.get(base, XSD + "string") if base != "decimal" \
            else XSD + "decimal"
        return F.struct(
            v.cast("string").alias("value"),
            F.when(v.isNotNull(), F.lit("literal")).alias("kind"),
            F.lit(None).cast("string").alias("lang"),
            F.when(v.isNotNull(), F.lit(dt)).alias("datatype"),
        ).alias(var)
    shape = (F.when(v.startswith("<<"), F.lit("triple"))
             .when(v.startswith("_:"), F.lit("bnode"))
             .when(v.rlike(_SCHEME_RE), F.lit("uri"))
             .otherwise(F.lit("literal")))
    if f"__typ_{var}__kind" in have:
        kind = F.coalesce(F.col(f"__typ_{var}__kind"), shape)
        kind = F.when(kind == F.lit("iri"), F.lit("uri")).otherwise(kind)
        lang = F.col(f"__typ_{var}__lang")
        dt = F.col(f"__typ_{var}__datatype")
        # engine identity convention: a lang tag implies rdf:langString
        # (companion datatype may be NULL); strip it for the result
        # formats, which carry xml:lang instead
        dt = F.when(lang.isNotNull(), F.lit(None).cast("string")) \
            .otherwise(dt)
    else:
        kind, lang = shape, F.lit(None).cast("string")
        dt = F.lit(None).cast("string")
    xsd_str = F.lit(XSD + "string")
    dt = F.when(dt.eqNullSafe(xsd_str), F.lit(None).cast("string")) \
        .otherwise(dt)   # simple/xsd:string → plain literal in results
    return F.struct(
        v.alias("value"),
        F.when(v.isNotNull(), kind).alias("kind"),
        F.when(v.isNotNull(), lang).alias("lang"),
        F.when(v.isNotNull(), dt).alias("datatype"),
    ).alias(var)


def _collect(df: DataFrame):
    names = _check_solutions(df)
    rows = df.select(*[_term_struct(df, n) for n in names]).collect()
    return names, rows


# --- driver-side, format-exact serializers ---------------------------------

def _json_triple(spelling: str) -> dict:
    """'<< … >>' table spelling → SPARQL 1.2 results JSON triple value
    ({"subject": …, "predicate": …, "object": …}, recursing on nested
    quoted subjects)."""
    from rdflib_jsonld_spark.jsonld.nquads import parse_term
    from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT, QT

    def term(t):
        if t[0] == IRI:
            return {"type": "uri", "value": t[1]}
        if t[0] == BNODE:
            return {"type": "bnode", "value": t[1]}
        if t[0] == QT:
            s, p, o = t[1]
            return {"type": "triple", "value": {
                "subject": term(s), "predicate": term(p),
                "object": term(o)}}
        out = {"type": "literal", "value": t[1]}
        if t[3]:
            out["xml:lang"] = t[3]
        elif t[2] and t[2] != XSD + "string":
            out["datatype"] = t[2]
        return out

    (qt, _) = parse_term(spelling)
    s, p, o = qt[1]
    return {"subject": term(s), "predicate": term(p), "object": term(o)}


def to_json(df: DataFrame, *, indent: int | None = None) -> str:
    """SPARQL 1.1 Query Results JSON Format."""
    if _is_ask(df):
        val = bool(df.collect()[0]["ask"])
        return json.dumps({"head": {}, "boolean": val}, indent=indent)
    names, rows = _collect(df)
    bindings = []
    for r in rows:
        b = {}
        for n in names:
            t = r[n]
            if t is None or t["kind"] is None:
                continue   # unbound → binding omitted
            if t["kind"] == "triple":
                # SPARQL 1.2 results draft: quoted-triple binding as a
                # nested s/p/o value (decomposed from the table
                # spelling by the pure-core star parser)
                cell = {"type": "triple", "value": _json_triple(t["value"])}
            else:
                cell = {"type": t["kind"], "value": t["value"]}
                if t["lang"]:
                    cell["xml:lang"] = t["lang"]
                elif t["datatype"]:
                    cell["datatype"] = t["datatype"]
            b[n] = cell
        bindings.append(b)
    return json.dumps({"head": {"vars": names},
                       "results": {"bindings": bindings}}, indent=indent)


def to_xml(df: DataFrame) -> str:
    """SPARQL Query Results XML Format (2nd edition)."""
    out = ['<?xml version="1.0"?>',
           '<sparql xmlns="http://www.w3.org/2005/sparql-results#">']
    if _is_ask(df):
        val = bool(df.collect()[0]["ask"])
        out += ["<head/>", f"<boolean>{str(val).lower()}</boolean>",
                "</sparql>"]
        return "\n".join(out)
    names, rows = _collect(df)
    out.append("<head>" + "".join(
        f"<variable name={quoteattr(n)}/>" for n in names) + "</head>")
    out.append("<results>")
    for r in rows:
        cells = []
        for n in names:
            t = r[n]
            if t is None or t["kind"] is None:
                continue
            val = escape(t["value"])
            if t["kind"] == "triple":
                inner = _xml_triple(t["value"])
            elif t["kind"] == "uri":
                inner = f"<uri>{val}</uri>"
            elif t["kind"] == "bnode":
                inner = f"<bnode>{escape(t['value'][2:])}</bnode>"
            elif t["lang"]:
                inner = (f"<literal xml:lang={quoteattr(t['lang'])}>"
                         f"{val}</literal>")
            elif t["datatype"]:
                inner = (f"<literal datatype={quoteattr(t['datatype'])}>"
                         f"{val}</literal>")
            else:
                inner = f"<literal>{val}</literal>"
            cells.append(f"<binding name={quoteattr(n)}>{inner}</binding>")
        out.append("<result>" + "".join(cells) + "</result>")
    out += ["</results>", "</sparql>"]
    return "\n".join(out)


def _xml_triple(spelling: str) -> str:
    """'<< … >>' spelling → SPARQL 1.2 results XML <triple> element."""
    from rdflib_jsonld_spark.jsonld.nquads import parse_term
    from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, QT

    def term(t):
        if t[0] == IRI:
            return f"<uri>{escape(t[1])}</uri>"
        if t[0] == BNODE:
            return f"<bnode>{escape(t[1])}</bnode>"
        if t[0] == QT:
            s, p, o = t[1]
            return ("<triple><subject>" + term(s) + "</subject>"
                    "<predicate>" + term(p) + "</predicate>"
                    "<object>" + term(o) + "</object></triple>")
        lex = escape(t[1])
        if t[3]:
            return f"<literal xml:lang={quoteattr(t[3])}>{lex}</literal>"
        if t[2] and t[2] != XSD + "string":
            return (f"<literal datatype={quoteattr(t[2])}>{lex}"
                    f"</literal>")
        return f"<literal>{lex}</literal>"

    (qt, _) = parse_term(spelling)
    s, p, o = qt[1]
    return ("<triple><subject>" + term(s) + "</subject>"
            "<predicate>" + term(p) + "</predicate>"
            "<object>" + term(o) + "</object></triple>")


def _csv_cell(value: str | None) -> str:
    if value is None:
        return ""
    if any(ch in value for ch in ',"\n\r'):
        return '"' + value.replace('"', '""') + '"'
    return value


_NT_ESC = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"),
           ("\t", "\\t")]


def _tsv_term(t) -> str:
    if t is None or t["kind"] is None:
        return ""
    if t["kind"] == "uri":
        return f"<{t['value']}>"
    if t["kind"] == "triple":
        # quoted-triple spelling is already N-Triples-shaped; re-spell
        # through the pure core so inner bnode labels get the same
        # sentinel encoding as plain cells
        from rdflib_jsonld_spark.jsonld.nquads import parse_term, term_to_nq
        return term_to_nq(parse_term(t["value"])[0])
    if t["kind"] == "bnode":
        # N-Triples BLANK_NODE_LABEL grammar: pipeline labels carry
        # '/ # : .' lineage salts — same sentinel encoder as every
        # other writer (sweep 27 class; r05 sweep: TSV emitted raw)
        from rdflib_jsonld_spark.jsonld.nquads import encode_label
        return "_:" + encode_label(t["value"][2:])
    val = t["value"]
    for raw, esc in _NT_ESC:
        val = val.replace(raw, esc)
    if t["lang"]:
        return f'"{val}"@{t["lang"]}'
    if t["datatype"]:
        return f'"{val}"^^<{t["datatype"]}>'
    return f'"{val}"'


def to_csv(df: DataFrame) -> str:
    """SPARQL 1.1 Query Results CSV Format (lexical forms, RFC 4180,
    CRLF line endings; ASK is serialized as a one-cell table, the
    format's recommended fallback)."""
    if _is_ask(df):
        val = bool(df.collect()[0]["ask"])
        return "ask\r\n" + str(val).lower() + "\r\n"
    names, rows = _collect(df)
    lines = [",".join(_csv_cell(n) for n in names)]
    for r in rows:
        lines.append(",".join(
            _csv_cell(None if r[n] is None or r[n]["kind"] is None
                      else r[n]["value"]) for n in names))
    return "\r\n".join(lines) + "\r\n"


def to_tsv(df: DataFrame) -> str:
    """SPARQL 1.1 Query Results TSV Format (N-Triples-encoded terms)."""
    if _is_ask(df):
        val = bool(df.collect()[0]["ask"])
        return "?ask\n" + str(val).lower() + "\n"
    names, rows = _collect(df)
    lines = ["\t".join("?" + n for n in names)]
    for r in rows:
        lines.append("\t".join(_tsv_term(r[n]) for n in names))
    return "\n".join(lines) + "\n"


# --- distributed writer ------------------------------------------------------

def _tsv_term_col(df: DataFrame, var: str):
    t = _term_struct(df, var)
    val = t["value"]
    for raw, esc in _NT_ESC:
        val = F.replace(val, F.lit(raw), F.lit(esc))
    lit = F.concat(F.lit('"'), val, F.lit('"'))
    lit = F.when(t["lang"].isNotNull(),
                 F.concat(lit, F.lit("@"), t["lang"])) \
        .when(t["datatype"].isNotNull(),
              F.concat(lit, F.lit("^^<"), t["datatype"], F.lit(">"))) \
        .otherwise(lit)
    from rdflib_jsonld_spark.sources.nquads_io import (_encode_label_col,
                                                       _encode_star_col)
    bnode = F.concat(F.lit("_:"),
                     _encode_label_col(F.substring(t["value"], 3, 1 << 30)))
    return (F.when(t["kind"].isNull(), F.lit(""))
            .when(t["kind"] == "triple",
                  _encode_star_col(t["value"]))  # inner labels encoded
            .when(t["kind"] == "uri",
                  F.concat(F.lit("<"), t["value"], F.lit(">")))
            .when(t["kind"] == "bnode", bnode)
            .otherwise(lit)).alias(var)


def tsv_lines(df: DataFrame) -> DataFrame:
    """One TSV-encoded results row per output row (the distributed
    writer's row encoding, exposed for pipelines that post-process or
    re-shuffle lines before writing)."""
    names = _check_solutions(df)
    return df.select(F.concat_ws(
        "\t", *[_tsv_term_col(df, n) for n in names]).alias("line"))


def write_results(df: DataFrame, path: str, *, format: str = "csv",
                  mode: str = "error") -> None:
    """Write a solution table with Spark's parallel writers — the
    100-TB path the driver-side ``to_*`` strings are not.

    - ``csv``: lexical forms, RFC 4180 quoting, ``header=True``
      (Spark's CSV writer; one header per part-file).
    - ``tsv``: N-Triples-encoded terms tab-joined, one row per line
      (data rows only — the ``?var`` header line is a driver-side
      concern; read back with the column order of ``df.columns``).
    - ``json``: line-delimited SRJ binding objects (one
      ``{"var": {"type": ..., "value": ...}}`` per line), the
      streaming-friendly variant of the JSON results format.
    """
    names = _check_solutions(df)
    if format == "csv":
        cells = [F.when(_term_struct(df, n)["kind"].isNotNull(),
                        _term_struct(df, n)["value"]).alias(n)
                 for n in names]
        df.select(*cells).write.mode(mode).option("header", True).csv(path)
        return
    if format == "tsv":
        tsv_lines(df).write.mode(mode).text(path)
        return
    if format == "json":
        structs = [_term_struct(df, n) for n in names]
        cells = [
            F.when(s["kind"].isNotNull(), F.struct(
                s["kind"].alias("type"), s["value"].alias("value"),
                s["lang"].alias("xml:lang"),
                s["datatype"].alias("datatype"))).alias(n)
            for n, s in zip(names, structs)]
        df.select(F.to_json(F.struct(*cells),
                            {"ignoreNullFields": "true"}).alias("value")) \
            .write.mode(mode).text(path)
        return
    raise ValueError(f"unknown results format {format!r}")
