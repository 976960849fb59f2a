"""R2RML-style custom mapping: templated relational → RDF.

The Direct Mapping (operators/directmap.py) is the W3C DEFAULT
relational bridge; real warehouses want the CUSTOM one — R2RML
([spec] W3C R2RML, Rec 2012-09-27): IRI templates over columns, chosen
classes, per-predicate column/template/constant object maps, language
tags and datatype overrides, and named-graph placement. Mappings here
are plain Python dicts (the Turtle mapping-document parser is a
documented narrowing, same policy as the SHACL shapes surface):

    {"table": "customer",               # key into the tables dict
     "subject": {"template": "http://e/cust/{c_custkey}",
                 "class": "http://e/Customer",       # optional
                 "graph": "http://e/g/crm"},         # optional
     "predicates": [
        {"predicate": "http://e/name", "column": "c_name"},
        {"predicate": "http://e/nation",
         "template": "http://e/nation/{c_nationkey}"},  # IRI object
        {"predicate": "http://e/label", "column": "c_name",
         "lang": "en"},
        {"predicate": "http://e/acct", "column": "c_acctbal",
         "datatype": "http://www.w3.org/2001/XMLSchema#decimal"},
        {"predicate": "http://e/kind", "constant": "http://e/K",
         "term_type": "iri"}]}

Template semantics per R2RML §7.3: ``{col}`` references substitute the
column's lexical value; a row with a NULL in any referenced column
produces no triple (R2RML NULL suppression, §11). Everything compiles
to ``concat``/``format_string`` column expressions — zero Python, zero
shuffle, whole-stage codegen, exactly like the Direct Mapping.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from .directmap import RDF_TYPE, _lexical, _xsd_type, iri_safe

_REF_RE = re.compile(r"\{([^{}]+)\}")


def _template_col(template: str, safe: bool = True):
    """R2RML IRI template → concat expression + referenced columns.
    NULL in any referenced column nulls the whole value (concat
    propagates NULL), which implements §11 NULL suppression for free.

    ``safe``: substitute the IRI-safe (percent-encoded) version of each
    column value per [spec] R2RML §7.3 — the default, because templates
    default to IRI term maps. Literal-typed templates pass safe=False
    (the spec substitutes raw values outside IRI term maps)."""
    parts: list = []
    last = 0
    refs: list[str] = []
    for m in _REF_RE.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last:m.start()]))
        refs.append(m.group(1))
        val = F.col(m.group(1)).cast("string")
        parts.append(iri_safe(val) if safe else val)
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    if not parts:
        parts = [F.lit("")]
    return F.concat(*parts), refs


def triples_map_to_quads(df: DataFrame, mapping: dict) -> DataFrame:
    """Apply one R2RML-style triples map to a DataFrame → quad table
    (engine schema; lineage conv_id = table name, turn_idx = 0)."""
    table = mapping.get("table", "table")
    subj_spec = mapping["subject"]
    subj, _ = _template_col(subj_spec["template"])
    graph = subj_spec.get("graph")
    g_col = F.lit(graph).cast("string") if graph else \
        F.lit(None).cast("string")
    dtypes = dict(zip(df.schema.names,
                      [f.dataType for f in df.schema.fields]))

    def shell(p_col, o_kind, o_value, o_dt, o_lang):
        return df.select(
            g_col.alias("g"),
            subj.alias("s"),
            F.lit(False).alias("s_is_bnode"),
            p_col.alias("p"),
            F.lit(o_kind).alias("o_kind"),
            o_value.alias("o_value"),
            (F.lit(o_dt) if o_dt else F.lit(None)).cast("string")
            .alias("o_datatype"),
            (F.lit(o_lang) if o_lang else F.lit(None)).cast("string")
            .alias("o_lang"),
            F.lit(table).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
        ).where(subj.isNotNull() & o_value.isNotNull())

    parts: list[DataFrame] = []
    if "class" in subj_spec:
        parts.append(shell(F.lit(RDF_TYPE), "iri",
                           F.lit(subj_spec["class"]), None, None))
    LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    for pm in mapping.get("predicates", []):
        p_col = F.lit(pm["predicate"])
        if "constant" in pm:
            kind = pm.get("term_type", "literal")
            dt = pm.get("datatype") if kind == "literal" else None
            if kind == "literal" and not dt and not pm.get("lang"):
                dt = "http://www.w3.org/2001/XMLSchema#string"
            parts.append(shell(
                p_col, kind, F.lit(str(pm["constant"])),
                LANGSTR if pm.get("lang") else dt,
                pm["lang"].lower() if pm.get("lang") else None))
        elif "template" in pm:
            kind = pm.get("term_type", "iri")
            val, _ = _template_col(pm["template"], safe=(kind == "iri"))
            # a language tag implies rdf:langString ([spec] R2RML §7.4
            # term generation) — the column branch already did this;
            # the template branch left o_datatype NULL (sweep 19)
            parts.append(shell(p_col, kind, val,
                               LANGSTR if pm.get("lang")
                               else pm.get("datatype"),
                               pm["lang"].lower() if pm.get("lang")
                               else None))
        elif "column" in pm:
            c = pm["column"]
            if pm.get("lang"):
                parts.append(shell(p_col, "literal",
                                   F.col(c).cast("string"), LANGSTR,
                                   pm["lang"].lower()))
            else:
                dt = pm.get("datatype") or _xsd_type(dtypes[c])
                parts.append(shell(p_col, "literal",
                                   _lexical(F.col(c), dtypes[c]), dt,
                                   None))
        else:
            raise ValueError(
                f"predicate map needs column/template/constant: {pm}")
    if not parts:
        raise ValueError("triples map produced no predicate maps")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def r2rml_map(tables: dict[str, DataFrame],
              mappings: list[dict]) -> DataFrame:
    """Apply a list of triples maps against a dict of DataFrames →
    one unioned quad table."""
    outs = [triples_map_to_quads(tables[m["table"]], m)
            for m in mappings]
    if not outs:
        raise ValueError("no mappings")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
