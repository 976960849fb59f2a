"""W3C Direct Mapping: relational DataFrames → quad tables, pure JVM.

``table_to_quads(df, "nation", pk=["n_nationkey"])`` turns ANY
DataFrame into rows of the engine's quad schema following the W3C
Direct Mapping conventions ([spec] "A Direct Mapping of Relational
Data to RDF", https://www.w3.org/TR/rdb-direct-mapping/):

- row node:   ``<base><Table>/<pk1>=<v1>;<pk2>=<v2>`` (§2.1 row IRI);
  tables without a primary key get deterministic per-row blank nodes
  derived from ALL column values (the spec's bnode rows, made
  deterministic for resume/idempotence like every id in this repo).
- type:       ``row rdf:type <base><Table>``
- literals:   ``row <base><Table>#<col> "lexical"^^xsd:*`` with the
  natural datatype map (§2.3 / R2RML natural mapping): integral →
  xsd:integer, float/double → xsd:double, decimal → xsd:decimal,
  boolean → xsd:boolean, date → xsd:date, timestamp → xsd:dateTime,
  else xsd:string. NULL columns emit no triple (§2.1).
- references: ``fks={"n_regionkey": ("region", ["r_regionkey"])}``
  adds ``row <base><Table>#ref-<col> <other row IRI>`` (§2.1 reference
  triples) — a pure column rename, NO join: the target IRI is
  reconstructed from the FK value, so the mapping stays a narrow
  zero-shuffle projection per table at any scale.

Everything is whole-stage-codegen column algebra — no Python, no UDFs:
one ``select`` per emitted predicate, unioned. Together with the
SPARQL front-end this gives the classic relational→KG bridge: map the
warehouse tables once, query them as a graph (see the
kg_directmap_sparql_join contract query: SPARQL over the mapped
dataset ≡ the SQL join on the source tables).

The reference checkout has no relational bridge (tombstone) —
pipeline-extension breadth on the engine's quad model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


# RFC 3987 iunreserved = ALPHA / DIGIT / "-" / "." / "_" / "~" / ucschar.
# Everything else printable-ASCII percent-encodes when a column value is
# substituted into an IRI ([spec] R2RML §7.3 "IRI-safe version"; Direct
# Mapping §2.1 row IRIs). '%' must encode FIRST. Non-ASCII stays raw
# (ucschar is allowed in IRIs); C0 controls are out of scope for
# relational lexicals (documented narrowing).
_IRI_SAFE_MAP = [("%", "%25")] + [
    (c, "%%%02X" % ord(c)) for c in
    " !\"#$&'()*+,/:;<=>?@[\\]^`{|}"
]


def iri_safe(col: F.Column) -> F.Column:
    """Percent-encode the non-iunreserved printable-ASCII set — pure
    chained literal replaces, stays in whole-stage codegen (sweep 19)."""
    for raw, enc in _IRI_SAFE_MAP:
        col = F.replace(col, F.lit(raw), F.lit(enc))
    return col


def _xsd_type(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                       T.LongType)):
        return XSD + "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return XSD + "double"
    if isinstance(dt, T.DecimalType):
        return XSD + "decimal"
    if isinstance(dt, T.BooleanType):
        return XSD + "boolean"
    if isinstance(dt, T.DateType):
        return XSD + "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return XSD + "dateTime"
    return XSD + "string"


def _lexical(col: F.Column, dt: T.DataType) -> F.Column:
    """Canonical lexical form per XSD — date/timestamp ISO-formatted,
    everything else Spark's string cast (which matches the engine's
    canonical integer/decimal forms)."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    return col.cast("string")


def _row_iri(base: str, table: str, df: DataFrame,
             pk: list[str]) -> F.Column:
    parts: list = [F.lit(f"{base}{table}/")]
    for i, c in enumerate(pk):
        if i:
            parts.append(F.lit(";"))
        parts.append(F.lit(f"{c}="))
        parts.append(iri_safe(F.col(c).cast("string")))
    return F.concat(*parts)


def table_to_quads(df: DataFrame, table: str,
                   base: str = "http://example.org/db/",
                   pk: list[str] | None = None,
                   fks: dict | None = None,
                   columns: list[str] | None = None) -> DataFrame:
    """Direct-map one table to quads (engine quad schema; lineage
    conv_id = table name, turn_idx = 0, g = NULL)."""
    cols = columns or df.columns
    if pk:
        subj = _row_iri(base, table, df, pk)
        s_bn = F.lit(False)
    else:
        # deterministic bnode per row from every column value
        subj = F.concat(
            F.lit(f"_:{table}/"),
            F.sha2(F.concat_ws(
                "\x1f", *[F.col(c).cast("string") for c in df.columns]),
                256))
        s_bn = F.lit(True)

    def shell(p, o_kind, o_value, o_dt):
        return df.select(
            F.lit(None).cast("string").alias("g"),
            subj.alias("s"),
            s_bn.alias("s_is_bnode"),
            F.lit(p).alias("p"),
            F.lit(o_kind).alias("o_kind"),
            o_value.alias("o_value"),
            (F.lit(o_dt) if o_dt else F.lit(None)).cast("string")
            .alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(table).alias("conv_id"),
            F.lit(0).alias("turn_idx"),
        ).where(o_value.isNotNull())

    parts = [shell(RDF_TYPE, "iri", F.lit(f"{base}{table}"), None)]
    dtypes = dict(zip(df.schema.names, [f.dataType for f in
                                        df.schema.fields]))
    for c in cols:
        if fks and c in fks:
            ref_table, ref_pk = fks[c]
            ref_parts: list = [F.lit(f"{base}{ref_table}/")]
            for i, rc in enumerate(ref_pk):
                if i:
                    ref_parts.append(F.lit(";"))
                ref_parts.append(F.lit(f"{rc}="))
                ref_parts.append(iri_safe(F.col(c).cast("string")))
            parts.append(shell(f"{base}{table}#ref-{c}", "iri",
                               F.concat(*ref_parts), None))
        else:
            dt = dtypes[c]
            parts.append(shell(f"{base}{table}#{c}", "literal",
                               _lexical(F.col(c), dt), _xsd_type(dt)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tables_to_quads(tables: dict, base: str = "http://example.org/db/",
                    pks: dict | None = None,
                    fks: dict | None = None) -> DataFrame:
    """Map a whole schema: ``tables={name: df}``, ``pks={name: [cols]}``,
    ``fks={name: {col: (ref_table, [ref_pk])}}`` → one unioned quad
    table (each table stays its own narrow scan branch)."""
    out = None
    for name, df in tables.items():
        q = table_to_quads(df, name, base=base,
                           pk=(pks or {}).get(name),
                           fks=(fks or {}).get(name))
        out = q if out is None else out.unionByName(q)
    return out
