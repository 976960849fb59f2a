"""Distributed N-Quads source/sink for quad tables.

The reference round-tripped graphs through ``.nq`` golden files and rdflib's
nquads plugin ([v0.5.0] test/test_testsuite.py compared toRdf output against
N-Quads — SURVEY.md §5.1); this is the same capability as a Spark I/O pair
per [spec] RDF 1.1 N-Quads (W3C Rec 2014-02-25):

- **sink**: quad rows → one N-Quads statement per line, built ENTIRELY with
  JVM-side column functions (literal `F.replace` chains for escaping, no
  regex, no Python) — the write path stays in whole-stage codegen and
  scales with the cluster; `df.write.text` emits one part-file per
  partition.
- **source**: `spark.read.text` → Arrow-batched ``mapInPandas`` over the
  pure-core parser (jsonld/nquads.py parse_line) — parsing is inherently
  per-line stringy work, so it rides the same vectorized-UDF seam as
  expansion (SURVEY.md §2.J).

Line-format parity with the pure core (`jsonld.nquads.quad_to_nq`) is
asserted test-side so fixtures, the oracle comparator, and the distributed
sink can never drift apart.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from rdflib_jsonld_spark.jsonld import keys
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT

NQ_READ_SCHEMA = T.StructType([
    T.StructField("g", T.StringType(), True),
    T.StructField("s", T.StringType(), False),
    T.StructField("s_is_bnode", T.BooleanType(), False),
    T.StructField("p", T.StringType(), False),
    T.StructField("o_kind", T.StringType(), False),
    T.StructField("o_value", T.StringType(), False),
    T.StructField("o_datatype", T.StringType(), True),
    T.StructField("o_lang", T.StringType(), True),
])


def _escape_col(c):
    """N-Quads string escaping ([spec] N-Quads §2.3 ECHAR): literal
    replaces, backslash FIRST. `F.replace` is plain-string (no regex)."""
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _encode_label_col(c):
    """JVM twin of jsonld.nquads.encode_label: injectively map lineage-
    salted labels onto N-Quads BLANK_NODE_LABEL grammar. '_' escape FIRST."""
    for raw, enc in (("_", "__"), ("/", "_s"), ("#", "_h"),
                     (":", "_c"), (".", "_d")):
        c = F.replace(c, F.lit(raw), F.lit(enc))
    return c


def _node_col(c):
    """IRI-or-bnode column → N-Quads spelling (bnodes carry '_:')."""
    return F.when(c.startswith("_:"),
                  F.concat(F.lit("_:"),
                           _encode_label_col(F.substring(c, 3, 1 << 30)))) \
        .otherwise(F.concat(F.lit("<"), c, F.lit(">")))


def nquads_lines(quads: DataFrame) -> DataFrame:
    """quads(g,s,p,o_kind,o_value,o_datatype,o_lang,…) → one-column
    DataFrame ``value`` of N-Quads statements. Pure column algebra."""
    lit_body = F.concat(F.lit('"'), _escape_col(F.col("o_value")),
                        F.lit('"'))
    obj = (
        F.when(F.col("o_kind") == "literal",
               F.when(F.col("o_lang").isNotNull(),
                      F.concat(lit_body, F.lit("@"), F.col("o_lang")))
               .when(F.col("o_datatype").isNotNull()
                     & (F.col("o_datatype") != keys.XSD_STRING),
                     F.concat(lit_body, F.lit("^^<"),
                              F.col("o_datatype"), F.lit(">")))
               .otherwise(lit_body))
        .otherwise(_node_col(F.col("o_value")))
    )
    line = F.concat(
        _node_col(F.col("s")), F.lit(" "),
        _node_col(F.col("p")), F.lit(" "),
        obj,
        F.when(F.col("g").isNotNull(),
               F.concat(F.lit(" "), _node_col(F.col("g"))))
        .otherwise(F.lit("")),
        F.lit(" ."),
    )
    return quads.select(line.alias("value"))


def write_nquads(quads: DataFrame, path: str, mode: str = "error") -> None:
    """Materialize a quad table as N-Quads text (one part per partition)."""
    nquads_lines(quads).write.mode(mode).text(path)


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """N-Quads text file(s) → quad table (lineage-free columns).

    Splittable: `spark.read.text` gives one row per line across file
    splits; each Arrow batch runs the pure-core parser."""
    return parse_nquads_lines(spark.read.text(path))


def parse_nquads_lines(lines: DataFrame) -> DataFrame:
    """One-column ``value`` DataFrame of N-Quads statements → quad table."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from rdflib_jsonld_spark.jsonld.nquads import parse_line
        cols = [f.name for f in NQ_READ_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for line in pdf["value"]:
                q = parse_line(line)
                if q is None:
                    continue
                g, s, p, o = q
                g_str = (f"_:{g[1]}" if g[0] == BNODE else g[1]) \
                    if g is not None else None
                s_str = f"_:{s[1]}" if s[0] == BNODE else s[1]
                p_str = f"_:{p[1]}" if p[0] == BNODE else p[1]
                if o[0] == LIT:
                    _, lex, dt, lang = o
                    out.append((g_str, s_str, s[0] == BNODE, p_str,
                                "literal", lex, dt, lang))
                else:
                    o_str = f"_:{o[1]}" if o[0] == BNODE else o[1]
                    out.append((g_str, s_str, s[0] == BNODE, p_str,
                                "bnode" if o[0] == BNODE else "iri",
                                o_str, None, None))
            if out:
                yield pd.DataFrame(out, columns=cols)

    return lines.mapInPandas(parse, schema=NQ_READ_SCHEMA)
