"""Distributed Turtle / TriG source + sink over the quad table.

The Spark face of :mod:`rdflib_jsonld_spark.jsonld.turtle` (the pure
core). Most public RDF ships as Turtle, and the reference's rdflib host
round-trips graphs through it ([checkout] README.md:55 serialize
``format='n3'``; SURVEY.md §2.A1/A3 — the plugin I/O surface), so the
engine needs both directions:

- **source**: whole-file reads (``wholetext``) → ``mapInPandas`` over the
  pure-core parser. Turtle is NOT line-splittable (``@prefix`` state is
  document-global), so parallelism = file count — which is exactly how a
  100 TB Turtle corpus is laid out in practice (many part files). Blank
  node labels are salted per file (D11 determinism): re-reading the same
  layout reproduces identical rows; labels across layouts differ only up
  to the bnode relabeling freedom RDF grants.
- **sink**: each partition serializes to ONE standalone Turtle/TriG
  document (its own ``@prefix`` header) inside a single Arrow pass, then
  ``df.write.text`` emits one part-file per partition. No shuffle, no
  driver collect; output scales with the partition count.

Line-format parity with the pure core is direct — the sink and the test
oracle call the SAME ``serialize``/``serialize_trig`` functions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from rdflib_jsonld_spark.jsonld import turtle as ttl
from rdflib_jsonld_spark.jsonld.tordf import BNODE, IRI, LIT

TURTLE_READ_SCHEMA = T.StructType([
    T.StructField("g", T.StringType(), True),
    T.StructField("s", T.StringType(), False),
    T.StructField("s_is_bnode", T.BooleanType(), False),
    T.StructField("p", T.StringType(), False),
    T.StructField("o_kind", T.StringType(), False),
    T.StructField("o_value", T.StringType(), False),
    T.StructField("o_datatype", T.StringType(), True),
    T.StructField("o_lang", T.StringType(), True),
    T.StructField("src", T.StringType(), False),
])

_TEXT_SCHEMA = T.StructType([T.StructField("value", T.StringType(), False)])


def _term_str(t: tuple) -> str:
    if t[0] == "qt":
        # RDF-star quoted term → canonical table spelling (star.py)
        from rdflib_jsonld_spark.operators.star import term_to_star
        return term_to_star(t)
    return ("_:" + t[1]) if t[0] == BNODE else t[1]


def _quad_rows(quads: list, src: str) -> list[tuple]:
    rows = []
    for g, s, p, o in quads:
        g_str = _term_str(g) if g is not None else None
        if o[0] == LIT:
            rows.append((g_str, _term_str(s), s[0] == BNODE, _term_str(p),
                         "literal", o[1], o[2], o[3], src))
        elif o[0] == "qt":
            rows.append((g_str, _term_str(s), s[0] == BNODE, _term_str(p),
                         "triple", _term_str(o), None, None, src))
        else:
            rows.append((g_str, _term_str(s), s[0] == BNODE, _term_str(p),
                         "bnode" if o[0] == BNODE else "iri",
                         _term_str(o), None, None, src))
    return rows


def read_turtle(spark: SparkSession, path: str,
                base: str | None = None) -> DataFrame:
    """Turtle/TriG files → quad table (one task per file).

    Malformed files surface as zero rows rather than dead tasks, matching
    the malformed-document posture of the JSON-LD sources
    (sources/jsonld_files.py); per-file error accounting can be layered
    with :func:`read_turtle_errors` when the corpus is untrusted.
    """
    files = (spark.read.format("text").option("wholetext", "true").load(path)
             .select(F.input_file_name().alias("src"), "value"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TURTLE_READ_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for src, value in zip(pdf["src"], pdf["value"]):
                try:
                    quads = ttl.parse(value, base=base or src,
                                      bnode_prefix=f"{src}#")
                except (ttl.TurtleParseError, RecursionError):
                    continue
                out.extend(_quad_rows(quads, src))
            if out:
                yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse, schema=TURTLE_READ_SCHEMA)


def _row_to_quad(g, s, p, o_kind, o_value, o_datatype, o_lang) -> tuple:
    def term(v):
        return (BNODE, v[2:]) if v.startswith("_:") else (IRI, v)

    if o_kind == "literal":
        o = (LIT, o_value, o_datatype, o_lang)
    else:
        o = term(o_value)
    return (term(g) if g is not None and not pd.isna(g) else None,
            term(s), term(p), o)


def turtle_part_documents(quads: DataFrame,
                          prefixes: dict | None = None,
                          trig: bool = True) -> DataFrame:
    """Quad table → one standalone Turtle/TriG document per partition.

    ``trig=False`` asserts the input is default-graph-only (named-graph
    rows raise inside the task, surfacing a real modeling error instead
    of silently dropping graphs).
    """
    cols = ["g", "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"]
    ser = ttl.serialize_trig if trig else ttl.serialize
    pfx = dict(prefixes) if prefixes is not None else None

    def to_doc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tuples: list[tuple] = []
        for pdf in batches:
            for row in zip(*(pdf[c] for c in cols)):
                tuples.append(_row_to_quad(*row))
        if tuples:
            yield pd.DataFrame({"value": [ser(tuples, pfx)]})

    return quads.select(*cols).mapInPandas(to_doc, schema=_TEXT_SCHEMA)


def write_turtle(quads: DataFrame, path: str,
                 prefixes: dict | None = None, trig: bool = True,
                 mode: str = "error") -> None:
    """Materialize the quad table as a directory of Turtle/TriG part
    files (one per partition, each standalone)."""
    turtle_part_documents(quads, prefixes, trig).write.mode(mode).text(path)


def parse_turtle_documents(docs: DataFrame, base: str | None = None,
                           bnode_prefix: str = "") -> DataFrame:
    """In-plan inverse of :func:`turtle_part_documents`: a DataFrame of
    Turtle/TriG document strings (column ``value``) → quad table.

    ``bnode_prefix=""`` passes sink-encoded labels through the sentinel
    codec untouched, so sink→source round-trips are label-exact (the
    same contract the N-Quads pair keeps — sources/nquads_io.py)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in TURTLE_READ_SCHEMA.fields]
        for pdf in batches:
            out: list[tuple] = []
            for i, value in enumerate(pdf["value"]):
                quads = ttl.parse(value, base=base,
                                  bnode_prefix=bnode_prefix)
                out.extend(_quad_rows(quads, f"doc/{i}"))
            if out:
                yield pd.DataFrame(out, columns=cols)

    return docs.mapInPandas(parse, schema=TURTLE_READ_SCHEMA)
