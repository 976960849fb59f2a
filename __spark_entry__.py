"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001.
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` gives a
DuckDB twin for EVERY query (45/45 as of r02 — zero rows-only):

- kg_* pipeline queries are engineered so the entire expand→link→
  canonicalize path is predictable from doc_id arithmetic
  (sources/doc_transcripts.py) or from the synthetic generator's planted
  blocks (re-parsed with stdlib json + an independent union-find —
  no engine code in the oracle derivation);
- LSH dedup operators (minhash/simhash/near-dup clustering) run the
  candidates→exact-verify shape, gated by DuckDB's exact all-pairs
  word-n-gram Jaccard (+ a recursive transitive closure for clusters);
- winnowing is replicated end-to-end IN SQL (same rolling hash,
  window-min selection, df-cap — value-exact n_shared);
- ANN/IVF are recall-1.0-gated against brute-force SQL (planted
  neighborhoods for the partial-probe IVF paths);
- multimodal features assert decode success + fixed shapes via a
  planted-truth VALUES oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from rdflib_jsonld_spark.operators import dedup, multimodal, similarity
from rdflib_jsonld_spark.operators.expand import dedup_quads, expand_transcripts
from rdflib_jsonld_spark.operators.linking import (
    canonical_mapping, entity_mention_counts, mention_edges)
from rdflib_jsonld_spark.operators.textstats import (
    STOPWORDS, with_lang_id, with_quality_score, with_token_counts)
from rdflib_jsonld_spark.sources.doc_transcripts import documents_as_transcripts
from rdflib_jsonld_spark.sources import transcripts as tr

KG = "https://kg.example.org/"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → transcripts → expand → CC-link → canonical
    entity mention counts (top 20) on sf0.001."""
    return _kg_entity_counts_documents(spark, "/root/testdata/sf0.001", 20)


# --------------------------------------------------------------------------
# KG pipeline queries
# --------------------------------------------------------------------------

def _kg_entity_counts_documents(spark, sf_dir, limit=50) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # persist the quad table: linking + counting each trigger actions, and
    # recomputing the Python expansion per action would dominate (at real
    # scale this is the materialized Iceberg quad table, see run_pipeline)
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    mapping = canonical_mapping(quads)
    counts = entity_mention_counts(quads, mapping)
    return (counts.orderBy(F.desc("n_mentions"), F.asc("canonical_id"))
            .limit(limit))


def q_kg_entity_counts_documents(spark, sf_dir) -> DataFrame:
    return _kg_entity_counts_documents(spark, sf_dir, 50)


def q_kg_predicate_counts_documents(spark, sf_dir) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    quads_raw = expand_transcripts(documents_as_transcripts(docs))
    return (quads_raw.groupBy("p")
            .agg(F.count(F.lit(1)).alias("n_quads"))
            .orderBy("p"))


def q_kg_quad_stats_documents(spark, sf_dir) -> DataFrame:
    """E5 stats over the documents-bridge quad table — fully predictable
    from doc_id arithmetic (subjects = mention nodes + sameAs chain
    subjects), so count_distinct gets a real oracle."""
    docs = _t(spark, sf_dir, "documents")
    quads_raw = expand_transcripts(documents_as_transcripts(docs))
    return quads_raw.agg(
        F.count(F.lit(1)).alias("n_quads"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("p").alias("n_predicates"))


def q_kg_serialized_documents(spark, sf_dir) -> DataFrame:
    """A3/A4 serializer surface on the documents bridge: expand → from-rdf
    re-serialize per source document. n_quads is doc_id arithmetic (5
    mention quads + j sameAs), and the serialized text must carry the
    mention IRI — both checkable by the DuckDB oracle."""
    from rdflib_jsonld_spark.operators.serialize import serialize_documents
    docs = _t(spark, sf_dir, "documents")
    quads = expand_transcripts(documents_as_transcripts(docs))
    ser = serialize_documents(quads)
    has_id = ser.jsonld.contains(
        F.concat(F.lit(f"{KG}m/doc/"), F.col("turn_idx").cast("string")))
    return (ser.select("conv_id",
                       F.col("turn_idx").cast("long").alias("turn_idx"),
                       F.col("n_quads").cast("long").alias("n_quads"),
                       has_id.alias("has_mention_id"))
            .orderBy("conv_id", "turn_idx"))


def q_kg_bgp_optional_sameas(spark, sf_dir) -> DataFrame:
    """Extended BGP (OPTIONAL left-join semantics): every mention with its
    about-entity, optionally the entity's sameAs target — bindings exist
    iff the doc's alias index j ≥ 1, so counts are doc_id arithmetic."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    docs = _t(spark, sf_dir, "documents")
    # persist: match_bgp_extended scans the quad plan once per pattern
    # (2 branches here) — without the cache the mapInPandas expansion
    # recomputes per branch (CLAUDE.md r02 lesson, VERDICT r02 #1)
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rows = match_bgp_extended(
        quads,
        [("?m", f"{KG}vocab#about", "?e")],
        optional=[("?e", "http://www.w3.org/2002/07/owl#sameAs", "?t")])
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.count("t").cast("long").alias("n_with_sameas"))


def q_kg_bgp_union_about_sameas(spark, sf_dir) -> DataFrame:
    """SPARQL UNION: {?s about ?o} UNION {?s sameAs ?o} — the mention→
    entity pairs plus the distinct alias-chain edges, one NULL-pad-free
    union of compatible solution sets. Fully doc_id-arithmetic."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rows = match_bgp_extended(
        quads,
        [("?s", f"{KG}vocab#about", "?o")],
        union=[[("?s", _OWL_SAMEAS, "?o")]])
    return rows.orderBy("s", "o")


def q_kg_bgp_negation_counts(spark, sf_dir) -> DataFrame:
    """The two SPARQL negation forms, distinguished: FILTER NOT EXISTS
    and MINUS agree when the groups share a variable (mentions whose
    entity has no sameAs out-edge ⇔ alias index 0), but a MINUS group
    sharing NO variable removes nothing (spec domain-disjointness rule)
    even though the group matches — all three counts are doc_id math."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    pat = [("?m", f"{KG}vocab#about", "?e")]
    neg = [("?e", _OWL_SAMEAS, "?t")]
    disjoint = [("?x", _OWL_SAMEAS, "?y")]  # matches, but shares no var
    a = match_bgp_extended(quads, pat, not_exists=neg).agg(
        F.count(F.lit(1)).cast("long").alias("n_not_exists"))
    b = match_bgp_extended(quads, pat, minus=neg).agg(
        F.count(F.lit(1)).cast("long").alias("n_minus_shared"))
    c = match_bgp_extended(quads, pat, minus=disjoint).agg(
        F.count(F.lit(1)).cast("long").alias("n_minus_disjoint"))
    return a.crossJoin(b).crossJoin(c)


def q_kg_bgp_values_mentions(spark, sf_dir) -> DataFrame:
    """SPARQL VALUES: inline bindings constrain ?e to three base aliases;
    e/3/a0 and e/4/a0 are always mentioned (alias index provably 0 for
    those residues) while e/1/a0 never is (doc_id ≡ 1 mod 500 is odd →
    alias index 1) — the unmatched binding row must contribute nothing."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp_extended
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rows = match_bgp_extended(
        quads,
        [("?m", f"{KG}vocab#about", "?e")],
        values=(["e"], [(f"{KG}e/3/a0",), (f"{KG}e/4/a0",),
                        (f"{KG}e/1/a0",)]))
    return rows.orderBy("m")


def q_kg_construct_entity_graph(spark, sf_dir) -> DataFrame:
    """SPARQL CONSTRUCT contract gate: instantiate an inverted
    entity-centric graph (?e mentionedBy ?m; ?e a Entity) from the
    mention BGP; per-predicate quad counts are doc_id arithmetic
    (mentionedBy = one per doc; type = distinct mentioned aliases)."""
    from rdflib_jsonld_spark.operators.bgp import construct
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    vocab = KG + "vocab#"
    out = construct(
        quads,
        where=[("?m", vocab + "about", "?e"),
               ("?m", rdf_type, vocab + "Mention")],
        template=[("?e", vocab + "mentionedBy", "?m"),
                  ("?e", rdf_type, vocab + "Entity")])
    return (out.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy("p"))


def q_kg_framed_mentions(spark, sf_dir) -> DataFrame:
    """Document-level JSON-LD 1.1 FRAMING (jsonld/frame.py via
    operators/docops.frame_documents_stage): every block framed by
    ``{"@type": "Mention"}`` — exactly one match per block, and the
    @once-embedded ``about`` alias node carries an owl:sameAs edge iff
    its alias index j = doc_id %% (1 + (doc_id%%500)%%3) >= 1, so
    per-source match/embed totals are pure doc_id arithmetic."""
    from rdflib_jsonld_spark.operators.docops import frame_documents_stage
    from rdflib_jsonld_spark.sources.registry import CONTEXT_V1_IRI
    docs = _t(spark, sf_dir, "documents")
    framed = frame_documents_stage(
        documents_as_transcripts(docs),
        {"@context": CONTEXT_V1_IRI, "@type": "Mention"})
    return (framed.groupBy(F.col("conv_id").alias("source"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_blocks"),
                 F.sum("n_nodes").cast("long").alias("n_matched"),
                 F.sum(F.col("doc_json").contains("sameAs").cast("long"))
                 .cast("long").alias("n_embedded"))
            .orderBy("source"))


def q_kg_graph_dedup_canonical(spark, sf_dir) -> DataFrame:
    """GRAPH-level dedup via RDFC-1.0 canonical hashing
    (jsonld/canonicalize.py + docops.canonical_hash_stage): strip the
    instance-unique mention id + turn edge, canonicalize each block's
    dataset, and count DISTINCT canonical hashes per source. Two blocks
    collide iff they are isomorphic, which by construction happens iff
    they share (entity, alias j, surface variant) = (doc_id%%500,
    doc_id%%(1+ent%%3), doc_id%%5) — exact doc_id arithmetic."""
    from rdflib_jsonld_spark.operators.docops import canonical_hash_stage

    def strip_instance_ids(doc):
        nodes = doc.get("@graph", [])
        out = []
        for n in nodes:
            if isinstance(n, dict) and n.get("@type") == "Mention":
                n = {k: v for k, v in n.items()
                     if k not in ("id", "turn")}
            out.append(n)
        return {**doc, "@graph": out}

    docs = _t(spark, sf_dir, "documents")
    hashes = canonical_hash_stage(documents_as_transcripts(docs),
                                  prepare=strip_instance_ids)
    return (hashes.groupBy(F.col("conv_id").alias("source"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_blocks"),
                 F.countDistinct("canon_hash").cast("long")
                 .alias("n_graphs"))
            .orderBy("source"))


def q_kg_directmap_nation_quads(spark, sf_dir) -> DataFrame:
    """W3C Direct Mapping (operators/directmap.py): the nation table →
    quads, VALUE-EXACT — row IRIs, type triples, xsd-typed literals and
    the FK reference triple to region are all reconstructed string-for-
    string by the DuckDB oracle."""
    from rdflib_jsonld_spark.operators.directmap import table_to_quads
    quads = table_to_quads(
        _t(spark, sf_dir, "nation"), "nation", pk=["n_nationkey"],
        fks={"n_regionkey": ("region", ["r_regionkey"])})
    return (quads.select("s", "p", "o_kind", "o_value", "o_datatype")
            .orderBy("s", "p", "o_value"))


def q_kg_directmap_sparql_join(spark, sf_dir) -> DataFrame:
    """Relational→KG→SPARQL round trip: direct-map region + nation,
    then a SPARQL text query joins them through the FK reference
    triple — the answer must equal the plain SQL join on the source
    tables."""
    from rdflib_jsonld_spark.operators.directmap import tables_to_quads
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = tables_to_quads(
        {"nation": _t(spark, sf_dir, "nation"),
         "region": _t(spark, sf_dir, "region")},
        pks={"nation": ["n_nationkey"], "region": ["r_regionkey"]},
        fks={"nation": {"n_regionkey": ("region", ["r_regionkey"])}})
    return sparql(quads, """
        SELECT ?rname (COUNT(?n) AS ?n_nations)
        WHERE {
          ?n <http://example.org/db/nation#ref-n_regionkey> ?r .
          ?r <http://example.org/db/region#r_name> ?rname .
        }
        GROUP BY ?rname ORDER BY ?rname""")


def q_kg_rdfs_customer_types(spark, sf_dir) -> DataFrame:
    """RDFS entailment materialization (operators/inference.py):
    customers typed by their nation class, nation ⊑ region ⊑ urn:Geo
    — after rdfs_closure every customer carries its nation, region AND
    urn:Geo types, so per-class instance counts equal the plain SQL
    rollups (depth-2 rdfs9 through the rdfs11 closure)."""
    from rdflib_jsonld_spark.operators.inference import (RDF_TYPE, RDFS,
                                                         rdfs_closure)
    B = "http://example.org/db/"

    def quad(df, s, p, o):
        return df.select(
            F.lit(None).cast("string").alias("g"), s.alias("s"),
            F.lit(False).alias("s_is_bnode"), F.lit(p).alias("p"),
            F.lit("iri").alias("o_kind"), o.alias("o_value"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"))

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    nation_cls = F.concat(F.lit(f"{B}nation/n_nationkey="),
                          F.col("c_nationkey").cast("string"))
    quads = quad(cust, F.concat(F.lit(f"{B}customer/c_custkey="),
                                F.col("c_custkey").cast("string")),
                 RDF_TYPE, nation_cls) \
        .unionByName(quad(
            nation,
            F.concat(F.lit(f"{B}nation/n_nationkey="),
                     F.col("n_nationkey").cast("string")),
            RDFS + "subClassOf",
            F.concat(F.lit(f"{B}region/r_regionkey="),
                     F.col("n_regionkey").cast("string")))) \
        .unionByName(quad(
            region,
            F.concat(F.lit(f"{B}region/r_regionkey="),
                     F.col("r_regionkey").cast("string")),
            RDFS + "subClassOf", F.lit("urn:Geo")))
    closed = rdfs_closure(quads)
    return (closed.where(F.col("p") == RDF_TYPE)
            .groupBy(F.col("o_value").alias("cls"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_instances"))
            .orderBy("cls"))


def q_kg_shacl_report(spark, sf_dir) -> DataFrame:
    """SHACL-core validation (operators/validation.py) over the
    transcript KG: the about-target class constraint fails for EVERY
    mention (alias nodes carry no rdf:type), the surface lowercase
    pattern fails exactly for the Initcap/UPPER variants
    (doc_id%%5 ∈ {1,3}), and min/max-count constraints hold — so the
    per-constraint violation counts are pure doc_id arithmetic."""
    from rdflib_jsonld_spark.operators.validation import validate
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    report = validate(quads, [{
        "id": "MentionShape",
        "target_class": f"{KG}vocab#Mention",
        "properties": [
            {"path": f"{KG}vocab#about", "min_count": 1,
             "class": f"{KG}vocab#Entity"},
            {"path": f"{KG}vocab#surface", "pattern": "^[a-z]"},
            {"path": f"{KG}vocab#turn", "max_count": 1},
        ]}])
    return (report.groupBy("path", "constraint")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .orderBy("path", "constraint"))


def q_kg_shacl_extended(spark, sf_dir) -> DataFrame:
    """The r03 SHACL constraint families on planted arithmetic:
    has_value misses for every mention (confidence is 0.9, target 0.95
    → n_docs focus violations), equals between about and turn fails in
    both directions (2·n_docs value rows), the closed shape flags
    exactly the undeclared turn edge (n_docs), and unique_lang over the
    lang-free surface stays silent (no row)."""
    from rdflib_jsonld_spark.operators.validation import validate
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    report = validate(quads, [{
        "id": "MentionExt",
        "target_class": f"{KG}vocab#Mention",
        "closed": True,
        "properties": [
            {"path": f"{KG}vocab#confidence", "has_value": "0.95"},
            {"path": f"{KG}vocab#surface", "unique_lang": True},
            {"path": f"{KG}vocab#about", "equals": f"{KG}vocab#turn"},
        ]}])
    return (report.groupBy("constraint")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .orderBy("constraint"))


def q_kg_expanded_node_counts(spark, sf_dir) -> DataFrame:
    """Document-level Expansion ([spec] JLD-API §5.1) as a Spark stage:
    per-conversation expanded block/node totals, arithmetically
    predictable from doc_id (sources/doc_transcripts.py construction)."""
    from rdflib_jsonld_spark.operators.docops import expanded_node_counts
    docs = _t(spark, sf_dir, "documents")
    return expanded_node_counts(documents_as_transcripts(docs))


def q_kg_flattened_node_counts(spark, sf_dir) -> DataFrame:
    """Document-level Flattening ([spec] JLD-API §5.2-5.3): labeled-node
    totals per conversation. Referenced-only nodes collapse into node
    references, so counts equal the expansion arithmetic."""
    from rdflib_jsonld_spark.operators.docops import flatten_documents_stage
    docs = _t(spark, sf_dir, "documents")
    return (flatten_documents_stage(documents_as_transcripts(docs))
            .groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_blocks"),
                 F.sum("n_nodes").cast("long").alias("n_nodes"))
            .orderBy("conv_id"))


def q_kg_compact_roundtrip(spark, sf_dir) -> DataFrame:
    """Distributed conformance gate: expand→compact→to-rdf must reproduce
    the directly-emitted graph (bnode-iso) for EVERY block; the oracle
    asserts n_ok == n_blocks per conversation."""
    from rdflib_jsonld_spark.operators.docops import compact_roundtrip_stage
    docs = _t(spark, sf_dir, "documents")
    return (compact_roundtrip_stage(documents_as_transcripts(docs))
            .groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_blocks"),
                 F.sum(F.col("ok").cast("long")).cast("long").alias("n_ok"))
            .orderBy("conv_id"))


def q_kg_nquads_roundtrip(spark, sf_dir) -> DataFrame:
    """N-Quads sink/source round trip fully in-plan: serialize the raw quad
    stream to N-Quads lines with JVM column algebra, re-parse with the
    pure-core parser, count objects by kind — predictable from doc_id
    arithmetic (iri objects = type+about+turn+j sameAs; literals =
    surface+confidence)."""
    from rdflib_jsonld_spark.sources.nquads_io import (
        nquads_lines, parse_nquads_lines)
    docs = _t(spark, sf_dir, "documents")
    quads = expand_transcripts(documents_as_transcripts(docs))
    back = parse_nquads_lines(nquads_lines(quads))
    return (back.groupBy("o_kind")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("o_kind"))


def q_kg_turtle_roundtrip(spark, sf_dir) -> DataFrame:
    """Turtle/TriG sink/source round trip fully in-plan: dedup the quad
    stream (the sink is set-semantic — [spec] RDF 1.1 §3.1), serialize
    each partition to a standalone TriG document, re-parse with the
    pure-core grammar, count objects by kind. Counts are doc_id
    arithmetic: iri = type+about+turn per doc + DISTINCT sameAs pairs
    (dedup collapses cross-document repeats); literal = surface+
    confidence per doc."""
    from rdflib_jsonld_spark.sources.turtle_io import (
        parse_turtle_documents, turtle_part_documents)
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs)))
    back = parse_turtle_documents(turtle_part_documents(quads, trig=True))
    return (back.groupBy("o_kind")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy("o_kind"))


def q_kg_entity_pagerank(spark, sf_dir) -> DataFrame:
    """Entity-importance ranking over the alias graph: symmetrized
    owl:sameAs edges → 5 fixed PageRank power iterations
    (operators/graphstats.py). Fixed iteration count makes the recurrence
    exactly replicable by an unrolled SQL oracle; ranks rounded to 8
    decimals on both sides (the star sums are ≤3 doubles, so fp
    accumulation-order noise is ≪ the rounding grain)."""
    from rdflib_jsonld_spark.operators.graphstats import pagerank
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs)))
    sameas = quads.where(F.col("p") == _OWL_SAMEAS) \
        .select(F.col("s").alias("src"), F.col("o_value").alias("dst"))
    edges = sameas.unionByName(
        sameas.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr = pagerank(edges, iterations=5)
    return (pr.select("node", F.round("rank", 8).alias("rank"))
            .orderBy("node"))


def q_kg_cooccurrence_triangles(spark, sf_dir) -> DataFrame:
    """Triangle census (operators/graphstats.triangle_stats) over the
    entity co-occurrence graph mined from the quad table: entities whose
    mentions share a conversation get an edge (about ⋈ turn on the
    mention subject). By construction each source is a disjoint entity
    clique, so the census is exact combinatorics per source-group size —
    the SQL oracle computes Σ C(n_k,2) / Σ C(n_k,3) / Σ n_k·C(n_k-1,2)."""
    from rdflib_jsonld_spark.operators.graphstats import triangle_stats
    docs = _t(spark, sf_dir, "documents")
    # persist: about + turn branches both scan the Python expansion
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    vocab = KG + "vocab#"
    about = quads.where(F.col("p") == vocab + "about").select(
        F.col("s").alias("m"),
        F.regexp_extract("o_value", r"e/([0-9]+)/", 1).alias("ent"))
    turn = quads.where(F.col("p") == vocab + "turn").select(
        F.col("s").alias("m"),
        F.regexp_extract("o_value", r"conv/([^/]+)/", 1).alias("conv"))
    occ = (about.join(turn, "m").select("conv", "ent").distinct()
           .persist())
    a = occ.select("conv", F.col("ent").alias("src"))
    b = occ.select(F.col("conv").alias("cb"), F.col("ent").alias("dst"))
    edges = (a.join(b, (a.conv == b.cb) & (a.src < b.dst))
             .select("src", "dst"))
    res = triangle_stats(edges)
    return res.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round("clustering_coefficient", 6).alias("clustering_coefficient"))


def q_kg_owl_property_closure(spark, sf_dir) -> DataFrame:
    """OWL property-rule materialization
    (operators/inference.owl_property_closure): plant three ontology
    declarations over the documents KG — about owl:inverseOf aboutOf,
    owl:sameAs Symmetric + Transitive — then count the materialized
    about/aboutOf/sameAs edges. aboutOf = |about| = n_docs; the
    sameAs count is the symmetric-transitive closure of the alias
    chains (complete digraphs with self-loops per chain), which the
    oracle computes with a recursive CTE."""
    from rdflib_jsonld_spark.operators.inference import (
        OWL, RDF_TYPE as _RT, owl_property_closure)
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs)))
    vocab = KG + "vocab#"
    decl = spark.createDataFrame([
        (None, vocab + "about", False, OWL + "inverseOf", "iri",
         vocab + "aboutOf", None, None),
        (None, _OWL_SAMEAS, False, _RT, "iri",
         OWL + "SymmetricProperty", None, None),
        (None, _OWL_SAMEAS, False, _RT, "iri",
         OWL + "TransitiveProperty", None, None),
    ], quads.select("g", "s", "s_is_bnode", "p", "o_kind", "o_value",
                    "o_datatype", "o_lang").schema)
    out = owl_property_closure(
        quads.select("g", "s", "s_is_bnode", "p", "o_kind", "o_value",
                     "o_datatype", "o_lang").unionByName(decl))
    return (out.where(F.col("p").isin(vocab + "about", vocab + "aboutOf",
                                      _OWL_SAMEAS))
            .groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy("p"))


def q_kg_bfs_distances(spark, sf_dir) -> DataFrame:
    """Frontier-expansion BFS (graphstats.bfs_distances) on the entity
    chain graph (consecutive entity ids linked): undirected distances
    from entity 0 within 12 hops are exactly 0..12 — closed-form
    oracle; the Spark side runs the real iterative join levels."""
    from rdflib_jsonld_spark.operators.graphstats import bfs_distances
    docs = _t(spark, sf_dir, "documents")
    ents = docs.select((F.col("doc_id") % 500).cast("long").alias("e")) \
        .distinct()
    edges = (ents.where(F.col("e") < 499)
             .select(F.col("e").cast("string").alias("src"),
                     (F.col("e") + 1).cast("string").alias("dst")))
    res = bfs_distances(edges, ["0"], max_depth=12, directed=False)
    return (res.select(F.col("node").cast("long").alias("entity"),
                       F.col("dist").cast("long").alias("dist"))
            .orderBy("entity"))


def q_kg_weighted_distances(spark, sf_dir) -> DataFrame:
    """Frontier Bellman-Ford SSSP (graphstats.weighted_distances) on a
    weighted DAG over the entity ids (+1 hops cost 3/4 alternating, +2
    hops cost 5/6/7 cycling): the oracle enumerates ALL path sums with
    a recursive CTE (terminates — DAG) and takes the per-node minimum;
    the Spark side runs the real iterative relaxation rounds."""
    from rdflib_jsonld_spark.operators.graphstats import weighted_distances
    docs = _t(spark, sf_dir, "documents")
    ents = docs.select((F.col("doc_id") % 40).cast("long").alias("e")) \
        .distinct()
    hop1 = ents.where(F.col("e") < 39).select(
        F.col("e").cast("string").alias("src"),
        (F.col("e") + 1).cast("string").alias("dst"),
        (F.lit(3) + F.col("e") % 2).cast("long").alias("weight"))
    hop2 = ents.where(F.col("e") < 38).select(
        F.col("e").cast("string").alias("src"),
        (F.col("e") + 2).cast("string").alias("dst"),
        (F.lit(5) + F.col("e") % 3).cast("long").alias("weight"))
    res = weighted_distances(hop1.unionByName(hop2), ["0"],
                             directed=True, max_iters=45)
    return (res.select(F.col("node").cast("long").alias("entity"),
                       F.col("dist").cast("long").alias("dist"))
            .orderBy("entity"))


def q_kg_lpa_communities(spark, sf_dir) -> DataFrame:
    """Label-propagation community detection
    (operators/graphstats.label_propagation) on the entity co-occurrence
    graph: 2 synchronous rounds with the min-label tie-break. The oracle
    replays the recurrence generically in SQL (per-round vote counts +
    row_number argmax with the same (count DESC, label ASC) order) —
    per-community member counts must match exactly."""
    from rdflib_jsonld_spark.operators.graphstats import label_propagation
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    vocab = KG + "vocab#"
    about = quads.where(F.col("p") == vocab + "about").select(
        F.col("s").alias("m"),
        F.regexp_extract("o_value", r"e/([0-9]+)/", 1).alias("ent"))
    turn = quads.where(F.col("p") == vocab + "turn").select(
        F.col("s").alias("m"),
        F.regexp_extract("o_value", r"conv/([^/]+)/", 1).alias("conv"))
    occ = about.join(turn, "m").select("conv", "ent").distinct()
    a = occ.select("conv", F.col("ent").alias("src"))
    b = occ.select(F.col("conv").alias("cb"), F.col("ent").alias("dst"))
    edges = (a.join(b, (a.conv == b.cb) & (a.src < b.dst))
             .select("src", "dst"))
    res = label_propagation(edges, iterations=2)
    return (res.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("label"))


def q_kg_bgp_mention_counts(spark, sf_dir) -> DataFrame:
    """BGP matching over the constructed graph: mentions typed Mention
    with an about edge, counted per (pre-canonicalization) entity alias —
    predictable from doc_id arithmetic → full SQL oracle."""
    from rdflib_jsonld_spark.operators.bgp import match_bgp
    docs = _t(spark, sf_dir, "documents")
    # persist: the 2-pattern BGP scans the quad plan twice (r02 bench
    # regression 1.33s→2.79s was exactly this recompute-per-branch)
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    vocab = KG + "vocab#"
    res = match_bgp(quads, [
        ("?m", vocab + "about", "?e"),
        ("?m", rdf_type, vocab + "Mention"),
    ])
    return (res.groupBy("e").agg(F.count(F.lit(1)).alias("n_mentions"))
            .orderBy("e"))


def q_kg_bgp_group_aggregates(spark, sf_dir) -> DataFrame:
    """SPARQL SELECT aggregation layer (solutions.sparql_select): per
    entity alias, COUNT / COUNT DISTINCT / SAMPLE / a BIND-derived alias
    index, with HAVING + ORDER + LIMIT — every value doc_id arithmetic,
    so the whole SELECT pipeline gets an exact SQL oracle. SAMPLE is the
    documented deterministic min."""
    from rdflib_jsonld_spark.operators.solutions import sparql_select
    docs = _t(spark, sf_dir, "documents")
    # persist: the 2-pattern BGP scans the Python expansion twice
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    vocab = KG + "vocab#"
    return sparql_select(
        quads,
        [("?m", rdf_type, vocab + "Mention"), ("?m", vocab + "about", "?e")],
        # ordered BINDs: the 2nd and 3rd reference the 1st
        bind=[("cast(regexp_extract(e, 'e/([0-9]+)/', 1) as int)", "?ent"),
              ("ent % 50", "?grp"),
              ("cast(regexp_extract(e, 'a([0-9]+)$', 1) as int)", "?j")],
        group_by=["?grp"],
        aggregates=[("count", "?m", "n_mentions"),
                    ("count_distinct", "?e", "n_aliases"),
                    ("sample", "?m", "first_mention"),
                    ("max", "?j", "max_alias_idx")],
        having=["n_mentions > 1"],
        order_by=["desc(n_mentions)", "?grp"],
        limit=25)


def q_kg_sparql_text_aggregate(spark, sf_dir) -> DataFrame:
    """SPARQL *text* front-end (operators/sparql.py): a full query
    string — prologue, ``a`` keyword, ``;`` elision, BIND over
    STRBEFORE/STRAFTER, GROUP BY + 3 aggregate kinds, HAVING that
    reuses a projected aggregate, ORDER BY + LIMIT — parsed and
    compiled onto the same operators the kwargs surface uses. Every
    value is doc_id arithmetic → exact SQL oracle."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    # persist: the 2-pattern BGP scans the Python expansion twice
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    return sparql(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?grp (COUNT(?m) AS ?n_mentions)
               (COUNT(DISTINCT ?e) AS ?n_aliases)
               (MIN(?m) AS ?first_mention)
        WHERE {{
          ?m a v:Mention ; v:about ?e .
          BIND(xsd:integer(STRBEFORE(STRAFTER(STR(?e), "/e/"), "/a"))
               AS ?enti)
          BIND(xsd:integer(?enti - 50 * xsd:integer(FLOOR(?enti / 50)))
               AS ?grp)
        }}
        GROUP BY ?grp
        HAVING (COUNT(?m) > 5)
        ORDER BY DESC(?n_mentions) ?grp
        LIMIT 30""")


def q_kg_sparql_text_union_negation(spark, sf_dir) -> DataFrame:
    """Text-layer UNION + per-branch BIND + FILTER NOT EXISTS: three
    branches tag their solutions with a kind; the third branch (mentions
    without a turn edge) is provably empty, so its group must be absent.
    alias_link count per entity = max alias index seen (doc_id
    arithmetic — the dedup'd sameAs chain edges are {1..max_j})."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    return sparql(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX owl: <http://www.w3.org/2002/07/owl#>
        SELECT ?kind (COUNT(*) AS ?n)
        WHERE {{
          {{ ?m a v:Mention . BIND("mention" AS ?kind) }}
          UNION
          {{ ?x owl:sameAs ?y . BIND("alias_link" AS ?kind) }}
          UNION
          {{ ?m2 a v:Mention .
             FILTER NOT EXISTS {{ ?m2 v:turn ?t }}
             BIND("orphan" AS ?kind) }}
        }}
        GROUP BY ?kind ORDER BY ?kind""")


def q_kg_sparql_text_ask(spark, sf_dir) -> DataFrame:
    """ASK form through the text layer: a provably-true pattern (any
    mention exists) and a provably-false one (a mention with no turn
    edge), labeled and unioned — limit(1)+count gate, no full scan
    materialization."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    pfx = f"PREFIX v: <{KG}vocab#>\n"
    a1 = sparql(quads, pfx + "ASK { ?m a v:Mention }") \
        .select(F.lit("any_mention").alias("which"), "ask")
    a2 = sparql(quads, pfx + """ASK { ?m a v:Mention .
        FILTER NOT EXISTS { ?m v:turn ?t } }""") \
        .select(F.lit("orphan_mention").alias("which"), "ask")
    return a1.unionByName(a2).orderBy("which")


def q_kg_sparql_text_describe(spark, sf_dir) -> DataFrame:
    """DESCRIBE form through the text layer: the mention node of doc 0
    — per-predicate quad counts of its concise description (exactly
    one quad for each of the 5 mention properties)."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    res = sparql(quads, f"DESCRIBE <{KG}m/doc/0>")
    return (res.groupBy("p")
            .agg(F.count(F.lit(1)).cast("long").alias("n_quads"))
            .orderBy("p"))


def q_kg_sparql_text_path(spark, sf_dir) -> DataFrame:
    """Text-layer property path: ``?src owl:sameAs+ ?dst`` parsed from
    the query string (path grammar in predicate position → match_path
    plus-closure). Reach counts are doc_id arithmetic: alias a_k
    reaches exactly k lower aliases."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    return sparql(quads, """
        PREFIX owl: <http://www.w3.org/2002/07/owl#>
        SELECT ?src (COUNT(?dst) AS ?n_reach)
        WHERE { ?src owl:sameAs+ ?dst }
        GROUP BY ?src ORDER BY ?src""")


def q_kg_sparql_text_subquery(spark, sf_dir) -> DataFrame:
    """Text-layer sub-SELECT (§12): an aggregate subquery (per-alias
    mention counts) joins an outer property-path pattern, then the
    outer query re-aggregates — the analytics shape (aggregate →
    join → aggregate) that needs nesting. Oracle is doc_id
    arithmetic: alias a_k of entity e is mentioned by docs with
    doc_id%500==e and doc_id%(1+e%3)==k, and reaches exactly k lower
    aliases through the sameAs chain."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    return sparql(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX owl: <http://www.w3.org/2002/07/owl#>
        SELECT ?e ?n_m (COUNT(?y) AS ?n_reach)
        WHERE {{
          {{ SELECT ?e (COUNT(?m) AS ?n_m)
             WHERE {{ ?m a v:Mention ; v:about ?e }}
             GROUP BY ?e }}
          ?e owl:sameAs+ ?y .
        }}
        GROUP BY ?e ?n_m
        ORDER BY ?e""")


def q_kg_sparql_update_rewrite(spark, sf_dir) -> DataFrame:
    """SPARQL 1.1 Update (operators/update.py) as graph curation: a
    3-op sequence — DELETE WHERE drops every confidence quad, a
    DELETE/INSERT modify rewrites the sameAs alias edges to
    v:linked + a per-subject v:status tag, INSERT DATA stamps a
    revision quad — then per-predicate counts over the NEW store.
    Every count is doc_id arithmetic on the dedup'd transcript KG:
    about/surface/turn/type = n_docs, linked = Σ_e max_j(e) (dedup'd
    chain edges), status = distinct sources = the same Σ, rev = 1,
    confidence/sameAs gone."""
    from rdflib_jsonld_spark.operators.update import update
    docs = _t(spark, sf_dir, "documents")
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    updated = update(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX owl: <http://www.w3.org/2002/07/owl#>
        DELETE WHERE {{ ?m v:confidence ?c }} ;
        DELETE {{ ?x owl:sameAs ?y }}
        INSERT {{ ?x v:linked ?y . ?x v:status "merged" }}
        WHERE {{ ?x owl:sameAs ?y }} ;
        INSERT DATA {{ <urn:job> v:rev "r3" }}""")
    return (updated.groupBy("p")
            .agg(F.count(F.lit(1)).cast("long").alias("n_quads"))
            .orderBy("p"))


def q_kg_cc_distributed_documents(spark, sf_dir) -> DataFrame:
    """F2 connected components through the DISTRIBUTED large-star/small-
    star branch (driver_threshold=0 disables the driver union-find, so
    the plan provably runs the Kiveris-style alternating rounds to
    fixpoint). On the documents bridge the component structure is doc_id
    arithmetic: every entity's aliases a0..a_maxj collapse to a0."""
    from rdflib_jsonld_spark.operators.linking import (
        connected_components, mention_edges)
    docs = _t(spark, sf_dir, "documents")
    # persist: mention_edges scans the quad plan three times (sameAs,
    # mentions, surfaces) — cache so the Python expansion runs once
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    mapping = connected_components(mention_edges(quads), driver_threshold=0)
    return mapping.orderBy("node")


def q_kg_sameas_closure(spark, sf_dir) -> DataFrame:
    """SPARQL ``sameAs+`` property path: transitive closure (path
    doubling, O(log diameter) rounds) of the owl:sameAs edge set. The
    alias chains make the closure doc_id arithmetic: every (a_i, a_j)
    with 0 <= j < i <= maxj(entity)."""
    from rdflib_jsonld_spark.operators.linking import transitive_closure
    docs = _t(spark, sf_dir, "documents")
    # single-branch scan: the closure's own localCheckpoint materializes
    # the edge set, so no quad-table persist is needed here
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs)))
    edges = (quads.where((F.col("p") == _OWL_SAMEAS)
                         & (F.col("o_kind") == "iri"))
             .select(F.col("s").alias("src"),
                     F.col("o_value").alias("dst")))
    return transitive_closure(edges).orderBy("src", "dst")


def q_kg_path_alias_reach(spark, sf_dir) -> DataFrame:
    """SPARQL 1.1 property path ``?m about/(sameAs|^sameAs)* ?a`` over
    the documents bridge (operators/paths.py: parser + seq/alt/inv/star
    with seeded closure evaluation). The undirected sameAs star reaches
    EVERY alias of the mentioned entity — including, via the zero-length
    path, the about-target itself when the entity has no aliases — so
    per-alias mention counts are doc_id arithmetic: alias a_k of entity
    e (k = 0..maxj(e)) is reached by all count(e) mentions."""
    from rdflib_jsonld_spark.operators.paths import match_path, parse_path
    docs = _t(spark, sf_dir, "documents")
    # persist: the path's seq/star branches scan the quad plan from
    # multiple joins (about edges, sameAs edges, node universe)
    quads = dedup_quads(expand_transcripts(documents_as_transcripts(docs))) \
        .persist()
    path = parse_path(
        f"<{KG}vocab#about>/(<{_OWL_SAMEAS}>|^<{_OWL_SAMEAS}>)*")
    pairs = match_path(quads, "?m", path, "?a")
    return (pairs.groupBy("a")
            .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
            .orderBy("a"))


def q_kg_expand_error_metrics(spark, sf_dir) -> DataFrame:
    """A5/§4.3.3 metrics face, contract-gated: expand_with_metrics must
    count exactly the generator's planted malformed blocks in _kg_errors
    while emitting every quad from healthy blocks — the oracle re-counts
    both from the planted JSON with stdlib json only (no engine code)."""
    from rdflib_jsonld_spark.operators.expand import expand_with_metrics
    t = tr.transcripts_df(spark, n_convs=150, seed=42)
    out = expand_with_metrics(t)
    return out.agg(
        F.sum("_kg_errors").cast("long").alias("n_errors"),
        F.count(F.when(F.col("_kg_errors") == 0, 1)).cast("long")
        .alias("n_quads"))


def q_kg_top_predicates_transcripts(spark, sf_dir) -> DataFrame:
    # synthetic generator corpus (sf_dir-independent, deterministic seed)
    t = tr.transcripts_df(spark, n_convs=150, seed=42)
    quads = expand_transcripts(t)
    return (quads.groupBy("p").agg(F.count(F.lit(1)).alias("n_quads"))
            .orderBy(F.desc("n_quads"), F.asc("p")).limit(20))


def q_kg_canonical_mapping_transcripts(spark, sf_dir) -> DataFrame:
    t = tr.transcripts_df(spark, n_convs=150, seed=42)
    # persist: mention_edges is a 3-branch scan of the Python expansion
    quads = dedup_quads(expand_transcripts(t)).persist()
    return canonical_mapping(quads).orderBy("node")


def q_kg_sameas_edges_transcripts(spark, sf_dir) -> DataFrame:
    t = tr.transcripts_df(spark, n_convs=150, seed=42)
    quads = dedup_quads(expand_transcripts(t)).persist()
    return mention_edges(quads).orderBy("src", "dst")


# --------------------------------------------------------------------------
# relational operator surface (TPC-H-ish + windows + set ops + JSON)
# --------------------------------------------------------------------------

def q_tpch_q1_pricing_summary(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
             F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
             F.round(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count(F.lit(1)).alias("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3_shipping_priority(spark, sf_dir) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_tpch_q18_large_orders(spark, sf_dir) -> DataFrame:
    """Q18 shape (large-volume customers): group-HAVING over the fact
    table feeding a semi-join back into a 3-way join — the canonical
    hot-key aggregation + AQE-skew-join exercise."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 150)
           .select("l_orderkey"))
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
        .select("c_name", "c_custkey", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd")
                .alias("o_orderdate"),
                F.round("o_totalprice", 2).alias("o_totalprice"),
                F.round("total_qty", 2).alias("total_qty"))
    )


def q_tpch_q14_promo_revenue(spark, sf_dir) -> DataFrame:
    """Q14 shape (promotion effect): fact-to-dim broadcast join with a
    conditional aggregate — covers the `part` dimension table."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-06-01").cast("timestamp")))
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(
            100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                          .otherwise(F.lit(0.0)))
            / F.sum(rev), 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def q_tpch_q5_local_supplier(spark, sf_dir) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q_tpch_q6_forecast_revenue(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_rows")))


def q_orders_rank_window(spark, sf_dir) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (orders.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("o_custkey", "o_orderkey", "rn"))


def q_events_sessionize(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is exact
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = us - F.lag(us).over(w)
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (ev.withColumn("new_session", new_s)
            .groupBy("user_id")
            .agg(F.sum("new_session").cast("long").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy("user_id"))


def q_lineitem_cube(spark, sf_dir) -> DataFrame:
    """Grouping-sets breadth (SURVEY §2.E5): CUBE over
    (returnflag, linestatus) with sum/count metrics — Catalyst expands
    to one Expand + hash aggregate; the oracle is DuckDB's native
    GROUP BY CUBE. NULL group keys are the roll-up rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").cast("bigint").alias("sum_qty"),
                 F.count(F.lit(1)).alias("n_rows"))
            .orderBy(F.asc_nulls_first("l_returnflag"),
                     F.asc_nulls_first("l_linestatus")))


def q_events_funnel(spark, sf_dir) -> DataFrame:
    """Ordered-funnel analysis (operators/temporal.funnel_counts):
    signup → view → purchase with a 2-hour window from the anchor,
    leftmost-greedy binding (documented semantics). The oracle replays
    the identical greedy recurrence as chained min-aggregates in SQL."""
    from rdflib_jsonld_spark.operators.temporal import funnel_counts
    ev = _t(spark, sf_dir, "events") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    return funnel_counts(ev, ["signup", "view", "purchase"],
                         within_seconds=7200).orderBy("step_idx")


def q_events_rolling_value_sum(spark, sf_dir) -> DataFrame:
    """Window FRAME coverage (G1 beyond row_number/lag): per-user rolling
    sum over ROWS 2 PRECEDING..CURRENT — the deterministic frame makes
    the float sum engine-portable (same ≤3 addends in the same order)."""
    ev = _t(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return (ev.select("event_id", "user_id",
                      F.round(F.sum("value").over(w), 4).alias("rolling3"))
            .orderBy("event_id"))


def q_events_hourly_windows(spark, sf_dir) -> DataFrame:
    """Tumbling-window aggregation (the batch face of the streaming
    windowed agg, G1/I): F.window is epoch-aligned, so hourly buckets
    equal date_trunc('hour') — which is the DuckDB oracle."""
    ev = _t(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour")
    return (ev.groupBy(w.alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz")
                    .alias("window_start"), "event_type", "n", "sum_value")
            .orderBy("window_start", "event_type"))


def q_events_sliding_windows(spark, sf_dir) -> DataFrame:
    """SLIDING-window aggregation (1-hour window every 30 minutes —
    the overlapping-window face of G1/I that tumbling windows don't
    exercise): every event lands in exactly window÷slide = 2 windows.
    F.window is epoch-aligned, so the oracle materializes both
    candidate starts per event (trunc-to-30min and 30min earlier) and
    aggregates the union."""
    ev = _t(spark, sf_dir, "events")
    w = F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes")
    return (ev.groupBy(w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp_ntz")
                    .alias("window_start"), "n", "sum_value")
            .orderBy("window_start"))


def q_events_session_windows(spark, sf_dir) -> DataFrame:
    """NATIVE session windows (F.session_window, 30-minute gap) — the
    engine-managed counterpart of the lag/cumsum sessionization in
    events_sessionize, usable identically under Structured Streaming.
    The oracle derives the same sessions relationally: a new session
    starts where the gap from the previous event exceeds the timeout,
    session id = running sum of starts, then per-session start/end/
    count."""
    ev = _t(spark, sf_dir, "events") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("w.start").cast("timestamp_ntz")
                    .alias("session_start"),
                    "n_events")
            .orderBy("user_id", "session_start"))


def q_events_json_stats(spark, sf_dir) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("k").alias("sum_k"),
                 F.round(F.avg("value"), 4).alias("avg_value"))
            .orderBy("event_type"))


def q_events_asof_attribution(spark, sf_dir) -> DataFrame:
    """As-of join (union + window forward-fill, one shuffle): each
    purchase event attributed to the user's most recent click at or
    before it. DuckDB's native ASOF JOIN is the oracle."""
    from rdflib_jsonld_spark.operators.temporal import asof_join
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    clicks = ev.where(F.col("event_type") == "click") \
        .select("user_id", F.col("event_id").alias("click_id"), "ts")
    joined = asof_join(purchases, clicks, ["user_id"],
                       left_ts="ts", right_ts="ts")
    return (joined.select(
        "event_id", "user_id",
        F.round("value", 2).alias("value"),
        F.col("asof_click_id").alias("click_id"),
        F.round(
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("asof_ts").cast("timestamp")))
            / 1e6, 3).alias("gap_seconds"))
        .orderBy("event_id"))


def q_lineitem_percentiles(spark, sf_dir) -> DataFrame:
    """Exact distribution stats per return flag (percentile is exact and
    engine-portable, unlike approx_percentile — the contract-checkable
    member of the H3 numeric family)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (li.groupBy("l_returnflag")
            .agg(F.round(pct[0], 4).alias("p50"),
                 F.round(pct[1], 4).alias("p90"),
                 F.round(pct[2], 4).alias("p99"),
                 F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd"))
            .orderBy("l_returnflag"))


def q_customers_with_orders_semijoin(spark, sf_dir) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("c_nationkey"))


def q_returnflag_set_ops(spark, sf_dir) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    early = li.where(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")) \
        .select("l_returnflag", "l_linestatus").distinct()
    late = li.where(F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) \
        .select("l_returnflag", "l_linestatus").distinct()
    return (early.intersect(late)
            .unionByName(early.exceptAll(late))
            .orderBy("l_returnflag", "l_linestatus"))


# --------------------------------------------------------------------------
# training-data operators over documents/embeddings
# --------------------------------------------------------------------------

def q_doc_token_stats(spark, sf_dir) -> DataFrame:
    docs = with_token_counts(_t(spark, sf_dir, "documents"))
    return (docs.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("n_ws_tokens"), 4).alias("avg_ws_tokens"),
                 F.round(F.avg("n_bpe_tokens"), 4).alias("avg_bpe_tokens"),
                 F.round(F.avg(F.length("text")), 4).alias("avg_chars"))
            .orderBy("lang"))


def q_doc_quality_by_source(spark, sf_dir) -> DataFrame:
    docs = with_quality_score(_t(spark, sf_dir, "documents"))
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("quality_score"), 4).alias("avg_quality"),
                 F.round(F.avg("punct_ratio"), 6).alias("avg_punct_ratio"),
                 F.round(F.avg("stopword_ratio"), 6).alias("avg_stop_ratio"))
            .orderBy("source"))


def q_doc_chunk_stats(spark, sf_dir) -> DataFrame:
    """Sliding-window chunking (JVM sequence/explode/substring, no
    Python): per-source chunk counts and size stats — the windowing op
    every training pipeline runs before tokenization. The oracle
    replicates the chunk grid with generate_series + substr."""
    from rdflib_jsonld_spark.operators.textstats import chunk_documents
    ch = chunk_documents(_t(spark, sf_dir, "documents"),
                         chunk_chars=500, overlap=50)
    return (ch.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.countDistinct("doc_id").alias("n_docs"),
                 F.max("chunk_idx").cast("long").alias("max_chunk_idx"),
                 F.round(F.avg(F.length("chunk_text")), 4)
                 .alias("avg_chunk_chars"))
            .orderBy("source"))


def q_doc_decontam_flags(spark, sf_dir) -> DataFrame:
    """Benchmark decontamination (curation.flag_contaminated): docs with
    doc_id % 97 == 0 play the eval set; every other doc sharing a word
    5-gram with it is flagged. Broadcast semi-join against the benchmark
    gram set — the corpus text never shuffles. Exact-replicable in SQL."""
    from rdflib_jsonld_spark.operators.curation import (
        benchmark_ngram_set, flag_contaminated)
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    # plant verbatim benchmark copies (id+1M) into the corpus: the flag
    # set must contain every plant (recall) on top of organic overlaps
    planted = bench.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    corpus = docs.where(F.col("doc_id") % 97 != 0).unionByName(planted)
    flags = flag_contaminated(corpus, benchmark_ngram_set(bench, n=5), n=5)
    return (flags.where("contaminated")
            .select("doc_id", "n_hits").orderBy("doc_id"))


def q_doc_repetition_scores(spark, sf_dir) -> DataFrame:
    """Gopher-style within-doc repetition (curation.repetition_scores):
    top-20 documents by duplicate word-3-gram fraction."""
    from rdflib_jsonld_spark.operators.curation import repetition_scores
    docs = _t(spark, sf_dir, "documents")
    return (repetition_scores(docs, n=3)
            .orderBy(F.desc("dup_frac"), F.asc("doc_id")).limit(20))


def q_doc_split_counts(spark, sf_dir) -> DataFrame:
    """Deterministic md5 train/val/test assignment
    (curation.assign_splits): the DuckDB oracle reproduces the identical
    per-document bucketing, so per-source × split counts must match
    exactly — the engine-independence guarantee the operator exists
    for."""
    from rdflib_jsonld_spark.operators.curation import assign_splits
    docs = _t(spark, sf_dir, "documents")
    return (assign_splits(docs, seed="v1").groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("source", "split"))


def q_doc_bm25_topk(spark, sf_dir) -> DataFrame:
    """Lexical retrieval (operators/search.py): inverted index over the
    documents corpus + BM25 top-15 for a multi-term query; the oracle
    recomputes the identical tokenization, collection stats and Lucene-
    smoothed scoring in SQL (scores rounded to 6 decimals)."""
    from rdflib_jsonld_spark.operators.search import bm25_topk, build_index
    docs = _t(spark, sf_dir, "documents")
    idx = build_index(docs)
    res = bm25_topk(idx, "spark window merge", k=15)
    return res.select("doc", F.round("score", 6).alias("score"))


_CLF_WEIGHTS = {b: (b % 7 - 3) * 0.8 for b in range(0, 64, 3)}


def q_doc_clf_scores(spark, sf_dir) -> DataFrame:
    """Hashed linear text classifier (operators/classify.py): per-source
    mean sigmoid score + positives under a fixed arithmetic weight
    vector. Scoring is a zero-shuffle map-literal projection; the oracle
    reproduces the identical md5 bucketing and weights in SQL (scores
    rounded to 6 decimals)."""
    from rdflib_jsonld_spark.operators.classify import (
        linear_text_classifier)
    docs = _t(spark, sf_dir, "documents")
    out = linear_text_classifier(docs, _CLF_WEIGHTS, bias=0.1,
                                 n_buckets=64)
    return (out.groupBy("source")
            .agg(F.round(F.avg("clf_score"), 6).alias("avg_score"),
                 F.sum(F.col("clf_label").cast("long")).cast("long")
                 .alias("n_positive"))
            .orderBy("source"))


def q_doc_clf_train(spark, sf_dir) -> DataFrame:
    """Distributed quality-classifier TRAINING (classify.
    train_linear_classifier): 5 rounds of seeded full-batch gradient
    descent for the hashed logistic model, label = (lang = 'en') — the
    fastText-style quality-filter fit a curation pipeline actually runs
    (Joulin et al. 2016). Driver state is exactly the 64-float weight
    vector + bias (the kmeans-centroid pattern); each round is one
    forward-pass hash agg (weights ship in the plan as a map literal,
    zero-join) plus one (bucket, residual) hash agg. The oracle replays
    the identical 5-round GD recurrence in SQL (weight table ⟕ per-round
    gradient); weights rounded to 6 decimals, bias emitted as
    bucket -1."""
    from rdflib_jsonld_spark.operators.classify import (
        train_linear_classifier)
    docs = _t(spark, sf_dir, "documents").withColumn(
        "y", (F.col("lang") == "en").cast("int"))
    w, bias = train_linear_classifier(docs, "y", n_buckets=64,
                                      lr=1.0, n_rounds=5)
    rows = [(-1, round(float(bias), 6))] + \
        [(b, round(float(wb), 6)) for b, wb in enumerate(w)]
    return spark.createDataFrame(rows, "bucket long, weight double") \
        .orderBy("bucket")


def _clf_train_oracle_sql(n_rounds: int, n_buckets: int,
                          lr: float) -> str:
    """Unrolled full-batch logistic-GD recurrence in DuckDB SQL —
    replays classify.train_linear_classifier round by round: forward
    pass (weight join + sigmoid), per-doc residual, per-bucket
    gradient, weight/bias update."""
    sql = [f"""WITH feat AS (
      SELECT doc_id, y, n, b, count(*)::DOUBLE AS c
      FROM (
        SELECT doc_id, (lang = 'en')::INT::DOUBLE AS y,
               len(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                 t -> t <> ''))::DOUBLE AS n,
               ('0x' || substr(md5(unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                   t -> t <> '')) || chr(31) || 'clf-v1'), 1, 8))::BIGINT
               % {n_buckets} AS b
        FROM documents)
      GROUP BY doc_id, y, n, b),
    nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    w0 AS (SELECT unnest(range(0, {n_buckets}))::BIGINT AS b,
                  0.0 AS wt),
    b0 AS (SELECT 0.0 AS bias)"""]
    for r in range(n_rounds):
        sql.append(f""",
    z{r} AS (
      SELECT f.doc_id, first(f.y) AS y, sum(w.wt * f.c / f.n) AS dot
      FROM feat f JOIN w{r} w USING (b)
      GROUP BY f.doc_id),
    r{r} AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-((SELECT bias FROM b{r}) + dot))) - y
               AS res
      FROM z{r}),
    g{r} AS (
      SELECT f.b, sum(r.res * f.c / f.n) AS g
      FROM feat f JOIN r{r} r USING (doc_id) GROUP BY f.b),
    w{r + 1} AS (
      SELECT w.b, w.wt - {lr} * coalesce(g.g, 0.0)
                         / (SELECT n_docs FROM nd) AS wt
      FROM w{r} w LEFT JOIN g{r} g USING (b)),
    b{r + 1} AS (
      SELECT bias - {lr} * (SELECT sum(res) FROM r{r})
                    / (SELECT n_docs FROM nd) AS bias
      FROM b{r})""")
    sql.append(f"""
    SELECT -1::BIGINT AS bucket, round(bias, 6) AS weight
    FROM b{n_rounds}
    UNION ALL SELECT b AS bucket, round(wt, 6) AS weight
    FROM w{n_rounds}
    ORDER BY bucket""")
    return "".join(sql)


def q_kg_chat_render(spark, sf_dir) -> DataFrame:
    """Training-document assembly (curation.render_chat_documents):
    one document per conversation with turns in stable turn order — the
    north rule's per-turn-text-equality invariant as an operator. The
    oracle rebuilds the identical string with ORDER BY string_agg and
    compares md5 + length per conversation."""
    from rdflib_jsonld_spark.operators.curation import (
        render_chat_documents)
    docs = _t(spark, sf_dir, "documents")
    tr = docs.select(F.col("source").alias("conv_id"),
                     F.col("doc_id").cast("int").alias("turn_idx"),
                     F.lit("user").alias("role"), "text")
    out = render_chat_documents(tr)
    return (out.select("conv_id", "n_turns",
                       F.length("doc_text").cast("long").alias("n_chars"),
                       F.md5("doc_text").alias("doc_md5"))
            .orderBy("conv_id"))


def q_supplier_fuzzy_pairs(spark, sf_dir) -> DataFrame:
    """Exact-recall fuzzy string join (operators/fuzzy.py, PassJoin-
    style segment pigeonhole): supplier names within edit distance 1 —
    the numbered-name corpus is dense in distance-1 pairs (digit
    substitutions). The oracle is an INDEPENDENT brute-force
    levenshtein over all pairs, so it checks the candidate scheme's
    recall, not just the verify stage."""
    from rdflib_jsonld_spark.operators.fuzzy import fuzzy_pairs
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("s"))
    return fuzzy_pairs(sup, max_dist=1).orderBy("id_a", "id_b")


def q_supplier_fuzzy_clusters(spark, sf_dir) -> DataFrame:
    """Fuzzy-surface clustering: exact-recall distance-1 pairs
    (operators/fuzzy.py) → connected components (linking.py) →
    (member, cluster_root) for every non-root member. The oracle
    recomputes components with a recursive closure over the
    brute-force pair graph — an independent path end to end."""
    from rdflib_jsonld_spark.operators.fuzzy import fuzzy_pairs
    from rdflib_jsonld_spark.operators.linking import connected_components
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_name").alias("s"))
    pairs = fuzzy_pairs(sup, max_dist=1)
    # keep ids NUMERIC through CC: the component root is the min, and
    # lexicographic string-min ("10" < "9") would disagree with the
    # oracle's numeric least()
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    return (comp.select(F.col("node").cast("long").alias("s_suppkey"),
                        F.col("root").cast("long").alias("cluster_root"))
            .where(F.col("s_suppkey") != F.col("cluster_root"))
            .orderBy("s_suppkey"))


def q_kg_r2rml_customer_quads(spark, sf_dir) -> DataFrame:
    """R2RML-style custom mapping (operators/r2rml.py): customer rows
    through IRI templates, a class map, a language-tagged label, and a
    nation-reference template. VALUE-sensitive gate: per predicate, the
    row count plus a sum of 32-bit md5 prefixes over (s ‖ o) — the
    oracle rebuilds every subject/object string in SQL and must land on
    the identical checksum."""
    from rdflib_jsonld_spark.operators.r2rml import triples_map_to_quads
    cust = _t(spark, sf_dir, "customer")
    ex = "http://e/"
    quads = triples_map_to_quads(cust, {
        "table": "customer",
        "subject": {"template": ex + "cust/{c_custkey}",
                    "class": ex + "Customer"},
        "predicates": [
            {"predicate": ex + "name", "column": "c_name"},
            {"predicate": ex + "label", "column": "c_name", "lang": "en"},
            {"predicate": ex + "nation",
             "template": ex + "nation/{c_nationkey}"},
            {"predicate": ex + "segment", "column": "c_mktsegment"},
        ]})
    chk = (F.conv(F.substring(
        F.md5(F.concat_ws("\x1f", F.col("s"), F.col("o_value"))), 1, 8),
        16, 10).cast("bigint"))
    return (quads.groupBy("p")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(chk).cast("long").alias("checksum"))
            .orderBy("p"))


def q_kg_ifp_sameas(spark, sf_dir) -> DataFrame:
    """Ontology-driven entity resolution (inference.owl_sameas_rules):
    customers mapped through R2RML with an InverseFunctionalProperty
    nation key → every same-nation customer pair is derived sameAs;
    per-nation pair counts are C(n_k, 2) — exact SQL arithmetic."""
    from rdflib_jsonld_spark.operators.inference import (
        OWL, RDF_TYPE as _RT, owl_sameas_rules)
    from rdflib_jsonld_spark.operators.r2rml import triples_map_to_quads
    cust = _t(spark, sf_dir, "customer")
    ex = "http://e/"
    quads = triples_map_to_quads(cust, {
        "table": "customer",
        "subject": {"template": ex + "cust/{c_custkey}"},
        "predicates": [
            {"predicate": ex + "nationKey",
             "template": ex + "nation/{c_nationkey}"}]})
    decl = spark.createDataFrame(
        [(None, ex + "nationKey", False, _RT, "iri",
          OWL + "InverseFunctionalProperty", None, None,
          "decl", 0)], quads.schema)
    pairs = owl_sameas_rules(quads.unionByName(decl))
    # group pairs by the shared nation (recoverable from either member)
    return (pairs
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.count_distinct(F.col("src")).cast("long")
                 .alias("n_src_distinct")))


def q_doc_c4_flags(spark, sf_dir) -> DataFrame:
    """C4 cleaning heuristics (curation.c4_quality_flags): line
    structure is PLANTED arithmetically (three terminal sentences for
    doc_id%3=0, a brace for %7=0, lorem ipsum for %11=0), and the
    oracle re-applies the identical construction AND the identical
    line analysis (regex + word count) in SQL."""
    from rdflib_jsonld_spark.operators.curation import c4_quality_flags
    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(
                "\nThis is a planted terminal sentence number one.\n"
                "And a second good planted line for keeping!\n"
                "Plus a third planted line that also qualifies."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" {"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" lorem ipsum"))
            .otherwise(F.lit(""))))
    flags = c4_quality_flags(planted)
    return flags.agg(
        F.sum("n_lines").cast("long").alias("total_lines"),
        F.sum("n_kept_lines").cast("long").alias("total_kept"),
        F.sum(F.col("has_lorem_ipsum").cast("long")).cast("long")
        .alias("n_lorem"),
        F.sum(F.col("has_brace").cast("long")).cast("long")
        .alias("n_brace"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"))


_GOPHER_BULLETS = ("\n- bullet one\n- bullet two\n- bullet three"
                   "\n- bullet four\n- bullet five\n- bullet six"
                   "\n- bullet seven\n- bullet eight\n- bullet nine"
                   "\n- bullet ten")


def q_doc_gopher_flags(spark, sf_dir) -> DataFrame:
    """Gopher quality rules (curation.gopher_quality_flags): rule
    violations are PLANTED arithmetically (stop words for doc_id%2=0,
    a '#' run for %5=0, ten bullet lines for %7=0, a trailing-ellipsis
    line for %11=0) and the oracle re-applies the identical construction
    AND the identical word/line analysis in SQL — per-source rule-pass
    counts are value-exact."""
    from rdflib_jsonld_spark.operators.curation import gopher_quality_flags
    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.lit(" and that have with")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit(" "), F.repeat(F.lit("# "), 150)))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(_GOPHER_BULLETS))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.lit("\nthis planted line trails off..."))
            .otherwise(F.lit(""))))
    flags = gopher_quality_flags(planted)
    per_source = flags.join(docs.select("doc_id", "source"), "doc_id")
    aggs = [F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words")]
    for c in ("ok_words", "ok_mean_len", "ok_symbol", "ok_bullet",
              "ok_ellipsis", "ok_alpha", "ok_stop", "keep"):
        aggs.append(F.sum(F.col(c).cast("long")).cast("long")
                    .alias("n_" + c))
    return per_source.groupBy("source").agg(*aggs).orderBy("source")


def q_doc_source_caps(spark, sf_dir) -> DataFrame:
    """Per-source cap (curation.cap_per_source): the kept set is a pure
    function of (doc_id, source, seed) via seeded-md5 rank, so the
    oracle's identical window reproduces it exactly — per-source counts
    AND id checksums match."""
    from rdflib_jsonld_spark.operators.curation import cap_per_source
    docs = _t(spark, sf_dir, "documents")
    kept = cap_per_source(docs, cap=30)
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id")).orderBy("source")


def _with_synth_urls(docs: DataFrame) -> DataFrame:
    """Deterministic url column for the URL-curation queries (testdata
    has no url field and is read-only): six doc_id-arithmetic variants
    per group g = doc_id//6 — bare, www+default-port, uppercase-scheme+
    trailing-slash, tracker-only query, fragment (all five canonicalize
    identically), plus one with a KEPT query param (a distinct
    canonical). Replicated verbatim in the DuckDB oracles."""
    g = (F.col("doc_id") / 6).cast("long")
    host = F.concat(F.lit("d"), (g % 7).cast("string"),
                    F.lit(".example.com"))
    path = F.concat(F.lit("/p/"), g.cast("string"))
    v = F.col("doc_id") % 6
    url = (F.when(v == 0, F.concat(F.lit("https://"), host, path))
           .when(v == 1, F.concat(F.lit("https://www."), host,
                                  F.lit(":443"), path))
           .when(v == 2, F.concat(F.lit("HTTPS://"), host, path,
                                  F.lit("/")))
           .when(v == 3, F.concat(F.lit("https://"), host, path,
                                  F.lit("?utm_source=x&fbclid=9")))
           .when(v == 4, F.concat(F.lit("https://"), host, path,
                                  F.lit("#frag")))
           .otherwise(F.concat(F.lit("https://"), host, path,
                               F.lit("?id="), (g % 2).cast("string"))))
    return docs.withColumn("url", url)


_SYNTH_URL_SQL = """
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'https://' || host || path
               WHEN 1 THEN 'https://www.' || host || ':443' || path
               WHEN 2 THEN 'HTTPS://' || host || path || '/'
               WHEN 3 THEN 'https://' || host || path
                           || '?utm_source=x&fbclid=9'
               WHEN 4 THEN 'https://' || host || path || '#frag'
               ELSE 'https://' || host || path || '?id='
                    || ((doc_id // 6) % 2)::VARCHAR
             END AS url
      FROM (SELECT doc_id,
                   'd' || ((doc_id // 6) % 7)::VARCHAR
                       || '.example.com' AS host,
                   '/p/' || (doc_id // 6)::VARCHAR AS path
            FROM documents)"""

# the IDENTICAL RE2 pattern the engine uses (curation._URL_PARTS),
# $$-quoted for SQL; group 1 scheme, 2 authority, 3 path, 4 query
_URL_CANON_SQL = r"""
    parts AS (
      SELECT doc_id, trim(url) AS u,
             lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
             regexp_replace(lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)), '^www\.', '') AS host0,
             regexp_replace(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3), '/+$', '') AS path,
             regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS q
      FROM u),
    canon AS (
      SELECT doc_id,
             CASE WHEN scheme = '' THEN lower(u)
                  ELSE scheme || '://'
                       || CASE WHEN scheme = 'https'
                               THEN regexp_replace(host0, ':443$', '')
                               WHEN scheme = 'http'
                               THEN regexp_replace(host0, ':80$', '')
                               ELSE host0 END
                       || path
                       || CASE WHEN len(qp) > 0
                               THEN '?' || array_to_string(qp, '&')
                               ELSE '' END
             END AS canon_url,
             regexp_replace(host0, ':[0-9]+$', '') AS domain
      FROM (SELECT *,
                   list_filter(string_split(q, '&'),
                     p -> p <> '' AND NOT regexp_matches(p,
                       '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$')) AS qp
            FROM parts))"""


def q_doc_url_dedup(spark, sf_dir) -> DataFrame:
    """URL-level dedup (curation.url_dedup over curation.canonical_url
    — the C4/CCNet/RefinedWeb URL pass): synthetic urls where five
    variants per group (www + :443, uppercase scheme + trailing slash,
    tracker-only query, fragment) collapse to one canonical and a
    kept-param variant stays distinct. The oracle replicates the FULL
    canonicalization (identical RE2 regexes, tracker filter, min-id
    winner) in SQL — per-domain survivor counts + id checksums exact."""
    from rdflib_jsonld_spark.operators.curation import (url_dedup,
                                                        url_domain)
    docs = _with_synth_urls(_t(spark, sf_dir, "documents"))
    kept = url_dedup(docs).withColumn("domain", url_domain(F.col("url")))
    return (kept.groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_survivors"),
                 F.sum("doc_id").cast("long").alias("id_checksum"),
                 F.countDistinct("canon_url").cast("long")
                 .alias("n_canon"))
            .orderBy("domain"))


def q_doc_domain_filter(spark, sf_dir) -> DataFrame:
    """Domain blocklist + per-domain cap (curation.domain_filter =
    RefinedWeb §3.1 URL filtering + cap_per_source reuse): block
    d1/d4.example.com, cap the rest at 20 docs per domain by seeded-md5
    rank. The oracle replays the identical host extraction, blocklist
    and window in SQL — per-domain counts + id checksums exact."""
    from rdflib_jsonld_spark.operators.curation import domain_filter
    docs = _with_synth_urls(_t(spark, sf_dir, "documents"))
    kept = domain_filter(docs, ["d1.example.com", "d4.example.com"],
                         cap=20)
    return (kept.groupBy("domain")
            .agg(F.count("*").cast("long").alias("n_kept"),
                 F.sum("doc_id").cast("long").alias("id_checksum"))
            .orderBy("domain"))


def q_doc_corpus_dedup(spark, sf_dir) -> DataFrame:
    """Corpus-level duplicate-span removal (dedup.corpus_chunk_dedup):
    a fixed 200-char block is PLANTED as a prefix of every doc_id%4=0
    document, so its window duplicates corpus-wide and only the
    globally-first occurrence survives. The oracle re-applies the
    identical chunking + first-occurrence rule in SQL, grouping on the
    window TEXT (hash-free — stronger than the engine's xxhash64 keys);
    reassembled text is compared by length and an md5-prefix checksum."""
    from rdflib_jsonld_spark.operators.dedup import corpus_chunk_dedup
    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("abcdefghij" * 20), F.col("text")))
        .otherwise(F.col("text")))
    out = corpus_chunk_dedup(planted, chunk_chars=200)
    chk = F.conv(F.substring(F.md5("text_deduped"), 1, 8), 16, 10) \
        .cast("long")
    joined = out.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chunks").cast("long").alias("sum_chunks"),
        F.sum("n_dropped").cast("long").alias("sum_dropped"),
        F.sum(F.length("text_deduped")).cast("long").alias("sum_chars"),
        F.sum(chk).cast("long").alias("text_checksum")).orderBy("source")


def q_doc_shared_passages(spark, sf_dir) -> DataFrame:
    """Exact-substring shared passages (dedup.shared_passages): a
    ~47-char passage is PLANTED into each (10j, 10j+1) document pair —
    the pair id sits 24 chars in, so no 25-gram crosses pairs — and the
    oracle re-derives the same maximal islands in SQL, joining on the
    window TEXT (hash-free: stronger than the engine's rolling-hash
    keys, a 64-bit collision would fail the gate). Natural corpus spans
    ≥ 40 chars count identically on both sides."""
    from rdflib_jsonld_spark.operators.dedup import shared_passages
    docs = _t(spark, sf_dir, "documents")
    pid = F.floor(F.col("doc_id") / 10).cast("long").cast("string")
    planted = docs.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 10 <= 1,
                        F.concat(F.lit(" planted shared passage "), pid,
                                 F.lit(" marker block pad end")))
                 .otherwise(F.lit(""))))
    spans = shared_passages(planted, k=25, min_span=40)
    return (spans.groupBy("id_a", "id_b")
            .agg(F.count("*").cast("long").alias("n_spans"),
                 F.max("span_len").cast("long").alias("max_span"),
                 F.sum("span_len").cast("long").alias("total_span"))
            .orderBy("id_a", "id_b"))


def q_doc_exactsubstr_dedup(spark, sf_dir) -> DataFrame:
    """ExactSubstr rewrite (dedup.drop_shared_passages): same planting
    as doc_shared_passages; every ≥40-char shared span is excised from
    all but its first-occurrence document. The oracle replays the whole
    chain in SQL — span islands on the window TEXT, interval merge via
    the cumulative-max trick, excision as lag-window segment
    reassembly — and compares rewritten lengths + md5 checksums."""
    from rdflib_jsonld_spark.operators.dedup import drop_shared_passages
    docs = _t(spark, sf_dir, "documents")
    pid = F.floor(F.col("doc_id") / 10).cast("long").cast("string")
    planted = docs.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 10 <= 1,
                        F.concat(F.lit(" planted shared passage "), pid,
                                 F.lit(" marker block pad end")))
                 .otherwise(F.lit(""))))
    out = drop_shared_passages(planted, k=25, min_span=40)
    chk = F.conv(F.substring(F.md5("text_deduped"), 1, 8), 16, 10) \
        .cast("long")
    joined = out.join(docs.select("doc_id", "source"), "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_cut_spans").cast("long").alias("sum_cut_spans"),
        F.sum("n_cut_chars").cast("long").alias("sum_cut_chars"),
        F.sum(F.length("text_deduped")).cast("long").alias("sum_chars"),
        F.sum(chk).cast("long").alias("text_checksum")).orderBy("source")


def q_doc_lm_scores(spark, sf_dir) -> DataFrame:
    """CCNet-style bigram-LM quality scores (classify.bigram_lm_scores,
    self-trained on the corpus): the oracle rebuilds the identical
    Laplace-smoothed bigram model and per-document average log₂
    probability in SQL — per-doc scores exact at 6 decimals (the BM25
    float convention)."""
    from rdflib_jsonld_spark.operators.classify import bigram_lm_scores
    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(docs).orderBy("doc_id")


def q_doc_dsir_weights(spark, sf_dir) -> DataFrame:
    """DSIR importance log-weights (operators/dsir.py, Xie et al. 2023):
    every document re-weighted toward the src0/src1 target slice under
    Laplace-smoothed hashed unigram+bigram bucket models. Scoring is a
    zero-shuffle map-literal projection (the classifier shape); the
    oracle rebuilds the identical md5 bucketing, both distribution
    estimates and the per-doc log-ratio sum in SQL — exact at 6
    decimals (the BM25 float convention)."""
    from rdflib_jsonld_spark.operators.dsir import dsir_log_weights
    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    out = dsir_log_weights(docs, target, n_buckets=512)
    return out.select("doc_id", "source",
                      F.round("dsir_logw", 6).alias("dsir_logw")) \
        .orderBy("doc_id")


def q_doc_dsir_sample(spark, sf_dir) -> DataFrame:
    """DSIR resampling (dsir.dsir_resample): 50 documents drawn without
    replacement with probability ∝ exp(importance weight) via the
    deterministic seeded-Gumbel top-k trick — the draw is a TakeOrdered,
    rerun-identical. The oracle replicates weights AND the Gumbel keys
    (md5 uniform → logw − ln(−ln u)) end-to-end in SQL."""
    from rdflib_jsonld_spark.operators.dsir import (dsir_log_weights,
                                                    dsir_resample)
    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    weighted = dsir_log_weights(docs, target, n_buckets=512)
    out = dsir_resample(weighted, n=50)
    return out.select("doc_id", "source",
                      F.round("dsir_logw", 6).alias("dsir_logw")) \
        .orderBy("doc_id")


def q_doc_bpe_merges(spark, sf_dir) -> DataFrame:
    """BATCHED distributed BPE learning (bpe.learn_bpe_batched, 3
    rounds × up to 4 merges/round): per round ONE pair count feeds a
    top-k candidate list; candidates are greedily accepted iff
    symbol-disjoint from every already-accepted pair that round — the
    standard batching that collapses 32k-vocab learning from 32k
    sequential driver rounds to ~hundreds. The oracle replays the
    identical batched recurrence in SQL (ranked candidates →
    accepted-set accumulation via NOT EXISTS → conditional list_reduce
    folds in acceptance order) — merge table value-exact. batch_k=1
    equals sequential BPE (unit-tested)."""
    from rdflib_jsonld_spark.operators.bpe import learn_bpe_batched
    docs = _t(spark, sf_dir, "documents")
    return learn_bpe_batched(docs, n_rounds=3, batch_k=4).orderBy("step")


def q_doc_bpe_segments(spark, sf_dir) -> DataFrame:
    """BPE application (bpe.segment_words): the corpus vocabulary
    segmented with the merges learned by the batched recurrence — the
    tokenizer-application face of the pair. Oracle = the same unrolled
    SQL recurrence's FINAL word table; pieces compared as a '|'-joined
    string, counts and piece counts exact."""
    from rdflib_jsonld_spark.operators.bpe import (learn_bpe_batched,
                                                   segment_words)
    docs = _t(spark, sf_dir, "documents")
    merges = [(r["lhs"], r["rhs"])
              for r in learn_bpe_batched(docs, n_rounds=3,
                                         batch_k=4).collect()]
    seg = segment_words(docs, merges)
    return seg.select(
        "w", F.col("cnt").cast("long").alias("cnt"),
        F.size("pieces").cast("long").alias("n_pieces"),
        F.array_join("pieces", "|").alias("pieces_str")).orderBy("w")


_LM_SCORES_SQL_BODY = r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(trim(text)),
                                                       '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            uni_stream AS (SELECT doc_id, unnest(ws) AS w FROM toks),
            uni AS (SELECT w, count(*) AS c1 FROM uni_stream GROUP BY w),
            v AS (SELECT count(*) AS v FROM uni),
            bg_stream AS (
              SELECT doc_id, ws[i + 1] AS w1, ws[i + 2] AS w2
              FROM toks,
                   UNNEST(range(0, greatest(len(ws) - 1, 0))) AS r(i)),
            big AS (SELECT w1, w2, count(*) AS c12
                    FROM bg_stream GROUP BY w1, w2),
            scored AS (
              SELECT s.doc_id,
                     ln((c12 + 1.0) / (c1 + 1.0 * v.v)) / ln(2.0) AS lp
              FROM bg_stream s
              JOIN big USING (w1, w2)
              JOIN uni ON uni.w = s.w1, v)
            SELECT doc_id,
                   count(*)::BIGINT AS n_bigrams,
                   round(avg(lp), 6) AS avg_logp
            FROM scored GROUP BY doc_id
"""

# the standalone per-doc form wraps the body (the body has no ORDER BY so
# the tiers oracle can reuse it as a CTE)
_LM_SCORES_SQL = _LM_SCORES_SQL_BODY

# DSIR weights CTE chain (operators/dsir.py replicated end-to-end: the
# identical tokenizer, unigram+bigram grams, md5 bucketing at 512
# buckets, Laplace-smoothed target/raw estimates over the src0/src1
# target slice, per-doc log-ratio sum). Ends at `perdoc(doc_id, source,
# w)` with NO final SELECT so the sample oracle can extend the chain.
_DSIR_PERDOC_SQL = r"""
    WITH toks AS (
      SELECT doc_id, source, list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9]+'),
               t -> t <> '') AS ts
      FROM documents),
    idx AS (
      SELECT doc_id, source, ts,
             unnest(generate_series(1, len(ts) - 1)) AS i
      FROM toks),
    grams AS (
      SELECT doc_id, source, unnest(ts) AS g FROM toks
      UNION ALL
      SELECT doc_id, source, ts[i] || ' ' || ts[i + 1] AS g FROM idx),
    bkt AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(g || chr(31) || 'dsir-v1'), 1, 8)
             )::BIGINT % 512 AS b
      FROM grams),
    raw_c AS (SELECT b, count(*)::DOUBLE AS cr FROM bkt GROUP BY b),
    tgt_c AS (SELECT b, count(*)::DOUBLE AS ct FROM bkt
              WHERE source IN ('src0', 'src1') GROUP BY b),
    tot AS (SELECT (SELECT count(*) FROM bkt)::DOUBLE AS tr,
                   (SELECT count(*) FROM bkt
                    WHERE source IN ('src0', 'src1'))::DOUBLE AS tt),
    ratio AS (
      SELECT r.b,
             ln((coalesce(t.ct, 0.0) + 1.0) / (tot.tt + 512.0))
             - ln((r.cr + 1.0) / (tot.tr + 512.0)) AS lr
      FROM raw_c r LEFT JOIN tgt_c t USING (b), tot),
    perdoc AS (
      SELECT d.doc_id, d.source, coalesce(sum(x.lr), 0.0) AS w
      FROM documents d
      LEFT JOIN (SELECT bkt.doc_id, ratio.lr FROM bkt
                 JOIN ratio USING (b)) x ON x.doc_id = d.doc_id
      GROUP BY d.doc_id, d.source)
"""


def _bpe_chain_sql(n_rounds: int, batch_k: int) -> str:
    """Unrolled BATCHED-BPE recurrence in DuckDB SQL (engine:
    bpe.learn_bpe_batched). Per round: pair counts → top batch_k
    candidates pivoted wide → greedy symbol-disjoint acceptance flags
    f1..fk (lateral column aliases; fi = candidate i shares no symbol
    with any already-ACCEPTED fj, j<i) → conditional list_reduce folds
    applied in acceptance order. batch_k=1 is sequential BPE. Symbols
    are chr(31)-joined (corpus words are alnum); a merge appends
    WITHOUT the separator, so the fold needs no list accumulator."""
    k = batch_k
    sql = ["""WITH toks AS (
      SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                      '\\s+'),
                                w -> w <> '')) AS w
      FROM documents),
    words0 AS (
      SELECT w, count(*)::BIGINT AS cnt,
             array_to_string(string_split(w, ''), chr(31)) AS sym
      FROM toks GROUP BY w)"""]
    pivot = ",\n             ".join(
        f"max(CASE WHEN rk = {i} THEN a END) AS a{i},\n             "
        f"max(CASE WHEN rk = {i} THEN b END) AS b{i},\n             "
        f"max(CASE WHEN rk = {i} THEN total END) AS t{i}"
        for i in range(1, k + 1))
    flags = []
    for i in range(1, k + 1):
        conds = [f"(a{i} IS NOT NULL)"]
        for j in range(1, i):
            conds.append(f"(NOT f{j} OR (a{i} NOT IN (a{j}, b{j}) "
                         f"AND b{i} NOT IN (a{j}, b{j})))")
        flags.append(f"{' AND '.join(conds)} AS f{i}")
    flags_sql = ",\n             ".join(flags)
    folds, prev = [], "sym"
    for i in range(1, k + 1):
        folds.append(
            f"CASE WHEN f{i} THEN\n"
            f"               list_reduce(string_split({prev}, chr(31)),\n"
            f"                 (acc, x) -> CASE WHEN string_split(acc, "
            f"chr(31))[-1] = a{i}\n"
            f"                                   AND x = b{i}\n"
            f"                   THEN acc || x\n"
            f"                   ELSE acc || chr(31) || x END)\n"
            f"             ELSE {prev} END AS sym{i}")
        prev = f"sym{i}"
    folds_sql = ",\n             ".join(folds)
    for r in range(n_rounds):
        sql.append(f""",
    pairs{r} AS (
      SELECT s[i + 1] AS a, s[i + 2] AS b, sum(cnt)::BIGINT AS total
      FROM (SELECT cnt, string_split(sym, chr(31)) AS s FROM words{r}),
           UNNEST(range(0, greatest(len(s) - 1, 0))) AS rr(i)
      GROUP BY a, b),
    cand{r} AS (
      SELECT a, b, total,
             row_number() OVER (ORDER BY total DESC, a, b) AS rk
      FROM pairs{r} ORDER BY total DESC, a, b LIMIT {k}),
    f{r} AS (
      SELECT *,
             {flags_sql}
      FROM (SELECT {pivot}
            FROM cand{r})),
    words{r + 1} AS (
      SELECT w, cnt, sym{k} AS sym FROM (
      SELECT w, cnt,
             {folds_sql}
      FROM words{r}, f{r}))""")
    return "".join(sql)


def _bpe_oracle_sql(n_rounds: int, batch_k: int = 1) -> str:
    """Batched-BPE merge table: every accepted (round, rank) candidate,
    step-numbered in acceptance order — value-exact vs
    learn_bpe_batched(n_rounds, batch_k)."""
    rows = "\n      UNION ALL ".join(
        f"SELECT {r} AS rnd, {i} AS rk, a{i} AS lhs, b{i} AS rhs, "
        f"t{i} AS pc FROM f{r} WHERE f{i}"
        for r in range(n_rounds) for i in range(1, batch_k + 1))
    return _bpe_chain_sql(n_rounds, batch_k) + f"""
    SELECT (row_number() OVER (ORDER BY rnd, rk) - 1)::BIGINT AS step,
           lhs, rhs, lhs || rhs AS merged, pc::BIGINT AS pair_count
    FROM (
      {rows}
    ) ORDER BY step"""


def _bpe_segments_oracle_sql(n_rounds: int, batch_k: int = 1) -> str:
    """Same unrolled recurrence, but the final SELECT reads the LAST
    word table — the segmentation after all merges."""
    return _bpe_chain_sql(n_rounds, batch_k) + f"""
    SELECT w, cnt,
           len(string_split(sym, chr(31)))::BIGINT AS n_pieces,
           replace(sym, chr(31), '|') AS pieces_str
    FROM words{n_rounds} ORDER BY w"""


def q_events_cohort_retention(spark, sf_dir) -> DataFrame:
    """Cohort retention (temporal.cohort_retention, hourly cohorts,
    horizons 0-3): the oracle repeats the distinct-activity → min-cohort
    → self-join rollup in SQL; counts exact."""
    from rdflib_jsonld_spark.operators.temporal import cohort_retention
    events = _t(spark, sf_dir, "events")
    return cohort_retention(events, horizons=3, unit_seconds=3600)


def q_emb_quantization(spark, sf_dir) -> DataFrame:
    """Per-vector affine int8 quantization
    (similarity.quantize_embeddings): the oracle computes the identical
    codes in SQL (floor(x+0.5) half-up spelled out, double-cast floats)
    — integer code sums exact, error stats exact at 6 decimals."""
    from rdflib_jsonld_spark.operators.similarity import (
        quantize_embeddings)
    embs = _t(spark, sf_dir, "embeddings")
    return quantize_embeddings(embs).orderBy("vec_id")


def q_doc_incremental_dedup(spark, sf_dir) -> DataFrame:
    """Incremental exact dedup (dedup.incremental_exact_dedup): the
    historical index is the fingerprints of the doc_id%3=0 documents;
    the new batch is the corpus with doc_id%7=0 texts REPLACED by one
    of five canonical strings (within-batch duplicate groups). The
    oracle applies the same identity on the normalized TEXT (hash-free)
    — survivors are batch-first AND index-absent, counts + id checksums
    per source exact."""
    from rdflib_jsonld_spark.operators.dedup import incremental_exact_dedup
    from rdflib_jsonld_spark.operators.textstats import with_fingerprint
    docs = _t(spark, sf_dir, "documents")
    seen = with_fingerprint(docs.where(F.col("doc_id") % 3 == 0)) \
        .select("fingerprint")
    new = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit("batch duplicate content block "),
                        (F.col("doc_id") % 5).cast("string")))
        .otherwise(F.col("text")))
    out = incremental_exact_dedup(new, seen)
    return out.groupBy("source").agg(
        F.count("*").cast("long").alias("n_survivors"),
        F.sum("doc_id").cast("long").alias("id_checksum")) \
        .orderBy("source")


def q_doc_incremental_near_dup(spark, sf_dir) -> DataFrame:
    """Incremental near-dup dedup (dedup.incremental_near_dup): the new
    batch is %9=0 clones (text || ' tail' — near-dups of history, must
    drop) plus %9=1 reversed texts (fresh, must survive) against the
    full corpus as history. The oracle computes exact all-pairs
    new-vs-history word-3-gram Jaccard in SQL (given LSH recall,
    corpus-validated) — per-source survivor counts + id checksums."""
    from rdflib_jsonld_spark.operators.dedup import incremental_near_dup
    docs = _t(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") < 2000).select("doc_id", "text")
    clones = (docs.where(F.col("doc_id") % 9 == 0)
              .select((F.col("doc_id") + 5_000_000).alias("doc_id"),
                      "source",
                      F.concat("text", F.lit(" tail")).alias("text")))
    fresh = (docs.where(F.col("doc_id") % 9 == 1)
             .select((F.col("doc_id") + 5_000_000).alias("doc_id"),
                     "source", F.reverse(F.col("text")).alias("text")))
    surv = incremental_near_dup(clones.unionByName(fresh), history,
                                jaccard_threshold=0.8)
    return surv.groupBy("source").agg(
        F.count("*").cast("long").alias("n_survivors"),
        F.sum("doc_id").cast("long").alias("id_checksum")) \
        .orderBy("source")


def q_doc_lm_tiers(spark, sf_dir) -> DataFrame:
    """CCNet quality tiers (Wenzek et al. 2020 §4): per-source ntile(3)
    buckets of the bigram-LM score — head/middle/tail. Deterministic
    ordering (score DESC, doc_id ASC); the oracle repeats the whole LM
    + ntile rollup in SQL."""
    from pyspark.sql import Window
    from rdflib_jsonld_spark.operators.classify import bigram_lm_scores
    docs = _t(spark, sf_dir, "documents")
    scores = bigram_lm_scores(docs)
    joined = scores.join(docs.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy(F.desc("avg_logp"),
                                             F.asc("doc_id"))
    tiers = joined.withColumn("tier", F.ntile(3).over(w))
    return tiers.groupBy("source", "tier").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.round(F.min("avg_logp"), 6).alias("min_logp"),
        F.round(F.max("avg_logp"), 6).alias("max_logp")) \
        .select("source", F.col("tier").cast("long").alias("tier"),
                "n_docs", "id_checksum", "min_logp", "max_logp") \
        .orderBy("source", "tier")


def q_events_rate_anomalies(spark, sf_dir) -> DataFrame:
    """Hourly per-type rate anomalies (temporal.rate_anomalies): a
    burst of planted duplicate events in one hour for one type must
    flag; the oracle repeats the count → mean/stddev → z-score rollup
    in SQL (sample stddev both sides, 6-decimal rounding)."""
    from rdflib_jsonld_spark.operators.temporal import rate_anomalies
    events = _t(spark, sf_dir, "events")
    burst = (events.where((F.col("event_id") % 50 == 0))
             .withColumn("ts", F.lit("2024-01-03 07:30:00")
                         .cast("timestamp"))
             .withColumn("event_type", F.lit("click")))
    planted = events.unionByName(burst)
    return rate_anomalies(planted, z_threshold=2.0) \
        .orderBy("event_type", "period")


def q_doc_curation_funnel(spark, sf_dir) -> DataFrame:
    """END-TO-END curation funnel: the five individually-oracle-gated
    stages chained the way a real pre-training pipeline runs them —
    C4 line heuristics → Gopher document rules → corpus-level
    duplicate-span drop → per-source cap → mixture sampling — with one
    planted text construction giving every stage real victims (%3 docs
    lack terminal lines, %5 docs lack stop words, %4 docs share a
    200-char block, caps bite at 25/source, mixture rates at the
    doc_mixture_counts values). The oracle replays the ENTIRE chain in
    SQL with the same stage fragments; output is the funnel report
    (stage, surviving doc count)."""
    from rdflib_jsonld_spark.operators.curation import (
        c4_quality_flags, cap_per_source, gopher_quality_flags,
        sample_mixture)
    from rdflib_jsonld_spark.operators.dedup import corpus_chunk_dedup
    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id", "source",
        F.concat(
            F.when(F.col("doc_id") % 4 == 0,
                   F.lit("abcdefghij" * 20 + " ")).otherwise(F.lit("")),
            F.col("text"),
            F.when(F.col("doc_id") % 3 != 0, F.lit(
                "\nThis is a planted terminal sentence number one.\n"
                "And a second good planted line for keeping!\n"
                "Plus a third planted line that also qualifies."))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 != 0,
                   F.lit(" and that have with")).otherwise(F.lit("")))
        .alias("text"))
    # NOT persisted: all six funnel branches are pure JVM column algebra
    # (no Python stage — the r02 persist lesson doesn't apply) and a
    # measured A/B at sf0.1 showed persisting the survivor tables SLOWER
    # (12.6s vs 10.3s warm: materialization cost > recompute under AQE)
    c4 = c4_quality_flags(planted).where("keep").select("doc_id")
    s1 = planted.join(c4, "doc_id")
    gop = gopher_quality_flags(s1).where("keep").select("doc_id")
    s2 = s1.join(gop, "doc_id")
    dd = corpus_chunk_dedup(s2, chunk_chars=200)
    s3 = s2.join(dd.where(F.col("n_dropped") == 0).select("doc_id"),
                 "doc_id")
    s4 = cap_per_source(s3, cap=25)
    rates = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25,
             "src4": 0.0}
    s5 = sample_mixture(s4, rates, default_rate=0.6)
    out = None
    for i, (name, df) in enumerate([
            ("raw", planted), ("c4", s1), ("gopher", s2),
            ("dedup", s3), ("cap", s4), ("mixture", s5)]):
        row = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs")) \
            .select(F.lit(i).cast("long").alias("stage_idx"),
                    F.lit(name).alias("stage"), "n_docs")
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage_idx")


def q_doc_mixture_counts(spark, sf_dir) -> DataFrame:
    """Deterministic weighted source mixing (curation.sample_mixture):
    per-source keep-rates applied as a seeded md5 Bernoulli filter; the
    oracle reproduces the identical bucketing, so per-source kept
    counts match exactly — partitioning- and engine-independent."""
    from rdflib_jsonld_spark.operators.curation import sample_mixture
    docs = _t(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25,
             "src4": 0.0}
    return (sample_mixture(docs, rates, default_rate=0.6)
            .groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
            .orderBy("source"))


def q_doc_pack_manifest(spark, sf_dir) -> DataFrame:
    """Sequence-packing manifest (curation.pack_sequences): seeded md5
    sharding + per-shard ordered token cumsum → per-document sequence
    spans. The FULL manifest is compared (every offset, span and
    straddle flag), not an aggregate — the oracle replays the identical
    shard hash and window arithmetic in SQL."""
    from rdflib_jsonld_spark.operators.curation import pack_sequences
    docs = _t(spark, sf_dir, "documents")
    return (pack_sequences(docs, seq_len=64, shards=8)
            .orderBy("doc_id"))


def q_doc_pii_scrub(spark, sf_dir) -> DataFrame:
    """PII detection + scrubbing (curation.pii_counts/scrub_pii): PII
    is PLANTED arithmetically (email when doc_id%3=0, ssn %11, ipv4 %5,
    phone %7 — appended in scrub order), then detection counts and the
    masked-length delta are aggregated per doc_id%10 group. The oracle
    replants identically and runs the SAME RE2-compatible regexes in
    DuckDB, so counts AND the character-exact replacement must match."""
    from rdflib_jsonld_spark.operators.curation import pii_counts, scrub_pii
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.format_string(
                " reach user%d@example.com", did)).otherwise(""),
            F.when(did % 11 == 0, F.concat(
                F.lit(" id 123-45-"),
                F.lpad((did % 10000).cast("string"), 4, "0")))
            .otherwise(""),
            F.when(did % 5 == 0, F.format_string(
                " host 10.1.%d.7", did % 256)).otherwise(""),
            F.when(did % 7 == 0, F.concat(
                F.lit(" call +1555"),
                F.lpad(did.cast("string"), 7, "0"))).otherwise(""),
        ).alias("text"))
    counts = pii_counts(planted)
    scrubbed = scrub_pii(planted).select(
        "doc_id", F.length("text").alias("len_scrub"))
    joined = (planted.select("doc_id", F.length("text").alias("len_raw"))
              .join(counts, "doc_id").join(scrubbed, "doc_id"))
    return (joined.groupBy((did % 10).cast("int").alias("grp"))
            .agg(F.sum("n_email").cast("long").alias("n_email"),
                 F.sum("n_ssn").cast("long").alias("n_ssn"),
                 F.sum("n_ipv4").cast("long").alias("n_ipv4"),
                 F.sum("n_phone").cast("long").alias("n_phone"),
                 F.sum(F.col("len_raw") - F.col("len_scrub"))
                 .cast("long").alias("chars_delta"))
            .orderBy("grp"))


def q_doc_exact_dup_groups(spark, sf_dir) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    planted = (docs.where(F.col("doc_id") < 5)
               .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    both = docs.unionByName(planted)
    return (both.groupBy(F.md5("text").alias("text_md5"))
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min("doc_id").alias("keep_id"),
                 F.max("doc_id").alias("max_dup_id"))
            .where(F.col("n_dups") > 1)
            .orderBy("keep_id"))


def q_doc_lang_pred_counts(spark, sf_dir) -> DataFrame:
    docs = with_lang_id(_t(spark, sf_dir, "documents"))
    return (docs.groupBy("pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("pred_lang"))


def q_doc_ngram_jaccard_pairs(spark, sf_dir) -> DataFrame:
    """Exact word-3-gram Jaccard pairs (explode → equi-join set algebra,
    all JVM-side)."""
    docs = _t(spark, sf_dir, "documents")
    return (dedup.ngram_jaccard_pairs(docs, threshold=0.4)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
            .orderBy(F.desc("jaccard"), "id_a", "id_b").limit(50))


def q_doc_minhash_near_dups(spark, sf_dir) -> DataFrame:
    """MinHash-LSH candidates → exact word-3-gram Jaccard verify (the
    standard candidates→verify dedup shape). Verification makes the result
    the exact set of ≥0.8-Jaccard pairs (given LSH recall, validated on
    this corpus), so DuckDB's exact all-pairs Jaccard is a full oracle."""
    docs = _t(spark, sf_dir, "documents")
    planted = (docs.where(F.col("doc_id") < 10)
               .withColumn("doc_id", F.col("doc_id") + 2_000_000)
               .withColumn("text", F.concat("text", F.lit(" tail"))))
    both = docs.where(F.col("doc_id") < 2000).unionByName(planted)
    # est-Jaccard prefilter at 0.5 ≪ the 0.8 exact gate: a true ≥0.8 pair
    # estimating below 0.5 over 64 perms is a ~6σ event, so the prefilter
    # only sheds verify work, never recall
    cands = dedup.minhash_lsh_pairs(both, jaccard_threshold=0.5)
    return (dedup.exact_ngram_jaccard_verify(cands, both, threshold=0.8)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def q_doc_simhash_near_dups(spark, sf_dir) -> DataFrame:
    """SimHash banded candidates → exact word-3-gram Jaccard verify at a
    tighter 0.9 threshold (simhash targets small perturbations)."""
    docs = _t(spark, sf_dir, "documents")
    planted = (docs.where(F.col("doc_id") < 10)
               .withColumn("doc_id", F.col("doc_id") + 3_000_000)
               .withColumn("text", F.concat("text", F.lit(" q"))))
    both = docs.where(F.col("doc_id") < 2000).unionByName(planted)
    cands = dedup.simhash_pairs(both, max_hamming=64, n_bands=8)
    return (dedup.exact_ngram_jaccard_verify(cands, both, threshold=0.9)
            .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
            .orderBy("id_a", "id_b"))


def q_doc_near_dup_clusters(spark, sf_dir) -> DataFrame:
    """Fuzzy-dedup clustering end-to-end: LSH candidates → exact-Jaccard
    verify → connected components → (doc_id, cluster_root). The oracle
    recomputes the exact ≥0.8 pair graph in DuckDB and resolves
    components with a recursive transitive closure — so candidate recall,
    the verify math AND the CC mapping are all value-checked."""
    docs = _t(spark, sf_dir, "documents")
    planted = (docs.where(F.col("doc_id") < 10)
               .withColumn("doc_id", F.col("doc_id") + 4_000_000)
               .withColumn("text", F.concat("text", F.lit(" tail"))))
    both = docs.where(F.col("doc_id") < 2000).unionByName(planted)
    return (dedup.near_dup_clusters(both, jaccard_threshold=0.8)
            .orderBy("doc_id"))


def q_emb_topk_cosine(spark, sf_dir) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    return similarity.brute_force_topk(emb, qvec, k=10)


def q_emb_norm_by_label(spark, sf_dir) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return (emb.withColumn("norm", norm)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("norm"), 6).alias("avg_norm"))
            .orderBy("label"))


def q_emb_ann_topk(spark, sf_dir) -> DataFrame:
    """Sign-LSH ANN gated on full recall: at this corpus/parameter point
    the bucket union provably contains the true top-10, so the exact
    brute-force SQL is the oracle (the judge-suggested recall@k gate with
    the threshold at 1.0). At larger corpora n_bits scales up and recall
    trades against candidate count — that path stays rows-only."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    return similarity.ann_topk(emb, qvec, k=10, n_bits=4, n_tables=16)


def q_emb_ivf_topk(spark, sf_dir) -> DataFrame:
    """IVF ANN with planted truth: 10 near-copies of vec 0 are planted, so
    the true top-10 lives in the query's own cell — the clustered case IVF
    exists for — and a PARTIAL probe (2 of 8 cells) must recover it
    exactly. The brute-force SQL over the same planted universe is the
    oracle (testdata embeddings are isotropic-random, where no partial
    probe can concentrate a natural top-10 — planting builds the locality
    the gate needs while keeping assignment/probe/re-rank fully exercised).
    """
    emb = _t(spark, sf_dir, "embeddings")
    q0 = emb.where(F.col("vec_id") == 0)
    planted = (q0.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i"),
        "embedding", "label")
        .select((F.col("i") + 6_000_000).cast("long").alias("vec_id"),
                F.transform("embedding",
                            lambda x: x + F.col("i") * F.lit(0.0002))
                .cast("array<float>").alias("embedding"),
                "label"))
    both = emb.unionByName(planted)
    qvec = [float(x) for x in q0.collect()[0].embedding]
    return similarity.ivf_topk(both, qvec, k=10, n_clusters=8, n_probe=2)


def q_emb_ivf_multi_topk(spark, sf_dir) -> DataFrame:
    """Batch IVF (one assignment pass shared by 3 queries, per-query
    2-of-8-cell probe + windowed exact re-rank). Planted truth: 5 near-
    copies per query live in the query's own cell, so the partial probe
    must recover the exact per-query top-5 — brute-force SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 3)
    planted = (qs.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(5))).alias("i"),
        "embedding", "label")
        .select((F.col("vec_id") * 100 + F.col("i") + 7_000_000)
                .cast("long").alias("vec_id"),
                F.transform("embedding",
                            lambda x: x + F.col("i") * F.lit(0.0002))
                .cast("array<float>").alias("embedding"),
                "label"))
    both = emb.unionByName(planted)
    return (similarity.ivf_topk_multi(both, qs, k=5,
                                      n_clusters=8, n_probe=2)
            .orderBy("query_id", "rank"))


def q_emb_ivf_join_topk(spark, sf_dir) -> DataFrame:
    """Corpus-vs-corpus IVF (ivf_topk_join): NO driver collect of the
    query side — probe cells are a distributed pass, candidates a
    shuffle join on cluster id. Planted truth: 3 near-copies per query
    (8 queries) live in each query's own cell, so a partial 2-of-8
    probe must recover the exact per-query top-3 — brute-force SQL over
    the planted universe is the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    planted = (qs.select(
        "vec_id",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("i"),
        "embedding", "label")
        .select((F.col("vec_id") * 100 + F.col("i") + 8_000_000)
                .cast("long").alias("vec_id"),
                F.transform("embedding",
                            lambda x: x + F.col("i") * F.lit(0.0002))
                .cast("array<float>").alias("embedding"),
                "label"))
    both = emb.unionByName(planted)
    return (similarity.ivf_topk_join(both, qs, k=3,
                                     n_clusters=8, n_probe=2)
            .orderBy("query_id", "rank"))


def q_doc_winnowing_overlap(spark, sf_dir) -> DataFrame:
    """Winnowing (MOSS) fingerprint-overlap pairs with the stop-
    fingerprint cap — boilerplate/plagiarism detection."""
    from rdflib_jsonld_spark.operators.dedup import winnowing_overlap_pairs
    docs = _t(spark, sf_dir, "documents")
    return (winnowing_overlap_pairs(docs, min_shared=8)
            .orderBy(F.desc("n_shared"), "id_a", "id_b").limit(50))


def q_emb_kmeans_sizes(spark, sf_dir) -> DataFrame:
    """Distributed Lloyd k-means (operators/clustering.py): seeded
    md5-order init + 3 full-corpus iterations, cluster sizes. The
    oracle replays the ENTIRE recurrence in SQL (init row_number over
    the same md5, per-iteration argmin with the same lower-index
    tie-break, per-dimension avg update). fp note: both engines rank by
    L2 in double; argmin flips would need two centroids equidistant to
    ~1e-10 — not present in continuous data (empirically exact here)."""
    from rdflib_jsonld_spark.operators.clustering import kmeans
    emb = _t(spark, sf_dir, "embeddings")
    assign, _ = kmeans(emb, k=6, iterations=3)
    return (assign.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("cluster"))


def q_emb_semantic_dedup(spark, sf_dir) -> DataFrame:
    """SemDeDup (cluster-then-cosine-prune, operators/clustering.py):
    8 planted near-exact clones (the emb_near_dup_pairs planting
    pattern) must be exactly the dropped set — the clone co-clusters
    with its original (perturbation ≪ centroid margins) and is its only
    cosine-0.99 neighbor (random 64-dim corpus: max background cosine
    ≈ 0.5). Planted-truth oracle, corpus-validated geometry."""
    from rdflib_jsonld_spark.operators.clustering import semantic_dedup
    emb = _t(spark, sf_dir, "embeddings")
    planted = (emb.where(F.col("vec_id") < 8)
               .withColumn("vec_id", F.col("vec_id") + 5_000_000)
               .withColumn("embedding",
                           F.transform("embedding",
                                       lambda x: x + F.lit(0.0005))))
    out = semantic_dedup(emb.unionByName(planted), threshold=0.99,
                         k=6, iterations=2)
    return out.select(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).cast("long")
        .alias("n_dropped"),
        F.sum(F.when(~F.col("keep"), F.col("vec_id"))).cast("long")
        .alias("dropped_id_sum"))


def q_emb_near_dup_pairs(spark, sf_dir) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    planted = (emb.where(F.col("vec_id") < 8)
               .withColumn("vec_id", F.col("vec_id") + 5_000_000)
               .withColumn("embedding",
                           F.transform("embedding",
                                       lambda x: x + F.lit(0.0005))))
    both = emb.unionByName(planted)
    return (similarity.embedding_near_dup_pairs(both, threshold=0.98)
            .orderBy("id_a", "id_b"))


def q_multimodal_features(spark, sf_dir) -> DataFrame:
    """Multimodal decode→feature pipeline over REAL uncompressed payloads
    (BMP/WAV/RVID parsed from bytes — no codec libs needed); every
    payload must decode (n_decoded) into its kind's fixed feature shape."""
    media = multimodal.synthetic_media_df(spark, n=48)
    feats = multimodal.extract_features(media)
    return (feats.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("feature").alias("n_decoded"),
                 F.max(F.size("feature")).alias("feat_dim"))
            .orderBy("kind"))


# --------------------------------------------------------------------------
# contract
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG pipeline (SURVEY §2 A/C/D + F linking)
        "kg_entity_counts_documents": q_kg_entity_counts_documents,
        "kg_predicate_counts_documents": q_kg_predicate_counts_documents,
        "kg_quad_stats_documents": q_kg_quad_stats_documents,
        "kg_bgp_mention_counts": q_kg_bgp_mention_counts,
        "kg_bgp_optional_sameas": q_kg_bgp_optional_sameas,
        "kg_bgp_union_about_sameas": q_kg_bgp_union_about_sameas,
        "kg_bgp_negation_counts": q_kg_bgp_negation_counts,
        "kg_bgp_values_mentions": q_kg_bgp_values_mentions,
        "kg_construct_entity_graph": q_kg_construct_entity_graph,
        "kg_sameas_closure": q_kg_sameas_closure,
        "kg_path_alias_reach": q_kg_path_alias_reach,
        "kg_sparql_text_aggregate": q_kg_sparql_text_aggregate,
        "kg_sparql_text_union_negation": q_kg_sparql_text_union_negation,
        "kg_sparql_text_path": q_kg_sparql_text_path,
        "kg_sparql_text_subquery": q_kg_sparql_text_subquery,
        "kg_sparql_text_ask": q_kg_sparql_text_ask,
        "kg_sparql_text_describe": q_kg_sparql_text_describe,
        "kg_sparql_update_rewrite": q_kg_sparql_update_rewrite,
        "kg_framed_mentions": q_kg_framed_mentions,
        "kg_graph_dedup_canonical": q_kg_graph_dedup_canonical,
        "kg_directmap_nation_quads": q_kg_directmap_nation_quads,
        "kg_rdfs_customer_types": q_kg_rdfs_customer_types,
        "kg_shacl_report": q_kg_shacl_report,
        "kg_shacl_extended": q_kg_shacl_extended,
        "kg_directmap_sparql_join": q_kg_directmap_sparql_join,
        "kg_expanded_node_counts": q_kg_expanded_node_counts,
        "kg_flattened_node_counts": q_kg_flattened_node_counts,
        "kg_compact_roundtrip": q_kg_compact_roundtrip,
        "kg_nquads_roundtrip": q_kg_nquads_roundtrip,
        "kg_turtle_roundtrip": q_kg_turtle_roundtrip,
        "kg_entity_pagerank": q_kg_entity_pagerank,
        "kg_cooccurrence_triangles": q_kg_cooccurrence_triangles,
        "kg_lpa_communities": q_kg_lpa_communities,
        "kg_bfs_distances": q_kg_bfs_distances,
        "kg_weighted_distances": q_kg_weighted_distances,
        "kg_owl_property_closure": q_kg_owl_property_closure,
        "kg_serialized_documents": q_kg_serialized_documents,
        "kg_cc_distributed_documents": q_kg_cc_distributed_documents,
        "kg_expand_error_metrics": q_kg_expand_error_metrics,
        "kg_top_predicates_transcripts": q_kg_top_predicates_transcripts,
        "kg_canonical_mapping_transcripts": q_kg_canonical_mapping_transcripts,
        "kg_sameas_edges_transcripts": q_kg_sameas_edges_transcripts,
        # relational surface (E5 stats, F joins, G windows/set ops, H scalars)
        "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
        "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
        "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
        "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
        "tpch_q18_large_orders": q_tpch_q18_large_orders,
        "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
        "lineitem_cube": q_lineitem_cube,
        "lineitem_percentiles": q_lineitem_percentiles,
        "orders_rank_window": q_orders_rank_window,
        "events_sessionize": q_events_sessionize,
        "events_funnel": q_events_funnel,
        "events_sliding_windows": q_events_sliding_windows,
        "events_session_windows": q_events_session_windows,
        "events_cohort_retention": q_events_cohort_retention,
        "events_rate_anomalies": q_events_rate_anomalies,
        "lineitem_cube": q_lineitem_cube,
        "events_rolling_value_sum": q_events_rolling_value_sum,
        "events_asof_attribution": q_events_asof_attribution,
        "events_hourly_windows": q_events_hourly_windows,
        "events_json_stats": q_events_json_stats,
        "customers_with_orders_semijoin": q_customers_with_orders_semijoin,
        "returnflag_set_ops": q_returnflag_set_ops,
        # training-data ops
        "doc_token_stats": q_doc_token_stats,
        "doc_quality_by_source": q_doc_quality_by_source,
        "doc_exact_dup_groups": q_doc_exact_dup_groups,
        "doc_chunk_stats": q_doc_chunk_stats,
        "kg_bgp_group_aggregates": q_kg_bgp_group_aggregates,
        "doc_decontam_flags": q_doc_decontam_flags,
        "doc_repetition_scores": q_doc_repetition_scores,
        "doc_split_counts": q_doc_split_counts,
        "doc_mixture_counts": q_doc_mixture_counts,
        "doc_c4_flags": q_doc_c4_flags,
        "doc_gopher_flags": q_doc_gopher_flags,
        "doc_source_caps": q_doc_source_caps,
        "doc_url_dedup": q_doc_url_dedup,
        "doc_domain_filter": q_doc_domain_filter,
        "doc_corpus_dedup": q_doc_corpus_dedup,
        "doc_incremental_dedup": q_doc_incremental_dedup,
        "doc_incremental_near_dup": q_doc_incremental_near_dup,
        "doc_curation_funnel": q_doc_curation_funnel,
        "doc_shared_passages": q_doc_shared_passages,
        "doc_exactsubstr_dedup": q_doc_exactsubstr_dedup,
        "doc_lm_scores": q_doc_lm_scores,
        "doc_lm_tiers": q_doc_lm_tiers,
        "doc_dsir_weights": q_doc_dsir_weights,
        "doc_dsir_sample": q_doc_dsir_sample,
        "doc_bpe_merges": q_doc_bpe_merges,
        "doc_bpe_segments": q_doc_bpe_segments,
        "kg_chat_render": q_kg_chat_render,
        "kg_r2rml_customer_quads": q_kg_r2rml_customer_quads,
        "kg_ifp_sameas": q_kg_ifp_sameas,
        "supplier_fuzzy_pairs": q_supplier_fuzzy_pairs,
        "supplier_fuzzy_clusters": q_supplier_fuzzy_clusters,
        "doc_bm25_topk": q_doc_bm25_topk,
        "doc_clf_scores": q_doc_clf_scores,
        "doc_clf_train": q_doc_clf_train,
        "doc_pack_manifest": q_doc_pack_manifest,
        "doc_pii_scrub": q_doc_pii_scrub,
        "doc_ngram_jaccard_pairs": q_doc_ngram_jaccard_pairs,
        "doc_lang_pred_counts": q_doc_lang_pred_counts,
        "doc_minhash_near_dups": q_doc_minhash_near_dups,
        "doc_simhash_near_dups": q_doc_simhash_near_dups,
        "doc_near_dup_clusters": q_doc_near_dup_clusters,
        "emb_topk_cosine": q_emb_topk_cosine,
        "emb_norm_by_label": q_emb_norm_by_label,
        "emb_ann_topk": q_emb_ann_topk,
        "emb_ivf_topk": q_emb_ivf_topk,
        "emb_ivf_multi_topk": q_emb_ivf_multi_topk,
        "emb_ivf_join_topk": q_emb_ivf_join_topk,
        "doc_winnowing_overlap": q_doc_winnowing_overlap,
        "emb_near_dup_pairs": q_emb_near_dup_pairs,
        "emb_kmeans_sizes": q_emb_kmeans_sizes,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "emb_quantization": q_emb_quantization,
        "multimodal_features": q_multimodal_features,
    }


_STOP_PATTERN = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _transcript_truth(n_convs: int = 150, seed: int = 42):
    """Planted ground truth for the synthetic-generator queries.

    The generator (test infrastructure, not engine) plants JSON-LD mention
    documents into turn text; this derives the expected quad-predicate
    counts and linking edges by re-parsing those planted blocks with
    stdlib ``json`` and applying the *planting spec's* arithmetic counting
    rules plus an independent union-find — no tordf/expand/linking code is
    touched, so the oracle and the engine can only agree by computing the
    same answer.
    """
    import json as _json
    import re as _re
    from collections import Counter

    from rdflib_jsonld_spark.sources.registry import VOCAB as _V
    from rdflib_jsonld_spark.sources.transcripts import (
        FENCE_CLOSE, FENCE_OPEN, generate_conv)

    fence_re = _re.compile(
        _re.escape(FENCE_OPEN) + r"(.*?)" + _re.escape(FENCE_CLOSE),
        _re.DOTALL)

    def norm_surface(s: str) -> str:
        s = s.lower()
        s = _re.sub(r"[^a-z0-9]+", " ", s)
        s = _re.sub(r"\b(inc|gmbh|corp|ltd|llc)\b", " ", s)
        return _re.sub(r" +", " ", s).strip()

    pred_counts: Counter = Counter()
    sameas_edges: set[tuple[str, str]] = set()
    blocks: dict[str, set[str]] = {}
    n_malformed = 0

    for conv_n in range(n_convs):
        for row in generate_conv(seed, conv_n):
            for m in fence_re.finditer(row["text"]):
                try:
                    doc = _json.loads(m.group(1))
                except ValueError:
                    n_malformed += 1  # planted malformed block → no quads
                    continue
                nodes = doc.get("@graph") or [doc]
                for node in nodes:
                    if "@type" in node:
                        pred_counts[_RDF + "type"] += 1
                    for key, piri in (("surface", _V + "surface"),
                                      ("about", _V + "about"),
                                      ("turn", _V + "turn"),
                                      ("confidence", _V + "confidence")):
                        if key in node:
                            pred_counts[piri] += 1
                    if "label" in node:
                        pred_counts[_V + "label"] += len(node["label"])
                    if "tags" in node:
                        tags = node["tags"]
                        pred_counts[_V + "tags"] += 1
                        pred_counts[_RDF + "first"] += len(tags)
                        pred_counts[_RDF + "rest"] += len(tags)
                    if "sameAs" in node:
                        pred_counts[_OWL_SAMEAS] += 1
                        sameas_edges.add((node["id"], node["sameAs"]))
                    if "surface" in node and "about" in node:
                        blocks.setdefault(norm_surface(node["surface"]),
                                          set()).add(node["about"])

    block_edges = set()
    for ents in blocks.values():
        root = min(ents)
        block_edges.update((e, root) for e in ents if e != root)
    edges = sorted(sameas_edges | block_edges)

    # independent union-find; root = lexicographic component min
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted({n for e in edges for n in e})
    mapping = [(n, find(n)) for n in nodes if find(n) != n]
    return pred_counts, edges, mapping, n_malformed


_TRANSCRIPT_TRUTH_CACHE: list = []


def _transcript_oracle_sqls() -> dict[str, str]:
    if not _TRANSCRIPT_TRUTH_CACHE:
        _TRANSCRIPT_TRUTH_CACHE.append(_transcript_truth())
    pred_counts, edges, mapping, n_malformed = _TRANSCRIPT_TRUTH_CACHE[0]
    top = sorted(pred_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    top_vals = ", ".join(f"('{p}', {n}::BIGINT)" for p, n in top)
    edge_vals = ", ".join(f"('{a}', '{b}')" for a, b in edges)
    map_vals = ", ".join(f"('{n}', '{r}')" for n, r in mapping)
    return {
        "kg_top_predicates_transcripts": f"""
            SELECT * FROM (VALUES {top_vals}) AS t(p, n_quads)
            ORDER BY n_quads DESC, p
        """,
        "kg_sameas_edges_transcripts": f"""
            SELECT * FROM (VALUES {edge_vals}) AS t(src, dst)
            ORDER BY src, dst
        """,
        "kg_canonical_mapping_transcripts": f"""
            SELECT * FROM (VALUES {map_vals}) AS t(node, root)
            ORDER BY node
        """,
        "kg_expand_error_metrics": f"""
            SELECT {n_malformed}::BIGINT AS n_errors,
                   {sum(pred_counts.values())}::BIGINT AS n_quads
        """,
    }


def _lang_id_oracle_sql() -> str:
    """DuckDB mirror of textstats.lang_id_udf, generated from the SAME
    n-gram profiles so the two can never drift: per-language substring-hit
    scores, normalized by length, argmax with lexicographic tie-break."""
    from rdflib_jsonld_spark.operators.textstats import _PROFILES
    langs = sorted(_PROFILES)
    score_cols = []
    for lang in langs:
        hits = " + ".join(
            f"(length(t) - length(replace(t, '{g}', ''))) / {len(g)}"
            for g in _PROFILES[lang])
        score_cols.append(
            f"({hits}) / (1 + length(t) / 100.0) AS s_{lang}")
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs)
    return f"""
        WITH scored AS (
          SELECT doc_id, {', '.join(score_cols)}
          FROM (SELECT doc_id, lower(text) AS t FROM documents)),
        pred AS (
          SELECT doc_id,
                 CASE WHEN m <= 0 THEN 'und' {case} ELSE 'und' END
                     AS pred_lang
          FROM (SELECT *, {m} AS m FROM scored))
        SELECT pred_lang, count(*)::BIGINT AS n_docs
        FROM pred GROUP BY pred_lang ORDER BY pred_lang
    """


def _pagerank_oracle_sql(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled PageRank recurrence over the symmetrized sameAs alias
    graph — one CTE per power iteration, exactly the fixed-iteration
    computation operators/graphstats.pagerank runs (no dangling term:
    the symmetric graph makes every node a source)."""
    pre = f"""
        WITH d0 AS (
          SELECT doc_id % 500 AS e,
                 doc_id % (1 + (doc_id % 500) % 3) AS j
          FROM documents),
        links AS (
          SELECT DISTINCT e, m
          FROM d0, unnest(generate_series(1, j)) AS t(m)
          WHERE j >= 1),
        edges AS (
          -- alias CHAIN: a_m owl:sameAs a_(m-1), symmetrized
          SELECT '{KG}e/' || e::VARCHAR || '/a' || m::VARCHAR AS src,
                 '{KG}e/' || e::VARCHAR || '/a' || (m - 1)::VARCHAR AS dst
          FROM links
          UNION ALL
          SELECT '{KG}e/' || e::VARCHAR || '/a' || (m - 1)::VARCHAR,
                 '{KG}e/' || e::VARCHAR || '/a' || m::VARCHAR
          FROM links),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        deg AS (SELECT src AS node, count(*)::DOUBLE AS od
                FROM edges GROUP BY src),
        np AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM np) AS rank FROM nodes)"""
    body = ""
    for i in range(1, iters + 1):
        body += f""",
        r{i} AS (
          SELECT nd.node,
                 (1.0 - {d}) / (SELECT n FROM np)
                 + {d} * coalesce(c.contrib, 0.0) AS rank
          FROM nodes nd LEFT JOIN (
            SELECT ed.dst AS node, sum(r.rank / dg.od) AS contrib
            FROM edges ed
            JOIN r{i - 1} r ON r.node = ed.src
            JOIN deg dg ON dg.node = ed.src
            GROUP BY ed.dst) c ON c.node = nd.node)"""
    return pre + body + f"""
        SELECT node, round(rank, 8) AS rank FROM r{iters} ORDER BY node
    """


def _kmeans_oracle_sql(k: int = 6, iters: int = 3, dim: int = 64) -> str:
    """Full Lloyd recurrence unrolled in SQL: the same md5-order init,
    per-iteration argmin (rank by distance then cluster index — the
    lower-index tie-break of clustering._assign_col) and per-dimension
    avg update that operators/clustering.kmeans runs."""
    pre = f"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      c0 AS (SELECT row_number() OVER (
                 ORDER BY md5(vec_id::VARCHAR || chr(31) || 'km-v1')) - 1
                 AS c, v
             FROM e
             ORDER BY md5(vec_id::VARCHAR || chr(31) || 'km-v1')
             LIMIT {k})"""
    body = ""
    for i in range(iters + 1):
        body += f""",
      a{i} AS (
        SELECT vec_id, c FROM (
          SELECT e.vec_id, ci.c,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_distance(e.v, ci.v), ci.c) AS rn
          FROM e CROSS JOIN c{i} ci) t WHERE rn = 1)"""
        if i < iters:
            body += f""",
      u{i + 1} AS (
        SELECT a.c, r.i, avg(e.v[r.i]) AS m
        FROM a{i} a JOIN e USING (vec_id)
        CROSS JOIN range(1, {dim + 1}) r(i)
        GROUP BY a.c, r.i),
      c{i + 1} AS (
        SELECT c, list(m ORDER BY i) AS v FROM u{i + 1} GROUP BY c
        UNION ALL
        SELECT c, v FROM c{i}
        WHERE c NOT IN (SELECT DISTINCT c FROM u{i + 1}))"""
    return pre + body + f"""
      SELECT c AS cluster, count(*)::BIGINT AS n
      FROM a{iters} GROUP BY c ORDER BY cluster"""


def oracle_sql() -> dict[str, str]:
    return {
        # --- KG pipeline, predictable from doc_id arithmetic -------------
        "kg_entity_counts_documents": f"""
            SELECT '{KG}e/' || (doc_id % 500)::varchar || '/a0' AS canonical_id,
                   count(*) AS n_mentions
            FROM documents
            GROUP BY 1
            ORDER BY n_mentions DESC, canonical_id
            LIMIT 50
        """,
        "kg_bgp_optional_sameas": """
            SELECT count(*)::BIGINT AS n_mentions,
                   sum(CASE WHEN doc_id % (1 + (doc_id % 500) % 3) >= 1
                       THEN 1 ELSE 0 END)::BIGINT AS n_with_sameas
            FROM documents
        """,
        "kg_shacl_extended": """
            WITH n AS (SELECT count(*)::BIGINT AS c FROM documents)
            SELECT "constraint", n_violations FROM (
              SELECT 'closed' AS "constraint", c AS n_violations FROM n
              UNION ALL SELECT 'equals', 2 * c FROM n
              UNION ALL SELECT 'has_value', c FROM n)
            ORDER BY "constraint"
        """,
        "kg_shacl_report": f"""
            WITH n AS (SELECT count(*)::BIGINT AS c FROM documents),
            p AS (SELECT count(*)::BIGINT AS c FROM documents
                  WHERE doc_id % 5 IN (1, 3))
            SELECT path, "constraint", n_violations FROM (
              SELECT '{KG}vocab#about' AS path,
                     'class' AS "constraint", c AS n_violations FROM n
              UNION ALL
              SELECT '{KG}vocab#surface', 'pattern', c FROM p)
            ORDER BY path, "constraint"
        """,
        "kg_rdfs_customer_types": """
            WITH ct AS (
              SELECT c_nationkey AS k, count(*)::BIGINT AS n
              FROM customer GROUP BY 1),
            nt AS (
              SELECT n_regionkey AS r, sum(n)::BIGINT AS n
              FROM ct JOIN nation ON k = n_nationkey GROUP BY 1)
            SELECT cls, n_instances FROM (
              SELECT 'http://example.org/db/nation/n_nationkey='
                     || k::varchar AS cls, n AS n_instances FROM ct
              UNION ALL
              SELECT 'http://example.org/db/region/r_regionkey='
                     || r::varchar, n FROM nt
              UNION ALL
              SELECT 'urn:Geo',
                     (SELECT count(*)::BIGINT FROM customer))
            ORDER BY cls
        """,
        "kg_directmap_nation_quads": """
            WITH s AS (
              SELECT 'http://example.org/db/nation/n_nationkey='
                     || n_nationkey::varchar AS s, * FROM nation),
            q AS (
              SELECT s,
                     'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                         AS p,
                     'iri' AS o_kind,
                     'http://example.org/db/nation' AS o_value,
                     NULL::varchar AS o_datatype
              FROM s
              UNION ALL
              SELECT s, 'http://example.org/db/nation#n_nationkey',
                     'literal', n_nationkey::varchar,
                     'http://www.w3.org/2001/XMLSchema#integer' FROM s
              UNION ALL
              SELECT s, 'http://example.org/db/nation#n_name',
                     'literal', n_name,
                     'http://www.w3.org/2001/XMLSchema#string' FROM s
              UNION ALL
              SELECT s, 'http://example.org/db/nation#ref-n_regionkey',
                     'iri',
                     'http://example.org/db/region/r_regionkey='
                     || n_regionkey::varchar,
                     NULL::varchar FROM s)
            SELECT s, p, o_kind, o_value, o_datatype FROM q
            ORDER BY s, p, o_value
        """,
        "kg_directmap_sparql_join": """
            SELECT r.r_name AS rname,
                   count(*)::BIGINT AS n_nations
            FROM nation n JOIN region r
              ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
            ORDER BY rname
        """,
        "kg_graph_dedup_canonical": """
            SELECT source,
                   count(*)::BIGINT AS n_blocks,
                   count(DISTINCT
                         (doc_id % 500)::varchar || '_' ||
                         (doc_id % (1 + (doc_id % 500) % 3))::varchar
                         || '_' || (doc_id % 5)::varchar)::BIGINT
                       AS n_graphs
            FROM documents
            GROUP BY source
            ORDER BY source
        """,
        "kg_framed_mentions": """
            SELECT source,
                   count(*)::BIGINT AS n_blocks,
                   count(*)::BIGINT AS n_matched,
                   sum(CASE WHEN doc_id % (1 + (doc_id % 500) % 3) >= 1
                       THEN 1 ELSE 0 END)::BIGINT AS n_embedded
            FROM documents
            GROUP BY source
            ORDER BY source
        """,
        "kg_expanded_node_counts": """
            SELECT source AS conv_id,
                   count(*)::BIGINT AS n_blocks,
                   sum(1 + (doc_id % (1 + (doc_id % 500) % 3)))::BIGINT
                       AS n_nodes
            FROM documents
            GROUP BY source
            ORDER BY conv_id
        """,
        "kg_flattened_node_counts": """
            SELECT source AS conv_id,
                   count(*)::BIGINT AS n_blocks,
                   sum(1 + (doc_id % (1 + (doc_id % 500) % 3)))::BIGINT
                       AS n_nodes
            FROM documents
            GROUP BY source
            ORDER BY conv_id
        """,
        "kg_compact_roundtrip": """
            SELECT source AS conv_id,
                   count(*)::BIGINT AS n_blocks,
                   count(*)::BIGINT AS n_ok
            FROM documents
            GROUP BY source
            ORDER BY conv_id
        """,
        "kg_nquads_roundtrip": """
            WITH d AS (
              SELECT doc_id % (1 + (doc_id % 500) % 3) AS j FROM documents)
            SELECT o_kind, n FROM (
              SELECT 'iri' AS o_kind, sum(3 + j)::BIGINT AS n FROM d
              UNION ALL
              SELECT 'literal', (2 * count(*))::BIGINT FROM d)
            ORDER BY o_kind
        """,
        "kg_entity_pagerank": _pagerank_oracle_sql(5, 0.85),
        "kg_owl_property_closure": f"""
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            links AS (
              SELECT DISTINCT e, m
              FROM d, unnest(generate_series(1, j)) AS t(m)
              WHERE j >= 1),
            sym AS (
              SELECT '{KG}e/' || e::VARCHAR || '/a' || m::VARCHAR AS src,
                     '{KG}e/' || e::VARCHAR || '/a' || (m-1)::VARCHAR
                       AS dst
              FROM links
              UNION
              SELECT '{KG}e/' || e::VARCHAR || '/a' || (m-1)::VARCHAR,
                     '{KG}e/' || e::VARCHAR || '/a' || m::VARCHAR
              FROM links),
            reach AS (
              WITH RECURSIVE r(src, dst) AS (
                SELECT src, dst FROM sym
                UNION
                SELECT r.src, s.dst FROM r JOIN sym s ON r.dst = s.src)
              SELECT * FROM r)
            SELECT p, n FROM (
              SELECT '{KG}vocab#about' AS p,
                     (SELECT count(*) FROM documents)::BIGINT AS n
              UNION ALL
              SELECT '{KG}vocab#aboutOf',
                     (SELECT count(*) FROM documents)::BIGINT
              UNION ALL
              SELECT 'http://www.w3.org/2002/07/owl#sameAs',
                     (SELECT count(*) FROM reach)::BIGINT)
            ORDER BY p
        """,
        "kg_bfs_distances": """
            WITH ents AS (SELECT DISTINCT doc_id % 500 AS e
                          FROM documents)
            SELECT e::BIGINT AS entity, e::BIGINT AS dist
            FROM ents WHERE e <= 12
            ORDER BY entity
        """,
        "kg_lpa_communities": """
            WITH occ AS (
              SELECT DISTINCT source, (doc_id % 500)::VARCHAR AS e
              FROM documents),
            edges AS (
              SELECT a.e AS src, b.e AS dst
              FROM occ a JOIN occ b
                ON a.source = b.source AND a.e <> b.e),
            l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
            v1 AS (SELECT e.src, l.label, count(*) AS cnt
                   FROM edges e JOIN l0 l ON l.node = e.dst
                   GROUP BY e.src, l.label),
            l1 AS (SELECT src AS node, label FROM (
                     SELECT src, label, row_number() OVER (
                       PARTITION BY src ORDER BY cnt DESC, label) AS rn
                     FROM v1) t WHERE rn = 1),
            v2 AS (SELECT e.src, l.label, count(*) AS cnt
                   FROM edges e JOIN l1 l ON l.node = e.dst
                   GROUP BY e.src, l.label),
            l2 AS (SELECT src AS node, label FROM (
                     SELECT src, label, row_number() OVER (
                       PARTITION BY src ORDER BY cnt DESC, label) AS rn
                     FROM v2) t WHERE rn = 1)
            SELECT label, count(*)::BIGINT AS n_members
            FROM l2 GROUP BY label ORDER BY label
        """,
        "kg_cooccurrence_triangles": """
            WITH occ AS (
              SELECT DISTINCT source, doc_id % 500 AS e FROM documents),
            grp AS (
              SELECT source, count(*)::BIGINT AS n FROM occ
              GROUP BY source)
            SELECT sum(n)::BIGINT AS n_nodes,
                   sum(n * (n - 1) / 2)::BIGINT AS n_edges,
                   sum(n * (n - 1) * (n - 2) / 2)::BIGINT AS n_wedges,
                   sum(n * (n - 1) * (n - 2) / 6)::BIGINT AS n_triangles,
                   round(CASE WHEN sum(n * (n - 1) * (n - 2) / 2) > 0
                         THEN 3.0 * sum(n * (n - 1) * (n - 2) / 6)
                              / sum(n * (n - 1) * (n - 2) / 2)
                         ELSE 0.0 END, 6) AS clustering_coefficient
            FROM grp
        """,
        "kg_turtle_roundtrip": """
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            links AS (
              SELECT DISTINCT e, m
              FROM d, unnest(generate_series(1, j)) AS t(m)
              WHERE j >= 1)
            SELECT o_kind, n FROM (
              SELECT 'iri' AS o_kind,
                     ((SELECT 3 * count(*) FROM d)
                      + (SELECT count(*) FROM links))::BIGINT AS n
              UNION ALL
              SELECT 'literal', (SELECT 2 * count(*) FROM d)::BIGINT)
            ORDER BY o_kind
        """,
        "kg_predicate_counts_documents": f"""
            WITH d AS (
              SELECT doc_id,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents)
            SELECT p, n_quads FROM (
              SELECT '{KG}vocab#about' AS p, count(*)::BIGINT AS n_quads FROM d
              UNION ALL SELECT '{KG}vocab#surface', count(*)::BIGINT FROM d
              UNION ALL SELECT '{KG}vocab#turn', count(*)::BIGINT FROM d
              UNION ALL SELECT '{KG}vocab#confidence', count(*)::BIGINT FROM d
              UNION ALL SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                               count(*)::BIGINT FROM d
              UNION ALL SELECT 'http://www.w3.org/2002/07/owl#sameAs',
                               sum(j)::BIGINT FROM d)
            ORDER BY p
        """,
        "kg_quad_stats_documents": """
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            links AS (
              SELECT DISTINCT e, m
              FROM d, unnest(generate_series(1, j)) AS t(m)
              WHERE j >= 1)
            SELECT ((SELECT 5 * count(*) FROM documents)
                    + (SELECT coalesce(sum(j), 0) FROM d))::BIGINT AS n_quads,
                   ((SELECT count(*) FROM documents)
                    + (SELECT count(*) FROM links))::BIGINT AS n_subjects,
                   6::BIGINT AS n_predicates
        """,
        "kg_cc_distributed_documents": f"""
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            maxj AS (SELECT e, max(j) AS mj FROM d GROUP BY e),
            nodes AS (
              SELECT e, i AS j
              FROM maxj, UNNEST(range(1, mj + 1)) AS t(i)
              WHERE mj >= 1)
            SELECT '{KG}e/' || e::varchar || '/a' || j::varchar AS node,
                   '{KG}e/' || e::varchar || '/a0' AS root
            FROM nodes
            ORDER BY node
        """,
        "kg_bgp_mention_counts": f"""
            SELECT '{KG}e/' || (doc_id % 500)::varchar || '/a'
                     || (doc_id % (1 + (doc_id % 500) % 3))::varchar AS e,
                   count(*) AS n_mentions
            FROM documents
            GROUP BY 1
            ORDER BY e
        """,
        "kg_bgp_union_about_sameas": f"""
            WITH d AS (
              SELECT doc_id, doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            about AS (
              SELECT '{KG}m/doc/' || doc_id::varchar AS s,
                     '{KG}e/' || e::varchar || '/a' || j::varchar AS o
              FROM d),
            maxj AS (SELECT e, max(j) AS mj FROM d GROUP BY e),
            sameas AS (
              SELECT '{KG}e/' || e::varchar || '/a' || i::varchar AS s,
                     '{KG}e/' || e::varchar || '/a' || (i-1)::varchar AS o
              FROM maxj, UNNEST(range(1, mj + 1)) AS t(i)
              WHERE mj >= 1)
            SELECT s, o FROM (
              SELECT * FROM about UNION SELECT * FROM sameas)
            ORDER BY s, o
        """,
        "kg_bgp_negation_counts": """
            SELECT sum(CASE WHEN doc_id % (1 + (doc_id % 500) % 3) = 0
                       THEN 1 ELSE 0 END)::BIGINT AS n_not_exists,
                   sum(CASE WHEN doc_id % (1 + (doc_id % 500) % 3) = 0
                       THEN 1 ELSE 0 END)::BIGINT AS n_minus_shared,
                   count(*)::BIGINT AS n_minus_disjoint
            FROM documents
        """,
        "kg_bgp_values_mentions": f"""
            SELECT '{KG}e/' || (doc_id % 500)::varchar || '/a0' AS e,
                   '{KG}m/doc/' || doc_id::varchar AS m
            FROM documents
            WHERE doc_id % 500 IN (3, 4)
            ORDER BY m
        """,
        "kg_construct_entity_graph": f"""
            WITH d AS (
              SELECT doc_id, doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents)
            SELECT p, n FROM (
              SELECT '{KG}vocab#mentionedBy' AS p,
                     count(*)::BIGINT AS n FROM d
              UNION ALL
              SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                     count(DISTINCT e * 10 + j)::BIGINT FROM d)
            ORDER BY p
        """,
        "kg_sameas_closure": f"""
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            maxj AS (SELECT e, max(j) AS mj FROM d GROUP BY e),
            pairs AS (
              SELECT e, i, jj
              FROM maxj,
                   UNNEST(range(1, mj + 1)) AS t(i),
                   UNNEST(range(0, i)) AS u(jj)
              WHERE mj >= 1)
            SELECT '{KG}e/' || e::varchar || '/a' || i::varchar AS src,
                   '{KG}e/' || e::varchar || '/a' || jj::varchar AS dst
            FROM pairs
            ORDER BY src, dst
        """,
        "kg_path_alias_reach": f"""
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            agg AS (SELECT e, count(*) AS n, max(j) AS mj
                    FROM d GROUP BY e)
            SELECT '{KG}e/' || e::varchar || '/a' || k::varchar AS a,
                   n::BIGINT AS n_mentions
            FROM agg, UNNEST(range(0, mj + 1)) AS t(k)
            ORDER BY a
        """,
        "kg_sparql_text_aggregate": f"""
            WITH m AS (
              SELECT '{KG}m/doc/' || doc_id::varchar AS mention,
                     '{KG}e/' || (doc_id % 500)::varchar || '/a' ||
                         (doc_id % (1 + (doc_id % 500) % 3))::varchar AS e,
                     ((doc_id % 500) % 50)::BIGINT AS grp
              FROM documents)
            SELECT grp,
                   count(mention)::BIGINT AS n_mentions,
                   count(DISTINCT e)::BIGINT AS n_aliases,
                   min(mention) AS first_mention
            FROM m
            GROUP BY grp
            HAVING count(mention) > 5
            ORDER BY n_mentions DESC, grp
            LIMIT 30
        """,
        "kg_sparql_text_union_negation": """
            WITH mj AS (
              SELECT doc_id % 500 AS ent,
                     max(doc_id % (1 + (doc_id % 500) % 3)) AS m
              FROM documents GROUP BY 1)
            SELECT kind, n FROM (
              SELECT 'alias_link' AS kind, sum(m)::BIGINT AS n FROM mj
              UNION ALL
              SELECT 'mention', count(*)::BIGINT FROM documents)
            WHERE n > 0
            ORDER BY kind
        """,
        "kg_sparql_text_path": f"""
            WITH mj AS (
              SELECT doc_id % 500 AS ent,
                     max(doc_id % (1 + (doc_id % 500) % 3)) AS m
              FROM documents GROUP BY 1)
            SELECT '{KG}e/' || ent::varchar || '/a' || k::varchar AS src,
                   k::BIGINT AS n_reach
            FROM mj, UNNEST(range(1, m + 1)) AS t(k)
            ORDER BY src
        """,
        "kg_sparql_text_ask": """
            SELECT which, ask FROM (
              SELECT 'any_mention' AS which,
                     (SELECT count(*) FROM documents) > 0 AS ask
              UNION ALL
              SELECT 'orphan_mention', false)
            ORDER BY which
        """,
        "kg_sparql_text_describe": f"""
            SELECT p, n_quads FROM (
              SELECT '{KG}vocab#about' AS p, 1::BIGINT AS n_quads
              UNION ALL SELECT '{KG}vocab#confidence', 1
              UNION ALL SELECT '{KG}vocab#surface', 1
              UNION ALL SELECT '{KG}vocab#turn', 1
              UNION ALL SELECT
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 1)
            ORDER BY p
        """,
        "kg_sparql_update_rewrite": f"""
            WITH d AS (
              SELECT doc_id % 500 AS e,
                     doc_id % (1 + (doc_id % 500) % 3) AS j
              FROM documents),
            mx AS (SELECT e, max(j) AS m FROM d GROUP BY e),
            nd AS (SELECT count(*)::BIGINT AS n FROM documents),
            lk AS (SELECT coalesce(sum(m), 0)::BIGINT AS n FROM mx)
            SELECT p, n_quads FROM (
              SELECT '{KG}vocab#about' AS p, n AS n_quads FROM nd
              UNION ALL SELECT '{KG}vocab#surface', n FROM nd
              UNION ALL SELECT '{KG}vocab#turn', n FROM nd
              UNION ALL SELECT
                'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', n FROM nd
              UNION ALL SELECT '{KG}vocab#linked', n FROM lk
              UNION ALL SELECT '{KG}vocab#status', n FROM lk
              UNION ALL SELECT '{KG}vocab#rev', 1)
            ORDER BY p
        """,
        "kg_sparql_text_subquery": f"""
            WITH mc AS (
              SELECT doc_id % 500 AS ent,
                     doc_id % (1 + (doc_id % 500) % 3) AS al,
                     count(*)::BIGINT AS n_m
              FROM documents GROUP BY 1, 2)
            SELECT '{KG}e/' || ent::varchar || '/a' || al::varchar AS e,
                   n_m, al::BIGINT AS n_reach
            FROM mc WHERE al >= 1
            ORDER BY e
        """,
        # --- relational -----------------------------------------------------
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= timestamp '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "lineitem_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                   round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                   round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
                   round(stddev_samp(l_extendedprice), 4) AS sd
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
        "doc_ngram_jaccard_pairs": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
                         AS w
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
                      GROUP BY doc_id),
            overlap AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(round(n_common
                               / (sa.n_grams + sb.n_grams - n_common), 6), 4)
                       AS jaccard
            FROM overlap
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(n_common / (sa.n_grams + sb.n_grams - n_common), 6)
                  >= 0.4
            ORDER BY jaccard DESC, id_a, id_b LIMIT 50
        """,
        "events_asof_attribution": """
            WITH p AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id AS click_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT p.event_id, p.user_id,
                   round(p.value, 2) AS value,
                   c.click_id,
                   round(epoch(p.ts) - epoch(c.ts), 3) AS gap_seconds
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id
        """,
        "tpch_q14_promo_revenue": """
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0.0 END)
                         / sum(l_extendedprice * (1 - l_discount)), 4)
                       AS promo_revenue_pct,
                   count(*)::BIGINT AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1998-03-01'
              AND l_shipdate <  TIMESTAMP '1998-06-01'
        """,
        "tpch_q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 150)
            SELECT c_name, c_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(sum(l_quantity)::DOUBLE, 2) AS total_qty
            FROM lineitem
            JOIN big USING (l_orderkey)
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "tpch_q3_shipping_priority": """
            SELECT l_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < timestamp '1998-01-01'
              AND l_shipdate  > timestamp '1998-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey
            LIMIT 10
        """,
        "tpch_q5_local_supplier": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "tpch_q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= timestamp '1996-01-01'
              AND l_shipdate <  timestamp '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24
        """,
        "lineitem_cube": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "orders_rank_window": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 3
        """,
        "lineitem_cube": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity)::BIGINT AS sum_qty,
                   count(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "events_session_windows": """
            WITH seq AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w)
                                  > 1800
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            tagged AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts ROWS UNBOUNDED
                                      PRECEDING) AS sid
              FROM seq)
            SELECT user_id,
                   min(ts)::TIMESTAMP AS session_start,
                   count(*)::BIGINT AS n_events
            FROM tagged
            GROUP BY user_id, sid
            ORDER BY user_id, session_start
        """,
        "events_sliding_windows": """
            WITH starts AS (
              SELECT to_timestamp(floor(epoch(ts))::BIGINT
                       - (floor(epoch(ts))::BIGINT % 1800))::TIMESTAMP
                       AS w,
                     value
              FROM events
              UNION ALL
              SELECT to_timestamp(floor(epoch(ts))::BIGINT
                       - (floor(epoch(ts))::BIGINT % 1800)
                       - 1800)::TIMESTAMP,
                     value
              FROM events)
            SELECT w AS window_start,
                   count(*)::BIGINT AS n,
                   round(sum(value), 2) AS sum_value
            FROM starts
            GROUP BY w
            ORDER BY window_start
        """,
        "events_funnel": """
            WITH s0 AS (
              SELECT user_id, min(ts) AS t0
              FROM events WHERE event_type = 'signup'
              GROUP BY user_id),
            s1 AS (
              SELECT s0.user_id, s0.t0, min(e.ts) AS t
              FROM s0 JOIN events e
                ON e.user_id = s0.user_id AND e.event_type = 'view'
                   AND e.ts > s0.t0
                   AND epoch(e.ts) <= epoch(s0.t0) + 7200
              GROUP BY s0.user_id, s0.t0),
            s2 AS (
              SELECT s1.user_id, s1.t0, min(e.ts) AS t
              FROM s1 JOIN events e
                ON e.user_id = s1.user_id AND e.event_type = 'purchase'
                   AND e.ts > s1.t
                   AND epoch(e.ts) <= epoch(s1.t0) + 7200
              GROUP BY s1.user_id, s1.t0)
            SELECT step_idx, step, n_users FROM (
              SELECT 0 AS step_idx, 'signup' AS step,
                     count(*)::BIGINT AS n_users FROM s0
              UNION ALL SELECT 1, 'view', count(*)::BIGINT FROM s1
              UNION ALL SELECT 2, 'purchase', count(*)::BIGINT FROM s2)
            ORDER BY step_idx
        """,
        "events_sessionize": """
            SELECT user_id,
                   sum(new_session)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM (
              SELECT user_id,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800000000
                          OR lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                          THEN 1 ELSE 0 END AS new_session
              FROM events)
            GROUP BY user_id
            ORDER BY user_id
        """,
        "events_rolling_value_sum": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                       AS rolling3
            FROM events
            ORDER BY event_id
        """,
        "events_hourly_windows": """
            SELECT date_trunc('hour', ts) AS window_start,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY window_start, event_type
        """,
        "events_json_stats": """
            SELECT event_type,
                   count(*) AS n,
                   sum(regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT)::BIGINT
                       AS sum_k,
                   round(avg(value), 4) AS avg_value
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "customers_with_orders_semijoin": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_nationkey
            ORDER BY c_nationkey
        """,
        "returnflag_set_ops": """
            WITH early AS (
              SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              WHERE l_shipdate < timestamp '1996-01-01'),
            late AS (
              SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              WHERE l_shipdate >= timestamp '1996-01-01')
            SELECT * FROM (
              SELECT * FROM early INTERSECT SELECT * FROM late
              UNION ALL
              (SELECT * FROM early EXCEPT SELECT * FROM late))
            ORDER BY l_returnflag, l_linestatus
        """,
        # --- planted-truth oracles for the synthetic-generator corpus -----
        **_transcript_oracle_sqls(),
        # --- documents/embeddings ------------------------------------------
        "doc_lang_pred_counts": _lang_id_oracle_sql(),
        "doc_token_stats": r"""
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(len(regexp_split_to_array(trim(text), '\s+'))), 4)
                       AS avg_ws_tokens,
                   round(avg(len(regexp_extract_all(
                       text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))), 4)
                       AS avg_bpe_tokens,
                   round(avg(length(text)), 4) AS avg_chars
            FROM documents
            GROUP BY lang
            ORDER BY lang
        """,
        "doc_quality_by_source": rf"""
            WITH scored AS (
              SELECT source,
                     length(text) AS n_chars,
                     length(text)
                       - length(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_words,
                     len(regexp_extract_all(text, '{_STOP_PATTERN}'))
                       AS n_stop,
                     length(regexp_replace(text, '\s+', '', 'g')) AS n_nonws
              FROM documents),
            ratios AS (
              SELECT source,
                     CASE WHEN n_chars > 0
                          THEN n_punct::DOUBLE / n_chars ELSE 0 END AS punct_ratio,
                     CASE WHEN n_words > 0
                          THEN n_stop::DOUBLE / n_words ELSE 0 END AS stop_ratio,
                     CASE WHEN n_words > 0
                          THEN n_nonws::DOUBLE / n_words ELSE 0 END AS mean_wlen,
                     n_words
              FROM scored),
            q AS (
              SELECT source,
                     round(punct_ratio, 6) AS punct_ratio,
                     round(stop_ratio, 6) AS stop_ratio,
                     round(CASE WHEN n_words >= 5 THEN 0.4 ELSE 0.0 END
                         + CASE WHEN punct_ratio < 0.2 THEN 0.2 ELSE 0.0 END
                         + CASE WHEN stop_ratio > 0.05 AND stop_ratio < 0.6
                                THEN 0.2 ELSE 0.0 END
                         + CASE WHEN mean_wlen > 2.5 AND mean_wlen < 12.0
                                THEN 0.2 ELSE 0.0 END, 2) AS quality_score
              FROM ratios)
            SELECT source,
                   count(*) AS n_docs,
                   round(avg(quality_score), 4) AS avg_quality,
                   round(avg(punct_ratio), 6) AS avg_punct_ratio,
                   round(avg(stop_ratio), 6) AS avg_stop_ratio
            FROM q
            GROUP BY source
            ORDER BY source
        """,
        "doc_chunk_stats": """
            WITH chunks AS (
              SELECT doc_id, source, i AS chunk_idx,
                     substr(text, (i * 450 + 1)::INT, 500) AS chunk_text
              FROM documents,
                   UNNEST(range(0, greatest(1,
                       ceil((length(text) - 50) / 450.0))::BIGINT)) AS t(i))
            SELECT source,
                   count(*) AS n_chunks,
                   count(DISTINCT doc_id) AS n_docs,
                   max(chunk_idx)::BIGINT AS max_chunk_idx,
                   round(avg(length(chunk_text)), 4) AS avg_chunk_chars
            FROM chunks
            GROUP BY source
            ORDER BY source
        """,
        "doc_exact_dup_groups": """
            WITH both_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 5)
            SELECT md5(text) AS text_md5,
                   count(*) AS n_dups,
                   min(doc_id) AS keep_id,
                   max(doc_id) AS max_dup_id
            FROM both_docs
            GROUP BY md5(text)
            HAVING count(*) > 1
            ORDER BY keep_id
        """,
        "kg_bgp_group_aggregates": """
            WITH m AS (
              SELECT 'https://kg.example.org/m/doc/' || doc_id::varchar
                         AS mention,
                     'https://kg.example.org/e/' || (doc_id % 500)::varchar
                         || '/a' ||
                         (doc_id % (1 + (doc_id % 500) % 3))::varchar AS e,
                     ((doc_id % 500) % 50)::INT AS grp,
                     (doc_id % (1 + (doc_id % 500) % 3))::INT AS j
              FROM documents)
            SELECT grp,
                   count(mention)::BIGINT AS n_mentions,
                   count(DISTINCT e)::BIGINT AS n_aliases,
                   min(mention) AS first_mention,
                   max(j) AS max_alias_idx
            FROM m
            GROUP BY grp
            HAVING count(*) > 1
            ORDER BY n_mentions DESC, grp
            LIMIT 25
        """,
        "doc_decontam_flags": r"""
            WITH corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
              WHERE doc_id % 97 = 0),
            words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
                         AS w
              FROM corpus),
            bwords AS (
              SELECT string_split_regex(trim(lower(text)), '\s+') AS w
              FROM documents WHERE doc_id % 97 = 0),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-4, 1)+1)) AS t(i)),
            bench AS (
              SELECT DISTINCT array_to_string(w[i:i+4], ' ') AS gram
              FROM bwords, UNNEST(range(1, greatest(len(w)-4, 1)+1)) AS t(i))
            SELECT g.doc_id, count(*)::BIGINT AS n_hits
            FROM grams g JOIN bench USING (gram)
            GROUP BY g.doc_id
            ORDER BY g.doc_id
        """,
        "doc_repetition_scores": r"""
            WITH words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+')
                         AS w
              FROM documents),
            grams AS (
              SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            per_gram AS (
              SELECT doc_id, gram, count(*) AS c FROM grams
              GROUP BY doc_id, gram)
            SELECT doc_id,
                   sum(c)::BIGINT AS total_grams,
                   round(1 - count(*)/sum(c), 6) AS dup_frac,
                   round(max(c)/sum(c), 6) AS top_frac
            FROM per_gram
            GROUP BY doc_id
            ORDER BY dup_frac DESC, doc_id
            LIMIT 20
        """,
        "supplier_fuzzy_clusters": """
            WITH RECURSIVE pg AS (
              SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
              FROM supplier a JOIN supplier b
                ON a.s_suppkey < b.s_suppkey
              WHERE levenshtein(a.s_name, b.s_name) <= 1),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pg
              UNION SELECT id_b, id_a FROM pg),
            closure(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT c.a, e.b FROM closure c JOIN edges e ON e.a = c.b
              WHERE e.b != c.a),
            roots AS (
              SELECT a AS node, least(a, min(b)) AS root
              FROM closure GROUP BY a)
            SELECT node::BIGINT AS s_suppkey, root::BIGINT AS cluster_root
            FROM roots WHERE root != node
            ORDER BY s_suppkey
        """,
        "supplier_fuzzy_pairs": """
            SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
                   levenshtein(a.s_name, b.s_name)::INT AS dist
            FROM supplier a JOIN supplier b
              ON a.s_suppkey < b.s_suppkey
            WHERE levenshtein(a.s_name, b.s_name) <= 1
            ORDER BY id_a, id_b
        """,
        "kg_ifp_sameas": """
            WITH g AS (
              SELECT c_nationkey, count(*)::BIGINT AS n
              FROM customer GROUP BY 1)
            SELECT sum(n * (n - 1) / 2)::BIGINT AS n_pairs,
                   sum(n - 1)::BIGINT AS n_src_distinct
            FROM g
        """,
        "kg_r2rml_customer_quads": """
            WITH q AS (
              SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                       AS p,
                     'http://e/cust/' || c_custkey::VARCHAR AS s,
                     'http://e/Customer' AS o
              FROM customer
              UNION ALL
              SELECT 'http://e/name',
                     'http://e/cust/' || c_custkey::VARCHAR, c_name
              FROM customer
              UNION ALL
              SELECT 'http://e/label',
                     'http://e/cust/' || c_custkey::VARCHAR, c_name
              FROM customer
              UNION ALL
              SELECT 'http://e/nation',
                     'http://e/cust/' || c_custkey::VARCHAR,
                     'http://e/nation/' || c_nationkey::VARCHAR
              FROM customer
              UNION ALL
              SELECT 'http://e/segment',
                     'http://e/cust/' || c_custkey::VARCHAR, c_mktsegment
              FROM customer)
            SELECT p, count(*)::BIGINT AS n,
                   sum(('0x' || substr(md5(s || chr(31) || o), 1, 8))
                       ::BIGINT)::BIGINT AS checksum
            FROM q GROUP BY p ORDER BY p
        """,
        "kg_chat_render": """
            SELECT source AS conv_id,
                   count(*)::BIGINT AS n_turns,
                   length(string_agg('user: ' || text, chr(10) || chr(10)
                                     ORDER BY doc_id))::BIGINT AS n_chars,
                   md5(string_agg('user: ' || text, chr(10) || chr(10)
                                  ORDER BY doc_id)) AS doc_md5
            FROM documents
            GROUP BY source
            ORDER BY conv_id
        """,
        "doc_clf_train": _clf_train_oracle_sql(5, 64, 1.0),
        "doc_clf_scores": r"""
            WITH w(b, wt) AS (VALUES (0, -2.4000000000000004),
                      (3, 0.0),
                      (6, 2.4000000000000004),
                      (9, -0.8),
                      (12, 1.6),
                      (15, -1.6),
                      (18, 0.8),
                      (21, -2.4000000000000004),
                      (24, 0.0),
                      (27, 2.4000000000000004),
                      (30, -0.8),
                      (33, 1.6),
                      (36, -1.6),
                      (39, 0.8),
                      (42, -2.4000000000000004),
                      (45, 0.0),
                      (48, 2.4000000000000004),
                      (51, -0.8),
                      (54, 1.6),
                      (57, -1.6),
                      (60, 0.8),
                      (63, -2.4000000000000004)),
            toks AS (
              SELECT doc_id, source, unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> '')) AS tok,
                     len(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''))::DOUBLE AS n
              FROM documents),
            per_doc AS (
              SELECT t.doc_id, t.source,
                     1.0 / (1.0 + exp(-(0.1 + sum(coalesce(w.wt, 0.0))
                                        / first(t.n)))) AS score
              FROM toks t LEFT JOIN w
                ON w.b = ('0x' || substr(md5(t.tok || chr(31)
                                             || 'clf-v1'), 1, 8))::BIGINT
                         % 64
              GROUP BY t.doc_id, t.source)
            SELECT source,
                   round(avg(score), 6) AS avg_score,
                   sum((score >= 0.5)::BIGINT)::BIGINT AS n_positive
            FROM per_doc
            GROUP BY source
            ORDER BY source
        """,
        "doc_bm25_topk": r"""
            WITH toks AS (
              SELECT doc_id AS doc, unnest(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> '')) AS term,
                     len(list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''))::BIGINT AS dl
              FROM documents),
            postings AS (
              SELECT term, doc, count(*)::BIGINT AS tf, first(dl) AS dl
              FROM toks GROUP BY term, doc),
            stats AS (
              SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM (
                SELECT DISTINCT doc, dl FROM postings)),
            hits AS (
              SELECT * FROM postings
              WHERE term IN ('spark', 'window', 'merge')),
            dfs AS (SELECT term, count(*)::DOUBLE AS df FROM hits
                    GROUP BY term)
            SELECT doc,
                   round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                             * h.tf * 2.2
                             / (h.tf + 1.2 * (0.25 + 0.75 * h.dl
                                              / s.avgdl))), 6) AS score
            FROM hits h JOIN dfs d USING (term) CROSS JOIN stats s
            GROUP BY doc
            ORDER BY sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                         * h.tf * 2.2
                         / (h.tf + 1.2 * (0.25 + 0.75 * h.dl / s.avgdl)))
                     DESC, doc
            LIMIT 15
        """,
        "doc_c4_flags": r"""
            WITH planted AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 3 = 0 THEN
                          chr(10) || 'This is a planted terminal sentence number one.'
                          || chr(10) || 'And a second good planted line for keeping!'
                          || chr(10) || 'Plus a third planted line that also qualifies.'
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN ' {' ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN ' lorem ipsum'
                        ELSE '' END AS t
              FROM documents),
            flags AS (
              SELECT doc_id,
                     len(string_split(t, chr(10)))::BIGINT AS n_lines,
                     len(list_filter(string_split(t, chr(10)),
                       ln -> regexp_matches(trim(ln), '[.!?"]$')
                             AND len(list_filter(
                                   regexp_split_to_array(trim(ln), '\s+'),
                                   w -> w <> '')) >= 5))::BIGINT
                       AS n_kept,
                     contains(lower(t), 'lorem ipsum') AS has_li,
                     contains(t, '{') AS has_br
              FROM planted)
            SELECT sum(n_lines)::BIGINT AS total_lines,
                   sum(n_kept)::BIGINT AS total_kept,
                   sum(has_li::BIGINT)::BIGINT AS n_lorem,
                   sum(has_br::BIGINT)::BIGINT AS n_brace,
                   sum((n_kept >= 3 AND NOT has_li AND NOT has_br)
                       ::BIGINT)::BIGINT AS n_keep
            FROM flags
        """,
        "doc_corpus_dedup": r"""
            WITH planted AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 4 = 0
                          THEN repeat('abcdefghij', 20) || text
                          ELSE text END AS t
              FROM documents),
            chunks AS (
              SELECT doc_id, source, i AS chunk_idx,
                     substr(t, i*200 + 1, 200) AS chunk_text
              FROM planted,
                   UNNEST(range(0, greatest(1, ceil(length(t) / 200.0))
                                   ::BIGINT)) AS r(i)),
            kept AS (
              SELECT doc_id, chunk_idx, chunk_text FROM (
                SELECT doc_id, chunk_idx, chunk_text,
                       row_number() OVER (PARTITION BY chunk_text
                                          ORDER BY doc_id, chunk_idx) AS rn
                FROM chunks) WHERE rn = 1),
            rebuilt AS (
              SELECT doc_id,
                     string_agg(chunk_text, '' ORDER BY chunk_idx) AS txt,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id),
            totals AS (
              SELECT doc_id, source, count(*) AS n_chunks
              FROM chunks GROUP BY doc_id, source)
            SELECT source,
                   count(*)::BIGINT AS n_docs,
                   sum(n_chunks)::BIGINT AS sum_chunks,
                   sum(n_chunks - coalesce(n_kept, 0))::BIGINT
                       AS sum_dropped,
                   sum(length(coalesce(txt, '')))::BIGINT AS sum_chars,
                   sum(('0x' || substr(md5(coalesce(txt, '')), 1, 8))
                       ::BIGINT)::BIGINT AS text_checksum
            FROM totals LEFT JOIN rebuilt USING (doc_id)
            GROUP BY source ORDER BY source
        """,
        "doc_shared_passages": r"""
            WITH planted AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 10 <= 1 THEN
                         ' planted shared passage '
                         || (doc_id // 10)::VARCHAR
                         || ' marker block pad end'
                       ELSE '' END AS raw
              FROM documents),
            norm AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(raw), '\s+', ' ', 'g')) AS t
              FROM planted),
            padded AS (
              SELECT doc_id,
                     CASE WHEN length(t) < 25 THEN rpad(t, 25, '_')
                          ELSE t END AS t
              FROM norm),
            grams AS (
              SELECT doc_id, i - 1 AS pos, substr(t, i, 25) AS g
              FROM padded,
                   UNNEST(range(1, length(t) - 25 + 2)) AS r(i)),
            ok AS (
              SELECT * FROM grams
              WHERE g IN (SELECT g FROM grams
                          GROUP BY g HAVING count(*) <= 1000)),
            m AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.pos AS pos_a, a.pos - b.pos AS delta
              FROM ok a JOIN ok b ON a.g = b.g AND a.doc_id < b.doc_id),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY id_a, id_b, delta
                                           ORDER BY pos_a) AS rn
              FROM m),
            spans AS (
              SELECT id_a, id_b, count(*) + 24 AS span_len
              FROM r GROUP BY id_a, id_b, delta, pos_a - rn),
            keep AS (SELECT * FROM spans WHERE span_len >= 40)
            SELECT id_a, id_b,
                   count(*)::BIGINT AS n_spans,
                   max(span_len)::BIGINT AS max_span,
                   sum(span_len)::BIGINT AS total_span
            FROM keep GROUP BY id_a, id_b ORDER BY id_a, id_b
        """,
        "kg_weighted_distances": """
            WITH RECURSIVE ents AS (
              SELECT DISTINCT (doc_id % 40)::BIGINT AS e FROM documents),
            edges AS (
              SELECT e AS src, e + 1 AS dst, (3 + e % 2)::BIGINT AS w
              FROM ents WHERE e < 39
              UNION ALL
              SELECT e, e + 2, (5 + e % 3)::BIGINT
              FROM ents WHERE e < 38),
            walk(node, dist) AS (
              SELECT 0::BIGINT, 0::BIGINT
              UNION
              SELECT edges.dst, walk.dist + edges.w
              FROM walk JOIN edges ON edges.src = walk.node)
            SELECT node AS entity, min(dist)::BIGINT AS dist
            FROM walk GROUP BY node ORDER BY entity
        """,
        "doc_curation_funnel": r"""
            WITH planted AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 4 = 0
                          THEN repeat('abcdefghij', 20) || ' '
                          ELSE '' END
                     || text
                     || CASE WHEN doc_id % 3 <> 0 THEN
                          chr(10) || 'This is a planted terminal sentence number one.'
                          || chr(10) || 'And a second good planted line for keeping!'
                          || chr(10) || 'Plus a third planted line that also qualifies.'
                        ELSE '' END
                     || CASE WHEN doc_id % 5 <> 0 THEN ' and that have with'
                        ELSE '' END AS t
              FROM documents),
            s1 AS (
              SELECT * FROM planted
              WHERE len(list_filter(string_split(t, chr(10)),
                      ln -> regexp_matches(trim(ln), '[.!?"]$')
                            AND len(list_filter(
                                  regexp_split_to_array(trim(ln), '\s+'),
                                  w -> w <> '')) >= 5)) >= 3
                AND NOT contains(lower(t), 'lorem ipsum')
                AND NOT contains(t, '{')),
            g AS (
              SELECT doc_id, source, t,
                     list_filter(regexp_split_to_array(t, '\s+'),
                                 w -> w <> '') AS words,
                     string_split(t, chr(10)) AS lines,
                     length(t) - length(replace(t, '#', '')) AS n_hash,
                     (length(t) - length(replace(t, '...', ''))) / 3
                         AS n_ell
              FROM s1),
            s2 AS (
              SELECT doc_id, source, t FROM g
              WHERE len(words) BETWEEN 50 AND 100000
                AND list_sum(list_transform(words, w -> length(w)))::DOUBLE
                    / greatest(len(words), 1)::DOUBLE BETWEEN 3.0 AND 10.0
                AND (n_hash + n_ell)::DOUBLE
                    / greatest(len(words), 1)::DOUBLE <= 0.1
                AND len(list_filter(lines, ln ->
                      regexp_matches(trim(ln), '^[-*•] ')))::DOUBLE
                    / greatest(len(lines), 1)::DOUBLE <= 0.9
                AND len(list_filter(lines, ln ->
                      regexp_matches(trim(ln), '(\.\.\.|…)$')))::DOUBLE
                    / greatest(len(lines), 1)::DOUBLE <= 0.3
                AND len(list_filter(words, w ->
                      regexp_matches(w, '[A-Za-z]')))::DOUBLE
                    / greatest(len(words), 1)::DOUBLE >= 0.8
                AND (list_contains(words, 'the')::INT
                     + list_contains(words, 'be')::INT
                     + list_contains(words, 'to')::INT
                     + list_contains(words, 'of')::INT
                     + list_contains(words, 'and')::INT
                     + list_contains(words, 'that')::INT
                     + list_contains(words, 'have')::INT
                     + list_contains(words, 'with')::INT) >= 2),
            chunks AS (
              SELECT doc_id, i AS chunk_idx,
                     substr(t, i*200 + 1, 200) AS chunk_text
              FROM s2,
                   UNNEST(range(0, greatest(1, ceil(length(t) / 200.0))
                                   ::BIGINT)) AS r(i)),
            ranked AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY chunk_text
                                        ORDER BY doc_id, chunk_idx) AS rn
              FROM chunks),
            dropdocs AS (SELECT DISTINCT doc_id FROM ranked WHERE rn > 1),
            s3 AS (SELECT s2.* FROM s2
                   WHERE doc_id NOT IN (SELECT doc_id FROM dropdocs)),
            s4 AS (
              SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                         ORDER BY md5(doc_id::varchar || chr(31)
                                      || 'cap-v1'), doc_id) AS rk
                FROM s3) WHERE rk <= 25),
            s5 AS (
              SELECT doc_id FROM s4
              WHERE ('0x' || substr(md5(doc_id::varchar || chr(31)
                                        || 'mix-v1'), 1, 8))::BIGINT
                    % 1000000
                    < CASE source
                        WHEN 'src0' THEN 1000000
                        WHEN 'src1' THEN 750000
                        WHEN 'src2' THEN 500000
                        WHEN 'src3' THEN 250000
                        WHEN 'src4' THEN 0
                        ELSE 600000 END)
            SELECT * FROM (
              SELECT 0::BIGINT AS stage_idx, 'raw' AS stage,
                     (SELECT count(*) FROM planted)::BIGINT AS n_docs
              UNION ALL SELECT 1, 'c4', (SELECT count(*) FROM s1)
              UNION ALL SELECT 2, 'gopher', (SELECT count(*) FROM s2)
              UNION ALL SELECT 3, 'dedup', (SELECT count(*) FROM s3)
              UNION ALL SELECT 4, 'cap', (SELECT count(*) FROM s4)
              UNION ALL SELECT 5, 'mixture', (SELECT count(*) FROM s5)
            ) ORDER BY stage_idx
        """,
        "doc_exactsubstr_dedup": r"""
            WITH planted AS (
              SELECT doc_id, source,
                     text || CASE WHEN doc_id % 10 <= 1 THEN
                         ' planted shared passage '
                         || (doc_id // 10)::VARCHAR
                         || ' marker block pad end'
                       ELSE '' END AS raw
              FROM documents),
            norm AS (
              SELECT doc_id, source,
                     trim(regexp_replace(lower(raw), '\s+', ' ', 'g')) AS t
              FROM planted),
            padded AS (
              SELECT doc_id,
                     CASE WHEN length(t) < 25 THEN rpad(t, 25, '_')
                          ELSE t END AS t
              FROM norm),
            grams AS (
              SELECT doc_id, i - 1 AS pos, substr(t, i, 25) AS g
              FROM padded,
                   UNNEST(range(1, length(t) - 25 + 2)) AS r(i)),
            ok AS (
              SELECT * FROM grams
              WHERE g IN (SELECT g FROM grams
                          GROUP BY g HAVING count(*) <= 1000)),
            m AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.pos AS pos_a, a.pos - b.pos AS delta
              FROM ok a JOIN ok b ON a.g = b.g AND a.doc_id < b.doc_id),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY id_a, id_b, delta
                                           ORDER BY pos_a) AS rn
              FROM m),
            iv AS (
              SELECT id_b AS doc_id,
                     min(pos_a) - delta AS s,
                     min(pos_a) - delta + count(*) + 24 AS e
              FROM r GROUP BY id_a, id_b, delta, pos_a - rn
              HAVING count(*) + 24 >= 40),
            pm AS (
              SELECT doc_id, s, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pmax
              FROM iv),
            isl AS (
              SELECT doc_id, s, e,
                     sum(CASE WHEN s > coalesce(pmax, -1) THEN 1
                         ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS grp
              FROM pm),
            mrg AS (
              SELECT doc_id, min(s) AS s, max(e) AS e
              FROM isl GROUP BY doc_id, grp),
            segs AS (
              SELECT mrg.doc_id, s AS ord,
                     substr(t, coalesce(lag(e) OVER (PARTITION BY mrg.doc_id
                                                     ORDER BY s), 0) + 1,
                            s - coalesce(lag(e) OVER (PARTITION BY mrg.doc_id
                                                      ORDER BY s), 0)) AS seg
              FROM mrg JOIN norm ON norm.doc_id = mrg.doc_id
              UNION ALL
              SELECT mx.doc_id, 1099511627776 AS ord,
                     substr(t, mx.e_max + 1, length(t) - mx.e_max)
              FROM (SELECT doc_id, max(e) AS e_max
                    FROM mrg GROUP BY doc_id) mx
              JOIN norm ON norm.doc_id = mx.doc_id),
            cuts AS (
              SELECT doc_id, count(*) AS n_spans, sum(e - s) AS n_chars
              FROM mrg GROUP BY doc_id),
            rebuilt AS (
              SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS txt
              FROM segs GROUP BY doc_id),
            final AS (
              SELECT norm.doc_id, norm.source,
                     coalesce(rebuilt.txt, norm.t) AS txt,
                     coalesce(cuts.n_spans, 0) AS n_spans,
                     coalesce(cuts.n_chars, 0) AS n_chars
              FROM norm
              LEFT JOIN rebuilt ON rebuilt.doc_id = norm.doc_id
              LEFT JOIN cuts ON cuts.doc_id = norm.doc_id)
            SELECT source,
                   count(*)::BIGINT AS n_docs,
                   sum(n_spans)::BIGINT AS sum_cut_spans,
                   sum(n_chars)::BIGINT AS sum_cut_chars,
                   sum(length(txt))::BIGINT AS sum_chars,
                   sum(('0x' || substr(md5(txt), 1, 8))::BIGINT)::BIGINT
                       AS text_checksum
            FROM final GROUP BY source ORDER BY source
        """,
        "doc_lm_scores": _LM_SCORES_SQL + " ORDER BY doc_id",
        "doc_dsir_weights": _DSIR_PERDOC_SQL + r"""
            SELECT doc_id, source, round(w, 6) AS dsir_logw
            FROM perdoc ORDER BY doc_id
        """,
        "doc_dsir_sample": _DSIR_PERDOC_SQL + r"""
            , keyed AS (
              SELECT p.doc_id, p.source, p.w,
                     p.w - ln(-ln(
                       (('0x' || substr(md5(p.doc_id::VARCHAR || chr(31)
                                            || 'dsir-sample-v1'), 1, 8)
                        )::BIGINT + 0.5) / 4294967296.0)) AS k
              FROM perdoc p),
            topn AS (SELECT * FROM keyed ORDER BY k DESC, doc_id LIMIT 50)
            SELECT doc_id, source, round(w, 6) AS dsir_logw
            FROM topn ORDER BY doc_id
        """,
        "doc_lm_tiers": """
            WITH scores AS (""" + _LM_SCORES_SQL_BODY + """),
            tiers AS (
              SELECT s.doc_id, d.source, s.avg_logp,
                     ntile(3) OVER (PARTITION BY d.source
                                    ORDER BY s.avg_logp DESC,
                                             s.doc_id ASC) AS tier
              FROM scores s JOIN documents d ON d.doc_id = s.doc_id)
            SELECT source, tier::BIGINT AS tier,
                   count(*)::BIGINT AS n_docs,
                   sum(doc_id)::BIGINT AS id_checksum,
                   round(min(avg_logp), 6) AS min_logp,
                   round(max(avg_logp), 6) AS max_logp
            FROM tiers GROUP BY source, tier ORDER BY source, tier
        """,
        "doc_bpe_merges": _bpe_oracle_sql(3, batch_k=4),
        "doc_bpe_segments": _bpe_segments_oracle_sql(3, batch_k=4),
        "events_cohort_retention": """
            WITH act AS (
              SELECT DISTINCT user_id AS u,
                     floor(epoch(ts) / 3600)::BIGINT AS p
              FROM events),
            coh AS (SELECT u, min(p) AS cohort_period FROM act GROUP BY u)
            SELECT cohort_period, (p - cohort_period)::BIGINT AS horizon,
                   count(*)::BIGINT AS n_users
            FROM act JOIN coh USING (u)
            WHERE p - cohort_period <= 3
            GROUP BY cohort_period, horizon
            ORDER BY cohort_period, horizon
        """,
        "emb_quantization": """
            WITH v AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings),
            m AS (
              SELECT vec_id, e,
                     list_aggregate(e, 'min')::DOUBLE AS mn,
                     list_aggregate(e, 'max')::DOUBLE AS mx
              FROM v),
            s AS (
              SELECT vec_id, e, mn,
                     CASE WHEN mx > mn THEN (mx - mn) / 255.0
                          ELSE 1.0 END AS scale
              FROM m),
            c AS (
              SELECT vec_id, e, mn, scale,
                     list_transform(e, x ->
                       least(floor((x - mn) / scale + 0.5)::BIGINT,
                             255)) AS codes
              FROM s),
            d AS (
              SELECT vec_id, e, mn, scale, codes,
                     list_transform(codes, cc ->
                       mn + cc::DOUBLE * scale) AS deq
              FROM c),
            err AS (
              SELECT vec_id, mn, scale, codes,
                     list_transform(range(1, len(e) + 1), i ->
                       abs(e[i] - deq[i])) AS ae,
                     len(e) AS n
              FROM d)
            SELECT vec_id,
                   n::BIGINT AS n_dims,
                   list_sum(codes)::BIGINT AS sum_codes,
                   list_aggregate(codes, 'max')::BIGINT AS max_code,
                   round(scale, 6) AS scale,
                   round(mn, 6) AS zero_point,
                   round(list_aggregate(ae, 'max')::DOUBLE, 6)
                       AS max_abs_err,
                   round(list_sum(list_transform(ae, x -> x * x))::DOUBLE
                         / n, 6) AS mse
            FROM err ORDER BY vec_id
        """,
        "doc_incremental_dedup": r"""
            WITH seen AS (
              SELECT DISTINCT
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                         AS norm
              FROM documents WHERE doc_id % 3 = 0),
            new_batch AS (
              SELECT doc_id, source,
                     CASE WHEN doc_id % 7 = 0
                          THEN 'batch duplicate content block '
                               || (doc_id % 5)::VARCHAR
                          ELSE text END AS t
              FROM documents),
            normed AS (
              SELECT doc_id, source,
                     trim(regexp_replace(lower(t), '\s+', ' ', 'g'))
                         AS norm
              FROM new_batch),
            firsts AS (
              SELECT norm, min(doc_id) AS keep FROM normed GROUP BY norm),
            survivors AS (
              SELECT n.doc_id, n.source
              FROM normed n
              JOIN firsts f ON f.norm = n.norm AND f.keep = n.doc_id
              WHERE n.norm NOT IN (SELECT norm FROM seen))
            SELECT source,
                   count(*)::BIGINT AS n_survivors,
                   sum(doc_id)::BIGINT AS id_checksum
            FROM survivors GROUP BY source ORDER BY source
        """,
        "doc_incremental_near_dup": r"""
            WITH history AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000),
            new_batch AS (
              SELECT doc_id + 5000000 AS doc_id, source,
                     text || ' tail' AS text
              FROM documents WHERE doc_id % 9 = 0
              UNION ALL
              SELECT doc_id + 5000000, source, reverse(text)
              FROM documents WHERE doc_id % 9 = 1),
            hw AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\s+') AS w
                   FROM history),
            nw AS (SELECT doc_id,
                          string_split_regex(trim(lower(text)), '\s+') AS w
                   FROM new_batch),
            hg AS (SELECT DISTINCT doc_id,
                          array_to_string(w[i:i+2], ' ') AS gram
                   FROM hw,
                        UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            ng AS (SELECT DISTINCT doc_id,
                          array_to_string(w[i:i+2], ' ') AS gram
                   FROM nw,
                        UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            hs AS (SELECT doc_id, count(*) AS n FROM hg GROUP BY doc_id),
            ns AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id),
            ov AS (SELECT ng.doc_id AS nid, hg.doc_id AS hid,
                          count(*) AS c
                   FROM ng JOIN hg USING (gram) GROUP BY 1, 2),
            dropped AS (
              SELECT DISTINCT nid FROM ov
              JOIN ns ON ns.doc_id = nid
              JOIN hs ON hs.doc_id = hid
              WHERE round(c / (ns.n + hs.n - c), 6) >= 0.8),
            surv AS (
              SELECT doc_id, source FROM new_batch
              WHERE doc_id NOT IN (SELECT nid FROM dropped))
            SELECT source,
                   count(*)::BIGINT AS n_survivors,
                   sum(doc_id)::BIGINT AS id_checksum
            FROM surv GROUP BY source ORDER BY source
        """,
        "events_rate_anomalies": """
            WITH planted AS (
              SELECT event_type, ts FROM events
              UNION ALL
              SELECT 'click', TIMESTAMP '2024-01-03 07:30:00'
              FROM events WHERE event_id % 50 = 0),
            counts AS (
              SELECT event_type,
                     floor(epoch(ts) / 3600)::BIGINT AS period,
                     count(*)::BIGINT AS n_events
              FROM planted GROUP BY event_type, period),
            stats AS (
              SELECT event_type, avg(n_events) AS mu,
                     stddev_samp(n_events) AS sd
              FROM counts GROUP BY event_type)
            SELECT c.event_type, c.period, c.n_events,
                   round(CASE WHEN sd > 0 THEN (n_events - mu) / sd
                              ELSE 0.0 END, 6) AS zscore,
                   abs(round(CASE WHEN sd > 0 THEN (n_events - mu) / sd
                                  ELSE 0.0 END, 6)) > 2.0 AS is_anomaly
            FROM counts c JOIN stats USING (event_type)
            ORDER BY event_type, period
        """,
        "doc_gopher_flags": r"""
            WITH planted AS (
              SELECT doc_id, source,
                     text
                     || CASE WHEN doc_id % 2 = 0 THEN ' and that have with'
                        ELSE '' END
                     || CASE WHEN doc_id % 5 = 0 THEN ' ' || repeat('# ', 150)
                        ELSE '' END
                     || CASE WHEN doc_id % 7 = 0 THEN
                          chr(10) || '- bullet one'
                          || chr(10) || '- bullet two'
                          || chr(10) || '- bullet three'
                          || chr(10) || '- bullet four'
                          || chr(10) || '- bullet five'
                          || chr(10) || '- bullet six'
                          || chr(10) || '- bullet seven'
                          || chr(10) || '- bullet eight'
                          || chr(10) || '- bullet nine'
                          || chr(10) || '- bullet ten'
                        ELSE '' END
                     || CASE WHEN doc_id % 11 = 0 THEN
                          chr(10) || 'this planted line trails off...'
                        ELSE '' END AS t
              FROM documents),
            m AS (
              SELECT doc_id, source,
                     list_filter(regexp_split_to_array(t, '\s+'),
                                 w -> w <> '') AS words,
                     string_split(t, chr(10)) AS lines,
                     length(t) - length(replace(t, '#', '')) AS n_hash,
                     (length(t) - length(replace(t, '...', ''))) / 3
                         AS n_ell
              FROM planted),
            f AS (
              SELECT doc_id, source,
                     len(words)::BIGINT AS n_words,
                     len(words) BETWEEN 50 AND 100000 AS ok_words,
                     list_sum(list_transform(words, w -> length(w)))::DOUBLE
                       / greatest(len(words), 1)::DOUBLE
                       BETWEEN 3.0 AND 10.0 AS ok_mean_len,
                     (n_hash + n_ell)::DOUBLE
                       / greatest(len(words), 1)::DOUBLE <= 0.1 AS ok_symbol,
                     len(list_filter(lines, ln ->
                         regexp_matches(trim(ln), '^[-*•] ')))::DOUBLE
                       / greatest(len(lines), 1)::DOUBLE <= 0.9 AS ok_bullet,
                     len(list_filter(lines, ln ->
                         regexp_matches(trim(ln), '(\.\.\.|…)$')))::DOUBLE
                       / greatest(len(lines), 1)::DOUBLE <= 0.3
                       AS ok_ellipsis,
                     len(list_filter(words, w ->
                         regexp_matches(w, '[A-Za-z]')))::DOUBLE
                       / greatest(len(words), 1)::DOUBLE >= 0.8 AS ok_alpha,
                     (list_contains(words, 'the')::INT
                      + list_contains(words, 'be')::INT
                      + list_contains(words, 'to')::INT
                      + list_contains(words, 'of')::INT
                      + list_contains(words, 'and')::INT
                      + list_contains(words, 'that')::INT
                      + list_contains(words, 'have')::INT
                      + list_contains(words, 'with')::INT) >= 2 AS ok_stop
              FROM m)
            SELECT source,
                   count(*)::BIGINT AS n_docs,
                   sum(n_words)::BIGINT AS sum_words,
                   sum(ok_words::BIGINT)::BIGINT AS n_ok_words,
                   sum(ok_mean_len::BIGINT)::BIGINT AS n_ok_mean_len,
                   sum(ok_symbol::BIGINT)::BIGINT AS n_ok_symbol,
                   sum(ok_bullet::BIGINT)::BIGINT AS n_ok_bullet,
                   sum(ok_ellipsis::BIGINT)::BIGINT AS n_ok_ellipsis,
                   sum(ok_alpha::BIGINT)::BIGINT AS n_ok_alpha,
                   sum(ok_stop::BIGINT)::BIGINT AS n_ok_stop,
                   sum((ok_words AND ok_mean_len AND ok_symbol AND ok_bullet
                        AND ok_ellipsis AND ok_alpha AND ok_stop)
                       ::BIGINT)::BIGINT AS n_keep
            FROM f GROUP BY source ORDER BY source
        """,
        "doc_url_dedup": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            {_URL_CANON_SQL},
            win AS (SELECT canon_url, min(doc_id) AS doc_id
                    FROM canon GROUP BY canon_url)
            SELECT c.domain,
                   count(*)::BIGINT AS n_survivors,
                   sum(c.doc_id)::BIGINT AS id_checksum,
                   count(DISTINCT c.canon_url)::BIGINT AS n_canon
            FROM canon c
            JOIN win w ON w.canon_url = c.canon_url
                      AND w.doc_id = c.doc_id
            GROUP BY c.domain ORDER BY c.domain
        """,
        "doc_domain_filter": f"""
            WITH u AS ({_SYNTH_URL_SQL}),
            {_URL_CANON_SQL},
            ranked AS (
              SELECT domain, doc_id,
                     row_number() OVER (
                       PARTITION BY domain
                       ORDER BY md5(doc_id::varchar || chr(31)
                                    || 'cap-v1'), doc_id) AS rk
              FROM canon
              WHERE domain NOT IN ('d1.example.com', 'd4.example.com')
                AND NOT (domain LIKE '%.d1.example.com'
                         OR domain LIKE '%.d4.example.com'))
            SELECT domain, count(*)::BIGINT AS n_kept,
                   sum(doc_id)::BIGINT AS id_checksum
            FROM ranked WHERE rk <= 20
            GROUP BY domain ORDER BY domain
        """,
        "doc_source_caps": """
            WITH ranked AS (
              SELECT source, doc_id,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(doc_id::varchar || chr(31) || 'cap-v1'),
                                doc_id) AS rk
              FROM documents)
            SELECT source,
                   count(*)::BIGINT AS n_kept,
                   sum(doc_id)::BIGINT AS id_checksum,
                   min(doc_id)::BIGINT AS min_id,
                   max(doc_id)::BIGINT AS max_id
            FROM ranked WHERE rk <= 30
            GROUP BY source ORDER BY source
        """,
        "doc_mixture_counts": """
            WITH b AS (
              SELECT source,
                     ('0x' || substr(md5(doc_id::varchar || chr(31)
                                         || 'mix-v1'), 1, 8))::BIGINT
                     % 1000000 AS bucket
              FROM documents)
            SELECT source, count(*)::BIGINT AS n_kept
            FROM b
            WHERE bucket < CASE source
                             WHEN 'src0' THEN 1000000
                             WHEN 'src1' THEN 750000
                             WHEN 'src2' THEN 500000
                             WHEN 'src3' THEN 250000
                             WHEN 'src4' THEN 0
                             ELSE 600000 END
            GROUP BY source
            ORDER BY source
        """,
        "doc_pack_manifest": r"""
            WITH base AS (
              SELECT doc_id,
                     ('0x' || substr(md5(doc_id::varchar || chr(31)
                                         || 'pack-v1'), 1, 8))::BIGINT
                     % 8 AS shard,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text),
                                                         '\s+')) END
                     ::BIGINT AS n_tokens
              FROM documents),
            packed AS (
              SELECT doc_id, shard, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0)::BIGINT AS tok_offset
              FROM base)
            SELECT doc_id, shard, n_tokens, tok_offset,
                   (tok_offset // 64)::BIGINT AS first_seq,
                   ((tok_offset + greatest(n_tokens - 1, 0)) // 64)::BIGINT
                       AS last_seq,
                   (n_tokens > 0 AND tok_offset // 64
                    <> (tok_offset + greatest(n_tokens - 1, 0)) // 64)
                       AS straddles
            FROM packed
            ORDER BY doc_id
        """,
        "doc_split_counts": """
            WITH assigned AS (
              SELECT source,
                     ('0x' || substr(md5(doc_id::varchar || chr(31) || 'v1'),
                                     1, 8))::BIGINT % 1000000 AS b
              FROM documents)
            SELECT source,
                   CASE WHEN b < 900000 THEN 'train'
                        WHEN b < 950000 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs
            FROM assigned
            GROUP BY 1, 2
            ORDER BY source, split
        """,
        "doc_pii_scrub": r"""
            WITH planted AS (
              SELECT doc_id,
                     text ||
                     CASE WHEN doc_id % 3 = 0 THEN ' reach user'
                          || doc_id::varchar || '@example.com'
                          ELSE '' END ||
                     CASE WHEN doc_id % 11 = 0 THEN ' id 123-45-'
                          || lpad((doc_id % 10000)::varchar, 4, '0')
                          ELSE '' END ||
                     CASE WHEN doc_id % 5 = 0 THEN ' host 10.1.'
                          || (doc_id % 256)::varchar || '.7'
                          ELSE '' END ||
                     CASE WHEN doc_id % 7 = 0 THEN ' call +1555'
                          || lpad(doc_id::varchar, 7, '0')
                          ELSE '' END AS text
              FROM documents),
            scored AS (
              SELECT doc_id,
                     length(text) AS len_raw,
                     len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                         AS n_email,
                     len(regexp_extract_all(text,
                       '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
                     len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                         AS n_ipv4,
                     len(regexp_extract_all(text, '\+\d{7,15}\b'))
                         AS n_phone,
                     length(
                       regexp_replace(regexp_replace(regexp_replace(
                         regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                         '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                         '<IPV4>', 'g'),
                         '\+\d{7,15}\b', '<PHONE>', 'g')) AS len_scrub
              FROM planted)
            SELECT (doc_id % 10)::INT AS grp,
                   sum(n_email)::BIGINT AS n_email,
                   sum(n_ssn)::BIGINT AS n_ssn,
                   sum(n_ipv4)::BIGINT AS n_ipv4,
                   sum(n_phone)::BIGINT AS n_phone,
                   sum(len_raw - len_scrub)::BIGINT AS chars_delta
            FROM scored
            GROUP BY 1
            ORDER BY grp
        """,
        "emb_topk_cosine": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                       AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id
            LIMIT 10
        """,
        "emb_norm_by_label": """
            SELECT label,
                   count(*) AS n,
                   round(avg(sqrt(list_sum(
                       list_transform(embedding::DOUBLE[], x -> x * x)))), 6)
                       AS avg_norm
            FROM embeddings
            GROUP BY label
            ORDER BY label
        """,
        # Fuzzy-dedup clustering: exact >=0.8 pair graph + recursive
        # transitive closure -> per-node component min (matches CC roots)
        "doc_near_dup_clusters": r"""
            WITH RECURSIVE both_docs AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000
              UNION ALL
              SELECT doc_id + 4000000, text || ' tail' FROM documents
              WHERE doc_id < 10),
            words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
              FROM both_docs),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
                      GROUP BY doc_id),
            overlap AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pair_graph AS (
              SELECT id_a, id_b FROM overlap
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE round(n_common / (sa.n_grams + sb.n_grams - n_common), 6)
                    >= 0.8),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pair_graph
              UNION SELECT id_b, id_a FROM pair_graph),
            closure(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT c.a, e.b FROM closure c JOIN edges e ON e.a = c.b
              WHERE e.b != c.a),
            roots AS (
              SELECT a AS node, least(a, min(b)) AS root
              FROM closure GROUP BY a)
            SELECT node::BIGINT AS doc_id, root::BIGINT AS cluster_root
            FROM roots WHERE root != node
            ORDER BY doc_id
        """,
        # Full SQL replica of winnowing (SWA'03): same zero-basis FNV-style
        # rolling hash over the byte-normalized text (corpus is ASCII, so
        # unicode(char) == byte), same window-4 rightmost-min selection,
        # same df-cap and pair overlap — value-exact, not just membership.
        "doc_winnowing_overlap": r"""
            WITH norm AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
              FROM documents),
            padded AS (
              SELECT doc_id,
                     CASE WHEN length(t) < 8 THEN rpad(t, 8, '_') ELSE t END
                         AS t
              FROM norm),
            chars AS (
              SELECT doc_id, i AS p, unicode(t[i])::UBIGINT AS c
              FROM padded, UNNEST(range(1, length(t)+1)) AS r(i)),
            pos AS (
              SELECT doc_id, i AS p
              FROM padded, UNNEST(range(1, length(t)-8+2)) AS r(i)),
            h1 AS (SELECT pos.doc_id, pos.p,
                   ((xor(0::UBIGINT, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM pos JOIN chars ON chars.doc_id = pos.doc_id
                                      AND chars.p = pos.p),
            h2 AS (SELECT h1.doc_id, h1.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h1 JOIN chars ON chars.doc_id = h1.doc_id
                                     AND chars.p = h1.p + 1),
            h3 AS (SELECT h2.doc_id, h2.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h2 JOIN chars ON chars.doc_id = h2.doc_id
                                     AND chars.p = h2.p + 2),
            h4 AS (SELECT h3.doc_id, h3.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h3 JOIN chars ON chars.doc_id = h3.doc_id
                                     AND chars.p = h3.p + 3),
            h5 AS (SELECT h4.doc_id, h4.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h4 JOIN chars ON chars.doc_id = h4.doc_id
                                     AND chars.p = h4.p + 4),
            h6 AS (SELECT h5.doc_id, h5.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h5 JOIN chars ON chars.doc_id = h5.doc_id
                                     AND chars.p = h5.p + 5),
            h7 AS (SELECT h6.doc_id, h6.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h6 JOIN chars ON chars.doc_id = h6.doc_id
                                     AND chars.p = h6.p + 6),
            hashes AS (SELECT h7.doc_id, h7.p,
                   ((xor(h, c)::UHUGEINT * 1099511628211)
                    % 18446744073709551616)::UBIGINT AS h
                   FROM h7 JOIN chars ON chars.doc_id = h7.doc_id
                                     AND chars.p = h7.p + 7),
            nn AS (SELECT doc_id, count(*) AS n FROM hashes GROUP BY doc_id),
            small_fps AS (
              SELECT h.doc_id, min(h.h) AS fp
              FROM hashes h JOIN nn USING (doc_id)
              WHERE nn.n <= 4 GROUP BY h.doc_id),
            winmin AS (
              SELECT h.doc_id, h.p AS pe,
                     min(h.h) OVER (PARTITION BY h.doc_id ORDER BY h.p
                                    ROWS BETWEEN 3 PRECEDING
                                    AND CURRENT ROW) AS m
              FROM hashes h JOIN nn USING (doc_id)
              WHERE nn.n > 4),
            sel AS (
              SELECT w.doc_id, w.pe, max(h2.p) AS selp
              FROM (SELECT * FROM winmin WHERE pe >= 4) w
              JOIN hashes h2 ON h2.doc_id = w.doc_id
                            AND h2.p BETWEEN w.pe - 3 AND w.pe
                            AND h2.h = w.m
              GROUP BY w.doc_id, w.pe),
            big_fps AS (
              SELECT DISTINCT s.doc_id, h3.h AS fp
              FROM sel s JOIN hashes h3 ON h3.doc_id = s.doc_id
                                       AND h3.p = s.selp),
            fps AS (SELECT * FROM small_fps UNION ALL SELECT * FROM big_fps),
            rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 100),
            rfps AS (SELECT fps.* FROM fps JOIN rare USING (fp)),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*)::BIGINT AS n_shared
              FROM rfps a JOIN rfps b USING (fp)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
              HAVING count(*) >= 8)
            SELECT id_a, id_b, n_shared FROM pairs
            ORDER BY n_shared DESC, id_a, id_b LIMIT 50
        """,
        # recall-1.0-gated ANN/IVF: result must equal the exact top-k
        "emb_ann_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
                       AS cosine
            FROM embeddings e, q
            ORDER BY cosine DESC, e.vec_id
            LIMIT 10
        """,
        "emb_ivf_topk": """
            WITH planted AS (
              SELECT (6000000 + i)::BIGINT AS vec_id,
                     list_transform(embedding::DOUBLE[],
                                    x -> ((x + i * 0.0002)::FLOAT)::DOUBLE)
                         AS v
              FROM embeddings, UNNEST(range(1, 11)) AS t(i)
              WHERE vec_id = 0),
            univ AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL SELECT vec_id, v FROM planted),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0)
            SELECT u.vec_id,
                   round(list_cosine_similarity(u.v, q.qv), 6) AS cosine
            FROM univ u, q
            ORDER BY cosine DESC, u.vec_id
            LIMIT 10
        """,
        "emb_ivf_multi_topk": """
            WITH planted AS (
              SELECT (e.vec_id * 100 + i + 7000000)::BIGINT AS vec_id,
                     list_transform(e.embedding::DOUBLE[],
                                    x -> ((x + i * 0.0002)::FLOAT)::DOUBLE)
                         AS v
              FROM embeddings e, UNNEST(range(1, 6)) AS t(i)
              WHERE e.vec_id < 3),
            univ AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL SELECT vec_id, v FROM planted),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, u.vec_id AS nbr_id,
                     round(list_cosine_similarity(u.v, q.qv), 6) AS cosine
              FROM univ u CROSS JOIN q
              WHERE u.vec_id != q.query_id),
            ranked AS (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, nbr_id)::INT AS rank
              FROM scored)
            SELECT query_id, nbr_id, cosine, rank
            FROM ranked WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "emb_ivf_join_topk": """
            WITH planted AS (
              SELECT (e.vec_id * 100 + i + 8000000)::BIGINT AS vec_id,
                     list_transform(e.embedding::DOUBLE[],
                                    x -> ((x + i * 0.0002)::FLOAT)::DOUBLE)
                         AS v
              FROM embeddings e, UNNEST(range(1, 4)) AS t(i)
              WHERE e.vec_id < 8),
            univ AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL SELECT vec_id, v FROM planted),
            q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, u.vec_id AS nbr_id,
                     round(list_cosine_similarity(u.v, q.qv), 6) AS cosine
              FROM univ u CROSS JOIN q
              WHERE u.vec_id != q.query_id),
            ranked AS (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cosine DESC, nbr_id)::INT AS rank
              FROM scored)
            SELECT query_id, nbr_id, cosine, rank
            FROM ranked WHERE rank <= 3
            ORDER BY query_id, rank
        """,
        "emb_kmeans_sizes": _kmeans_oracle_sql(6, 3, 64),
        "emb_semantic_dedup": """
            SELECT ((SELECT count(*) FROM embeddings) + 8)::BIGINT
                       AS n_total,
                   (SELECT count(*) FROM embeddings)::BIGINT AS n_kept,
                   8::BIGINT AS n_dropped,
                   (8 * 5000000 + 28)::BIGINT AS dropped_id_sum
        """,
        "emb_near_dup_pairs": """
            WITH both_vecs AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 5000000,
                     list_transform(embedding::DOUBLE[], x -> x + 0.0005)
              FROM embeddings WHERE vec_id < 8)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 6) AS cosine
            FROM both_vecs a JOIN both_vecs b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.98
            ORDER BY id_a, id_b
        """,
        "doc_minhash_near_dups": r"""
            WITH both_docs AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000
              UNION ALL
              SELECT doc_id + 2000000, text || ' tail' FROM documents
              WHERE doc_id < 10),
            words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
              FROM both_docs),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
                      GROUP BY doc_id),
            overlap AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(round(n_common
                               / (sa.n_grams + sb.n_grams - n_common), 6), 4)
                       AS jaccard
            FROM overlap
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(n_common / (sa.n_grams + sb.n_grams - n_common), 6)
                  >= 0.8
            ORDER BY id_a, id_b
        """,
        "doc_simhash_near_dups": r"""
            WITH both_docs AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 2000
              UNION ALL
              SELECT doc_id + 3000000, text || ' q' FROM documents
              WHERE doc_id < 10),
            words AS (
              SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
              FROM both_docs),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS gram
              FROM words, UNNEST(range(1, greatest(len(w)-2, 1)+1)) AS t(i)),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams
                      GROUP BY doc_id),
            overlap AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM grams a JOIN grams b USING (gram)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b,
                   round(round(n_common
                               / (sa.n_grams + sb.n_grams - n_common), 6), 4)
                       AS jaccard
            FROM overlap
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE round(n_common / (sa.n_grams + sb.n_grams - n_common), 6)
                  >= 0.9
            ORDER BY id_a, id_b
        """,
        "kg_serialized_documents": """
            SELECT source AS conv_id,
                   doc_id::BIGINT AS turn_idx,
                   (5 + doc_id % (1 + (doc_id % 500) % 3))::BIGINT AS n_quads,
                   TRUE AS has_mention_id
            FROM documents
            ORDER BY conv_id, turn_idx
        """,
        # planted-truth oracle: synthetic_media_df(n=48) cycles
        # image/audio/video (16 each); every REAL payload (BMP/WAV/RVID)
        # must decode; feature shapes are fixed design constants
        # (image 8*8*3, audio 16*4, video 4*8*8) — predictable without
        # running the engine.
        "multimodal_features": """
            SELECT * FROM (VALUES
                ('audio', 16::BIGINT, 16::BIGINT, 64),
                ('image', 16::BIGINT, 16::BIGINT, 192),
                ('video', 16::BIGINT, 16::BIGINT, 256))
                AS t(kind, n, n_decoded, feat_dim)
            ORDER BY kind
        """,
    }
