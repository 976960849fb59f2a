"""KG-construction contract queries (SURVEY.md §2 rows A-G over the
transcript/documents bridge): expansion, SPARQL text, update, framing,
canonicalization, inference, validation, graph analytics, round-trips.
Split out of __spark_entry__.py (VERDICT r03 #4); the driver contract
still re-exports everything from there."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rdflib_jsonld_spark.operators.linking import (
    canonical_mapping, entity_mention_counts, mention_edges)
from rdflib_jsonld_spark.sources.doc_transcripts import documents_as_transcripts
from rdflib_jsonld_spark.sources import transcripts as tr

from rdflib_jsonld_spark.contract.common import (  # noqa: F401
    KG, _OWL_SAMEAS, _RDF, _t, shared_doc_quads, shared_transcript_quads)


def _kg_entity_counts_documents(spark, sf_dir, limit=50) -> DataFrame:
    quads = shared_doc_quads(spark, sf_dir)
    mapping = canonical_mapping(quads)
    counts = entity_mention_counts(quads, mapping)
    return (counts.orderBy(F.desc("n_mentions"), F.asc("canonical_id"))
            .limit(limit))


def q_kg_entity_counts_documents(spark, sf_dir) -> DataFrame:
    return _kg_entity_counts_documents(spark, sf_dir, 50)


def q_kg_predicate_counts_documents(spark, sf_dir) -> DataFrame:
    quads_raw = shared_doc_quads(spark, sf_dir, dedup=False)
    return (quads_raw.groupBy("p")
            .agg(F.count(F.lit(1)).alias("n_quads"))
            .orderBy("p"))


def q_kg_quad_stats_documents(spark, sf_dir) -> DataFrame:
    """E5 stats over the documents-bridge quad table — fully predictable
    from doc_id arithmetic (subjects = mention nodes + sameAs chain
    subjects), so count_distinct gets a real oracle."""
    quads_raw = shared_doc_quads(spark, sf_dir, dedup=False)
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
    quads = shared_doc_quads(spark, sf_dir, dedup=False)
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
    # shared_doc_quads is persisted: match_bgp_extended scans the quad
    # plan once per pattern — without the cache the mapInPandas expansion
    # recomputes per branch (CLAUDE.md r02 lesson, VERDICT r02 #1)
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir, dedup=False)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: about + turn branches both scan them
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: the 2-pattern BGP scans twice (r02 bench
    # regression 1.33s→2.79s was exactly this recompute-per-branch)
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: the 2-pattern BGP scans twice
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: the 2-pattern BGP scans twice
    quads = shared_doc_quads(spark, sf_dir)
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


def q_kg_sparql_text_semantics(spark, sf_dir) -> DataFrame:
    """Text-layer EXPRESSION semantics (sweeps 23-26): EBV of a bare
    numeric variable in FILTER, value-based ``=``/``<`` (confidence is
    the canonical double lexical "9.0E-1" — a lexical compare against
    0.9 would match nothing), term-aware IN with mixed numeric types
    (13.0 matches the integer 13), a typed-constant comparison, and
    STRLANG/LANG/sameTerm over computed string-fn results. Counts are
    doc_id arithmetic → exact SQL oracle."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = shared_doc_quads(spark, sf_dir)
    return sparql(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?ent (COUNT(*) AS ?n)
        WHERE {{
          ?m a v:Mention ; v:about ?e ; v:confidence ?c .
          BIND(xsd:integer(STRBEFORE(STRAFTER(STR(?e), "/e/"), "/a"))
               AS ?ent)
          BIND(STRLANG(SUBSTR(STR(?m), 1, 5), "en") AS ?tag)
          FILTER(?c && LANG(?tag) = "en" && sameTerm(?tag, "https"@en))
          FILTER(?c = 0.9 && ?ent IN (7, 13.0, 21)
                 || ?ent < "5"^^xsd:integer)
        }}
        GROUP BY ?ent
        ORDER BY ?ent""")


def q_kg_sparql_text_union_negation(spark, sf_dir) -> DataFrame:
    """Text-layer UNION + per-branch BIND + FILTER NOT EXISTS: three
    branches tag their solutions with a kind; the third branch (mentions
    without a turn edge) is provably empty, so its group must be absent.
    alias_link count per entity = max alias index seen (doc_id
    arithmetic — the dedup'd sameAs chain edges are {1..max_j})."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_doc_quads(spark, sf_dir)
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


def q_kg_star_annotations(spark, sf_dir) -> DataFrame:
    """RDF-star statement-level annotation ([spec] RDF-star CG report /
    SPARQL 1.2 WD; operators/star.py — no reference counterpart): each
    mention's (m, v:about, e) triple is quoted and annotated with a
    deterministic certainty (1 + doc_id % 7, doc_id recovered from the
    mention IRI), entirely JVM-side (concat builds the star.py table
    spelling; no Python in the construction). The SPARQL-star text
    front-end then matches ``<< ?m v:about ?e >> v:certainty ?c`` —
    regexp decomposition of the quoted subject, NOT a stored struct —
    and aggregates per entity alias. All doc_id arithmetic → exact
    oracle."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = shared_doc_quads(spark, sf_dir)
    vocab = KG + "vocab#"
    about = quads.where(F.col("p") == vocab + "about")
    doc_id = F.regexp_extract(F.col("s"), r"m/doc/([0-9]+)$", 1) \
        .cast("long")
    annots = about.select(
        F.lit(None).cast("string").alias("g"),
        F.concat(F.lit("<< <"), F.col("s"), F.lit("> <"),
                 F.lit(vocab + "about"), F.lit("> <"),
                 F.col("o_value"), F.lit("> >>")).alias("s"),
        F.lit(False).alias("s_is_bnode"),
        F.lit(vocab + "certainty").alias("p"),
        F.lit("literal").alias("o_kind"),
        (F.lit(1) + doc_id % 7).cast("string").alias("o_value"),
        F.lit("http://www.w3.org/2001/XMLSchema#integer")
        .alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.col("conv_id"), F.col("turn_idx"))
    star = quads.select(*annots.columns).unionByName(annots)
    return sparql(star, f"""
        PREFIX v: <{KG}vocab#>
        SELECT ?e (COUNT(?m) AS ?n_annot) (MIN(?c) AS ?min_c)
               (MAX(?c) AS ?max_c)
        WHERE {{ << ?m v:about ?e >> v:certainty ?c }}
        GROUP BY ?e ORDER BY ?e""")


def q_kg_star_annotation_blocks(spark, sf_dir) -> DataFrame:
    """SPARQL 1.2 annotation-block syntax (r05; operators/sparql.py
    annotation sugar — no reference counterpart): the SAME annotated
    mention store as kg_star_annotations, queried with
    ``?m v:about ?e {| v:certainty ?c |}`` instead of an explicit
    quoted-subject pattern. The block additionally requires the BASE
    triple asserted (it is, for every mention), so the aggregate equals
    kg_star_annotations' — same exact doc_id-arithmetic oracle shape,
    different front-end surface under driver verification."""
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = shared_doc_quads(spark, sf_dir)
    vocab = KG + "vocab#"
    about = quads.where(F.col("p") == vocab + "about")
    doc_id = F.regexp_extract(F.col("s"), r"m/doc/([0-9]+)$", 1) \
        .cast("long")
    annots = about.select(
        F.lit(None).cast("string").alias("g"),
        F.concat(F.lit("<< <"), F.col("s"), F.lit("> <"),
                 F.lit(vocab + "about"), F.lit("> <"),
                 F.col("o_value"), F.lit("> >>")).alias("s"),
        F.lit(False).alias("s_is_bnode"),
        F.lit(vocab + "certainty").alias("p"),
        F.lit("literal").alias("o_kind"),
        (F.lit(1) + doc_id % 7).cast("string").alias("o_value"),
        F.lit("http://www.w3.org/2001/XMLSchema#integer")
        .alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.col("conv_id"), F.col("turn_idx"))
    star = quads.select(*annots.columns).unionByName(annots)
    return sparql(star, f"""
        PREFIX v: <{KG}vocab#>
        SELECT ?e (COUNT(?m) AS ?n_annot) (MIN(?c) AS ?min_c)
               (MAX(?c) AS ?max_c)
        WHERE {{ ?m v:about ?e {{| v:certainty ?c |}} }}
        GROUP BY ?e ORDER BY ?e""")


def q_kg_star_annotation_docs(spark, sf_dir) -> DataFrame:
    """JSON-LD-star ``@annotation`` DOCUMENT syntax end-to-end (r05;
    jsonld/expansion.py + tordf.py star support, no reference
    counterpart — the checkout predates RDF-star): deterministic
    per-document JSON-LD-star docs (a v:cites edge annotated with a
    v:weight) run through the pure core inside the same Arrow seam as
    transcript expansion, yielding BOTH the asserted base triple and
    the quoted-triple-subject annotation quad; star.py decomposes the
    quoted spelling JVM-side and the aggregate cross-checks that every
    annotation has its asserted base. All doc_id arithmetic → exact
    DuckDB oracle."""
    import pandas as pd
    from pyspark.sql import types as T
    from rdflib_jsonld_spark.jsonld import to_rdf
    from rdflib_jsonld_spark.operators.expand import _term_cols
    from rdflib_jsonld_spark.operators.star import with_quoted_components

    vocab = KG + "vocab#"
    ent = KG + "e/doc/"
    doc_ids = _t(spark, sf_dir, "documents").select("doc_id")
    schema = T.StructType([
        T.StructField("s", T.StringType(), False),
        T.StructField("p", T.StringType(), False),
        T.StructField("o_kind", T.StringType(), False),
        T.StructField("o_value", T.StringType(), False),
    ])

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                doc = {"@id": f"{ent}{did}",
                       f"{vocab}cites": {
                           "@id": f"{ent}{(did * 7 + 3) % 97}",
                           "@annotation": {
                               f"{vocab}weight": (did % 5) + 1}}}
                for g, s, p, o in to_rdf(doc):
                    s_str, _ = _term_cols(s)
                    if o[0] == "lit":
                        rows.append((s_str, p[1], "literal", o[1]))
                    else:
                        o_str, _ = _term_cols(o)
                        rows.append((s_str, p[1],
                                     "triple" if o[0] == "qt" else "iri",
                                     o_str))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    quads = doc_ids.mapInPandas(gen, schema=schema).persist()
    ann = (with_quoted_components(
               quads.where(F.col("s").startswith("<<")), "s", "q")
           .where(F.col("p") == vocab + "weight")
           .select(F.col("qs").alias("src"), F.col("qo_value").alias("e"),
                   F.col("o_value").cast("long").alias("w")))
    base = (quads.where(F.col("p") == vocab + "cites")
            .select(F.col("s").alias("src"),
                    F.col("o_value").alias("e")))
    joined = ann.join(base, ["src", "e"], "inner")
    return (joined.groupBy("e")
            .agg(F.count(F.lit(1)).cast("long").alias("n_annot"),
                 F.sum("w").cast("long").alias("sum_w"),
                 F.max("w").cast("long").alias("max_w"))
            .orderBy("e"))


def q_kg_sparql_results_tsv(spark, sf_dir) -> DataFrame:
    """SPARQL results TSV encoding (operators/results.py) over a
    ``keep_types=True`` SELECT: an IRI column, a STRLANG-constructed
    ``@en`` literal, and a STRDT-constructed ``xsd:integer`` literal,
    each N-Triples-encoded by the distributed writer's JVM column
    expressions ([spec] SPARQL 1.1 Query Results CSV/TSV Formats).
    Every line is doc_id string arithmetic -> exact SQL oracle."""
    from rdflib_jsonld_spark.operators.results import tsv_lines
    from rdflib_jsonld_spark.operators.sparql import sparql
    quads = shared_doc_quads(spark, sf_dir)
    sols = sparql(quads, f"""
        PREFIX v: <{KG}vocab#>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?m (STRLANG(STRAFTER(STR(?m), "/doc/"), "en") AS ?tag)
               (STRDT(STRAFTER(STR(?m), "/doc/"), xsd:integer) AS ?num)
        WHERE {{ ?m a v:Mention }}""", keep_types=True)
    return tsv_lines(sols).orderBy("line")


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
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: mention_edges scans three times (sameAs,
    # mentions, surfaces) — cache so the Python expansion runs once
    quads = shared_doc_quads(spark, sf_dir)
    mapping = connected_components(mention_edges(quads), driver_threshold=0)
    return mapping.orderBy("node")


def q_kg_sameas_closure(spark, sf_dir) -> DataFrame:
    """SPARQL ``sameAs+`` property path: transitive closure (path
    doubling, O(log diameter) rounds) of the owl:sameAs edge set. The
    alias chains make the closure doc_id arithmetic: every (a_i, a_j)
    with 0 <= j < i <= maxj(entity)."""
    from rdflib_jsonld_spark.operators.linking import transitive_closure
    # single-branch scan: the closure's own localCheckpoint materializes
    # the edge set, so no quad-table persist is needed here
    quads = shared_doc_quads(spark, sf_dir)
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
    # shared quads are persisted: the path's seq/star branches scan from
    # multiple joins (about edges, sameAs edges, node universe)
    quads = shared_doc_quads(spark, sf_dir)
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
    quads = shared_transcript_quads(spark, dedup=False)
    return (quads.groupBy("p").agg(F.count(F.lit(1)).alias("n_quads"))
            .orderBy(F.desc("n_quads"), F.asc("p")).limit(20))


def q_kg_canonical_mapping_transcripts(spark, sf_dir) -> DataFrame:
    # shared quads are persisted: mention_edges is a 3-branch scan
    quads = shared_transcript_quads(spark)
    return canonical_mapping(quads).orderBy("node")


def q_kg_sameas_edges_transcripts(spark, sf_dir) -> DataFrame:
    quads = shared_transcript_quads(spark)
    return mention_edges(quads).orderBy("src", "dst")



_TRANSCRIPT_TRUTH_CACHE: list = []


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


# --------------------------------------------------------------------------
# driver-contract registry for this domain (merged by __spark_entry__)
# --------------------------------------------------------------------------

QUERIES = {
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
    "kg_sparql_text_semantics": q_kg_sparql_text_semantics,
    "kg_sparql_text_union_negation": q_kg_sparql_text_union_negation,
    "kg_sparql_text_path": q_kg_sparql_text_path,
    "kg_sparql_text_subquery": q_kg_sparql_text_subquery,
    "kg_sparql_text_ask": q_kg_sparql_text_ask,
    "kg_sparql_text_describe": q_kg_sparql_text_describe,
    "kg_sparql_results_tsv": q_kg_sparql_results_tsv,
    "kg_star_annotations": q_kg_star_annotations,
    "kg_star_annotation_docs": q_kg_star_annotation_docs,
    "kg_star_annotation_blocks": q_kg_star_annotation_blocks,
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
    "kg_bgp_group_aggregates": q_kg_bgp_group_aggregates,
}

ORACLES: dict = {
    **_transcript_oracle_sqls(),
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
    "kg_sparql_results_tsv": f"""
                SELECT '<{KG}m/doc/' || doc_id::varchar || '>' || chr(9) ||
                       '"' || doc_id::varchar || '"@en' || chr(9) ||
                       '"' || doc_id::varchar ||
                       '"^^<http://www.w3.org/2001/XMLSchema#integer>'
                       AS line
                FROM documents ORDER BY line
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
    "kg_sparql_text_semantics": """
                SELECT (doc_id % 500)::BIGINT AS ent,
                       count(*)::BIGINT AS n
                FROM documents
                WHERE (doc_id % 500) IN (7, 13, 21)
                   OR (doc_id % 500) < 5
                GROUP BY 1 ORDER BY 1
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
    "kg_star_annotations": f"""
                WITH a AS (
                  SELECT '{KG}e/' || (doc_id % 500)::varchar || '/a' ||
                             (doc_id % (1 + (doc_id % 500) % 3))::varchar
                             AS e,
                         (1 + doc_id % 7)::varchar AS c
                  FROM documents)
                SELECT e, count(*)::BIGINT AS n_annot,
                       min(c) AS min_c, max(c) AS max_c
                FROM a GROUP BY e ORDER BY e
            """,
    "kg_star_annotation_blocks": f"""
                WITH a AS (
                  SELECT '{KG}e/' || (doc_id % 500)::varchar || '/a' ||
                             (doc_id % (1 + (doc_id % 500) % 3))::varchar
                             AS e,
                         (1 + doc_id % 7)::varchar AS c
                  FROM documents)
                SELECT e, count(*)::BIGINT AS n_annot,
                       min(c) AS min_c, max(c) AS max_c
                FROM a GROUP BY e ORDER BY e
            """,
    "kg_star_annotation_docs": f"""
                WITH a AS (
                  SELECT '{KG}e/doc/' || ((doc_id * 7 + 3) % 97)::varchar
                             AS e,
                         (doc_id % 5 + 1)::BIGINT AS w
                  FROM documents)
                SELECT e, count(*)::BIGINT AS n_annot,
                       sum(w)::BIGINT AS sum_w, max(w)::BIGINT AS max_w
                FROM a GROUP BY e ORDER BY e
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
    "kg_serialized_documents": """
                SELECT source AS conv_id,
                       doc_id::BIGINT AS turn_idx,
                       (5 + doc_id % (1 + (doc_id % 500) % 3))::BIGINT AS n_quads,
                       TRUE AS has_mention_id
                FROM documents
                ORDER BY conv_id, turn_idx
            """,
}
