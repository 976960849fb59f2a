"""Graph analytics over the constructed KG: degrees and PageRank.

The reference builds graphs but never analyzes them (its dataset is one
in-memory rdflib Graph — SURVEY.md §4.1); entity-importance ranking is
the first analytics ask on a constructed KG (which canonical entities
matter?), so the pipeline carries it as a first-class operator the same
way it carries connected components (SURVEY.md §2.F2).

Algorithm: classic PageRank power iteration (Page et al. 1999, public),
expressed as DataFrame joins so Catalyst/AQE own the physical plan:

    contrib(dst) = Σ_{(src,dst)∈E} rank(src) / out_degree(src)
    rank'(v)     = (1-d)/N + d · (contrib(v) + dangling_mass/N)

Scale posture (10^12-edge ready):
- one hash join rank⋈edges + one hash agg per iteration — the same
  shuffle shape as one round of distributed CC; AQE handles skewed hubs
  (the same reason E6 salting exists for aggregations is why the
  contribution agg keys on dst, never on a hot constant);
- ``localCheckpoint`` per iteration with explicit unpersist of the
  previous round, exactly the CC-loop storage discipline
  (linking.py:163-166) — plans stay O(1) deep, storage O(1) rounds;
- the only driver actions are one scalar row per iteration (N once,
  dangling mass per round) — bounded at any scale;
- iteration count is FIXED (default 10), not convergence-tested: a fixed
  unrollable recurrence is what makes the result exactly replicable by
  the SQL oracle and by a resumed run (determinism > adaptive stopping;
  callers needing convergence can compare successive calls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def degree_stats(quads: DataFrame) -> DataFrame:
    """Per-node in/out degree over the quad table's IRI-to-IRI edges
    (literals are attributes, not graph edges; rdf:type is schema, not
    topology). One union + one hash agg — no joins."""
    edges = quads.where((F.col("o_kind") == "iri")
                        & (F.col("p") != RDF_TYPE))
    outs = edges.select(F.col("s").alias("node"),
                        F.lit(1).alias("out_e"), F.lit(0).alias("in_e"))
    ins = edges.select(F.col("o_value").alias("node"),
                       F.lit(0).alias("out_e"), F.lit(1).alias("in_e"))
    return (outs.unionByName(ins)
            .groupBy("node")
            .agg(F.sum("out_e").cast("long").alias("out_degree"),
                 F.sum("in_e").cast("long").alias("in_degree")))


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85) -> DataFrame:
    """(src, dst) directed edges → (node, rank) after a fixed number of
    power iterations. Ranks sum to 1 (dangling mass redistributed
    uniformly). Duplicate edges count once (set semantics, matching the
    quad table's graph model)."""
    e = (edges.select("src", "dst").dropDuplicates(["src", "dst"])
         .persist())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    if n == 0:
        e.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    # degree rides WITH the rank table so each iteration is ONE join with
    # the edge set, not two
    ranks = (nodes.join(out_deg, nodes.node == out_deg.src, "left")
             .select("node",
                     F.lit(1.0 / n).alias("rank"),
                     F.col("out_degree"))
             .localCheckpoint(eager=True))

    base = (1.0 - damping) / n
    for _ in range(iterations):
        # bounded driver action: ONE scalar — total rank parked on
        # dangling nodes this round
        dangling = ranks.where(F.col("out_degree").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).collect()[0][0]
        spread = base + damping * dangling / n
        contrib = (e.join(ranks, e.src == ranks.node)
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") / F.col("out_degree"))
                        .alias("contrib")))
        nxt = (ranks.join(contrib, ranks.node == contrib.dst, "left")
               .select(ranks.node,
                       (F.lit(spread) + F.lit(damping)
                        * F.coalesce(F.col("contrib"), F.lit(0.0)))
                       .alias("rank"),
                       ranks.out_degree)
               .localCheckpoint(eager=True))
        ranks.unpersist()
        ranks = nxt
    e.unpersist()
    nodes.unpersist()
    return ranks.select("node", "rank")
