"""Graph analytics queries (SURVEY.md §2C adjunct: link-graph quality
signals for corpus curation).

Web-scale pretraining curation ranks documents by the link graph
(Common-Crawl-style PageRank / harmonic-centrality filtering) — an
iterative algorithm, the shape Spark handles worst when written naively
(unbounded lineage growth, one shuffle per step forever). These queries
pin the engine's policy for it:

* iterate a FIXED, small number of rounds with the iteration unrolled
  into one declarative plan (3 rounds ≈ the useful signal for a quality
  prior; convergence-to-epsilon runs add a localCheckpoint cut per
  round — the fixpoint pattern `dedup_minhash_components` already pins);
* all rank arithmetic in integer ppm with explicit integral division,
  so both engines lose mass bit-identically and the result is
  value-hashable — no float damping drift;
* the edge list and degree table build once and persist (CacheManager
  dedupes the pure-builtin plan across invocations), each round is ONE
  join + ONE map-side-combined aggregate on the co-partitioned node
  key, and the shuffle key never changes — AQE reuses the exchange
  partitioning between rounds.

The graph here is the bipartite customer↔supplier trading graph from
orders⋈lineitem (node id = 2·custkey / 2·suppkey+1), standing in for a
host-level web link graph at testdata scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jorvik_spark.tables import load_table
from jorvik_spark.queries.registry import memo_df, query

_PR_ROUNDS = 3
# damping 0.85 in ppm: rank' = 150000 + (850000 * Σ share) div 1e6
_PR_BASE = 150_000
_PR_DAMP = 850_000


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric bipartite edge list (src, dst), persisted per sf_dir."""

    def build() -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        pairs = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("c"),
                (F.col("l_suppkey") * 2 + 1).alias("s"),
            )
            .distinct()
        )
        fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
        return fwd.unionByName(rev)

    return memo_df(f"graph_edges:{sf_dir}", spark, build)


@query(
    "graph_degree_distribution",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    deg AS (SELECT src,
                   CASE WHEN src % 2 = 0 THEN 'customer'
                        ELSE 'supplier' END AS node_type,
                   COUNT(*) AS d
            FROM edges GROUP BY 1, 2)
    SELECT node_type,
           CAST(CASE WHEN d = 0 THEN 0
                     ELSE length(bin(d)) END AS INTEGER)
               AS degree_bits,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(d) AS BIGINT) AS min_degree,
           CAST(MAX(d) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1, 2
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two degree histogram per node class — the skew census
    run BEFORE any per-node graph algorithm: the max-degree row tells
    you whether a hub key needs salting, and the bucket counts whether
    the degree distribution is heavy-tailed (web graphs are). Buckets
    are integer bit-lengths (no libm log2 — same convention as
    multimodal_size_histogram)."""
    deg = (
        _edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            F.when(F.col("src") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            F.when(F.col("d") == 0, F.lit(0))
            .otherwise(
                F.length(F.conv(F.col("d").cast("string"), 10, 2))
            )
            .cast("int")
            .alias("degree_bits"),
            "d",
        )
    )
    return deg.groupBy("node_type", "degree_bits").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("d").cast("long").alias("min_degree"),
        F.max("d").cast("long").alias("max_degree"),
    )


@query(
    "graph_pagerank_unrolled",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT o.o_custkey * 2 AS c, l.l_suppkey * 2 + 1 AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
    r1 AS (SELECT e.dst AS node,
                  CAST({_PR_BASE} + ({_PR_DAMP} * SUM(r0.r // g.d))
                       // 1000000 AS BIGINT) AS r
           FROM edges e JOIN r0 ON e.src = r0.node
                        JOIN deg g ON g.src = e.src
           GROUP BY e.dst),
    r2 AS (SELECT e.dst AS node,
                  CAST({_PR_BASE} + ({_PR_DAMP} * SUM(r1.r // g.d))
                       // 1000000 AS BIGINT) AS r
           FROM edges e JOIN r1 ON e.src = r1.node
                        JOIN deg g ON g.src = e.src
           GROUP BY e.dst),
    r3 AS (SELECT e.dst AS node,
                  CAST({_PR_BASE} + ({_PR_DAMP} * SUM(r2.r // g.d))
                       // 1000000 AS BIGINT) AS r
           FROM edges e JOIN r2 ON e.src = r2.node
                        JOIN deg g ON g.src = e.src
           GROUP BY e.dst)
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           r AS score_ppm
    FROM r3
    """,
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 rounds, unrolled) over the
    trading graph — the link-graph quality prior a web-corpus curation
    pipeline attaches to documents. Exact integer-ppm arithmetic: each
    node starts at 1e6; a round sends ``r div degree`` along every edge
    and re-ranks as ``150000 + (850000 · Σ inbound) div 1e6`` — both
    engines truncate identically, so three rounds later the scores are
    bit-equal and value-hashable (float damping would drift in the sum
    order).

    Scale: the edge list + degrees build once (persisted; the only
    distinct+shuffle over the fact join). Every round is one equi join
    on the SAME node key followed by a map-side-combined sum — the
    partitioning is stable across rounds, so the only per-round data
    motion is the contribution shuffle, proportional to |edges|.
    Unrolling 3 rounds keeps one declarative plan (no driver loop
    state); an until-convergence variant adds a localCheckpoint cut per
    round exactly like dedup's component fixpoint (dedup.py) to stop
    lineage growth. Hub skew is measurable first via
    ``graph_degree_distribution``.
    """
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1_000_000).cast("long").alias("r")
    )
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("share"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("share").alias("inbound"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.lit(_PR_BASE)
                    + F.expr(
                        f"(CAST({_PR_DAMP} AS BIGINT) * inbound)"
                        " div CAST(1000000 AS BIGINT)"
                    )
                )
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").alias("score_ppm"),
    )
