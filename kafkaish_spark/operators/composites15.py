"""Round-2 additions, batch 3: iterative graph analytics on the
relational tables.  [NS] north-star extension — the reference
(/root/reference/src/topic.js) has no processing layer.

PageRank here is the representative of the *iterative* operator class
(beyond the min-label connected components of q_dedup_cc_clusters):
a fixed number of power-iteration rounds expressed as pure DataFrame
joins + aggregations, with the floating-point accumulation made
bit-reproducible so the whole thing stays under the DuckDB oracle —
rare for graph workloads, which usually get waved off as rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_DAMP = 0.85
_BASE = 0.15
_ITERS = 3

_EDGE_CACHE = None  # last cached edge frame (bounded-leak guard)

# One power-iteration round as a DuckDB CTE: contributions r/deg flow
# along edges, are folded in ascending-src order with a 0.0 seed (the
# exact fold Spark's aggregate() performs after array_sort), then
# damped.  Prepending 0.0 makes DuckDB's seedless list_reduce match
# Spark's seeded fold: 0.0 + x == x exactly in IEEE for any finite x.
def _iter_cte(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             CAST({_BASE} AS DOUBLE) + CAST({_DAMP} AS DOUBLE) *
               list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(p.r / deg.d ORDER BY e.src)),
                 (a, b) -> a + b) AS r
      FROM e
      JOIN deg ON e.src = deg.src
      JOIN {prev} p ON e.src = p.node
      GROUP BY e.dst)"""


@query(
    "q_graph_pagerank",
    oracle=f"""
    WITH cs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (
      SELECT 'c' || ck AS src, 's' || sk AS dst FROM cs
      UNION ALL
      SELECT 's' || sk AS src, 'c' || ck AS dst FROM cs),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS r FROM deg),
    {_iter_cte('r0', 'r1')},
    {_iter_cte('r1', 'r2')},
    {_iter_cte('r2', 'r3')}
    SELECT node, round(r, 6) AS pagerank
    FROM r3
    """,
)
def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """3-round damped PageRank over the undirected bipartite
    customer<->supplier graph (an edge per distinct trading pair from
    orders x lineitem) — "which suppliers sit at the center of the
    purchase network".

    Bit-reproducibility (what makes an iterative float algorithm
    oracle-checkable): each node's incoming contributions are folded
    in ascending-neighbor order from a 0.0 seed — array_sort +
    aggregate() on the Spark side, list(... ORDER BY src) +
    list_reduce on DuckDB's — so every intermediate double is the SAME
    IEEE value in both engines across all rounds, and the
    cross-cluster-size determinism holds for the same reason it does
    in q_text_unigram_logprob.

    Scale: each round is one shuffle of the edge list (join on src)
    plus one aggregation by dst — O(E) per round, the textbook Pregel
    cost, with no driver-side state; the rank frame (O(V)) is the only
    thing carried between rounds.  Per-node fold arrays are bounded by
    max degree; a power-law hub at 100 TB would get the same salting
    treatment as any hot key (functions.skew), noted rather than
    needed at the driver's scales.  The fixed iteration count is what
    keeps the plan static and AQE-friendly; convergence-driven loops
    would re-plan per round off a 1-row driver check of the max delta.
    """
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    fwd = cs.select(
        F.concat(F.lit("c"), F.col("ck")).alias("src"),
        F.concat(F.lit("s"), F.col("sk")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # The edge list feeds deg + all _ITERS join rounds; cache it once
    # (Catalyst will not unify the repeated subtrees).  Module-level
    # handle with evict-before-replace, same bounded-leak pattern as
    # llm._SHINGLE_CACHE — unpersisting before return would drop the
    # cache before the lazy plan ever executes.
    global _EDGE_CACHE
    if _EDGE_CACHE is not None:
        _EDGE_CACHE.unpersist(blocking=False)
    edges = edges.cache()
    _EDGE_CACHE = edges
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    withdeg = edges.join(deg, "src")
    for _ in range(_ITERS):
        contrib = withdeg.join(
            ranks, withdeg["src"] == ranks["node"]
        ).select(
            "dst", "src", (F.col("r") / F.col("d")).alias("cb")
        )
        summed = F.aggregate(
            F.array_sort(F.collect_list(F.struct("src", "cb"))),
            F.lit(0.0),
            lambda a, s: a + s["cb"],
        )
        ranks = contrib.groupBy(F.col("dst").alias("node")).agg(
            (F.lit(_BASE) + F.lit(_DAMP) * summed).alias("r")
        )
    return ranks.select("node", F.round("r", 6).alias("pagerank"))
