"""Round-2 additions, batch 7: warehouse-maintenance and skew-control
kernels — deterministic reservoir sampling, salted two-phase
aggregation, incremental materialized-view refresh, and snapshot diff.
[NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer; these are the
operational patterns a 100 TB warehouse runs daily (sample for eyeball
QA, de-skew hot aggregation keys, refresh rollups from deltas instead
of full rescans, and audit what changed between two loads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ------------------------------------------------------------ sampling
@query(
    "q_sample_reservoir",
    oracle="""
    SELECT c_nationkey, c_custkey, rk FROM (
      SELECT c_nationkey, c_custkey,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rk
      FROM customer)
    WHERE rk <= 5
    """,
)
def q_sample_reservoir(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-group reservoir sample (k=5 customers per
    nation): rank rows by a salted hash of their key and keep the k
    smallest — the distributed equivalent of reservoir sampling, but
    reproducible across runs and engines (md5 instead of RNG state).

    Scale: one shuffle on the group key; the ranking window never
    sorts more than one group per task, and Spark's group-limit
    optimization (rn <= k pushed into the window) keeps per-group
    state at k rows, so a billion-row group costs O(rows) scan +
    O(k) memory, never a full sort spill.  This is the pattern for
    pulling a fixed-size, stable QA sample per domain/source out of a
    100 TB corpus without materializing an ordering of the corpus.
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        t(spark, sf, "customer")
        .select("c_nationkey", "c_custkey", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


# --------------------------------------------------------- skew control
@query(
    "q_agg_salted_skew",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation over a pathologically skewed key:
    ``l_returnflag`` has 3 distinct values, so a naive group-by sends
    a third of a 100 TB fact table to each of 3 reducers.  Phase 1
    salts the key with pmod(xxhash64(row), 64) and pre-aggregates
    (key, salt) — 64-way parallel, each partial fits in memory; phase
    2 merges the 3x64 partials, a trivially small shuffle.  The salt
    never reaches the result, so the answer is bit-identical to the
    plain group-by (the oracle).  Sums are integer cents — exact and
    merge-order-independent.

    This is the manual spelling of what AQE's skew mitigation cannot
    do for aggregations (AQE splits skewed JOIN partitions, not
    aggregation keys); Spark's own partial-aggregate step helps only
    when map-side cardinality is low enough to combine — salting
    guarantees reducer-side balance regardless.
    """
    li = t(spark, sf, "lineitem")
    partial = (
        li.withColumn(
            "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(64))
        )
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
                "pc"
            ),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n_items"), F.sum("pc").alias("cents")
    )


# ------------------------------------------- incremental view refresh
@query(
    "q_matview_incremental",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS yr, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS cents
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_matview_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view refresh: the rollup
    (yr, priority) -> (count, sum) is maintained as PARTIAL aggregates.
    The 'stored' view holds partials for history (< 1997-01-01); a
    refresh aggregates only the DELTA (>= 1997-01-01) and merges the
    two partial sets with a second tiny group-by.  Count and sum are
    commutative monoids, so merge(partials) == full recompute — which
    is exactly what the oracle checks.

    Scale: the daily refresh of a 100 TB fact table touches the delta
    partition (GBs) plus the matview itself (KBs — one row per
    (yr, priority)), never the historical fact data.  AVG/stddev
    refresh the same way stored as (sum, count) / (sum, sum2, count);
    MIN/MAX are monoids too.  Only holistic aggregates (exact median,
    distinct-count without a sketch) force a rescan — use the HLL
    sketch rows (q_sketch_hll_cardinality) for incremental distinct.
    """
    orders = t(spark, sf, "orders")
    cents = F.expr(_CENTS)
    cut = F.lit("1997-01-01").cast("date")

    def partials(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.year("o_orderdate").alias("yr"),
                "o_orderpriority",
                cents.alias("c"),
            )
            .groupBy("yr", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("pn"), F.sum("c").alias("pc"))
        )

    stored = partials(orders.filter(F.col("o_orderdate") < cut))
    delta = partials(orders.filter(F.col("o_orderdate") >= cut))
    return (
        stored.unionByName(delta)
        .groupBy("yr", "o_orderpriority")
        .agg(F.sum("pn").alias("n_orders"), F.sum("pc").alias("cents"))
    )


# ------------------------------------------------------- snapshot diff
@query(
    "q_diff_snapshots",
    oracle=f"""
    WITH snap_a AS (
      SELECT o_orderkey,
             md5(concat_ws('|', o_orderstatus, o_orderpriority,
                           CAST({_CENTS} AS VARCHAR))) AS h
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1997
    ), snap_b AS (
      SELECT o_orderkey,
             md5(concat_ws('|', o_orderstatus,
                           CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                                THEN '0-MOD' ELSE o_orderpriority END,
                           CAST({_CENTS} AS VARCHAR))) AS h
      FROM orders WHERE EXTRACT(year FROM o_orderdate) >= 1996
    )
    SELECT change_kind, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
                  WHEN b.o_orderkey IS NULL THEN 'removed'
                  WHEN a.h = b.h THEN 'unchanged'
                  ELSE 'changed' END AS change_kind
      FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey))
    GROUP BY change_kind
    """,
)
def q_diff_snapshots(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot diff between two loads of the same table: every row is
    reduced to (key, md5(row-fingerprint)), the two fingerprint sets
    full-outer join on the key, and each key classifies as
    added / removed / changed / unchanged.  Here snapshot A is orders
    through 1997 and snapshot B is 1996-onward with 1996 priorities
    rewritten — giving all four classes deterministically from the
    fixed testdata.

    Scale: the diff never moves row payloads — each side collapses to
    key + 32-byte hash at the scan (projection pruning reads only the
    fingerprinted columns), so the shuffle is O(keys), not O(bytes).
    This is the CDC-less change audit for a 100 TB daily load: a
    sort-merge join on the key with AQE handling any hot-key skew,
    followed by a 4-row aggregate.
    """
    orders = t(spark, sf, "orders")
    cents = F.expr(_CENTS)
    yr = F.year("o_orderdate")
    fp = lambda prio: F.md5(  # noqa: E731
        F.concat_ws(
            "|", F.col("o_orderstatus"), prio, cents.cast("string")
        )
    )
    snap_a = orders.filter(yr <= 1997).select(
        "o_orderkey", fp(F.col("o_orderpriority")).alias("ha")
    )
    snap_b = orders.filter(yr >= 1996).select(
        "o_orderkey",
        fp(
            F.when(yr == 1996, F.lit("0-MOD")).otherwise(
                F.col("o_orderpriority")
            )
        ).alias("hb"),
    )
    joined = snap_a.join(snap_b, "o_orderkey", "full_outer")
    return (
        joined.select(
            F.when(F.col("ha").isNull(), "added")
            .when(F.col("hb").isNull(), "removed")
            .when(F.col("ha") == F.col("hb"), "unchanged")
            .otherwise("changed")
            .alias("change_kind")
        )
        .groupBy("change_kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )
