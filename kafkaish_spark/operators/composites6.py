"""Sixth operator batch: the data-quality / observability surface —
dbt-style expectation checks, per-column profiling, path mining, and
equi-depth histograms.  A 100 TB training-data pipeline runs these
audits on every ingest BEFORE any expensive dedup/training pass, so
they are first-class operators, not notebook one-offs.

Design rules as per the earlier batches (integer-exact folds, unique
ordering keys, identical aliases in plan and oracle).  The audit
queries deliberately produce LONG (check-per-row) output — that is
the shape a monitoring sink ingests.

Reference parity: [NS] north-star operators per SURVEY.md §2.2; the
reference has no audit surface (its only introspection is the
collection stats call cited at src/topic.js:251-257).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- expectation checks
@query(
    "q_audit_expectations",
    oracle="""
    SELECT 'row_count_min_1' AS check_name,
           CAST(CASE WHEN COUNT(*) >= 1 THEN 0 ELSE 1 END AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'custkey_not_null',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) FROM orders
    UNION ALL
    SELECT 'orderdate_in_range',
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                           OR o_orderdate >= TIMESTAMP '2010-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'status_in_domain',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT) FROM orders
    """,
)
def q_audit_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """dbt-test-style expectation suite over orders, evaluated in ONE
    scan: row count, not-null, uniqueness, value range, date range,
    and domain membership — each reported as a violation count (0 =
    pass).  All six checks fold into a single aggregate row (one
    partial-agg reduce, no shuffle of the fact) and unpivot to the
    check-per-row shape a monitoring sink ingests; the oracle's
    six-scan UNION ALL formulation is the semantic spec, not the plan.
    The uniqueness check is the one Expand-based distinct; at
    billions of keys you'd swap it for the HLL sketch audit
    (q_sketch_hll_cardinality) and accept approximate."""
    o = t(spark, sf, "orders")
    wide = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_dist_orderkey"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "n_nonpos"
        ),
        F.sum(
            F.when(
                (F.col("o_orderdate") < "1990-01-01")
                | (F.col("o_orderdate") >= "2010-01-01"),
                1,
            ).otherwise(0)
        ).alias("n_bad_date"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("n_bad_status"),
    )
    checks = F.array(
        F.struct(
            F.lit("row_count_min_1").alias("check_name"),
            F.when(F.col("n_rows") >= 1, F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("n_violations"),
        ),
        F.struct(
            F.lit("custkey_not_null").alias("check_name"),
            (F.col("n_rows") - F.col("n_custkey"))
            .cast("long")
            .alias("n_violations"),
        ),
        F.struct(
            F.lit("orderkey_unique").alias("check_name"),
            (F.col("n_rows") - F.col("n_dist_orderkey"))
            .cast("long")
            .alias("n_violations"),
        ),
        F.struct(
            F.lit("totalprice_positive").alias("check_name"),
            F.col("n_nonpos").cast("long").alias("n_violations"),
        ),
        F.struct(
            F.lit("orderdate_in_range").alias("check_name"),
            F.col("n_bad_date").cast("long").alias("n_violations"),
        ),
        F.struct(
            F.lit("status_in_domain").alias("check_name"),
            F.col("n_bad_status").cast("long").alias("n_violations"),
        ),
    )
    return wide.select(F.explode(checks).alias("c")).select(
        "c.check_name", "c.n_violations"
    )


# ------------------------------------------------- column profiling
@query(
    "q_profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           COUNT(DISTINCT o_orderdate),
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def q_profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiler (the schema-drift / data-dictionary audit):
    null count, exact distinct count, and min/max per column of
    orders, in long format.  One scan computes every column's stats
    in a single Expand-based aggregate (vs the oracle's six scans);
    doubles render through DECIMAL(18,2) so both engines print the
    same string, timestamps through their common ISO text form.  At
    scale this is the query you run per-partition-ingest to catch a
    upstream schema or distribution break before it poisons a
    training run."""
    o = t(spark, sf, "orders")

    def prof(col: str, render):
        return [
            (F.count(F.lit(1)) - F.count(col)).cast("long").alias(f"nn_{col}"),
            F.countDistinct(col).alias(f"nd_{col}"),
            render(F.min(col)).alias(f"mn_{col}"),
            render(F.max(col)).alias(f"mx_{col}"),
        ]

    as_str = lambda c: c.cast("string")  # noqa: E731
    as_dec = lambda c: c.cast("decimal(18,2)").cast("string")  # noqa: E731
    cols = {
        "o_orderkey": as_str,
        "o_custkey": as_str,
        "o_orderstatus": as_str,
        "o_totalprice": as_dec,
        "o_orderdate": as_str,
        "o_orderpriority": as_str,
    }
    aggs = [a for c, r in cols.items() for a in prof(c, r)]
    wide = o.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_s"),
                F.col(f"mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select(
        "p.col_name", "p.n_nulls", "p.n_distinct", "p.min_s", "p.max_s"
    )


# ------------------------------------------------- path mining
@query(
    "q_events_top_paths",
    oracle="""
    WITH p AS (
      SELECT event_type || '>' ||
             lead(event_type, 1) OVER w || '>' ||
             lead(event_type, 2) OVER w AS path
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT path, COUNT(*) AS n
    FROM p WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def q_events_top_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top user paths: the 20 most frequent 3-step event sequences,
    built with two lead() calls over each user's timeline (windows at
    the tail of a history yield NULL and drop out — only complete
    triples count).  Extends q_events_markov_transitions from pairs to
    paths; one shuffle on user_id for the leads, a partial-aggregated
    shuffle on the path string, and TakeOrderedAndProject for the
    top-20 (tie-broken on the path text, so the cut is deterministic)."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(w),
            F.lead("event_type", 2).over(w),
        ).alias("path"),
        F.lead("event_type", 2).over(w).alias("_l2"),
    ).filter(F.col("_l2").isNotNull())
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


# ------------------------------------------------- equi-depth histogram
@query(
    "q_agg_equidepth_histogram",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             o_orderkey,
             ntile(10) OVER (ORDER BY round(o_totalprice * 100, 0),
                             o_orderkey) AS bucket
      FROM orders)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
    FROM v GROUP BY bucket
    """,
)
def q_agg_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order value: 10 buckets
    with equal row counts and data-driven boundaries — what a cost
    optimizer stores as column statistics, and what a skew audit reads
    (a wide top bucket = heavy tail).  ntile orders by (cents,
    orderkey), a total order, so bucket edges are deterministic.  The
    global ntile sorts the fact in one task — the honest formulation
    at audit scale; for 100 TB swap in approx-percentile cut points
    broadcast against the scan (q_outliers_above_p95 pattern), which
    trades exact equal heights for a full range-partitioned parallel
    pass."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    v = o.select(
        cents.alias("cents"),
        F.ntile(10)
        .over(Window.orderBy(cents, "o_orderkey"))
        .cast("long")
        .alias("bucket"),
    )
    return v.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").cast("long").alias("lo_cents"),
        F.max("cents").cast("long").alias("hi_cents"),
    )
