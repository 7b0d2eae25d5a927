"""Eighth operator batch: remaining SQL-surface corners — multi-column
IN subqueries (composite-key semi join), forward-looking RANGE frames,
and the wider datetime scalar-function sweep.

Same conventions as the earlier batches (exact-decimal money folds,
integer day numbers for RANGE bounds, identical aliases both engines).

Reference parity: [NS] north-star operators per SURVEY.md §2.2
(R26/R30 extensions); the reference computes none of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- multi-column IN
@query(
    "q_subquery_in_multi_col",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           CAST(o.o_orderdate AS DATE) AS latest_date
    FROM orders o
    WHERE EXISTS (SELECT 1
                  FROM (SELECT o_custkey AS ck, MAX(o_orderdate) AS md
                        FROM orders GROUP BY o_custkey) m
                  WHERE m.ck = o.o_custkey AND m.md = o.o_orderdate)
    """,
)
def q_subquery_in_multi_col(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-column IN subquery: each customer's order(s) on their
    latest order date, expressed as a composite-key membership test.
    Catalyst decorrelates ``(a, b) IN (subquery)`` into a LEFT SEMI
    join on BOTH columns — one shuffle keyed on the pair, no row
    explosion even when several orders tie on the latest date (the
    reason this is not an equi-join on a scalar subquery).  Ties are
    kept by semantics, so the result is deterministic without any
    tiebreak column."""
    o = t(spark, sf, "orders")
    o.createOrReplaceTempView("in_multi_orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS latest_date
        FROM in_multi_orders_v
        WHERE (o_custkey, o_orderdate) IN
              (SELECT o_custkey, MAX(o_orderdate)
               FROM in_multi_orders_v GROUP BY o_custkey)
        """
    )


# ------------------------------------------------- forward RANGE frame
@query(
    "q_window_forward_30d_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day', DATE '1992-01-01',
                          CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1992-01-01',
                                CAST(o_orderdate AS DATE))
             RANGE BETWEEN CURRENT ROW AND 30 FOLLOWING) AS DOUBLE)
             AS pipeline_30d
    FROM orders
    """,
)
def q_window_forward_30d_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Forward-looking RANGE frame: each order's customer spend over
    the NEXT 30 days (day d through d+30) — the demand-pipeline twin
    of q_window_trailing_30d_spend, and the frame shape behind
    forward-label construction ('did the customer spend X within 30
    days?') where a training pipeline must look strictly forward of
    the feature timestamp.  Value-based RANGE bounds over an integer
    day number keep the frame exact; same-day orders all see the full
    same-day total.  One shuffle on o_custkey."""
    o = t(spark, sf, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_no.cast("long"))
        .rangeBetween(0, 30)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        day_no.cast("long").alias("day_no"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("pipeline_30d"),
    )


# ------------------------------------------------- datetime sweep
@query(
    "q_scalar_datetime_sweep",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus_3m,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
           CAST(dayofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS doy,
           CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
             AS qtr_start
    FROM orders
    """,
)
def q_scalar_datetime_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """The wider datetime scalar surface (R26 extension): month end,
    calendar arithmetic (add_months, with both engines clamping
    month-end overflow the same way), quarter, ISO week, day-of-year,
    and quarter truncation — the derived-calendar columns every
    partitioning/reporting layer computes at scan time.  Pure codegen
    projection: no shuffle, no UDF, and every function pushes through
    the same whole-stage-codegen span as the scan."""
    o = t(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("plus_3m"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.to_date(F.date_trunc("quarter", d)).alias("qtr_start"),
    )


# ------------------------------------------------- Count-Min sketch
_CMS_DEPTH, _CMS_WIDTH = 4, 1024


@query("q_sketch_count_min_terms", oracle=None)
def q_sketch_count_min_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min frequency sketch over corpus terms — the mergeable
    heavy-hitters complement to the HLL cardinality sketch
    (q_sketch_hll_cardinality).  Each term increments one counter per
    hash row (seeded xxhash64 mod width); a term's frequency estimate
    is the MIN of its depth=4 cells — always an overestimate,
    within eps*N (eps ~ e/width) with high probability.  The sketch IS
    a DataFrame of (row_id, bucket, n): integer counters that merge by
    addition, so map-side partial aggregation builds it in one pass
    with a shuffle of at most depth x width rows — constant size no
    matter how many terms, the whole point at 100 TB (exact top-k over
    an unbounded vocabulary is q_text_tf_top_terms; this is what you
    run when the vocabulary doesn't fit anywhere).  Rows-only:
    xxhash64 seeding is engine-specific; the overestimate property and
    the eps*N accuracy bound are pytest-asserted via cms_lookup."""
    d = t(spark, sf, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("term"))
    cells = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col("term")),
                            F.lit(_CMS_WIDTH),
                        ).alias("bucket"),
                    )
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.row_id", "c.bucket")
    return cells.groupBy("row_id", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def cms_lookup(spark: SparkSession, sketch: DataFrame, terms: DataFrame) -> DataFrame:
    """Query the Count-Min sketch: for each row of ``terms`` (column
    ``term``), recompute the depth=4 cell coordinates with the
    SAME seeded hashes and take the minimum counter.  The sketch side
    is at most depth x width rows — broadcast — so lookups never
    shuffle the term list; missing cells count as 0."""
    probes = terms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_id"),
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col("term")),
                            F.lit(_CMS_WIDTH),
                        ).alias("bucket"),
                    )
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("term", "c.row_id", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .na.fill({"n": 0})
        .groupBy("term")
        .agg(F.min("n").cast("long").alias("est"))
    )
