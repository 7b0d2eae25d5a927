"""Fifth operator batch: the reporting-layer shapes — revenue
concentration (Pareto), gaps-and-islands streaks, hierarchical
dimension rollup, period-over-period growth, and weighted percentiles.

Same house rules as the earlier batches: money folds as integer cents
(order-independent, bit-equal to the DuckDB oracle), every ordering
that feeds a window carries a unique tiebreak key, and computed
columns are aliased identically on both engines.

Reference parity: [NS] north-star processing-layer operators per
SURVEY.md §2.2; the reference's only query shapes are the offset
scan / sort-limit / key lookup cited there (src/topic.js:144-148,
226-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- Pareto concentration
@query(
    "q_agg_pareto_customers",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT o_custkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                              ROWS UNBOUNDED PRECEDING) AS cum_cents,
             SUM(cents) OVER () AS tot_cents,
             COUNT(*) OVER () AS n_customers
      FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_top_customers,
           CAST(MIN(n_customers) AS BIGINT) AS n_customers,
           round(CAST(COUNT(*) AS DOUBLE) / MIN(n_customers), 6)
             AS top_share,
           CAST(MIN(tot_cents) AS BIGINT) AS total_cents
    FROM r
    WHERE cum_cents - cents < 0.8 * tot_cents
    """,
)
def q_agg_pareto_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto / 80-20 concentration: how many of the biggest customers
    cover 80% of total revenue.  A customer is in the top set iff the
    cumulative revenue BEFORE them is still under the 80% line (so the
    set is minimal and covers >= 80%).  Ordering is (cents DESC,
    custkey) — a total order, so the cutoff is deterministic on both
    engines, and all comparisons are integer cents vs an integer-scaled
    threshold.  The global cumulative window runs over the per-customer
    AGGREGATE (1 row/customer); at true scale swap the single-task sort
    for the two-pass range-partitioned cumsum the same way
    q_rfm_segmentation's docstring describes."""
    o = t(spark, sf, "orders")
    c = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wcum = Window.orderBy(F.desc("cents"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    r = c.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum_cents"),
        F.sum("cents").over(wall).alias("tot_cents"),
        F.count(F.lit(1)).over(wall).alias("n_customers"),
    )
    return r.filter(
        (F.col("cum_cents") - F.col("cents"))
        < 0.8 * F.col("tot_cents")
    ).agg(
        F.count(F.lit(1)).alias("n_top_customers"),
        F.min("n_customers").cast("long").alias("n_customers"),
        F.round(F.count(F.lit(1)) / F.min("n_customers"), 6).alias(
            "top_share"
        ),
        F.min("tot_cents").cast("long").alias("total_cents"),
    )


# ------------------------------------------------- gaps and islands
@query(
    "q_window_order_streaks",
    oracle="""
    WITH d AS (
      SELECT DISTINCT o_custkey,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS m
      FROM orders),
    isl AS (
      SELECT o_custkey, m,
             (EXTRACT(year FROM m) * 12 + EXTRACT(month FROM m))
               - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY m)
               AS island
      FROM d)
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS streak_months,
           CAST(MIN(m) AS DATE) AS streak_start,
           CAST(MAX(m) AS DATE) AS streak_end
    FROM isl
    GROUP BY o_custkey, island
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY COUNT(*) DESC, MIN(m)) = 1
    """,
)
def q_window_order_streaks(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: each customer's LONGEST streak of consecutive
    months with at least one order.  The classic trick — month-index
    minus row_number is constant exactly while months are consecutive —
    turns streak detection into a plain group-by, with no iterative
    logic and one shuffle on (custkey).  Tie between equal-length
    streaks resolves to the earliest (deterministic).  The same shape
    finds daily active streaks, sensor uptime runs, and contiguous
    offset ranges in the topic log (sources/topic_log.py's
    contiguity audit)."""
    o = t(spark, sf, "orders")
    d = o.select(
        "o_custkey",
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("m"),
    ).distinct()
    midx = F.year("m") * 12 + F.month("m")
    wrn = Window.partitionBy("o_custkey").orderBy("m")
    isl = d.withColumn("island", midx - F.row_number().over(wrn))
    streaks = isl.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("streak_months"),
        F.min("m").alias("streak_start"),
        F.max("m").alias("streak_end"),
    )
    wbest = Window.partitionBy("o_custkey").orderBy(
        F.desc("streak_months"), "streak_start"
    )
    return (
        streaks.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "streak_months", "streak_start", "streak_end")
    )


# ------------------------------------------------- hierarchy rollup
@query(
    "q_agg_rollup_part_type",
    oracle="""
    SELECT string_split(p_type, ' ')[1] AS lvl1,
           string_split(p_type, ' ')[2] AS lvl2,
           string_split(p_type, ' ')[3] AS lvl3,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM part
    GROUP BY ROLLUP (string_split(p_type, ' ')[1],
                     string_split(p_type, ' ')[2],
                     string_split(p_type, ' ')[3])
    """,
)
def q_agg_rollup_part_type(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical dimension rollup: p_type ('STANDARD ANODIZED
    BRASS') splits into a 3-level hierarchy and ROLLUP produces
    subtotals at every prefix level plus the grand total — the
    drill-down cube a BI layer asks for, in ONE pass.  Catalyst plans
    rollup as Expand (each row fans out once per grouping set) feeding
    a single partial-aggregated Exchange — 4x the rows through one
    shuffle instead of 4 separate aggregation jobs over the fact."""
    p = t(spark, sf, "part")
    parts = F.split("p_type", " ")
    d = p.select(
        F.get(parts, 0).alias("lvl1"),
        F.get(parts, 1).alias("lvl2"),
        F.get(parts, 2).alias("lvl3"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("cents"),
    )
    return d.rollup("lvl1", "lvl2", "lvl3").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("long").alias("price_cents"),
    )


# ------------------------------------------------- period-over-period
@query(
    "q_agg_yoy_growth",
    oracle="""
    WITH y AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT yr, n_orders, cents,
           CAST(lag(cents) OVER (ORDER BY yr) AS BIGINT) AS prev_cents,
           round(CAST(cents - lag(cents) OVER (ORDER BY yr) AS DOUBLE)
                 / lag(cents) OVER (ORDER BY yr), 6) AS yoy
    FROM y
    """,
)
def q_agg_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Year-over-year growth: annual revenue with lag() against the
    prior year — the period-over-period reporting shape (works the same
    for week/month/quarter by changing the bucket).  The window runs
    over the 7-row yearly aggregate, so the 'global' sort is free; all
    growth inputs are exact integer cents and the ratio is the single
    final IEEE division."""
    o = t(spark, sf, "orders")
    y = o.groupBy(F.year("o_orderdate").cast("long").alias("yr")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("yr")
    prev = F.lag("cents").over(w)
    return y.select(
        "yr",
        "n_orders",
        "cents",
        prev.cast("long").alias("prev_cents"),
        F.round((F.col("cents") - prev).cast("double") / prev, 6).alias("yoy"),
    )


# ------------------------------------------------- weighted median
@query(
    "q_agg_weighted_median",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem),
    c AS (
      SELECT l_returnflag, cents, w,
             SUM(w) OVER (PARTITION BY l_returnflag
                          ORDER BY cents, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tot_w
      FROM v)
    SELECT l_returnflag,
           CAST(MIN(tot_w) AS BIGINT) AS total_weight,
           round(MIN(CASE WHEN 2 * cum_w >= tot_w THEN cents END) / 100.0, 6)
             AS weighted_median
    FROM c GROUP BY l_returnflag
    """,
)
def q_agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    price whose cumulative weight reaches half the total — i.e. the
    median UNIT shipped, not the median line.  All comparisons are
    integer (2·cum_w >= tot_w avoids the /2 rounding hazard) and the
    ordering key (cents, orderkey, linenumber) is a total order.

    Scale: l_returnflag has 3 values, so a single cumulative-sum
    window per flag is one fat task per flag at 100 TB.  The running
    weight is instead TWO-PHASE (the composites24 rank decomposition
    applied to a cumsum, which splits over ordered buckets exactly):
    price-range buckets (cents // 100000 — monotone in the leading
    sort key, so equal cents can never straddle buckets), a parallel
    within-(flag, bucket) running sum, and a per-flag broadcast
    prefix over the bounded (flag x bucket) weight histogram; tot_w
    falls out of the same histogram.  The unchanged naive-window
    oracle proves the decomposition exact."""
    li = t(spark, sf, "lineitem")
    v = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        "l_orderkey",
        "l_linenumber",
    ).withColumn("pbucket", (F.col("cents") / 100000).cast("long"))
    hist = v.groupBy("l_returnflag", "pbucket").agg(
        F.sum("w").alias("bw")
    )
    w_pre = (
        Window.partitionBy("l_returnflag")
        .orderBy("pbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = hist.select(
        "l_returnflag",
        "pbucket",
        F.coalesce(F.sum("bw").over(w_pre), F.lit(0)).alias("w0"),
    )
    tot = hist.groupBy("l_returnflag").agg(F.sum("bw").alias("tot_w"))
    w_in = (
        Window.partitionBy("l_returnflag", "pbucket")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = (
        v.withColumn("cw_in", F.sum("w").over(w_in))
        .join(F.broadcast(prefix), ["l_returnflag", "pbucket"])
        .join(F.broadcast(tot), "l_returnflag")
        .select(
            "l_returnflag",
            "cents",
            (F.col("w0") + F.col("cw_in")).alias("cum_w"),
            "tot_w",
        )
    )
    return c.groupBy("l_returnflag").agg(
        F.min("tot_w").cast("long").alias("total_weight"),
        F.round(
            F.min(
                F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("cents"))
            )
            / 100.0,
            6,
        ).alias("weighted_median"),
    )
