"""Tenth operator batch: cumulative-share banding (ABC inventory
classification) and recency-decayed engagement scoring.

The decay query is worth reading for its exactness trick: half-life
weights chosen as powers of two (1, 0.5, 0.25, ...) are exact dyadic
decimals, so weighted cents stay EXACT in DECIMAL arithmetic on both
engines — an order-independent, bit-reproducible "exponential" decay,
where a true exp(-age/tau) would drift in the last ulp between any
two engines (and between two partitionings of the same engine).

Reference parity: [NS] north-star operators per SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- ABC classification
@query(
    "q_agg_abc_parts",
    oracle="""
    WITH p AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey),
    r AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER () AS tot
      FROM p),
    cls AS (
      SELECT CASE WHEN cum - cents < 0.7 * tot THEN 'A'
                  WHEN cum - cents < 0.9 * tot THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents, tot
      FROM r)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           round(CAST(SUM(cents) AS DOUBLE) / MIN(tot), 6) AS share
    FROM cls GROUP BY abc_class
    """,
)
def q_agg_abc_parts(spark: SparkSession, sf: str) -> DataFrame:
    """ABC inventory classification: parts banded by cumulative revenue
    share — A carries the first 70%, B the next 20%, C the tail — the
    generalization of q_agg_pareto_customers from one cutoff to a band
    ladder, and the standard stock-priority report.  Band membership
    uses cumulative-BEFORE (each band is the minimal prefix crossing
    its line), ordering is the total order (cents DESC, partkey), and
    every comparison is integer cents against an integer-scaled
    threshold — deterministic on both engines.  The ranking window
    runs over the per-part aggregate, not the fact (see SCALE.md §8
    on global-ordering operators)."""
    li = t(spark, sf, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    p = li.groupBy("l_partkey").agg(F.sum(cents).cast("long").alias("cents"))
    wcum = Window.orderBy(F.desc("cents"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = p.select(
        "cents",
        F.sum("cents").over(wcum).alias("cum"),
        F.sum("cents").over(Window.partitionBy()).alias("tot"),
    )
    before = F.col("cum") - F.col("cents")
    cls = r.select(
        F.when(before < 0.7 * F.col("tot"), "A")
        .when(before < 0.9 * F.col("tot"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "tot",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("long").alias("class_cents"),
        F.round(F.sum("cents").cast("double") / F.min("tot"), 6).alias(
            "share"
        ),
    )


# ------------------------------------------------- decayed engagement
@query(
    "q_events_decay_score",
    oracle="""
    WITH ref AS (SELECT MAX(CAST(ts AS DATE)) AS ref_d FROM events),
    e AS (
      SELECT user_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             date_diff('day', CAST(ts AS DATE),
                       (SELECT ref_d FROM ref)) // 7 AS k
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           round(CAST(SUM(CAST(cents AS DECIMAL(18,2)) *
                          CASE k WHEN 0 THEN CAST(1.0    AS DECIMAL(8,4))
                                 WHEN 1 THEN CAST(0.5    AS DECIMAL(8,4))
                                 WHEN 2 THEN CAST(0.25   AS DECIMAL(8,4))
                                 WHEN 3 THEN CAST(0.125  AS DECIMAL(8,4))
                                 ELSE        CAST(0.0625 AS DECIMAL(8,4))
                          END) AS DOUBLE) / 100, 6) AS decay_score
    FROM e GROUP BY user_id
    """,
)
def q_events_decay_score(spark: SparkSession, sf: str) -> DataFrame:
    """Recency-decayed engagement score per user: each event's value
    counts at half weight per week of age (half-life = 7 days against
    the corpus's newest day) — the freshness-weighted activity metric
    behind engagement ranking and churn features.  The weights are
    powers of two, i.e. exact dyadic DECIMALs, so every weighted cent
    is exact and the sum is order-independent — a bit-reproducible
    stand-in for exp(-age/tau), which no two engines round alike.
    The reference day is a 1-row broadcast; one shuffle on user_id."""
    ev = t(spark, sf, "events")
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_d"))
    e = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.round(F.col("value") * 100, 0)
        .cast("long")
        .cast("decimal(18,2)")
        .alias("cents"),
        (F.datediff(F.col("ref_d"), F.to_date("ts")) / 7)
        .cast("int")
        .alias("k"),
    )
    weight = (
        F.when(F.col("k") == 0, F.lit("1.0"))
        .when(F.col("k") == 1, F.lit("0.5"))
        .when(F.col("k") == 2, F.lit("0.25"))
        .when(F.col("k") == 3, F.lit("0.125"))
        .otherwise(F.lit("0.0625"))
        .cast("decimal(8,4)")
    )
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("cents") * weight).cast("double") / 100, 6
        ).alias("decay_score"),
    )
