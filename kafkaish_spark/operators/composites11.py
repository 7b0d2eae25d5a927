"""Eleventh operator batch: running cumulative-distinct counts (the
incremental-discovery curve) and the discrete-percentile surface.

Reference parity: [NS] north-star operators per SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- running distinct
@query(
    "q_window_cumulative_distinct",
    oracle="""
    WITH f AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(event_type) OVER (
                    PARTITION BY user_id
                    ORDER BY event_type, ts, event_id)
                  IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_new
      FROM events)
    SELECT event_id, user_id,
           CAST(SUM(is_new) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM f
    """,
)
def q_window_cumulative_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running COUNT(DISTINCT) — how many distinct event types each
    user has seen as of every event (the feature-discovery /
    onboarding-depth curve).  SQL has no DISTINCT window aggregate, and
    the naive per-row set is O(history²); the standard rewrite marks
    each type's FIRST occurrence (lag over a type-major sort) and
    cumsums those flags in time order.  Both windows partition on
    user_id with different ORDER BYs, so Spark plans ONE Exchange and
    re-sorts in place (asserted in tests) — the two-sort-one-shuffle
    shape that scales to any history length."""
    ev = t(spark, sf, "events")
    w1 = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w1).eqNullSafe(F.col("event_type")), 0
        )
        .otherwise(1)
        .alias("is_new"),
    )
    return f.select(
        "event_id",
        "user_id",
        F.sum("is_new").over(w2).cast("long").alias("n_types_seen"),
    )


# ------------------------------------------------- discrete percentiles
@query(
    "q_agg_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           CAST(quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT),
                              0.5) AS BIGINT) AS p50_cents,
           CAST(quantile_disc(CAST(round(o_totalprice * 100, 0) AS BIGINT),
                              0.9) AS BIGINT) AS p90_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_percentile_disc(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete percentiles (percentile_disc / WITHIN GROUP, the
    SQL:2008 inverse-distribution form): the median and p90 as ACTUAL
    member values, never interpolated — what you want when the value
    must exist (an order id, a price that was actually charged), and
    the exact twin of q_agg_percentiles_quantity's continuous form.
    Integer cents make the picked members identical on both engines
    (both use the lowest-value-at-or-above-the-quantile convention)."""
    o = t(spark, sf, "orders")
    o.createOrReplaceTempView("pdisc_orders_v")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(percentile_disc(0.5) WITHIN GROUP (
                 ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS p50_cents,
               CAST(percentile_disc(0.9) WITHIN GROUP (
                 ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT))
                 AS BIGINT) AS p90_cents
        FROM pdisc_orders_v GROUP BY o_orderpriority
        """
    )
