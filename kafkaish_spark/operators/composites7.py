"""Seventh operator batch: the Arrow grouped-UDF surface
(``applyInArrow``, new in Spark 4) exercised with a trick worth
writing down — arbitrary-precision Python integers make a Python UDF
BIT-EQUAL to the SQL oracle, because every moment is summed exactly
and only the final division is IEEE — plus the INTERSECT ALL set op.

Reference parity: [NS] north-star operators (SURVEY.md §2.4 U-series
and §2.2 R24); the reference has no UDF or set-operation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- applyInArrow regression
def _regress_arrow(table):
    """Per-group OLS of value-cents against seconds-since-group-start.

    All moments are exact (Python ints never overflow — the int128 the
    oracle gets from DuckDB's HUGEINT, we get for free), so the two
    final float divisions are the only IEEE ops and both engines see
    identical inputs.  float(num)/float(den) deliberately mirrors the
    oracle's CAST(... AS DOUBLE)/CAST(... AS DOUBLE) — Python's
    int/int true division rounds the exact rational instead, which can
    differ in the last ulp."""
    import pyarrow as pa

    et = table.column("event_type")[0].as_py()
    xs = table.column("x_s").to_pylist()
    ys = table.column("y_c").to_pylist()
    x0 = min(xs)
    xs = [x - x0 for x in xs]
    n = len(xs)
    sx = sum(xs)
    sy = sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    if den == 0:
        # single-row group or all-identical x: slope is undefined.
        # Emit NULL like the SQL regr_* family would, instead of
        # letting ZeroDivisionError fail the whole job.
        slope = intercept = None
    else:
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = float(sy * sxx - sx * sxy) / float(den)
    return pa.table(
        {
            "event_type": [et],
            "n": [n],
            "slope": [slope],
            "intercept_cents": [intercept],
        }
    )


@query(
    "q_udaf_arrow_regression",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_ms(ts) // 1000 AS x,
             CAST(round(value * 100, 0) AS BIGINT) AS y
      FROM events),
    o AS (
      SELECT event_type,
             x - MIN(x) OVER (PARTITION BY event_type) AS x, y
      FROM e),
    s AS (
      SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM o GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept_cents
    FROM s
    """,
)
def q_udaf_arrow_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map Arrow UDF (``applyInArrow``, Spark 4's U3/U4
    surface): per event type, the OLS trend of value over time —
    slope in cents/second and the intercept at the group's first
    observation.  The group arrives as ONE Arrow table (zero-copy, no
    pandas conversion), moments accumulate as unbounded Python ints,
    and the oracle's HUGEINT arithmetic lands on the same exact
    integers — so a PYTHON UDF hash-matches DuckDB bit-for-bit, which
    row-at-a-time float accumulation could never guarantee.  Scale
    honesty: one group = one task; this is the surface demo, and the
    mergeable-moment formulation (q_agg_regression_price_qty) is what
    you run when a group won't fit a task."""
    ev = t(spark, sf, "events")
    from kafkaish_spark.functions.timeutil import epoch_ms

    ms = epoch_ms(F.col("ts"))
    prep = ev.select(
        "event_type",
        # (ms - ms % 1000) / 1000 is an exact double division (the
        # numerator is a representable multiple of 1000), so the cast
        # can never straddle an integer boundary the way ms/1000 could
        ((ms - ms % 1000) / 1000).cast("long").alias("x_s"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y_c"),
    )
    out = prep.groupBy("event_type").applyInArrow(
        _regress_arrow,
        schema="event_type string, n bigint, slope double, "
        "intercept_cents double",
    )
    return out.select(
        "event_type",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept_cents", 6).alias("intercept_cents"),
    )


# ------------------------------------------------- INTERSECT ALL
@query(
    "q_set_intersect_all_years",
    oracle="""
    SELECT * FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
      FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
      FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def q_set_intersect_all_years(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): order-years keep the MINIMUM of
    their multiplicities on the two sides — the multiset counterpart
    of q_set_intersect_customers' set form, and the last of the
    SQL-standard set operators (R24's exceptAll twin).  Catalyst plans
    it as a count-compare aggregate + generate, one shuffle on the
    value — no pairwise matching."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate").cast("long").alias("yr")
    a = o.filter(F.col("o_orderstatus") == "F").select(yr)
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(yr)
    return a.intersectAll(b)
