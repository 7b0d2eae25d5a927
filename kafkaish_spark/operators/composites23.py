"""Round-2 additions, batch 11: survival analysis and forecast
evaluation.
[NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer; these add the
two remaining classic analytics families: a Kaplan-Meier churn curve
(right-censored time-to-event, the honest retention statistic) and
seasonal-naive forecast scoring (MASE — the scale-free baseline every
forecasting system must beat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.folds import ordered_product
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_KM_CENSOR_DAYS = 1  # last activity within N days of corpus end => censored
# (the synthetic events table spans ~30 days with every user active in
# its final week — a 1-day horizon leaves an observable churn cohort)
_DAY_MS = 86_400_000


@query(
    "q_events_kaplan_meier",
    oracle=f"""
    WITH spans AS (
      SELECT user_id,
             (MAX(epoch_ms(ts)) - MIN(epoch_ms(ts))) // {_DAY_MS} AS dur,
             MAX(epoch_ms(ts)) AS last_ms
      FROM events GROUP BY user_id),
    horizon AS (SELECT MAX(last_ms) AS hmax FROM spans),
    labeled AS (
      SELECT dur,
             CASE WHEN last_ms >= (SELECT hmax FROM horizon)
                               - {_KM_CENSOR_DAYS} * {_DAY_MS}
                  THEN 0 ELSE 1 END AS ev
      FROM spans),
    hist AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(ev) AS BIGINT) AS d
      FROM labeled GROUP BY dur),
    risk AS (
      SELECT dur, cnt, d,
             CAST(SUM(cnt) OVER (ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_at_risk
      FROM hist),
    factors AS (
      SELECT dur, d, n_at_risk,
             1.0 - CAST(d AS DOUBLE) / n_at_risk AS f
      FROM risk WHERE d > 0)
    SELECT a.dur AS t, a.n_at_risk, a.d,
           round(list_reduce(
             list_prepend(CAST(1.0 AS DOUBLE),
                          list(b.f ORDER BY b.dur)),
             (x, y) -> x * y), 6) AS km
    FROM factors a JOIN factors b ON b.dur <= a.dur
    GROUP BY a.dur, a.n_at_risk, a.d
    """,
)
def q_events_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve for user lifetime (days between a
    user's first and last event), with RIGHT CENSORING: users still
    active in the corpus's final day have not churned — their
    lifetimes are lower bounds, and KM is the estimator that uses them
    without bias (a plain retention curve silently treats them as
    churned).  S(t) = prod over event times t' <= t of (1 - d/n): d =
    churns at t', n = users still at risk.

    Determinism: durations, churn counts and risk sets are exact
    integers (the risk set is a REVERSE cumulative window over the
    duration histogram — never a per-user scan per t); each hazard
    factor is one IEEE division, and the survival product is an
    ORDERED fold seeded with 1.0 (1.0 * x == x exactly — the
    multiplicative twin of the PageRank 0.0-seeded sum fold).

    Scale: events collapse to one row per user map-side, the histogram
    to one row per distinct duration (~days — hundreds); the prefix-
    product join is bounded by distinct event times squared, constant
    vs corpus size."""
    ev = t(spark, sf, "events")
    ems = epoch_ms(F.col("ts")).cast("long")
    spans = ev.groupBy("user_id").agg(
        ((F.max(ems) - F.min(ems)) / F.lit(_DAY_MS)).cast("long").alias("dur"),
        F.max(ems).alias("last_ms"),
    )
    horizon = spans.agg(F.max("last_ms").alias("hmax"))
    labeled = spans.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.col("last_ms")
            >= F.col("hmax") - F.lit(_KM_CENSOR_DAYS * _DAY_MS),
            0,
        )
        .otherwise(1)
        .alias("ev"),
    )
    hist = labeled.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("ev").cast("long").alias("d"),
    )
    w = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = hist.select(
        "dur", "d", F.sum("cnt").over(w).cast("long").alias("n_at_risk")
    )
    factors = risk.filter(F.col("d") > 0).select(
        "dur",
        "d",
        "n_at_risk",
        (F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk")).alias(
            "f"
        ),
    )
    a, b = factors.alias("a"), factors.alias("b")
    km = ordered_product(F.col("b.dur"), F.col("b.f"))
    return (
        a.join(b, F.col("b.dur") <= F.col("a.dur"))
        .groupBy(
            F.col("a.dur").alias("t"),
            F.col("a.n_at_risk").alias("n_at_risk"),
            F.col("a.d").alias("d"),
        )
        .agg(F.round(km, 6).alias("km"))
    )


@query(
    "q_ts_mase",
    oracle="""
    WITH monthly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             EXTRACT(month FROM o_orderdate) AS mo,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2),
    seq AS (
      SELECT yr, mo, cents, yr * 12 + mo AS idx FROM monthly),
    joined AS (
      SELECT s.yr, s.mo, s.cents,
             f.cents AS forecast,
             p.cents AS prev
      FROM seq s
      LEFT JOIN seq f ON f.idx = s.idx - 12
      LEFT JOIN seq p ON p.idx = s.idx - 1),
    scored AS (
      SELECT yr, mo, cents, forecast,
             abs(cents - forecast) AS abs_err,
             abs(cents - prev) AS naive_err
      FROM joined WHERE forecast IS NOT NULL AND prev IS NOT NULL),
    tot AS (
      SELECT CAST(SUM(abs_err) AS BIGINT) AS se,
             CAST(SUM(naive_err) AS BIGINT) AS sn,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM scored)
    SELECT yr, mo, cents, forecast, CAST(abs_err AS BIGINT) AS abs_err,
           round(CAST((SELECT se FROM tot) AS DOUBLE)
                 / (SELECT sn FROM tot), 6) AS mase
    FROM scored
    """,
)
def q_ts_mase(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: forecast each month's
    revenue with the SAME month last year, score it with MASE — the
    mean absolute error scaled by the in-sample 1-step naive error,
    the scale-free yardstick (MASE < 1 beats carrying yesterday
    forward) every forecasting pipeline reports before anything
    fancier.  All errors are exact integer cents; MASE is ONE division
    of two exact sums, so the metric is bit-identical anywhere.

    Scale: the fact collapses to one row per month map-side; the
    forecast/naive joins are self-joins on a month index over that
    tiny series.  Swapping in a real model's predictions keeps the
    whole scorer unchanged — only the forecast column changes."""
    o = t(spark, sf, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    seq = monthly.withColumn("idx", F.col("yr") * 12 + F.col("mo"))
    s, f, p = seq.alias("s"), seq.alias("f"), seq.alias("p")
    joined = (
        s.join(f, F.col("f.idx") == F.col("s.idx") - 12)
        .join(p, F.col("p.idx") == F.col("s.idx") - 1)
        .select(
            F.col("s.yr").alias("yr"),
            F.col("s.mo").alias("mo"),
            F.col("s.cents").alias("cents"),
            F.col("f.cents").alias("forecast"),
            F.abs(F.col("s.cents") - F.col("f.cents")).alias("abs_err"),
            F.abs(F.col("s.cents") - F.col("p.cents")).alias("naive_err"),
        )
    )
    tot = joined.agg(
        F.sum("abs_err").cast("long").alias("se"),
        F.sum("naive_err").cast("long").alias("sn"),
    )
    return joined.crossJoin(F.broadcast(tot)).select(
        "yr",
        "mo",
        "cents",
        "forecast",
        F.col("abs_err").cast("long").alias("abs_err"),
        F.round(F.col("se").cast("double") / F.col("sn"), 6).alias("mase"),
    )
