"""Ninth operator batch: interval-containment joins, conditional
bigram language-model estimates, market-concentration (HHI) metrics,
and arrival-process statistics.

House rules as before: integer-exact folds (cents / milliseconds /
counts), DECIMAL(38) where squares of cents would overflow int64 (the
Spark twin of DuckDB's automatic HUGEINT widening), unique ordering
keys under every window, identical aliases on both engines.

Reference parity: [NS] north-star processing-layer operators per
SURVEY.md §2.2/§2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_SESSION_GAP_MS = 30 * 60 * 1000  # same 30-min rule as q_events_sessionize


# ------------------------------------------------- interval containment
@query(
    "q_join_interval_errors",
    oracle=f"""
    WITH base AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type <> 'error'),
    g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                      > {_SESSION_GAP_MS}
                  THEN 1 ELSE 0 END AS is_new
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
    iv AS (
      SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, sid),
    err AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT iv.user_id,
           CAST(epoch_ms(iv.s_start) AS BIGINT) AS start_ms,
           CAST(iv.n_events AS BIGINT) AS n_events,
           CAST(COUNT(err.ts) AS BIGINT) AS n_errors
    FROM iv LEFT JOIN err
      ON err.user_id = iv.user_id
     AND err.ts >= iv.s_start AND err.ts <= iv.s_end
    GROUP BY iv.user_id, iv.s_start, iv.n_events
    """,
)
def q_join_interval_errors(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-containment join: sessions are derived from the
    NON-error activity (30-min-gap islands), then error events land in
    whichever session interval contains them — the ops question 'which
    user sessions were error-afflicted, and how badly?'.  The join is
    equi on user_id with the interval test as a residual, so Spark
    keeps a hash join (sessions per user are few); the session build
    itself is the one-Exchange lag/cumsum kernel shared with
    q_events_sessionize.  Errors outside any session (or between
    sessions) simply don't match — LEFT join keeps error-free sessions
    with n_errors = 0."""
    ev = t(spark, sf, "events")
    base = ev.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_ms(F.col("ts")) - epoch_ms(F.lag("ts").over(w))
    g = base.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull() | (gap > _SESSION_GAP_MS), 1)
        .otherwise(0),
    )
    s = g.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    joined = iv.join(
        err,
        (F.col("e_user") == F.col("user_id"))
        & (F.col("e_ts") >= F.col("s_start"))
        & (F.col("e_ts") <= F.col("s_end")),
        "left",
    )
    return joined.groupBy("user_id", "s_start", "n_events").agg(
        F.count("e_ts").alias("n_errors")
    ).select(
        "user_id",
        epoch_ms(F.col("s_start")).cast("long").alias("start_ms"),
        F.col("n_events").cast("long").alias("n_events"),
        "n_errors",
    )


# ------------------------------------------------- bigram LM estimate
@query(
    "q_text_bigram_lm",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT ws[i+1] AS w1, ws[i+2] AS w2
      FROM w, LATERAL unnest(range(len(ws) - 1)) AS u(i)),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1)
    SELECT c12.w1, c12.w2, n12, n1,
           round(CAST(n12 AS DOUBLE) / n1, 6) AS p_cond
    FROM c12 JOIN c1 ON c12.w1 = c1.w1
    ORDER BY n12 DESC, c12.w1, c12.w2
    LIMIT 20
    """,
)
def q_text_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram language-model estimation: P(w2 | w1) = count(w1 w2) /
    count(w1 ·) for the 20 most frequent bigrams — the MLE conditional
    a classic n-gram LM stores (and the statistic behind BPE merge
    ranking and collocation mining).  Adjacent pairs come from one
    indexed array lambda (no self-join of the token stream); both
    counts are exact integers off the SAME pair relation, so the
    conditional is one IEEE division.  Top-20 tie-breaks on the bigram
    text — deterministic cut."""
    d = t(spark, sf, "documents")
    ws = F.split("text", " ")
    pairs = d.select(
        F.explode(
            F.transform(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda x, i: F.struct(
                    x.alias("w1"), F.get(ws, i + 1).alias("w2")
                ),
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    return (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            F.round(F.col("n12") / F.col("n1"), 6).alias("p_cond"),
        )
        .orderBy(F.desc("n12"), "w1", "w2")
        .limit(20)
    )


# ------------------------------------------------- market concentration
@query(
    "q_agg_hhi_supplier_share",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                           AS BIGINT)) AS HUGEINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey)
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           round(CAST(SUM(cents * cents) AS DOUBLE)
                 / CAST(SUM(cents) * SUM(cents) AS DOUBLE), 6) AS hhi
    FROM rev GROUP BY s_nationkey
    """,
)
def q_agg_hhi_supplier_share(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per nation: the sum of
    squared supplier revenue shares (1/n = perfect competition, 1 =
    monopoly) — the skew metric a pipeline also uses to detect
    hot-key concentration BEFORE a join melts (HHI over join-key
    frequencies is exactly expected-probe-collision mass).  Algebra
    keeps it exact: HHI = Σc² / (Σc)² needs no per-supplier division —
    squares of cents accumulate in DECIMAL(38,0) (the Spark twin of
    the oracle's HUGEINT widening; Σc² overflows int64 at real scale),
    and the single division happens once per nation."""
    li = t(spark, sf, "lineitem")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("long")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).cast("decimal(19,0)").alias("cents"))
    )
    sq = (F.col("cents") * F.col("cents")).cast("decimal(38,0)")
    agg = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(sq).alias("sum_sq"),
        F.sum("cents").cast("decimal(19,0)").alias("tot"),
    )
    return agg.select(
        "s_nationkey",
        "n_suppliers",
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("tot") * F.col("tot")).cast("decimal(38,0)").cast("double"),
            6,
        ).alias("hhi"),
    )


# ------------------------------------------------- arrival process
@query(
    "q_events_inter_arrival",
    oracle="""
    WITH d AS (
      SELECT event_type,
             epoch_ms(ts) - epoch_ms(lag(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id)) AS gap_ms
      FROM events)
    SELECT event_type,
           COUNT(gap_ms) AS n_gaps,
           round(CAST(SUM(gap_ms) AS DOUBLE) / COUNT(gap_ms), 6)
             AS mean_gap_ms,
           median(gap_ms) AS p50_gap_ms
    FROM d WHERE gap_ms IS NOT NULL
    GROUP BY event_type
    """,
)
def q_events_inter_arrival(spark: SparkSession, sf: str) -> DataFrame:
    """Arrival-process statistics per event type: mean and median
    inter-arrival gap — the λ estimate capacity planning reads, and
    the drift signal for rate anomalies (mean >> median = bursty).
    Gaps are exact integer milliseconds off a (ts, event_id)-ordered
    lag; the mean is Σgap/n with one IEEE division, the median an
    exact percentile on integers (halves exactly representable — both
    engines interpolate identically).

    Scale: event_type is constant-cardinality, so a single lag window
    per type is one fat task per type at 100 TB.  The lag is instead
    BOUNDARY-STITCHED over (type, day) buckets: in-day gaps come from
    per-(type, day) windows (parallel — partitions grow with the
    calendar), and the one gap that crosses each midnight is
    reconstructed from the bounded per-day (first_ms, last_ms) frame
    (days x types rows) with a per-type lag over days.  Consecutive
    differences of a sorted multiset are split-point invariant, so the
    union of in-day + boundary gaps is EXACTLY the single-window gap
    multiset — which the unchanged naive-lag oracle proves."""
    ev = t(spark, sf, "events")
    ms = epoch_ms(F.col("ts"))
    keyed = ev.select(
        "event_type", "ts", "event_id", ms.alias("ms"),
        F.to_date("ts").alias("day"),
    )
    w_day = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    in_day = keyed.select(
        "event_type",
        (F.col("ms") - F.lag("ms").over(w_day)).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    days = keyed.groupBy("event_type", "day").agg(
        F.min("ms").alias("first_ms"), F.max("ms").alias("last_ms")
    )
    w_days = Window.partitionBy("event_type").orderBy("day")
    boundary = days.select(
        "event_type",
        (F.col("first_ms") - F.lag("last_ms").over(w_days)).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    d = in_day.unionByName(boundary)
    return d.groupBy("event_type").agg(
        F.count("gap_ms").alias("n_gaps"),
        F.round(
            F.sum("gap_ms").cast("double") / F.count("gap_ms"), 6
        ).alias("mean_gap_ms"),
        F.percentile("gap_ms", F.lit(0.5)).alias("p50_gap_ms"),
    )
