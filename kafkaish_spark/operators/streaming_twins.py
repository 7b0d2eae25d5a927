"""Batch twins of the streaming operators (SURVEY.md §2.3 S4-S6).

Spark's window()/session_window() work identically on batch DataFrames,
so the SAME expressions our streaming queries use are validated here
against hand-derived oracle SQL.  Window starts are reported as epoch
milliseconds (BIGINT) — timezone-free and hash-stable across engines.
The live streaming forms (watermarks, state, triggers) are exercised by
tests/test_streaming_semantics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum, dsum_sql
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

HOUR_MS = 3_600_000
SLIDE_MS = 300_000  # 5 minutes
WIN_MS = 600_000  # 10 minutes
GAP_MS = 1_800_000  # 30 minutes session gap


def _hour_ms():
    """Zone-free hour bucket of ``ts`` as epoch-ms BIGINT — the ONE
    definition shared by the anomaly / gap-fill / LOCF queries (the
    oracle twin is ``(epoch_ms(ts) // HOUR_MS) * HOUR_MS``)."""
    return (
        (epoch_ms(F.col("ts")).cast("long") / F.lit(HOUR_MS)).cast("long")
        * HOUR_MS
    )


def _hourly_grid(actual):
    """Dense (event_type x hour) spine derived from the ALREADY
    AGGREGATED hourly frame — bounds and distinct types come from the
    tiny aggregate, so the events fact table is scanned exactly once
    per query."""
    bounds = actual.agg(
        F.min("hour_start_ms").alias("lo"), F.max("hour_start_ms").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.lit(HOUR_MS))
        ).alias("hour_start_ms")
    )
    types = actual.select("event_type").distinct()
    return types.crossJoin(F.broadcast(spine))


# ---------------------------------------------------------------- S4
@query(
    "q_stream_tumbling_counts",
    oracle=f"""
    SELECT CAST((epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start_ms,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS value_sum
    FROM events GROUP BY 1
    """,
    bench=True,
)
def q_stream_tumbling_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time window — the exact expression a
    streaming groupBy(window(ts, '1 hour')) uses, run in batch."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "value_sum"))
        .select(
            epoch_ms(F.col("w.start")).cast("long").alias("window_start_ms"),
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------- S5
@query(
    "q_stream_sliding_counts",
    oracle=f"""
    WITH assigned AS (
      SELECT (epoch_ms(ts) // {SLIDE_MS}) * {SLIDE_MS} AS s0, value FROM events
      UNION ALL
      SELECT (epoch_ms(ts) // {SLIDE_MS}) * {SLIDE_MS} - {SLIDE_MS} AS s0, value
      FROM events)
    SELECT CAST(s0 AS BIGINT) AS window_start_ms,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS value_sum
    FROM assigned GROUP BY 1
    """,
)
def q_stream_sliding_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): each event lands in
    exactly two epoch-aligned windows; the oracle derives them by
    hand (floor-to-slide and its predecessor)."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "value_sum"))
        .select(
            epoch_ms(F.col("w.start")).cast("long").alias("window_start_ms"),
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------- S6
@query(
    "q_stream_session_windows",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value, epoch_ms(ts) AS ems,
             CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= {GAP_MS}
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, ts, value, ems,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           CAST(MIN(ems) AS BIGINT) AS session_start_ms,
           CAST(MAX(ems) + {GAP_MS} AS BIGINT) AS session_end_ms,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS value_sum
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_stream_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user via Spark's
    session_window — merged event-time sessions, end = last ts + gap.
    The oracle reconstructs identical sessions with lag + cumulative
    flags."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "value_sum"))
        .select(
            "user_id",
            epoch_ms(F.col("w.start")).cast("long").alias("session_start_ms"),
            epoch_ms(F.col("w.end")).cast("long").alias("session_end_ms"),
            "n_events",
            "value_sum",
        )
    )


# ---------------------------------------------------------------- funnel
@query(
    "q_events_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-stage conversion funnel (view -> click -> purchase, each
    stage strictly after the previous one's FIRST occurrence): the
    sequential-pattern query every event-analytics engine ships.
    Computed as a chain of user-keyed aggregates — each stage is one
    partial-aggregated shuffle on user_id and the stage frames shrink
    monotonically, so at 100 TB the expensive scan happens once per
    stage over an ever-smaller user set (never a per-user sort of the
    whole history).  Counts only in the output, so NTZ timestamps
    never cross the engine boundary."""
    ev = t(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(
            p.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
        )
    )


# ---------------------------------------------------------------- cohort retention
@query(
    "q_events_cohort_retention",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    a AS (
      SELECT DISTINCT e.user_id,
             datediff('day', s.d0, CAST(e.ts AS DATE)) // 7 AS wk
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE datediff('day', s.d0, CAST(e.ts AS DATE)) >= 0),
    base AS (SELECT COUNT(*) AS n0 FROM s)
    SELECT wk AS week_offset,
           COUNT(*) AS n_active,
           round(CAST(COUNT(*) AS DOUBLE) / (SELECT n0 FROM base), 6)
             AS retention
    FROM a GROUP BY wk
    """,
)
def q_events_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention: of users who signed up, what share is active
    again k weeks after their signup date — the standing health metric
    of any event stream.  Day arithmetic is integer (DATE diff, filter
    >= 0 BEFORE the integer division so floor-vs-truncate semantics
    never diverge); the retention share is one IEEE division against
    the cohort size.  Two user-keyed shuffles (first-signup agg +
    distinct activity weeks), both partial-aggregated."""
    ev = t(spark, sf, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("d0"))
    )
    dd = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    a = (
        ev.join(s, "user_id")
        .filter(dd >= 0)
        .select("user_id", dd.alias("dd"))
        .select("user_id", F.expr("CAST(dd DIV 7 AS BIGINT)").alias("wk"))
        .distinct()
    )
    # cohort size joined lazily (1-row broadcast) so the builder stays a
    # pure plan — no eager job, no stale frozen count on re-execution
    n0 = s.agg(F.count(F.lit(1)).alias("n0"))
    return (
        a.groupBy(F.col("wk").alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
        .crossJoin(F.broadcast(n0))
        .select(
            "week_offset",
            "n_active",
            F.round(F.col("n_active").cast("double") / F.col("n0"), 6).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------- anomaly
@query(
    "q_events_rate_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT)
               AS hour_start_ms,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, COUNT(*) AS k,
             CAST(SUM(n) AS DOUBLE) AS s1,
             CAST(SUM(n * n) AS DOUBLE) AS s2
      FROM hourly GROUP BY 1)
    SELECT h.event_type, h.hour_start_ms, h.n,
           round((h.n - s.s1 / s.k)
                 / sqrt(NULLIF((s.s2 - s.s1 * s.s1 / s.k) / (s.k - 1), 0)),
                 6) AS z
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    """,
)
def q_events_rate_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly event-rate anomaly score: each (event_type, hour) bucket's
    z-score against that type's own hourly distribution — the
    monitoring query a streaming pipeline materializes next to its
    rollup.  Counts are integers, so the per-type moments (sum n, sum
    n^2) are exact in any partition order and the z is a fixed IEEE
    sequence (the same order-independent-statistics pattern as
    q_agg_stats_dispersion).  Two small shuffles: hourly rollup, then
    per-type moments broadcast back onto it."""
    ev = t(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", _hour_ms().alias("hour_start_ms")
    ).agg(F.count(F.lit(1)).alias("n"))
    k = F.count(F.lit(1))
    stats = hourly.groupBy("event_type").agg(
        k.alias("k"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (
        F.col("k") - 1
    )
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "hour_start_ms",
            "n",
            F.round(
                (F.col("n") - F.col("s1") / F.col("k"))
                / F.sqrt(F.nullif(var, F.lit(0.0))),
                6,
            ).alias("z"),
        )
    )


# ---------------------------------------------------------------- gap fill
@query(
    "q_events_hourly_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT CAST((MIN(epoch_ms(ts)) // 3600000) * 3600000 AS BIGINT) AS lo,
             CAST((MAX(epoch_ms(ts)) // 3600000) * 3600000 AS BIGINT) AS hi
      FROM events),
    spine AS (
      SELECT unnest(range(lo, hi + 3600000, 3600000)) AS hour_start_ms
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, s.hour_start_ms FROM types t CROSS JOIN spine s),
    actual AS (
      SELECT event_type,
             CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT)
               AS hour_start_ms,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT g.event_type, CAST(g.hour_start_ms AS BIGINT) AS hour_start_ms,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN actual a
      ON g.event_type = a.event_type AND g.hour_start_ms = a.hour_start_ms
    """,
)
def q_events_hourly_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Gap filling over a generated date spine: every (event_type,
    hour) cell between the stream's bounds exists in the output, zeros
    where nothing happened — what every dashboard / anomaly detector
    needs before it can trust 'no rows' to mean 'zero events'.  The
    spine is sequence() over integer hour buckets crossed with the
    distinct types (both tiny — broadcast), left-joined onto the
    aggregated counts: the fact table is scanned once and shuffled only
    as (type, hour) partial counts."""
    ev = t(spark, sf, "events")
    actual = ev.groupBy(
        "event_type", _hour_ms().alias("hour_start_ms")
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = _hourly_grid(actual)
    return (
        grid.join(actual, ["event_type", "hour_start_ms"], "left")
        .select(
            "event_type",
            F.col("hour_start_ms").cast("long").alias("hour_start_ms"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


# ---------------------------------------------------------------- LOCF
@query(
    "q_events_hourly_locf",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST((MIN(epoch_ms(ts)) // 3600000) * 3600000 AS BIGINT) AS lo,
             CAST((MAX(epoch_ms(ts)) // 3600000) * 3600000 AS BIGINT) AS hi
      FROM events),
    spine AS (
      SELECT unnest(range(lo, hi + 3600000, 3600000)) AS hour_start_ms
      FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT t.event_type, s.hour_start_ms FROM types t CROSS JOIN spine s),
    actual AS (
      SELECT event_type,
             CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT)
               AS hour_start_ms,
             {dsum_sql('value')} / COUNT(*) AS v
      FROM events GROUP BY 1, 2)
    SELECT event_type, CAST(g.hour_start_ms AS BIGINT) AS hour_start_ms,
           last_value(a.v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY g.hour_start_ms
             ROWS UNBOUNDED PRECEDING) AS v_filled
    FROM grid g LEFT JOIN actual a USING (event_type, hour_start_ms)
    """,
)
def q_events_hourly_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Last-observation-carried-forward over the gap-filled hourly
    series: missing hours inherit the previous hour's mean value — the
    standard interpolation before feeding a sensor/metric stream into a
    model.  The carried value is the exact-decimal hourly mean, and
    LOCF itself is last(ignorenulls) over an unbounded-preceding frame
    — one window per type partition, no extra scan of the fact table
    beyond the gap-fill plan."""
    from pyspark.sql import Window as W

    ev = t(spark, sf, "events")
    actual = ev.groupBy(
        "event_type", _hour_ms().alias("hour_start_ms")
    ).agg((dsum("value") / F.count(F.lit(1))).alias("v"))
    grid = _hourly_grid(actual)
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_start_ms")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        grid.join(actual, ["event_type", "hour_start_ms"], "left")
        .select(
            "event_type",
            F.col("hour_start_ms").cast("long").alias("hour_start_ms"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
    )


# ---------------------------------------------------------------- S8 twin
@query(
    "q_stream_dedup_counts",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_unique
    FROM (SELECT DISTINCT event_type, user_id,
                 (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS h
          FROM events)
    GROUP BY event_type
    """,
)
def q_stream_dedup_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of stateful streaming dedup (S8): at most one counted
    engagement per (user, type, hour) — the exact state key a
    ``dropDuplicatesWithinWatermark(["event_type","user_id","h"])``
    stream holds, with the hour bucket bounding state exactly like the
    watermark does (state for closed hours is droppable).  The live
    form is exercised in tests/test_streaming_analytics.py; this twin
    pins the VALUES against the DuckDB oracle.

    Scale: dropDuplicates plans as a partial-then-final aggregate on
    the dedup key — map-side combining absorbs same-key repeats before
    the shuffle, so the exchange carries unique keys, not raw events."""
    ev = t(spark, sf, "events")
    return (
        ev.select("event_type", "user_id", _hour_ms().alias("h"))
        .dropDuplicates(["event_type", "user_id", "h"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )


# ------------------------------------------------------ seasonal anomaly
@query(
    "q_events_seasonal_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST((epoch_ms(ts) // 3600000) * 3600000 AS BIGINT)
               AS hour_start_ms,
             CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hod,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3),
    base AS (
      SELECT event_type, hod, COUNT(*) AS k,
             CAST(SUM(n) AS DOUBLE) AS s1,
             CAST(SUM(n * n) AS DOUBLE) AS s2
      FROM hourly GROUP BY 1, 2)
    SELECT h.event_type, h.hour_start_ms, h.hod, h.n,
           round((h.n - b.s1 / b.k)
                 / sqrt(NULLIF((b.s2 - b.s1 * b.s1 / b.k) / (b.k - 1), 0)),
                 6) AS z
    FROM hourly h JOIN base b
      ON h.event_type = b.event_type AND h.hod = b.hod
    WHERE b.k > 1
      AND abs((h.n - b.s1 / b.k)
              / sqrt(NULLIF((b.s2 - b.s1 * b.s1 / b.k) / (b.k - 1), 0))) >= 1.5
    """,
)
def q_events_seasonal_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonally-conditioned rate anomaly: each (type, hour) bucket is
    z-scored against the baseline for ITS OWN hour-of-day — so a
    nightly lull is not an anomaly and a spike at 3am is, which the
    unconditioned q_events_rate_anomaly cannot distinguish.  The
    baseline key (type, hour-of-day) is the seasonal profile a
    monitoring pipeline maintains incrementally (counts and squared
    counts are mergeable monoids, same as q_matview_incremental).

    Determinism: integer hourly counts -> exact per-(type,hod) moments
    -> one fixed IEEE z sequence (the dispersion pattern).  Scale: the
    fact collapses to hourly buckets map-side; the baseline is 24 x
    #types rows broadcast back onto them."""
    ev = t(spark, sf, "events")
    hod = (
        (epoch_ms(F.col("ts")).cast("long") / F.lit(HOUR_MS)).cast("long")
        % 24
    )
    hourly = ev.groupBy(
        "event_type", _hour_ms().alias("hour_start_ms"), hod.alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("double").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("k")) / (
        F.col("k") - 1
    )
    z = (F.col("n") - F.col("s1") / F.col("k")) / F.sqrt(
        F.nullif(var, F.lit(0.0))
    )
    return (
        hourly.join(F.broadcast(base), ["event_type", "hod"])
        .filter((F.col("k") > 1) & (F.abs(z) >= 1.5))
        .select(
            "event_type",
            "hour_start_ms",
            "hod",
            "n",
            F.round(z, 6).alias("z"),
        )
    )
