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
