"""Continuous hourly rollup — hypertable-style materialized aggregate.

At 100 TB the events table is append-only and every dashboard query
re-aggregates the same immutable history.  A continuous aggregate
materializes CLOSED time buckets once into a small parquet table and
serves reads as ``materialized-closed UNION aggregate(open tail)`` —
the TimescaleDB continuous-aggregate / Kafka-Streams-KTable pattern,
expressed as plain incremental Spark batch jobs.  The reference has no
aggregation at all (its only query shapes are offset scans,
src/topic.js:144-148); this is a north-star [NS] operator.

Scale properties:
- the materialize job scans only buckets past the stored high-water
  mark (a parquet ``min/max``-prunable predicate on ``ts``), so steady
  state cost is one hour of data, not the full table;
- the rollup table is ~|buckets| x |event_type| rows — always
  broadcast-small relative to raw events;
- the serving query aggregates only the open tail (< 1 hour of raw
  rows) and unions it with the pre-aggregated rest: no shuffle over
  history at read time.

Late data: rows arriving for an already-closed bucket are NOT folded in
automatically (same contract as a Timescale refresh window); call
``materialize_hourly(rebuild=True)`` to recompute.  The open bucket is
never materialized, so in-order appends are always correct.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum, dsum_sql
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

HOUR_MS = 3_600_000

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROLLUP_SCHEMA = (
    "window_start_ms BIGINT, event_type STRING, n_events BIGINT, value_sum DOUBLE"
)


def _bucket_ms(col):
    # ms fits a double exactly (< 2^53), so floor(x / h) * h is exact
    return (F.floor(epoch_ms(col) / F.lit(HOUR_MS)) * HOUR_MS).cast("long")


def rollup_dir(sf: str) -> str:
    """Stable per-scale-factor location under the repo warehouse."""
    name = os.path.basename(os.path.normpath(sf)) or "default"
    return os.path.join(_REPO_ROOT, "spark-warehouse", "_rollups", name, "events_hourly")


def _agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy(
            _bucket_ms(F.col("ts")).alias("window_start_ms"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "value_sum"))
    )


def materialize_hourly(
    spark: SparkSession,
    sf: str,
    out_dir: str | None = None,
    rebuild: bool = False,
    events: DataFrame | None = None,
) -> int:
    """Materialize all CLOSED hourly buckets not yet in the rollup.

    Incremental: only events with ``hwm < bucket < open-bucket`` are
    scanned and aggregated (a ts range predicate the parquet reader
    prunes on), then appended.  Returns the number of bucket/type rows
    written.  Idempotent: a second call with no new data writes 0.
    """
    out_dir = out_dir or rollup_dir(sf)
    if rebuild:
        # a rebuild rewrites the rollup files the memoized verified
        # serving frame captured — drop it so the next verified read
        # re-heals instead of serving the stale listing (ADVICE r12)
        invalidate_verified_serve()
    ev = events if events is not None else t(spark, sf, "events")
    mx = ev.agg(F.max(epoch_ms(F.col("ts"))).alias("m")).first()["m"]
    if mx is None:
        return 0
    open_bucket = (mx // HOUR_MS) * HOUR_MS  # newest bucket stays open

    hwm = None
    if os.path.isdir(out_dir) and not rebuild:
        existing = spark.read.schema(ROLLUP_SCHEMA).parquet(out_dir)
        hwm = existing.agg(F.max("window_start_ms").alias("m")).first()["m"]
        if hwm is not None and hwm >= open_bucket:
            return 0  # rollup already current (or data shrank: see rebuild)

    fresh = ev.filter(_bucket_ms(F.col("ts")) < open_bucket)
    if hwm is not None:
        fresh = fresh.filter(_bucket_ms(F.col("ts")) > hwm)
    rows = _agg(fresh).coalesce(1)  # rollup rows are tiny; one file per refresh
    mode = "overwrite" if rebuild else "append"
    rows.write.mode(mode).parquet(out_dir)
    return spark.read.schema(ROLLUP_SCHEMA).parquet(out_dir).count() if rebuild else (
        rows.count()
    )


def serve_hourly(
    spark: SparkSession,
    sf: str,
    out_dir: str | None = None,
    events: DataFrame | None = None,
) -> DataFrame:
    """Rollup read path: materialized closed buckets ∪ aggregated open
    tail.  Only the tail (< 1 h of raw rows) touches the events table."""
    out_dir = out_dir or rollup_dir(sf)
    ev = events if events is not None else t(spark, sf, "events")
    if not os.path.isdir(out_dir):  # nothing materialized yet
        return _agg(ev)
    closed = spark.read.schema(ROLLUP_SCHEMA).parquet(out_dir)
    hwm_row = closed.agg(F.max("window_start_ms").alias("m")).first()
    hwm = hwm_row["m"] if hwm_row is not None else None
    tail = ev if hwm is None else ev.filter(_bucket_ms(F.col("ts")) > hwm)
    return closed.unionByName(_agg(tail))


_VERIFIED_SERVE: tuple | None = None  # (session_token, sf_dir, frame)


def invalidate_verified_serve() -> None:
    """Drop the memoized verified serving frame (r12 ADVICE item 3):
    the memo assumes the rollup directory and the events table are
    immutable for the session — true for the driver's testdata, but a
    caller that REBUILDS the rollup mid-session (e.g. its own
    ``materialize_hourly(..., rebuild=True)``) must call this so the
    next ``serve_hourly_verified`` re-runs the self-heal instead of
    serving the stale pre-rebuild frame (whose captured file listing
    can also throw FileNotFound once the old files are gone)."""
    global _VERIFIED_SERVE
    _VERIFIED_SERVE = None


def serve_hourly_verified(spark: SparkSession, sf: str) -> DataFrame:
    """Materialize + serve, with the stale-rollup self-heal: a rollup
    left over from OLDER/regenerated testdata would disagree with raw;
    one cheap count() catches it and forces a rebuild.  Every read path
    that consumes the hourly rollup (direct serve AND the day/week
    cascade) must come through here so a stale base can never silently
    skew a derived level (round-3 ADVICE item 4).

    The materialize-check, high-water-mark probes and the count
    verification are ~5 eager jobs over IMMUTABLE inputs, previously
    re-run per call; the verified LAZY serving frame is now memoized
    per (session, sf) with the load_table/_VALIDATED_LOGS discipline
    (optimization r12): first contact per session still runs the full
    heal, every execution still scans the parquet, a new session or sf
    re-verifies, at most one entry held."""
    from kafkaish_spark.session import session_token

    global _VERIFIED_SERVE
    key = (session_token(spark), sf)
    if _VERIFIED_SERVE is not None and _VERIFIED_SERVE[:2] == key:
        return _VERIFIED_SERVE[2]
    materialize_hourly(spark, sf)
    out = serve_hourly(spark, sf)
    ev = t(spark, sf, "events")
    total = out.agg(F.sum("n_events").alias("n")).first()["n"] or 0
    if total != ev.count():
        materialize_hourly(spark, sf, rebuild=True)
        out = serve_hourly(spark, sf)
    _VERIFIED_SERVE = (*key, out)
    return out


@query(
    "q_rollup_hourly_events",
    oracle=f"""
    SELECT CAST((epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS window_start_ms,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS value_sum
    FROM events GROUP BY 1, 2
    """,
)
def q_rollup_hourly_events(spark: SparkSession, sf: str) -> DataFrame:
    """Continuous-aggregate read: materialize closed hourly buckets
    (incremental, no-op when current), then serve materialized ∪ open
    tail.  Oracle is the full recompute — the two must agree exactly,
    which holds because hourly buckets partition the rows, so each
    (bucket, type) group is summed in exactly one pass on one side."""
    return serve_hourly_verified(spark, sf)


DAY_MS = 86_400_000
WEEK_MS = 604_800_000


@query(
    "q_rollup_cascade",
    oracle=f"""
    WITH h AS (
      SELECT CAST((epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS BIGINT) AS hms,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             {dsum_sql('value')} AS vs
      FROM events GROUP BY 1, 2),
    hq AS (
      SELECT hms, event_type, n,
             CAST(round(vs * 1000000) AS BIGINT) AS vq
      FROM h),
    d AS (
      SELECT CAST((hms // {DAY_MS}) * {DAY_MS} AS BIGINT) AS pms,
             event_type,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(vq) AS BIGINT) AS vq
      FROM hq GROUP BY 1, 2),
    w AS (
      SELECT CAST((pms // {WEEK_MS}) * {WEEK_MS} AS BIGINT) AS pms,
             event_type,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(vq) AS BIGINT) AS vq
      FROM d GROUP BY 1, 2)
    SELECT 'day' AS level, pms AS period_start_ms, event_type,
           n AS n_events, vq AS value_micro
    FROM d
    UNION ALL
    SELECT 'week' AS level, pms AS period_start_ms, event_type,
           n AS n_events, vq AS value_micro
    FROM w
    """,
)
def q_rollup_cascade(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-resolution rollup CASCADE: day buckets computed FROM the
    materialized hourly rollup and week buckets FROM the day level —
    never from raw events.  This is the continuous-aggregate hierarchy
    (Timescale's rollup-on-rollup): at 100 TB the hourly table is
    ~|hours| x |types| rows, so every coarser resolution costs an
    aggregate over the PREVIOUS rollup, independent of raw volume, and
    adding a resolution never re-scans history.

    Correctness across the hops is the subtle part: hourly value sums
    are exact-decimal (dsum) doubles, but RE-summing doubles upward
    would be partition-order-dependent — so the cascade re-quantizes
    each hourly sum onto the 1e-6 integer grid once and every level
    above sums exact int64 (associative, engine-identical).  The
    oracle states the identical two-hop pipeline from raw events;
    agreement proves the materialized hourly base == a full recompute
    AND the upward hops are exact."""
    hourly = serve_hourly_verified(spark, sf).select(
        "window_start_ms",
        "event_type",
        F.col("n_events").cast("long").alias("n"),
        F.round(F.col("value_sum") * 1e6).cast("long").alias("vq"),
    )
    day = (
        hourly.groupBy(
            ((F.col("window_start_ms") / DAY_MS).cast("long") * DAY_MS).alias(
                "period_start_ms"
            ),
            "event_type",
        )
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("vq").cast("long").alias("value_micro"),
        )
    )
    week = (
        day.groupBy(
            (
                (F.col("period_start_ms") / WEEK_MS).cast("long") * WEEK_MS
            ).alias("period_start_ms"),
            "event_type",
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("value_micro").cast("long").alias("value_micro"),
        )
    )
    return day.select(
        F.lit("day").alias("level"),
        "period_start_ms",
        "event_type",
        "n_events",
        "value_micro",
    ).unionByName(
        week.select(
            F.lit("week").alias("level"),
            "period_start_ms",
            "event_type",
            "n_events",
            "value_micro",
        )
    )
