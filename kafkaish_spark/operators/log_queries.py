"""Log-layer operators as oracle-checkable batch twins (SURVEY.md §2.1).

The ``events`` table plays the topic log: ``event_id`` is the offset
(monotonically increasing), ``event_type`` the routing key — see
FIXTURES.md B.  The streaming forms live in
``kafkaish_spark.streaming`` and are exercised by the semantics pytest
suite; these batch twins give the DuckDB oracle something to check.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ---------------------------------------------------------------- L9
@query(
    "q_latest_offset",
    oracle="SELECT CAST(COALESCE(MAX(event_id), 0) AS BIGINT) AS latest_offset FROM events",
)
def q_latest_offset(spark: SparkSession, sf: str) -> DataFrame:
    """Newest offset (ref: Topic.latest, src/topic.js:221-244 does a
    sort-desc-limit-1; agg(max) reads only parquet footer stats)."""
    return t(spark, sf, "events").agg(
        F.coalesce(F.max("event_id"), F.lit(0)).cast("long").alias("latest_offset")
    )


# ---------------------------------------------------------------- L7 (batch twin)
@query(
    "q_replay_from_offset",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    WHERE event_id > (SELECT MAX(event_id) - 100 FROM events)
    """,
)
def q_replay_from_offset(spark: SparkSession, sf: str) -> DataFrame:
    """Batch replay from an offset (ref: replayFrom scan ``_id > last``,
    src/topic.js:144-149).  The offset predicate prunes parquet row
    groups via min/max stats — the Spark analog of Mongo evaluating
    ``$gt`` server-side."""
    ev = t(spark, sf, "events")
    last = ev.agg(F.max("event_id")).first()[0] - 100
    return ev.filter(F.col("event_id") > F.lit(int(last))).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# ---------------------------------------------------------------- L11
@query(
    "q_filter_event_type",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_filter_event_type(spark: SparkSession, sf: str) -> DataFrame:
    """Event-name routing (ref: client-side filter src/topic.js:172-173;
    live EventEmitter key :73-74,108).  Here the filter pushes down to
    the scan — strictly better than the reference."""
    return (
        t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------- L8 (introspection)
@query(
    "q_subscriber_lag",
    oracle="""
    SELECT user_id AS subscriber_id,
           CAST(MAX(event_id) AS BIGINT) AS last_offset,
           CAST((SELECT MAX(event_id) FROM events) - MAX(event_id) AS BIGINT) AS lag
    FROM events GROUP BY user_id
    """,
)
def q_subscriber_lag(spark: SparkSession, sf: str) -> DataFrame:
    """Subscriber-lag introspection (ref: the ``<topic>_subscribers``
    offset table, src/topic.js:202-220): treating each user as a
    durable subscriber whose last ack is its newest event."""
    ev = t(spark, sf, "events")
    tail = ev.agg(F.max("event_id")).first()[0]
    return ev.groupBy(F.col("user_id").alias("subscriber_id")).agg(
        F.max("event_id").cast("long").alias("last_offset"),
        (F.lit(int(tail)) - F.max("event_id")).cast("long").alias("lag"),
    )


# ---------------------------------------------------------------- L4 (rows-only)
@query("q_publish_roundtrip", oracle=None, bench=True)
def q_publish_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Publish -> replay round trip through a real topic log (ref:
    publish + confirm callback, src/topic.js:25-40; test
    'publish invokes confirmation callback', test/topic.js:76-89).
    Publishes the first 500 events into a fresh parquet topic and
    replays them; rows-only check (temp paths aren't SQL-visible)."""
    from kafkaish_spark.sources.topic_log import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="kafkaish_rt_"))
    topic = eng.prepare_topic("roundtrip")
    src = (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 500)
        .select(
            F.col("event_type").alias("event"),
            F.col("props").alias("message"),
            F.col("ts"),
        )
    )
    topic.publish_df(src)
    return topic.replay(since=0).select("offset", "event", "message")


# 2024-01-01T00:00:00Z as an absolute instant — zone-free by construction
_TT_BASE_EPOCH_US = 1_704_067_200_000_000


def _docs_tt_topic(spark: SparkSession, sf: str):
    """The shared time-travel warehouse fixture: the documents table
    published into a real topic log in doc_id order, each doc's ts an
    ABSOLUTE instant at base + doc_id minutes (timestamp_micros — no
    session-zone term), one ordered partition so offset k holds doc
    k-1 (doc_id is 0-based, offsets are 1-based; all seeks below
    derive bounds from TIMESTAMPS, which track doc_id exactly).
    Self-healed per sf on a content fingerprint whose timestamp term is
    the BASE-RELATIVE delta summed on decimal(38,0) — the absolute
    ``sum(unix_micros(ts))`` overflows int64 under ANSI mode past ~5.4k
    rows, while the delta sum is exactly ``sum(doc_id) * 60_000_000``
    at any scale factor, and still shifts (rebuild) if a fixture was
    persisted under a skewed session zone (the round-5 red).  Returns
    (topic, n_docs)."""
    import os

    from kafkaish_spark.sources.topic_log import Engine

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    d = t(spark, sf, "documents")
    n_docs, fp_docs = d.agg(
        F.count(F.lit(1)), F.sum("doc_id").cast("long")
    ).first()
    fp_ts = fp_docs * 60_000_000
    root = os.path.join(
        repo_root, "spark-warehouse", "_tt",
        os.path.basename(sf.rstrip("/")) or "default",
    )
    eng = Engine(spark, root)
    topic = eng.prepare_topic("docs_tt")

    def _topic_fp():
        row = topic.replay(since=0).agg(
            F.count(F.lit(1)),
            F.sum(F.get_json_object("message", "$.doc_id").cast("long")),
            F.sum(
                (F.unix_micros("ts") - F.lit(_TT_BASE_EPOCH_US)).cast(
                    "decimal(38,0)"
                )
            ),
        ).first()
        return row[0], row[1], None if row[2] is None else int(row[2])

    if topic.latest() != n_docs or _topic_fp() != (n_docs, fp_docs, fp_ts):
        # Serialize the heal across processes (the bucketed-layout
        # fixture pattern): without this, two sessions that both judge
        # the fixture stale interleave rmtree with publish.  The
        # fingerprint is RE-CHECKED under the lock — the loser of the
        # race sees the winner's fresh fixture and skips its own heal.
        from kafkaish_spark.sources.topic_log import writer_lock

        with writer_lock(root, "tt-fixture-heal"):
            eng = Engine(spark, root)
            topic = eng.prepare_topic("docs_tt")
            if topic.latest() != n_docs or _topic_fp() != (
                n_docs,
                fp_docs,
                fp_ts,
            ):
                if topic.latest():
                    import shutil

                    shutil.rmtree(os.path.join(root, "docs_tt"))
                    eng = Engine(spark, root)
                    topic = eng.prepare_topic("docs_tt")
                payload = (
                    d.select(
                        F.col("lang").alias("event"),
                        F.to_json(F.struct("doc_id")).alias("message"),
                        F.timestamp_micros(
                            F.lit(_TT_BASE_EPOCH_US)
                            + F.col("doc_id").cast("long") * F.lit(60_000_000)
                        ).alias("ts"),
                        F.col("doc_id"),
                    )
                    .repartition(1)
                    .sortWithinPartitions("doc_id")
                    .drop("doc_id")
                )
                topic.publish_df(payload)
    return topic, n_docs


# ---------------------------------------------------------------- L7b time travel
@query(
    "q_log_time_travel",
    oracle="""
    SELECT lang AS event,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents WHERE doc_id < 300 GROUP BY lang
    """,
)
def q_log_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Time-bounded replay proven as data: documents are published in
    doc_id order with synthetic timestamps (a fixed epoch base +
    doc_id minutes, built with ``timestamp_micros`` so the instant is
    ABSOLUTE — no session-zone term anywhere), then ``offset_for_time``
    (the Kafka offsetsForTimes analog — footer-stats segment pruning,
    boundary-segment scan) seeks the offset of minute 300 **by epoch
    seconds** (the TZ-safe numeric branch) and ``replay(until=seek-1)``
    reconstructs exactly the first 300 docs — the oracle computes the
    same set directly with ``doc_id < 300``.  A seek that lands one
    message off in either direction moves a count and a sum.

    The publish is a deterministic single-ordered-partition append
    (sortWithinPartitions on one partition), so offset k holds doc k-1
    (0-based doc_id, 1-based offsets) — what makes the time index
    oracle-checkable.  Fixture construction and overflow-safe
    self-healing live in ``_docs_tt_topic``."""
    topic, n_docs = _docs_tt_topic(spark, sf)
    # epoch seconds — offset_for_time's numeric branch, zone-free on
    # any driver/session combination
    seek = topic.offset_for_time(_TT_BASE_EPOCH_US / 1_000_000 + 300 * 60)
    if seek is None:
        raise ValueError(
            f"offset_for_time found no message at base+300min; "
            f"topic latest={topic.latest()} n_docs={n_docs}"
        )
    back = topic.replay(since=0, until=seek - 1)
    return back.groupBy("event").agg(
        F.count(F.lit(1)).cast("long").alias("n_msgs"),
        F.sum(F.get_json_object("message", "$.doc_id").cast("long"))
        .cast("long")
        .alias("sum_doc_id"),
    )


# ---------------------------------------------------------------- L7c window replay
@query(
    "q_log_replay_window",
    oracle="""
    SELECT lang AS event,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents WHERE doc_id >= 100 AND doc_id < 300 GROUP BY lang
    """,
)
def q_log_replay_window(spark: SparkSession, sf: str) -> DataFrame:
    """Half-open time-window replay proven as data (r6 verdict item 6):
    ``Topic.replay_between_times(t1, t2)`` must deliver exactly the
    messages with t1 <= publish instant < t2 — Kafka consumer
    time-window semantics.  Over the shared ``_docs_tt_topic`` fixture
    (doc k published at base + k minutes, held at offset k+1), the
    window [base+100min, base+300min) is exactly docs 100..299, which
    the oracle computes directly as ``doc_id >= 100 AND doc_id < 300``.
    Both bounds pass as EPOCH SECONDS (offset_for_time's numeric,
    TZ-safe branch); a boundary off by one message in either direction
    at either end moves a count and a sum.  The window resolves to
    offset bounds via two footer-pruned seeks, so the scan itself still
    prunes parquet segments on offset stats — time travel never costs a
    full log read (100 TB shape: two footer walks + a bounded range
    scan)."""
    topic, _ = _docs_tt_topic(spark, sf)
    base_s = _TT_BASE_EPOCH_US / 1_000_000
    window = topic.replay_between_times(base_s + 100 * 60, base_s + 300 * 60)
    return window.groupBy("event").agg(
        F.count(F.lit(1)).cast("long").alias("n_msgs"),
        F.sum(F.get_json_object("message", "$.doc_id").cast("long"))
        .cast("long")
        .alias("sum_doc_id"),
    )


@query("q_log_mirror_roundtrip", oracle=None)
def q_log_mirror_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Offset-preserving topic replication end-to-end (Topic.mirror_to,
    the MirrorMaker analog): publish the first 500 events into a fresh
    source topic, mirror it to an empty destination, and return the
    DESTINATION's full replay — which carries the source's offsets
    verbatim (a durable subscriber can fail over without offset
    translation).  Rows-only check (temp paths aren't SQL-visible);
    the offset-identity, incremental-delta, and idempotence invariants
    are pinned by tests/test_log_mirror.py."""
    from kafkaish_spark.sources.topic_log import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="kafkaish_mirror_"))
    src_topic = eng.prepare_topic("src")
    dst_topic = eng.prepare_topic("dst")
    ev = (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 500)
        .select(
            F.col("event_type").alias("event"),
            F.col("props").alias("message"),
            F.col("ts"),
        )
    )
    src_topic.publish_df(ev)
    src_topic.mirror_to(dst_topic)
    return dst_topic.replay(since=0).select("offset", "event", "message")


@query("q_log_topic_stats", oracle=None)
def q_log_topic_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Engine.describe_topics as data: publish two topics of different
    sizes (300 / 200 events) into a fresh root, ack one subscriber on
    the first, and return the engine-wide system table (one row per
    topic: files, rows, bytes, offset range, subscriber count — all
    from parquet footer stats, no per-topic Spark job).  Rows-only
    check (temp paths aren't SQL-visible); the per-column invariants
    are pinned by tests/test_log_layer.py::test_describe_topics."""
    from kafkaish_spark.sources.topic_log import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="kafkaish_stats_"))
    ev = t(spark, sf, "events").select(
        F.col("event_type").alias("event"),
        F.col("props").alias("message"),
        F.col("ts"),
        F.col("event_id"),
    )
    a = eng.prepare_topic("alpha")
    a.publish_df(ev.filter(F.col("event_id") <= 300).drop("event_id"))
    a.ack("w1", 5)
    b = eng.prepare_topic("beta")
    b.publish_df(
        ev.filter(
            (F.col("event_id") > 300) & (F.col("event_id") <= 500)
        ).drop("event_id")
    )
    return eng.describe_topics()


# Memoized per-application fixture for q_log_compaction_advice: the
# fragmented/packed topic pair is built ONCE per Spark app and reused
# by every plan enumeration (bench plan-diff, contract sweep, timed
# reps) — the same eager-work-at-plan-build fix the r9 advisor cache
# made for joins (r9 ADVICE item 5).  The temp root is removed at
# interpreter exit.
_COMPADV_FIXTURE: dict = {}


def _compadv_engine(spark: SparkSession, sf: str):
    import atexit
    import shutil

    from kafkaish_spark.sources.topic_log import Engine

    app = spark.sparkContext.applicationId
    if app in _COMPADV_FIXTURE:
        return _COMPADV_FIXTURE[app]
    root = tempfile.mkdtemp(prefix="kafkaish_compadv_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    eng = Engine(spark, root)
    frag = eng.prepare_topic("fragmented")
    # 10 single-message publishes still clears min_files=8 while paying
    # a quarter of the writer-lock/parquet-write cycles the r9 version
    # did (r9 ADVICE item 5)
    for i in range(10):
        frag.publish("e", {"i": i})
    packed = eng.prepare_topic("packed")
    ev = (
        t(spark, sf, "events")
        .filter(F.col("event_id") <= 300)
        .select(
            F.col("event_type").alias("event"),
            F.col("props").alias("message"),
            F.col("ts"),
        )
    )
    packed.publish_df(ev, target_files=1)
    _COMPADV_FIXTURE[app] = eng
    return eng


@query("q_log_compaction_advice", oracle=None)
def q_log_compaction_advice(spark: SparkSession, sf: str) -> DataFrame:
    """Engine.compaction_advice as data — the log layer's audit→action
    loop (the fragmentation twin of the query layer's join-strategy
    advisor): build one FRAGMENTED topic (10 single-message publishes
    — the direct fast path's many-tiny-segments pattern, memoized per
    Spark app so plan enumeration stays cheap) and one compact topic
    (a single publish_df batch), and return the advice table: the
    fragmented topic earns ``compact_small`` with a files_after
    estimate, the compact one reads ``ok``.  Footer stats only — no
    Spark job per topic.  Rows-only check (temp paths aren't
    SQL-visible); the verdict/threshold invariants are pinned by
    tests/test_log_layer.py::test_compaction_advice."""
    eng = _compadv_engine(spark, sf)
    return eng.compaction_advice(min_files=8).orderBy("topic")
