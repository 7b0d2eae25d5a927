"""Source/sink connectors between topic logs and external formats.

The reference speaks only MongoDB; a Spark-native log can ingest from
and export to anything `spark.read`/`df.write` speaks.  These helpers
keep the envelope contract (offset/ts/event/message) while letting the
payload come from CSV, JSON lines, or parquet — the Kafka-Connect role,
~30 lines because Spark IS the connector runtime.

At scale: ingest is one distributed read + one publish append (offset
assignment is a footer-stats max, not a scan); export partitions by the
routing key so downstream consumers prune by event.
"""

from __future__ import annotations

import json
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkaish_spark.sources.topic_log import Topic

_READ_FORMATS = {"csv", "json", "parquet", "orc", "text"}


def ingest(
    topic: Topic,
    path: str,
    fmt: str = "parquet",
    *,
    event_col: str | None = None,
    ts_col: str | None = None,
    options: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Read ``path`` in ``fmt`` and publish every row into ``topic``.

    ``event_col`` supplies the routing key (null = wildcard consumers
    only); all remaining columns become the JSON message payload —
    mirroring the reference's arbitrary-BSON message body
    (src/topic.js:26-29).  Returns the written envelope rows.
    """
    if fmt not in _READ_FORMATS:
        raise ValueError(f"unsupported ingest format {fmt!r} (one of {_READ_FORMATS})")
    reader = topic.spark.read
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true")
    df = reader.options(**opts).format(fmt).load(path)

    payload_cols = [
        c for c in df.columns if c not in {event_col, ts_col}
    ]
    out = df.select(
        (F.col(event_col) if event_col else F.lit(None).cast("string")).alias("event"),
        F.to_json(F.struct(*payload_cols)).alias("message"),
        *(
            [F.col(ts_col).cast("timestamp").alias("ts")]
            if ts_col
            else []
        ),
    )
    return topic.publish_df(out)


def export(
    topic: Topic,
    path: str,
    fmt: str = "parquet",
    *,
    since: int = 0,
    event: str | None = None,
    partition_by_event: bool = False,
) -> int:
    """Write a topic's log (optionally from an offset / one routing key)
    to ``path`` in ``fmt``.  Returns the number of rows exported."""
    df = topic.replay(since=since, event=event)
    writer = df.write.mode("overwrite")
    if partition_by_event:
        writer = writer.partitionBy("event")
    writer.format(fmt).save(path)
    # count what was WRITTEN, not a second replay of the source (which
    # would re-scan + re-sort and could disagree if a publish raced in)
    return topic.spark.read.format(fmt).load(path).count()


def messages_as(topic_df: DataFrame, schema: str | Any) -> DataFrame:
    """Schema-on-read payload typing: parse the JSON ``message`` column
    with a caller-supplied schema (the Spark answer to BSON's dynamic
    typing — the envelope is schema-on-write, the payload schema belongs
    to the consumer).  Works on batch (`topic.log()`/`replay`) and
    streaming (`topic.stream()`) frames alike."""
    return topic_df.withColumn("payload", F.from_json("message", schema))


def infer_payload_schema(topic: Topic, sample: int = 1000) -> str:
    """Best-effort payload schema from a sample of the log's JSON
    messages (driver-side sample of `sample` rows, never the full log)."""
    rows = topic.log().select("message").limit(sample).collect()
    rdd_like = [r["message"] for r in rows if r["message"] is not None]
    if not rdd_like:
        return "struct<>"
    df = topic.spark.read.json(topic.spark.sparkContext.parallelize(rdd_like))
    return df.schema.simpleString()


def publish_json_docs(topic: Topic, docs: list[dict], event: str | None = None):
    """Convenience parity with the reference's publish(event, object)
    (src/topic.js:25-29): each dict becomes one JSON message."""
    return topic.publish_batch([(event, json.dumps(d)) for d in docs])
