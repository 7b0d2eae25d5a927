"""Consumer groups over sharded topics — the Kafka consumer-group
analog for the shard-into-N-topics pattern (SURVEY.md §4 / SCALE.md §1).

The reference's subscription model (/root/reference/src/topic.js:92-116)
is one cursor per subscriber over one topic; it has no way to SPLIT a
topic's traffic across cooperating workers.  Kafka solves that with
partition assignment inside a named group.  Here the unit of
parallelism is the shard topic (``base.N``), and a group of M members
statically partitions the sorted shard list by index modulo M — the
deterministic "range assignor": every member computes its own
assignment from (shard list, member id, group size) with NO coordinator
and no rebalance protocol (Kafka's static membership, taken further:
membership is a constructor argument, not a negotiation).

Delivery contract per member = the durable ``subscribe_batches``
contract per owned shard: per-shard total order by offset,
at-least-once (micro-batch checkpoint commit), per-shard ack rows in
each shard's ``_subscribers`` table under the GROUP name (offsets
belong to the group, not the member — Kafka's contract).
Cross-shard order is NOT promised — exactly the multi-partition Kafka
relaxation the sharded-topic property test pins.

Scale: each member is one streaming query over a union of its shards'
file sources; backlog drains are bounded by ``max_files_per_trigger``
per source, consumer logic runs as Spark jobs on the batch DataFrame
(never a driver collect), and the per-batch ack bookkeeping aggregates
``max(offset) per shard`` — a handful of rows regardless of batch size.
"""

from __future__ import annotations

import os
import re
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkaish_spark.sources.topic_log import Engine
from kafkaish_spark.streaming.subscribe import Subscription, _start_offset_for


def shard_names(engine: Engine, base: str) -> list[str]:
    """The shard topics of ``base``, sorted by shard index — the stable
    order every member's assignment arithmetic runs over."""
    rx = re.compile(rf"{re.escape(base)}\.(\d+)")
    matched = []
    for name in engine.topics():
        m = rx.fullmatch(name)
        if m:
            matched.append((int(m.group(1)), name))
    return [name for _, name in sorted(matched)]


def assignment(shards: list[str], member: int, n_members: int) -> list[str]:
    """Static modulo assignment: shard i -> member (i mod n_members).
    Deterministic from shared inputs, so members never need to talk;
    members beyond the shard count idle (Kafka's over-provisioned
    group behavior).  Single source of truth shared with the batch
    ConsumerGroup (sources/consumer_group.py) so batch and streaming
    members of one logical group can never diverge on who owns a
    shard."""
    if not 0 <= member < n_members:
        raise ValueError(f"member must be in [0, {n_members}), got {member}")
    return [s for i, s in enumerate(shards) if i % n_members == member]


def subscribe_group(
    engine: Engine,
    base: str,
    group: str,
    member: int,
    n_members: int,
    batch_fn: Callable[[DataFrame, int], None] | None = None,
    replay: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> Subscription | None:
    """Join consumer group ``group`` as ``member`` of ``n_members``
    over the shards of ``base``.

    Returns a Subscription over ONE streaming query reading the union
    of this member's shards (each row carries its ``topic``), or None
    if the member's assignment is empty (more members than shards —
    the member idles, exactly like an over-provisioned Kafka group).

    ``batch_fn(batch_df, batch_id)`` runs per micro-batch BEFORE the
    ack, with columns (topic, offset, ts, event, message); a throwing
    batch_fn leaves the batch uncommitted for redelivery on resume
    (at-least-once).  replay=False starts each shard at its tail AT
    FIRST SUBSCRIBE — the start offset is persisted per (group, shard)
    (NOT per member: Kafka's contract, and the batch ConsumerGroup's —
    offsets belong to the group), so a member that resubscribes after
    downtime, or a DIFFERENT member that inherits the shard after a
    resize, resumes from the group's pinned start and still receives
    everything published in between (recomputing the tail at
    resubscribe would silently skip that window).

    Resizing: the checkpoint path carries the topology (n_members), so
    a resize starts fresh streaming checkpoints; per-shard delivery
    then resumes from ``max(group start, last group ack)`` — acked
    messages are not redelivered across a topology change, unacked
    ones are (at-least-once preserved)."""
    shards = shard_names(engine, base)
    mine = assignment(shards, member, n_members)
    if not mine:
        return None
    checkpoint = os.path.join(
        engine.root,
        "_groups",
        base,
        group,
        f"n{n_members}",
        f"member_{member}",
        "checkpoint",
    )
    fresh_topology = not os.path.exists(checkpoint)
    frames = []
    for shard in mine:
        topic = engine.prepare_topic(shard)
        s = topic.stream(max_files_per_trigger=max_files_per_trigger)
        start = _start_offset_for(topic, group, replay)
        if fresh_topology:
            # inherit progress from any previous topology via the
            # group-keyed acks (never from member-keyed state)
            start = max(start, topic.last_ack(group) or 0)
        if start:
            s = s.filter(F.col("offset") > F.lit(int(start)))
        frames.append(
            s.select(
                F.lit(shard).alias("topic"), "offset", "ts", "event", "message"
            )
        )
    stream = frames[0]
    for f in frames[1:]:
        stream = stream.unionByName(f)

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        if batch_fn is not None:
            batch_fn(batch_df, batch_id)
        # Ack bookkeeping: one max(offset) row per shard in this batch —
        # constant-size aggregate, never a row collect.
        heads = (
            batch_df.groupBy("topic")
            .agg(F.max("offset").alias("head"))
            .collect()
        )
        for row in heads:
            engine.prepare_topic(row["topic"]).ack(group, int(row["head"]))

    writer = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return Subscription(query, f"{group}.m{member}", checkpoint)
