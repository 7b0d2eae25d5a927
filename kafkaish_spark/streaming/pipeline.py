"""Topic-to-topic streaming pipelines (the Kafka-Streams shape).

The reference can only move data topic->subscriber; re-publishing a
transformed stream means user code consuming and calling publish by
hand.  Here a pipeline is one checkpointed streaming query whose sink
is another topic's publish path: read topic A, transform with any
DataFrame logic, append to topic B with fresh contiguous offsets.

Delivery is **effectively-once** end to end via the standard
foreachBatch idempotency pattern: the sink records the last published
micro-batch id; a batch replayed after a crash (same id) is skipped
instead of re-appended.  The marker write happens after the publish,
so the residual failure window (publish committed, marker lost)
degrades to at-least-once — same class as transactional-outbox
without the transaction.  At 100 TB each hop is an independent query
with its own parallelism and checkpoint; hops compose into DAGs.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame

from kafkaish_spark.sources.topic_log import Topic
from kafkaish_spark.streaming.subscribe import Subscription


def pipe(
    source: Topic,
    sink: Topic,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    *,
    name: str | None = None,
    event: str | None = None,
    available_now: bool = True,
) -> Subscription:
    """Stream ``source`` into ``sink``, optionally transforming the
    envelope frame in between.

    ``transform`` receives the envelope DataFrame (offset/ts/event/
    message) and must return a frame with at least (event, message)
    — same contract as ``Topic.publish_df``.  The checkpoint lives
    under the SINK topic keyed by ``name``, so each pipeline resumes
    independently."""
    if name is None:
        # default includes the source so pipe(A, C) and pipe(B, C)
        # never collide on one checkpoint/marker under the sink
        name = f"pipe_from_{source.name}"
    stream = source.stream(event=event)
    if transform is not None:
        stream = transform(stream)

    checkpoint = os.path.join(sink.root, "_pipelines", name, "checkpoint")
    # The marker lives INSIDE the checkpoint dir: resetting the
    # checkpoint (which restarts batch ids at 0) removes the marker
    # with it — a surviving marker would silently skip batches 0..N.
    marker = os.path.join(checkpoint, "kafkaish_last_batch.json")
    os.makedirs(checkpoint, exist_ok=True)

    def deliver(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(marker):
            try:
                with open(marker) as fh:
                    if batch_id <= json.load(fh)["batch_id"]:
                        return  # replayed batch already published: skip
            except (json.JSONDecodeError, KeyError, ValueError):
                # torn write from a crash mid-marker: treat as absent
                # (degrades this batch to at-least-once, never wedges)
                pass
        if not batch_df.isEmpty():
            cols = [c for c in ("event", "message", "ts") if c in batch_df.columns]
            sink.publish_df(batch_df.select(*cols))
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = f"{marker}.tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        os.replace(tmp, marker)

    writer = (
        stream.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return Subscription(writer.start(), name, checkpoint)
