"""Kafka-style consumer groups over sharded topic logs.

The reference delivers each topic's messages to every named subscriber
independently (one tailable cursor per subscriber, src/topic.js:90-117);
it has no notion of a GROUP of cooperating consumers splitting a topic's
partitions.  This module adds that Kafka analog on top of the
shard-into-N-topics pattern (``Engine.union_topics``): shards play the
role of Kafka partitions, a ``ConsumerGroup`` deterministically assigns
shards to members (round-robin over the sorted shard list, exactly
Kafka's range/round-robin assignor family), and committed offsets live
per (group, shard) in the existing durable-ack store — so REBALANCING
(changing the member count) never loses or redelivers acknowledged
messages, because offsets belong to the group+shard, not the member.

Delivery is at-least-once within a snapshot window: ``poll`` bounds each
shard read at the shard's tail observed at poll time and returns those
bounds, and ``commit`` acknowledges exactly the bounds the caller hands
back after processing — messages published mid-poll arrive next poll.

Scale notes: poll builds ONE DataFrame (per-shard offset-range scans
unioned with a ``topic`` column, predicates pushed to parquet row
groups) — members can process their whole assignment as a single Spark
job; the coordination metadata (assignments, acks) is driver-side JSON,
never a Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkaish_spark.sources.topic_log import Engine


class ConsumerGroup:
    """Cooperative consumption of a set of shard topics.

    ``shards`` is the full shard-topic name list (every member must pass
    the same list — it is the group's "topic"); ``n_members`` the group
    size.  Membership is positional (member ids ``0..n_members-1``),
    mirroring Kafka's member-to-partition assignment after a rebalance.
    """

    def __init__(self, engine: Engine, group: str, shards: list[str], n_members: int):
        if n_members < 1:
            raise ValueError("n_members must be >= 1")
        if not shards:
            raise ValueError("a consumer group needs at least one shard topic")
        self.engine = engine
        self.group = group
        self.shards = sorted(shards)
        self.n_members = n_members
        # set by rebalance(sticky=True): the ACTUAL previous ownership
        # map (shard index -> old member) the sticky assignor minimizes
        # movement against.  Carrying real owners (not the old member
        # COUNT) keeps stickiness exact across chained sticky resizes,
        # where the old topology is no longer the modulo map.
        self._prev_owner: list[int] | None = None

    # -- assignment ----------------------------------------------------

    def assignment(self) -> dict[int, list[str]]:
        """member id -> shard names; deterministic, disjoint, complete
        (round-robin over the sorted shard list, or the sticky map
        after rebalance(sticky=True)).  Delegates to the ONE group
        assignor family (streaming.groups) so batch and streaming
        members of the same logical group can never disagree about
        shard ownership."""
        return {m: self.assigned(m) for m in range(self.n_members)}

    def assigned(self, member_id: int) -> list[str]:
        from kafkaish_spark.streaming.groups import (
            assignment as _assign,
            sticky_assignment_from as _sticky_from,
        )

        if not 0 <= member_id < self.n_members:
            raise ValueError(
                f"member_id {member_id} out of range for group of {self.n_members}"
            )
        if self._prev_owner is not None:
            return _sticky_from(
                self.shards, member_id, self._prev_owner, self.n_members
            )
        return _assign(self.shards, member_id, self.n_members)

    def _owner_map(self) -> list[int]:
        """shard index -> owning member under THIS view's assignment
        (modulo or sticky alike) — what the next sticky rebalance
        minimizes movement against."""
        by_shard = {
            s: m for m, names in self.assignment().items() for s in names
        }
        return [by_shard[s] for s in self.shards]

    # -- consumption ---------------------------------------------------

    def poll(self, member_id: int) -> tuple[DataFrame, dict[str, int]]:
        """Unread messages on the member's shards, plus the per-shard
        snapshot bounds to hand to ``commit`` after processing.

        The frame carries a ``topic`` column (which shard each row came
        from) and is bounded at each shard's tail AS OF this call, so
        processing + commit covers a well-defined window even while
        producers keep publishing.
        """
        frames = []
        bounds: dict[str, int] = {}
        for name in self.assigned(member_id):
            topic = self.engine.prepare_topic(name)
            since = topic.last_ack(self.group) or 0
            upto = topic.latest()
            bounds[name] = upto
            if upto <= since:
                continue
            frames.append(
                topic.replay(since=since)
                .filter(F.col("offset") <= F.lit(upto))
                .select(F.lit(name).alias("topic"), "offset", "ts", "event", "message")
            )
        if not frames:
            return (
                self.engine.union_topics([self.assigned(member_id)[0]]).limit(0),
                bounds,
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out, bounds

    def commit(self, member_id: int, bounds: dict[str, int]) -> None:
        """Acknowledge a processed poll window: advance the group's
        durable offset on each of the member's shards (monotonic — a
        stale commit after a rebalance can't move offsets backwards)."""
        assigned = set(self.assigned(member_id))
        for name, offset in bounds.items():
            if name not in assigned:
                raise ValueError(
                    f"shard {name!r} is not assigned to member {member_id}"
                )
            self.engine.prepare_topic(name).ack(self.group, offset)

    # -- rebalancing ---------------------------------------------------

    def rebalance(self, n_members: int, sticky: bool = False) -> "ConsumerGroup":
        """New group view with a different member count.  Offsets are
        keyed (group, shard), so the new members resume exactly where
        the group left off on every shard.

        ``sticky=True`` returns a view whose assignment keeps shards
        with their previous owners wherever balance allows (the Kafka
        CooperativeStickyAssignor analog, streaming.groups
        .sticky_assignment_from) — fewest revocations, warm members
        keep their working sets.  The previous ownership handed to the
        assignor is this view's ACTUAL owner map, so chained sticky
        resizes (sticky on top of sticky) stay movement-minimal
        against who really owned each shard, not against the stale
        modulo topology.  Default stays the stateless modulo map."""
        g = ConsumerGroup(self.engine, self.group, self.shards, n_members)
        if sticky:
            g._prev_owner = self._owner_map()
        return g

    def lag(self) -> DataFrame:
        """Per-shard lag of this group vs each shard's tail."""
        rows = []
        for name in self.shards:
            topic = self.engine.prepare_topic(name)
            acked = topic.last_ack(self.group) or 0
            rows.append((name, acked, topic.latest() - acked))
        return self.engine.spark.createDataFrame(
            rows, "topic string, last_offset long, lag long"
        )
