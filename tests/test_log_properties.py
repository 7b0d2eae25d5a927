"""Property-based checks of the log-layer delivery contract
(hypothesis): for ANY publish sequence, replay preserves exact content
and total order with contiguous offsets, and resuming from any ack
yields exactly the unacked suffix — the general form of the
reference's hand-picked scenarios (test/topic.js:180-242's 1-6/1-5/6-10
dance and friends).

Examples are capped: each case drives real Spark jobs.
"""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

events = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
batches = st.lists(
    st.lists(st.tuples(events, st.integers(0, 999)), min_size=1, max_size=5),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=batches)
def test_replay_is_exact_ordered_history(engine_factory, batches):
    topic = engine_factory().prepare_topic("prop_replay")
    sent = []
    for batch in batches:
        msgs = [(e, json.dumps({"v": v})) for e, v in batch]
        topic.publish_batch(msgs)
        sent.extend(msgs)

    rows = topic.replay(since=0).orderBy("offset").collect()
    assert [r["offset"] for r in rows] == list(range(1, len(sent) + 1))
    assert [(r["event"], r["message"]) for r in rows] == sent


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(1, 12),
    ack_at=st.integers(0, 12),
)
def test_resume_yields_exactly_unacked_suffix(engine_factory, n, ack_at):
    ack_at = min(ack_at, n)
    topic = engine_factory().prepare_topic("prop_ack")
    topic.publish_batch([("e", str(i)) for i in range(1, n + 1)])
    if ack_at:
        topic.ack("sub", ack_at)
    last = topic.last_ack("sub") or 0
    rows = topic.replay(since=last).orderBy("offset").collect()
    assert [r["message"] for r in rows] == [str(i) for i in range(ack_at + 1, n + 1)]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    plan=st.lists(
        st.one_of(
            st.tuples(st.just("pub"), st.integers(1, 4)),
            st.tuples(st.just("compact"), st.just(0)),
        ),
        min_size=2,
        max_size=6,
    )
)
def test_compaction_interleaved_with_publishes_preserves_history(
    engine_factory, plan
):
    """Compacting at ANY point between publishes must leave replay
    exactly equal to the full publish history, and the log appendable."""
    topic = engine_factory().prepare_topic("prop_compact")
    expect = []
    i = 0
    for op, arg in plan:
        if op == "pub":
            msgs = [("e", f"m{i + j}") for j in range(arg)]
            i += arg
            topic.publish_batch(msgs)
            expect.extend(m for _, m in msgs)
        else:
            topic.compact(target_files=1)
    got = [r["message"] for r in topic.replay().collect()]
    assert got == expect
    if expect:
        assert topic.latest() == len(expect)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    shard_batches=st.lists(  # per-shard publish plans, interleaved round-robin
        st.lists(st.integers(1, 3), min_size=1, max_size=3),
        min_size=2,
        max_size=3,
    )
)
def test_sharded_union_is_per_shard_total_order(engine_factory, shard_batches):
    """SURVEY §4's multi-partition relaxation, as a property: for ANY
    interleaving of publishes across shards, (a) each shard's offsets
    are contiguous 1..n_i (per-shard total order, Kafka-partition
    analog), (b) the union reader sees every message exactly once with
    (topic, offset) as a unique key, and (c) per-shard publish order is
    recoverable from the union by sorting on offset within topic."""
    eng = engine_factory()
    sent = {}  # shard name -> [messages in publish order]
    plans = {f"shard_{i}": plan for i, plan in enumerate(shard_batches)}
    for name in plans:
        eng.prepare_topic(name)
        sent[name] = []
    # round-robin interleave publishes across shards (multi-writer shape)
    step = 0
    while any(plans.values()):
        for name, plan in plans.items():
            if not plan:
                continue
            k = plan.pop(0)
            msgs = [("e", f"{name}:m{step}:{j}") for j in range(k)]
            eng.prepare_topic(name).publish_batch(msgs)
            sent[name].extend(m for _, m in msgs)
        step += 1

    union = eng.union_topics(list(sent)).collect()
    # (b) exactly-once per (topic, offset); no cross-shard leakage
    keys = [(r["topic"], r["offset"]) for r in union]
    assert len(keys) == len(set(keys)) == sum(len(v) for v in sent.values())
    per = {}
    for r in union:
        per.setdefault(r["topic"], []).append((r["offset"], r["message"]))
    assert set(per) == set(sent)
    for name, rows in per.items():
        rows.sort()
        # (a) contiguous per-shard offsets from 1
        assert [o for o, _ in rows] == list(range(1, len(rows) + 1))
        # (c) offset order == publish order within the shard
        assert [m for _, m in rows] == sent[name]
        # and the shard handle's own tail agrees with the union view
        assert eng.prepare_topic(name).latest() == len(rows)
