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
