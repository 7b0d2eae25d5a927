"""Consumer-group semantics over sharded topics (streaming/groups.py):
static shard assignment, disjoint+complete delivery, per-shard order,
checkpointed resume, idle over-provisioned members."""

import json


def _drain(engine, base, group, member, n_members, **kw):
    """Run one member to backlog exhaustion, returning its delivered
    rows in (batch, topic, offset) order."""
    from kafkaish_spark.streaming.groups import subscribe_group

    got = []

    def batch_fn(df, _bid):
        got.extend(
            (r["topic"], int(r["offset"]), r["message"])
            for r in sorted(
                df.collect(), key=lambda r: (r["topic"], r["offset"])
            )
        )

    sub = subscribe_group(
        engine, base, group, member, n_members, batch_fn=batch_fn, **kw
    )
    if sub is not None:
        sub.await_termination(120)
    return sub, got


def test_group_splits_shards_disjoint_and_complete(engine):
    published = {}
    for i in range(4):
        topic = engine.prepare_topic(f"logs.{i}")
        rows = topic.publish_batch(
            [("ev", {"shard": i, "n": j}) for j in range(5)]
        )
        published[f"logs.{i}"] = len(rows)

    _, got0 = _drain(engine, "logs", "g1", 0, 2)
    _, got1 = _drain(engine, "logs", "g1", 1, 2)

    topics0 = {t for t, _, _ in got0}
    topics1 = {t for t, _, _ in got1}
    # modulo assignment over the sorted shard list
    assert topics0 == {"logs.0", "logs.2"}
    assert topics1 == {"logs.1", "logs.3"}
    # complete: every published message delivered to exactly one member
    per_topic: dict = {}
    for t, off, _ in got0 + got1:
        per_topic.setdefault(t, []).append(off)
    assert {t: len(v) for t, v in per_topic.items()} == published
    # per-shard order: offsets arrive monotonically within each shard
    for t, offs in per_topic.items():
        assert offs == sorted(offs), t


def test_overprovisioned_member_idles(engine):
    for i in range(2):
        engine.prepare_topic(f"few.{i}").publish_batch([("e", {"i": i})])
    sub, got = _drain(engine, "few", "g2", 4, 5)
    assert sub is None and got == []


def test_group_member_resumes_from_checkpoint(engine):
    for i in range(2):
        engine.prepare_topic(f"rs.{i}").publish_batch(
            [("e", {"round": 1, "n": j}) for j in range(3)]
        )
    _, first = _drain(engine, "rs", "g3", 0, 1)
    assert len(first) == 6  # sole member owns both shards

    engine.prepare_topic("rs.1").publish_batch([("e", {"round": 2})])
    _, second = _drain(engine, "rs", "g3", 0, 1)
    msgs = [json.loads(m)["round"] for _, _, m in second]
    assert msgs == [2], second  # only the new message, no redelivery


def test_group_ack_rows_per_shard(engine):
    for i in range(2):
        engine.prepare_topic(f"ak.{i}").publish_batch(
            [("e", {"n": j}) for j in range(4)]
        )
    _drain(engine, "ak", "g4", 0, 1)
    for i in range(2):
        topic = engine.prepare_topic(f"ak.{i}")
        assert topic.last_ack("g4.m0") == 4
