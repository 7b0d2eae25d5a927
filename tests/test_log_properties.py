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


# ----------------------------------------------------------------- lock
# Double-break race hardening (r6 verdict item 5): breakers serialize
# through a short-lived breaker guard and RE-JUDGE staleness under it,
# so two waiters that both saw a stale mtime cannot both remove, and a
# freshly recreated lock is never deleted by a late breaker.


def _locked_interval_worker(root, out_path, tag, hold_s):
    """Real-process worker: acquire the topic writer lock, record the
    held interval.  Module-level so multiprocessing can spawn it."""
    import time as _t

    from kafkaish_spark.sources.topic_log import writer_lock

    with writer_lock(root, what=f"race-{tag}"):
        t0 = _t.time()
        _t.sleep(hold_s)
        t1 = _t.time()
    with open(out_path, "a") as fh:
        fh.write(f"{tag} {t0:.6f} {t1:.6f}\n")


def test_writer_lock_two_processes_one_forced_stale_lock(tmp_path):
    """The verdict's requested race test: two REAL processes contend
    over a forced-stale lock.  Exactly one breaks it at a time; the
    held intervals never overlap; no lock debris survives."""
    import json
    import multiprocessing as mp
    import os
    import time

    root = str(tmp_path / "racetopic")
    os.makedirs(root)
    path = os.path.join(root, "_writer.lock")
    with open(path, "w") as fh:
        json.dump({"pid": 0, "ts": 0.0, "what": "crashed"}, fh)
    old = time.time() - 100_000
    os.utime(path, (old, old))  # forced stale

    out = str(tmp_path / "intervals.txt")
    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(
            target=_locked_interval_worker, args=(root, out, f"w{i}", 0.4)
        )
        for i in range(2)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    with open(out) as fh:
        ivals = sorted(
            (float(a), float(b)) for _, a, b in (ln.split() for ln in fh)
        )
    assert len(ivals) == 2
    assert ivals[0][1] <= ivals[1][0], f"held intervals overlap: {ivals}"
    assert not os.path.exists(path)
    assert not [f for f in os.listdir(root) if ".breaker" in f]


def test_break_stale_lock_leaves_fresh_lock_untouched(tmp_path):
    """The double-break loser: a waiter whose staleness verdict is out
    of date (the lock was broken and RECREATED under it) must not
    remove the new owner's lock — _break_stale_lock re-judges
    staleness under the breaker guard and backs off."""
    import json
    import os

    from kafkaish_spark.sources.topic_log import _break_stale_lock

    root = str(tmp_path)
    path = os.path.join(root, "_writer.lock")
    fresh = {"pid": 1234, "ts": 1.0, "what": "publish", "token": "winner"}
    with open(path, "w") as fh:
        json.dump(fresh, fh)  # current mtime: a live lock

    assert _break_stale_lock(path) is False
    with open(path) as fh:
        assert json.load(fh) == fresh  # untouched
    assert not os.path.exists(path + ".breaker")  # guard released


def test_break_stale_lock_backs_off_while_another_breaker_holds_guard(
    tmp_path, monkeypatch
):
    """A breaker that cannot get the guard within its wait budget backs
    off (returns False) instead of double-breaking; a CRASHED breaker's
    stale guard is removed and breaking proceeds."""
    import json
    import os
    import time

    from kafkaish_spark.sources import topic_log

    path = os.path.join(str(tmp_path), "_writer.lock")
    with open(path, "w") as fh:
        json.dump({"pid": 0, "ts": 0.0}, fh)
    old = time.time() - 100_000
    os.utime(path, (old, old))  # genuinely stale lock

    # a live breaker holds the guard -> this breaker backs off fast
    guard = path + ".breaker"
    open(guard, "w").close()
    monkeypatch.setattr(topic_log, "_BREAKER_WAIT_S", 0.2)
    assert topic_log._break_stale_lock(path) is False
    assert os.path.exists(path)  # nothing was broken

    # the guard goes stale (crashed breaker) -> it is removed and the
    # stale lock is finally broken
    os.utime(guard, (old, old))
    assert topic_log._break_stale_lock(path) is True
    assert not os.path.exists(path)
    assert not os.path.exists(guard)


def test_break_stale_lock_removes_genuinely_stale(tmp_path):
    import json
    import os
    import time

    from kafkaish_spark.sources.topic_log import _break_stale_lock

    path = os.path.join(str(tmp_path), "_writer.lock")
    with open(path, "w") as fh:
        json.dump({"pid": 0, "ts": 0.0}, fh)
    old = time.time() - 100_000
    os.utime(path, (old, old))
    assert _break_stale_lock(path) is True
    assert not os.path.exists(path)


def test_writer_lock_release_only_removes_own_token(tmp_path):
    """Release is token-checked: if the lockfile was replaced while we
    held it (a breaker raced past every guard), our exit must not
    remove the foreign owner's lock."""
    import json
    import os

    from kafkaish_spark.sources.topic_log import writer_lock

    root = str(tmp_path / "t")
    os.makedirs(root)
    path = os.path.join(root, "_writer.lock")
    with writer_lock(root):
        with open(path) as fh:
            assert "token" in json.load(fh)
        foreign = {"pid": 9, "ts": 9.0, "what": "x", "token": "foreign"}
        with open(path, "w") as fh:
            json.dump(foreign, fh)
    with open(path) as fh:
        assert json.load(fh) == foreign  # left in place
    os.remove(path)
    # normal path: own lock removed on exit
    with writer_lock(root):
        assert os.path.exists(path)
    assert not os.path.exists(path)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(1, 12),
    a=st.integers(0, 14),
    b=st.integers(0, 14),
)
def test_replay_between_times_is_half_open_window(
    engine_factory, spark, n, a, b
):
    """For ANY publish sequence with known instants and ANY window
    bounds, replay_between_times(t1, t2) delivers exactly the messages
    with t1 <= publish instant < t2 (half-open, Kafka time-window
    semantics) — the property behind q_log_replay_window's single
    driver-checked case.  Bounds land before, inside, between, and
    after the published range; empty windows deliver nothing."""
    from pyspark.sql import functions as F

    BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    topic = engine_factory().prepare_topic("prop_tt")
    payload = (
        spark.range(1, n + 1)
        .select(
            F.lit("e").alias("event"),
            F.col("id").cast("string").alias("message"),
            F.timestamp_micros(
                F.lit(BASE_US) + F.col("id") * F.lit(60_000_000)
            ).alias("ts"),
        )
        .repartition(1)
        .sortWithinPartitions(F.col("message").cast("long"))
    )
    topic.publish_df(payload)
    t1 = BASE_US / 1_000_000 + a * 60
    t2 = BASE_US / 1_000_000 + b * 60
    got = sorted(
        int(r["message"])
        for r in topic.replay_between_times(t1, t2).collect()
    )
    want = [i for i in range(1, n + 1) if a <= i < b]
    assert got == want


# ---------------------------------------------------------------- r9:
# the direct-publish / Spark-publish seam (r8 verdict item 7).  The
# two write paths (_publish_direct: driver-side pyarrow segment;
# publish_df: distributed offset assignment) may interleave in ANY
# order; the log must stay one contiguous, totally-ordered,
# ts-monotone history, and seek-by-time must stay consistent with the
# offsets (the r8 review fixed one ts-zone bug on exactly this seam).
publish_calls = st.lists(
    st.tuples(
        st.booleans(),  # True = direct path, False = Spark DF path
        st.lists(
            st.tuples(events, st.integers(0, 999)), min_size=1, max_size=4
        ),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(calls=publish_calls)
def test_direct_and_df_publishes_interleave_cleanly(engine_factory, calls):
    engine = engine_factory()
    spark = engine.spark
    topic = engine.prepare_topic("prop_seam")
    sent = []
    for direct, batch in calls:
        msgs = [(e, json.dumps({"v": v})) for e, v in batch]
        if direct:
            rows = topic.publish_batch(msgs)
            assert [r["offset"] for r in rows] == list(
                range(len(sent) + 1, len(sent) + len(msgs) + 1)
            )
        else:
            df = spark.createDataFrame(
                msgs, "event string, message string"
            ).coalesce(1)
            topic.publish_df(df, target_files=1)
        sent.extend(msgs)

    rows = topic.replay(since=0).orderBy("offset").collect()
    # contiguous offsets, exact content, total order across the seam
    assert [r["offset"] for r in rows] == list(range(1, len(sent) + 1))
    assert [(r["event"], r["message"]) for r in rows] == sent
    # publish instants are monotone in offset across both paths
    ts_seq = [r["ts"] for r in rows]
    assert all(a <= b for a, b in zip(ts_seq, ts_seq[1:]))
    # seek-by-time consistency: every collected ts seeks to the FIRST
    # offset of its clock tick, never past the row itself
    for r in rows:
        seek = topic.offset_for_time(r["ts"])
        assert seek is not None and seek <= r["offset"]
        assert ts_seq[seek - 1] == r["ts"]
