"""Cross-topic transactional publish (sources/transactions.py):
all-or-nothing across topics, journal recovery in both directions."""

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _df(spark, rows):
    return spark.createDataFrame(rows, "event string, message string")


def test_commit_appends_to_all_topics_with_contiguous_offsets(engine, spark):
    from kafkaish_spark.sources.transactions import publish_transaction

    a = engine.prepare_topic("txn_a")
    a.publish("e", {"pre": 1})  # pre-existing tail
    counts = publish_transaction(
        engine,
        [
            ("txn_a", _df(spark, [("e", "a1"), ("e", "a2")])),
            ("txn_b", _df(spark, [("e", "b1")])),
        ],
    )
    assert counts == {"txn_a": 2, "txn_b": 1}
    assert [r["offset"] for r in a.replay(since=0).collect()] == [1, 2, 3]
    b = engine.prepare_topic("txn_b")
    rows = b.replay(since=0).collect()
    assert [(r["offset"], r["message"]) for r in rows] == [(1, "b1")]


def test_crash_after_staging_rolls_back(engine, spark):
    from kafkaish_spark.sources.transactions import (
        publish_transaction,
        recover_transactions,
    )

    with pytest.raises(RuntimeError, match="simulated crash"):
        publish_transaction(
            engine,
            [
                ("txn_a", _df(spark, [("e", "x")])),
                ("txn_b", _df(spark, [("e", "y")])),
            ],
            _crash_after="staged",
        )
    # nothing visible before recovery...
    assert engine.prepare_topic("txn_a").latest() == 0
    assert engine.prepare_topic("txn_b").latest() == 0
    out = recover_transactions(engine)
    assert out == {"rolled_back": 1, "rolled_forward": 0}
    # ...and nothing after: the transaction never happened
    assert engine.prepare_topic("txn_a").latest() == 0
    assert engine.prepare_topic("txn_b").latest() == 0


def test_crash_mid_commit_rolls_forward(engine, spark):
    from kafkaish_spark.sources.transactions import (
        publish_transaction,
        recover_transactions,
    )

    with pytest.raises(RuntimeError, match="simulated crash"):
        publish_transaction(
            engine,
            [
                ("txn_a", _df(spark, [("e", "x1"), ("e", "x2")])),
                ("txn_b", _df(spark, [("e", "y1")])),
            ],
            _crash_after=1,  # first topic moved, second not
        )
    out = recover_transactions(engine)
    assert out == {"rolled_back": 0, "rolled_forward": 1}
    # BOTH topics show the full transaction after roll-forward
    a_rows = engine.prepare_topic("txn_a").replay(since=0).collect()
    b_rows = engine.prepare_topic("txn_b").replay(since=0).collect()
    assert sorted(r["message"] for r in a_rows) == ["x1", "x2"]
    assert [r["message"] for r in b_rows] == ["y1"]


def test_next_transaction_auto_recovers_debris(engine, spark):
    """publish_transaction runs recovery first: a crashed predecessor
    cannot block or corrupt the next writer, and offsets remain
    contiguous across the recovered history."""
    from kafkaish_spark.sources.transactions import publish_transaction

    with pytest.raises(RuntimeError):
        publish_transaction(
            engine,
            [("txn_a", _df(spark, [("e", "lost")]))],
            _crash_after="staged",
        )
    counts = publish_transaction(
        engine, [("txn_a", _df(spark, [("e", "kept")]))]
    )
    assert counts == {"txn_a": 1}
    rows = engine.prepare_topic("txn_a").replay(since=0).collect()
    assert [(r["offset"], r["message"]) for r in rows] == [(1, "kept")]


def test_partitioned_topics_rejected(engine, spark):
    from kafkaish_spark.sources.transactions import publish_transaction

    engine.prepare_topic("txn_part", partitioned=True)
    with pytest.raises(ValueError, match="date-partitioned"):
        publish_transaction(
            engine, [("txn_part", _df(spark, [("e", "x")]))]
        )
    assert engine.prepare_topic("txn_part").latest() == 0


def test_consume_transform_produce_exactly_once(engine, spark):
    """The EOS loop: poll topic A from the group offset, publish the
    transformed batch to topic B WITH the group-offset commit in the
    same transaction.  A crash mid-commit must leave, after recovery,
    BOTH the outputs and the advanced offset — re-polling resumes past
    the processed batch, nothing skipped, nothing reprocessed."""
    from kafkaish_spark.sources.transactions import (
        publish_transaction,
        recover_transactions,
    )

    src = engine.prepare_topic("eos_src")
    src.publish_batch([("e", {"i": 1}), ("e", {"i": 2}), ("e", {"i": 3})])

    def poll_and_relay(crash=None):
        start = src.last_ack("relay") or 0
        upto = src.latest()
        batch = src.replay(since=start).filter(F.col("offset") <= upto)
        out = batch.select(
            "event", F.concat(F.lit("out:"), F.col("message")).alias("message")
        )
        return publish_transaction(
            engine,
            [("eos_dst", out)],
            acks=[("eos_src", "relay", upto)],
            _crash_after=crash,
        )

    # crash between the commit point and the renames/acks
    with pytest.raises(RuntimeError):
        poll_and_relay(crash=0)
    recover_transactions(engine)
    dst = engine.prepare_topic("eos_dst")
    assert dst.latest() == 3  # outputs landed exactly once
    assert src.last_ack("relay") == 3  # offset advanced with them

    # resumed loop: nothing to process, nothing re-produced
    counts = poll_and_relay()
    assert counts == {"eos_dst": 0}
    assert dst.latest() == 3

    # and new input flows through exactly once
    src.publish("e", {"i": 4})
    poll_and_relay()
    msgs = sorted(r["message"] for r in dst.replay(since=0).collect())
    assert len(msgs) == 4 and msgs[-1].startswith("out:")


def test_same_topic_twice_in_one_transaction_gets_unique_offsets(
    engine, spark
):
    """Staged segments are invisible to latest(): without per-topic
    staged-row tracking, a topic appearing twice in ``publishes`` got
    the same base offset twice and the committed log held duplicate
    offsets (r4 advice, medium)."""
    from kafkaish_spark.sources.transactions import publish_transaction

    counts = publish_transaction(
        engine,
        [
            ("txn_dup", _df(spark, [("e", "m1"), ("e", "m2")])),
            ("txn_other", _df(spark, [("e", "x1")])),
            ("txn_dup", _df(spark, [("e", "m3")])),
        ],
    )
    assert counts == {"txn_dup": 3, "txn_other": 1}
    rows = engine.prepare_topic("txn_dup").replay(since=0).collect()
    assert [r["offset"] for r in rows] == [1, 2, 3]
    assert [r["message"] for r in rows] == ["m1", "m2", "m3"]
