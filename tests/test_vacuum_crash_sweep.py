"""Exhaustive crash-point sweep for the rewrite/recovery protocols
(VERDICT r11 next-round #4): simulate a crash at EVERY step of
_swap_log_with (compact / redact-to-zero) and of compact_small's
journaled move phase, then assert that restart (Topic construction) +
vacuum converge to exactly the right data — the pre-crash rows for
row-preserving ops at every step, and for redact-to-zero the erasure
standing from the moment its swap committed, never resurrected.

The crash is injected through topic_log._CRASH_POINT_HOOK, so every
state the sweep recovers from was produced by the REAL protocol code,
not hand-assembled directories.
"""

import os
import time

import pytest

from kafkaish_spark.sources import topic_log as tl


class SimulatedCrash(Exception):
    pass


@pytest.fixture
def crash_hook():
    """Arm the protocol crash hook for one named step; disarm after."""

    def arm(step):
        def hook(name):
            if name == step:
                raise SimulatedCrash(step)

        tl._CRASH_POINT_HOOK = hook

    yield arm
    tl._CRASH_POINT_HOOK = None


def _topic_with_rows(engine, name, n=6):
    topic = engine.prepare_topic(name)
    pad = "x" * 2048
    for i in range(n):
        topic.publish("e", {"u": "gone", "i": i, "pad": pad})
    return topic


def _contents(topic):
    return sorted((r["offset"], r["message"]) for r in topic.log().collect())


def _age_everything(topic):
    """Make every crash artifact look hours old so vacuum's staleness
    gate (which protects in-flight runs, not crash recovery) opens."""
    past = time.time() - 7200
    root = os.path.dirname(topic.log_dir)
    for entry in os.listdir(root):
        p = os.path.join(root, entry)
        os.utime(p, (past, past))


def _recover(engine, name):
    """Restart semantics: a FRESH engine (new process) prepares the
    topic — running the construction-time heal — then vacuums."""
    eng2 = tl.Engine(engine.spark, engine.root)
    topic = eng2.prepare_topic(name)
    _age_everything(topic)
    report = topic.vacuum()
    return topic, report


def _assert_clean(topic):
    """No crash artifact survives recovery, and a second vacuum is a
    no-op (recovery is idempotent and complete)."""
    root = os.path.dirname(topic.log_dir)
    leftovers = [
        e
        for e in os.listdir(root)
        if ".compact." in e or ".smallcompact." in e
    ]
    assert leftovers == [], leftovers
    again = topic.vacuum()
    assert again == {"recovered": [], "removed": [], "kept": []}


SWAP_STEPS = [
    "post_validate",  # validation moved BEFORE the swap (review r12)
    "pre_rename1",
    "post_rename1",
    "post_marker",
    "post_rename2",
]
# from this step on, the swap's second rename has happened and the new
# log is authoritative (validation already passed pre-swap)
SWAP_COMMITTED = {"post_rename2"}


@pytest.mark.parametrize("step", SWAP_STEPS)
def test_compact_crash_converges_to_same_rows(engine, crash_hook, step):
    """compact() is row-preserving, so EVERY crash point must recover
    to exactly the pre-crash rows — via rollback before the second
    rename, via the committed rewrite after it."""
    topic = _topic_with_rows(engine, f"swap_{step}")
    before = _contents(topic)
    crash_hook(step)
    with pytest.raises(SimulatedCrash):
        topic.compact(target_files=2)
    tl._CRASH_POINT_HOOK = None

    healed, _report = _recover(engine, f"swap_{step}")
    assert _contents(healed) == before
    assert healed.fsck()["ok"]
    _assert_clean(healed)


@pytest.mark.parametrize("step", SWAP_STEPS)
def test_redact_to_zero_crash_never_resurrects(engine, crash_hook, step):
    """redact() that empties the topic: before the swap commits, a
    crash rolls back to the full pre-crash rows; from the committed
    step on, the erasure STANDS — recovery must never resurrect the
    redacted rows (the right-to-be-forgotten guarantee the swap marker
    exists for)."""
    topic = _topic_with_rows(engine, f"redact_{step}")
    before = _contents(topic)
    crash_hook(step)
    with pytest.raises(SimulatedCrash):
        topic.redact("get_json_object(message, '$.u') = 'gone'")
    tl._CRASH_POINT_HOOK = None

    healed, _report = _recover(engine, f"redact_{step}")
    if step in SWAP_COMMITTED:
        assert _contents(healed) == []
    else:
        assert _contents(healed) == before
    assert healed.fsck()["ok"]
    _assert_clean(healed)


SMALL_STEPS = [
    "small_pre_intent",
    "small_post_intent",
    "small_mid_move",
    "small_post_move",
    "small_post_tmp_rm",
    "small_mid_remove",
    "small_post_remove",
]


@pytest.mark.parametrize("step", SMALL_STEPS)
def test_compact_small_crash_never_duplicates(engine, crash_hook, step):
    """compact_small's journaled move phase: whichever step the crash
    lands on, recovery converges to exactly ONE copy of every row —
    rollback while the staging tmp survives, roll-forward once it is
    gone — and fsck stays green (no duplicate-offset overlap)."""
    topic = _topic_with_rows(engine, f"small_{step}", n=8)
    before = _contents(topic)
    crash_hook(step)
    with pytest.raises(SimulatedCrash):
        topic.compact_small(small_bytes=1 << 20, target_files=2)
    tl._CRASH_POINT_HOOK = None

    healed, _report = _recover(engine, f"small_{step}")
    assert _contents(healed) == before
    assert healed.fsck()["ok"]
    _assert_clean(healed)


def test_invalid_rewrite_never_goes_live(engine):
    """Review r12: a rewrite that would DROP rows must be rejected
    BEFORE the swap — the live log stays untouched, the staged tmp is
    cleaned up, and no swap marker ever exists — so there is no crash
    window in which the bad rewrite is the only live copy."""
    topic = _topic_with_rows(engine, "badrw", n=6)
    before = _contents(topic)
    bad = topic.log().filter("offset > 2")  # silently drops rows

    def validate(after):
        n = after.count()
        return None if n == len(before) else f"row loss ({n})"

    with pytest.raises(RuntimeError, match="log untouched"):
        topic._swap_log_with(bad, 1, validate)
    assert _contents(topic) == before
    root = os.path.dirname(topic.log_dir)
    assert not [e for e in os.listdir(root) if ".compact." in e]
    assert topic.fsck()["ok"]


def test_bad_rewrite_crash_during_validate_keeps_original(
    engine, crash_hook
):
    """The exact data-loss scenario the r12 review found in the OLD
    ordering (validate after the swap): a row-dropping rewrite plus a
    crash inside the validate window.  With pre-swap validation the
    live log was never touched — recovery keeps every original row and
    GCs the staged tmp."""
    topic = _topic_with_rows(engine, "badrw_crash", n=6)
    before = _contents(topic)
    bad = topic.log().filter("offset > 2")
    crash_hook("post_validate")
    with pytest.raises(SimulatedCrash):
        topic._swap_log_with(bad, 1, lambda after: "would have failed")
    tl._CRASH_POINT_HOOK = None

    healed, _report = _recover(engine, "badrw_crash")
    assert _contents(healed) == before
    assert healed.fsck()["ok"]
    _assert_clean(healed)
