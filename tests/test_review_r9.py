"""Round-9 closing-review regression tests."""

from datetime import datetime, timezone

import pytest

from kafkaish_spark.sources.topic_log import _session_zone_date


# 20:00 UTC — next day in +8, same day in -5
_NOW = datetime(2026, 8, 16, 20, 0, 0, tzinfo=timezone.utc)


@pytest.mark.parametrize(
    "tz,expected_day",
    [
        ("UTC", 16),
        ("America/New_York", 16),
        ("Asia/Shanghai", 17),
        # fixed-offset spellings Spark accepts but zoneinfo rejects —
        # the review-r9 hole: these fell back to the UTC date while
        # publish_df filed the same instant under the session date
        ("GMT+08:00", 17),
        ("UTC+8", 17),
        ("+08:00", 17),
        ("+0800", 17),
        ("-05:00", 16),
        ("GMT-11:00", 16),
    ],
)
def test_session_zone_date_offset_ids(tz, expected_day):
    assert _session_zone_date(_NOW, tz).day == expected_day


def test_session_zone_date_unresolvable_falls_back_to_utc():
    assert _session_zone_date(_NOW, "Not/AZone").day == 16


def test_advised_join_rejects_non_fact_preserving_up_front(spark, sf_dir):
    """A right/full advised join must fail at call time, not when the
    data grows into the salt regime (review r9)."""
    from kafkaish_spark.functions.advisor import advised_join
    from kafkaish_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("o_custkey")
    )
    with pytest.raises(ValueError, match="not fact-preserving"):
        advised_join(o, n, "o_custkey", how="full")


def test_mirror_rename_order_survives_partial_phase3(
    engine, spark, monkeypatch
):
    """Simulate a crash BETWEEN phase-3 renames: let the first staged
    rename land, fail the second, and assert the visible mirror is a
    CONTIGUOUS prefix of the delta (so the next mirror_to's watermark
    resumes after it and replicates the rest).  Before the review-r9
    fix the os.walk rename order could land a HIGH-offset file first,
    and a crash before its lower siblings froze those offsets under
    the watermark forever."""
    import kafkaish_spark.sources.topic_log as tl

    src = engine.prepare_topic("mo_src")
    dst = engine.prepare_topic("mo_dst")
    for i in range(6):
        src.publish("e", {"i": i})
    src_offsets = sorted(r["offset"] for r in src.log().collect())

    real_replace = tl.os.replace
    calls = {"n": 0}

    def crashy_replace(a, b):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash between phase-3 renames")
        return real_replace(a, b)

    monkeypatch.setattr(tl.os, "replace", crashy_replace)
    try:
        src.mirror_to(dst)
        crashed = False
    except RuntimeError:
        crashed = True
    monkeypatch.setattr(tl.os, "replace", real_replace)

    if not crashed:
        # the delta staged as a single file — nothing to order; the
        # mirror is already complete and the invariant is trivially met
        assert sorted(
            r["offset"] for r in dst.log().collect()
        ) == src_offsets
        return
    visible = sorted(r["offset"] for r in dst.log().collect())
    # contiguous prefix of the delta — THE invariant the sorted rename
    # buys: no hole below the watermark
    assert visible == src_offsets[: len(visible)]
    assert dst.latest() == (visible[-1] if visible else 0)
    # recovery: the next mirror_to resumes after the prefix
    assert src.mirror_to(dst) == len(src_offsets) - len(visible)
    assert sorted(r["offset"] for r in dst.log().collect()) == src_offsets
