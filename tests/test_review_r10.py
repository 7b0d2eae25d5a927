"""Round-10 review regression tests (r9 ADVICE items)."""

from datetime import datetime, timezone

import pytest

from kafkaish_spark.sources.topic_log import _session_zone_date


_NOW = datetime(2026, 8, 16, 20, 0, 0, tzinfo=timezone.utc)


@pytest.mark.parametrize("tz", ["+25:00", "-99", "GMT+24:00", "+25:61"])
def test_session_zone_date_out_of_range_offset_falls_back_to_utc(tz):
    """datetime.timezone rejects offsets outside (-24h, +24h); a bad
    session-timezone conf must fall back to the UTC date, not crash the
    publish path (r9 ADVICE item 1)."""
    assert _session_zone_date(_NOW, tz).day == 16


def test_advise_join_cache_keys_include_thresholds(spark, sf_dir):
    """Two call sites sharing a cache_key but passing different
    thresholds must get independent measurements (r9 ADVICE item 2):
    nation fits a generous broadcast threshold but not a 1-byte one."""
    from kafkaish_spark.functions.advisor import advise_join_cached
    from kafkaish_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "o_custkey"
    )
    key = ("review-r10", sf_dir, "orders-nation")
    a_big = advise_join_cached(
        o, n, "o_custkey", cache_key=key, broadcast_bytes=64 << 20
    )
    a_tiny = advise_join_cached(
        o, n, "o_custkey", cache_key=key, broadcast_bytes=1
    )
    assert a_big.strategy == "broadcast"
    assert a_tiny.strategy != "broadcast"
    # and a repeat call with the same kwargs is a cache HIT (identity)
    assert (
        advise_join_cached(
            o, n, "o_custkey", cache_key=key, broadcast_bytes=64 << 20
        )
        is a_big
    )


def test_bench_plan_normalization_regex_is_anchored():
    """The RDD-callsite rule must erase only the known callsite shapes
    ('at Foo.java:0' / 'at <unknown>:0'), not arbitrary 'at x:1' text a
    genuine plan change could contain (r9 ADVICE item 3)."""
    import bench

    s = bench._normalize_plan_text(
        "Scan ExistingRDD at NativeMethodAccessorImpl.java:0\n"
        "Scan ExistingRDD at <unknown>:0\n"
        "Scan ExistingRDD at Invoke.scala:102\n"
        "SortMergeJoin at position:3 buckets:7"
    )
    assert "at _" in s
    assert "NativeMethodAccessorImpl" not in s
    assert "<unknown>:0" not in s
    assert "Invoke.scala:102" not in s
    assert "at position:3" in s  # non-callsite text survives


def test_streaming_percentiles_docstring_points_to_real_test():
    """The verification pointer in streaming_percentiles' docstring must
    name a test that exists (r9 ADVICE item 4)."""
    import os
    import re

    from kafkaish_spark.streaming.stateful import streaming_percentiles

    doc = streaming_percentiles.__doc__ or ""
    m = re.search(r"tests/(\S+?\.py)::(\w+)", doc)
    assert m, "docstring lost its verification pointer"
    path = os.path.join(os.path.dirname(__file__), os.path.basename(m.group(1)))
    with open(path) as fh:
        assert re.search(rf"def {m.group(2)}\b", fh.read()), (
            f"{m.group(1)} has no test named {m.group(2)}"
        )
