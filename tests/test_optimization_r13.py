"""Focused pins for the optimization-round-13 internals: the
cut_lineage storage seam, the rollup rebuild invalidation hook, the
directory-fresh bucketed source signature, the publish fast-path
partition pin, and the bench normalizer's paren-aware partition-count
scrub.  Each changed an operator's (or a tool's) internals; unchanged
RESULTS stay pinned by the existing oracle/pytest coverage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_cut_lineage_env_switches_storage(spark, monkeypatch):
    """Default path: localCheckpoint (no cache-manager entry).  With
    SPARK_GRAFT_RELIABLE_CHECKPOINT=1: persist(MEMORY_AND_DISK), so an
    executor loss on a cluster recomputes instead of failing."""
    from kafkaish_spark.functions.parallelism import (
        RELIABLE_CHECKPOINT_ENV,
        cut_lineage,
    )

    df = spark.range(10).withColumn("x", F.col("id") * 2)

    monkeypatch.delenv(RELIABLE_CHECKPOINT_ENV, raising=False)
    local = cut_lineage(df, eager=True)
    assert not local.storageLevel.useMemory  # not a persist
    assert local.count() == 10
    assert [r["x"] for r in local.orderBy("id").collect()] == [
        2 * i for i in range(10)
    ]

    monkeypatch.setenv(RELIABLE_CHECKPOINT_ENV, "1")
    reliable = cut_lineage(df, eager=True)
    try:
        assert reliable.storageLevel.useMemory and reliable.storageLevel.useDisk
        assert reliable.count() == 10
        assert [r["x"] for r in reliable.orderBy("id").collect()] == [
            2 * i for i in range(10)
        ]
    finally:
        reliable.unpersist(blocking=False)


def test_rollup_rebuild_invalidates_verified_serve(spark, tmp_path):
    """materialize_hourly(rebuild=True) must drop the memoized verified
    serving frame (r12 ADVICE item 3): a mid-session rebuild otherwise
    serves the stale pre-rebuild frame whose captured file listing may
    no longer exist."""
    from kafkaish_spark.operators import rollup as R

    ev = spark.createDataFrame(
        [(1, "a", 1.0), (7_200_000, "a", 2.0), (7_260_000, "b", 3.0)],
        "ms long, event_type string, value double",
    ).select(
        F.timestamp_millis(F.col("ms")).alias("ts"), "event_type", "value"
    )
    out = str(tmp_path / "rollup")
    R.materialize_hourly(spark, "unused-sf", out_dir=out, events=ev)

    sentinel = ("token", "sf", "frame")
    R._VERIFIED_SERVE = sentinel
    R.materialize_hourly(spark, "unused-sf", out_dir=out, rebuild=True, events=ev)
    assert R._VERIFIED_SERVE is None
    # non-rebuild calls must NOT invalidate (steady state keeps the memo)
    R._VERIFIED_SERVE = sentinel
    R.materialize_hourly(spark, "unused-sf", out_dir=out, events=ev)
    assert R._VERIFIED_SERVE == sentinel
    R._VERIFIED_SERVE = None


def test_publish_fast_path_offsets_contiguous_after_coalesce_pin(engine, spark):
    """The single-partition publish fast path pins the executed plan
    with coalesce(1) (r12 ADVICE item 1), so offsets stay contiguous
    0..n-1 regardless of how the write job re-plans the lineage."""
    topic = engine.prepare_topic("pin")
    src = spark.range(7).select(
        F.lit("e").alias("event"), F.col("id").cast("string").alias("message")
    ).coalesce(1)
    topic.publish_df(src)
    offs = [r["offset"] for r in topic.log().select("offset").collect()]
    assert sorted(offs) == list(range(1, 8))


def test_bucketed_source_sig_sees_directory_changes(spark, tmp_path):
    """_source_sig must re-list the source directories from the
    filesystem (r12 ADVICE item 4): a file appearing in the directory
    after the relation was created (and memoized) must change the
    signature even though df.inputFiles() still reports the stale
    captured listing."""
    import json

    from kafkaish_spark.sources.bucketed import ensure_bucketed_layout

    src_dir = tmp_path / "src"
    spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.parquet(str(src_dir))
    df = spark.read.parquet(str(src_dir))  # captures the initial listing

    loc = tmp_path / "layout"
    fp = ("t_sig_probe", lambda d: (d.count(),))
    ensure_bucketed_layout(
        spark, str(loc), [("t_sig_probe", df, "k", "t_sig_probe")], 2, [fp]
    )
    with open(loc / "_manifest.json") as fh:
        sources_before = json.load(fh)["sources"]

    # add a file to the SOURCE directory; the memoized relation's
    # inputFiles() won't see it, the directory listing must
    spark.range(10, 12).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("append").parquet(str(src_dir))
    ensure_bucketed_layout(
        spark, str(loc), [("t_sig_probe", df, "k", "t_sig_probe")], 2, [fp]
    )
    with open(loc / "_manifest.json") as fh:
        sources_after = json.load(fh)["sources"]
    assert sources_after != sources_before
    assert len(sources_after) > len(sources_before)
    spark.sql("DROP TABLE IF EXISTS t_sig_probe")


def test_advised_rank_top_k_prunes_without_changing_qualifying_rows(spark):
    """top_k guarantees every row with rank <= k survives with an
    identical rank value (both strategies), and the two-phase plan gains
    the WindowGroupLimit map-side prune."""
    from kafkaish_spark.functions.advisor import WindowAdvice, advised_rank

    rows = [(g, v, v % 3) for g in ("a", "b") for v in range(40)]
    df = spark.createDataFrame(rows, "g string, v long, noise long")
    two = WindowAdvice("two_phase", "a", 0.5, 0.125)
    plain = WindowAdvice("plain", "a", 0.5, 0.125)
    bucket = F.floor(F.col("v") / 10).cast("long")

    full = advised_rank(df, "g", ["v"], bucket, advice=two)
    k = 15
    want = {
        (r["g"], r["v"], r["rnk"])
        for r in full.collect()
        if r["rnk"] <= k
    }
    for adv in (two, plain):
        pruned = advised_rank(df, "g", ["v"], bucket, advice=adv, top_k=k)
        got = {
            (r["g"], r["v"], r["rnk"])
            for r in pruned.filter(F.col("rnk") <= k).collect()
        }
        assert got == want, adv.strategy

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        advised_rank(df, "g", ["v"], bucket, advice=two, top_k=k).explain(
            "formatted"
        )
    assert "WindowGroupLimit" in buf.getvalue()


def test_logreg_scored_is_row_local(spark):
    """The step-1 scored frame must plan as scan + projections — zero
    Exchange (the r13 rewrite inlines the collected 8-weight vector and
    folds each row's own slice; the old shape shuffled the exploded
    rows x 8 frame on vec_id just to reassemble per-row state)."""
    import io
    from contextlib import redirect_stdout

    from kafkaish_spark.operators.composites22 import _logreg_parts

    scored = _logreg_parts(spark, "/root/testdata/sf0.001")["scored"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        scored.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # scores in [0, 1] with both classes present (sanity of the fold)
    rows = scored.collect()
    assert rows and all(0.0 <= r["s"] <= 1.0 for r in rows)


def test_bench_partition_scrub_handles_nested_parens():
    """The paren-aware scrubber normalizes the partition count at any
    nesting depth (r12 ADVICE item 5) and is idempotent."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _scrub_partition_counts as scrub

    two_level = "hashpartitioning(cast(coalesce(a#3, 0) as bigint), 8)"
    want = "hashpartitioning(cast(coalesce(a#3, 0) as bigint), _)"
    assert scrub(two_level) == want
    assert scrub(want) == want  # idempotent
    assert scrub("SinglePartition") == "SinglePartition"
    assert (
        scrub("rangepartitioning(x#1 ASC NULLS FIRST, 200)")
        == "rangepartitioning(x#1 ASC NULLS FIRST, _)"
    )


def test_bench_json_line_is_slim():
    """The one-line driver contract must not embed the per-query
    diagnostic maps that truncated the r10/r11 captures — they belong
    to the bench_meta.json sidecar (r12 verdict item 1)."""
    import inspect
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    src = inspect.getsource(bench.main)
    # the final print's payload: after the meta sidecar dump, the
    # json.dumps fed to print() must carry the contract keys and not
    # the diagnostic maps
    tail = src[src.rindex("print(") :]
    for key in ('"metric"', '"value"', '"unit"', '"queries"', '"sf"'):
        assert key in tail
    for key in ('"noise_band"', '"plan_changed"', '"first_call_sec"'):
        assert key not in tail
