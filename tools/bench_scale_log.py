"""Log-layer weak scaling: does the pub/sub core stay fast as the
TOPIC grows?

BENCH_scale (tools/bench_scale.py) proves the RELATIONAL engine's
plans are size-invariant; this is the same question for the reference's
actual product surface (steveliles/kafkaish src/topic.js): publish,
latest, tail replay.  The 100 TB claim for a log is specifically that
the hot ops cost O(tail), not O(topic):

- ``publish_one_s``  — one single-message publish against the grown
  topic (the reference's core usage, src/topic.js:25-40).  Cost =
  writer lock + footer-stats ``latest()`` + one tiny write; the only
  size-dependent term is the footer sweep (~0.5 ms/file).
- ``latest_s``       — the footer-stats tail lookup alone.
- ``replay_tail_s``  — full materialization (sum of message byte
  lengths, which forces the payload column decode — a bare count()
  would be answered from parquet metadata and prove nothing) of a
  FIXED-size tail via ``replay(since=latest-CHUNK)``.  The offset
  predicate pushes down to parquet row-group stats, so segments
  entirely below ``since`` are skipped on their footers — time should
  stay ~flat while the topic grows 16x.
- ``replay_full_s``  — the same materialization over the WHOLE log:
  the deliberately linear control the tail number is judged against.

Topics are built from ``CHUNK``-row publishes (one segment file each),
so topic size and file count grow together — 1x/4x/16x data = 4/16/64
segments, exactly how a long-lived topic accretes.  Messages carry a
~100-byte non-constant payload (dictionary-proof) so the decode has
real byte volume.  All topics are built BEFORE any timing and each
metric is min-of-REPS with reps INTERLEAVED across scales (bench.py's
rule — a scale measured only first would eat the session's JIT
warm-up and look slower than a bigger one).  The tail replay's
physical plan is checked for the pushed offset filter and the result
row count is asserted, so a silently-broken pushdown fails loudly
instead of reporting a fast wrong answer.

After the scale rows, the largest topic is compacted back to the base
segment count and ``latest``/``publish`` are re-measured — the
metadata ops are linear in segments, compaction is the product's
answer, and the payoff should be MEASURED, not asserted.

Usage: PYTHONPATH=/root/repo python tools/bench_scale_log.py
Prints one JSON line (committed as BENCH_scale_log_r12.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources.topic_log import Engine  # noqa: E402

CHUNK = 50_000  # rows per publish = rows per segment file
BASE_CHUNKS = 4  # 1x topic = 200k rows in 4 segments
SCALES = (1, 4, 16)
REPS = 3


def _chunk_df(spark, lo: int):
    return spark.range(lo, lo + CHUNK).select(
        F.concat(F.lit("e"), (F.col("id") % 8).cast("string")).alias("event"),
        F.to_json(
            F.struct(
                F.col("id").alias("k"),
                # non-constant ~100B filler: parquet can't dictionary-
                # collapse it, so replay decode moves real bytes
                F.repeat(F.col("id").cast("string"), 16).alias("pad"),
            )
        ).alias("message"),
    )


def _build_topic(engine, spark, name: str, n_chunks: int):
    topic = engine.prepare_topic(name)
    for i in range(n_chunks):
        topic.publish_df(_chunk_df(spark, i * CHUNK), target_files=1)
    return topic


def _decode_all(df) -> int:
    """Force a real replay: decode the payload column of every
    surviving row group (a bare count() is answered from parquet
    metadata and would look flat even with pruning broken)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("message")).alias("b"),
    ).first()
    assert row["b"] is not None
    return int(row["n"])


def _min_of(fn, reps: int = REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 4)


def main() -> None:
    spark = get_spark()
    root = tempfile.mkdtemp(prefix="bench_scale_log_")
    try:
        engine = Engine(spark, root=os.path.join(root, "topics"))

        # untimed warm-up: compile publish/replay/count plans
        warm = _build_topic(engine, spark, "warmup", 1)
        warm.publish("e0", {"k": -1})
        _decode_all(warm.replay(since=warm.latest() - 1000))
        _decode_all(warm.log())

        # build everything before timing anything
        topics = {}
        for scale in SCALES:
            topics[scale] = _build_topic(
                engine, spark, f"t{scale}x", BASE_CHUNKS * scale
            )

        state = {}
        for scale in SCALES:
            topic = topics[scale]
            n_rows = topic.latest()
            tail = topic.replay(since=n_rows - CHUNK)
            plan = tail._jdf.queryExecution().executedPlan().toString()
            state[scale] = {
                "scale": scale,
                "rows": n_rows,
                "segments": BASE_CHUNKS * scale,
                "tail_df": tail,
                "tail_filter_pushed": (
                    "offset" in plan and "PushedFilters" in plan
                ),
                "replay_tail_s": float("inf"),
                "replay_full_s": float("inf"),
                "latest_s": float("inf"),
                "publish_one_s": None,
            }
            assert _decode_all(tail) == CHUNK  # untimed, also warms

        # timed reps, interleaved across scales
        for _ in range(REPS):
            for scale in SCALES:
                s, topic = state[scale], topics[scale]
                t0 = time.monotonic()
                n = _decode_all(s["tail_df"])
                s["replay_tail_s"] = min(
                    s["replay_tail_s"], time.monotonic() - t0
                )
                assert n == CHUNK
                t0 = time.monotonic()
                _decode_all(topic.log())
                s["replay_full_s"] = min(
                    s["replay_full_s"], time.monotonic() - t0
                )
                t0 = time.monotonic()
                topic.latest()
                s["latest_s"] = min(s["latest_s"], time.monotonic() - t0)

        # single-message publish last (it appends): one timed shot per
        # scale — the build phase already compiled this exact path
        for scale in SCALES:
            t0 = time.monotonic()
            topics[scale].publish("e0", {"k": -1})
            state[scale]["publish_one_s"] = round(time.monotonic() - t0, 4)

        # compaction payoff on the LARGEST topic: the metadata ops are
        # linear in segment count, and compaction is the product's
        # answer — measure that the compacted 64-segment topic really
        # returns to (near) the small-topic row instead of asserting it
        big = topics[SCALES[-1]]
        t0 = time.monotonic()
        big.compact(target_files=BASE_CHUNKS)
        compact_s = round(time.monotonic() - t0, 4)
        seg_after = sum(
            1
            for _d, _s, files in os.walk(big.log_dir)
            for f in files
            if f.startswith("part-") and f.endswith(".parquet")
        )
        latest_after = _min_of(big.latest)
        t0 = time.monotonic()
        big.publish("e0", {"k": -2})
        publish_after = round(time.monotonic() - t0, 4)
        post_compact = {
            "compact_s": compact_s,
            "segments_after": seg_after,
            "latest_s_after": latest_after,
            "publish_one_s_after": publish_after,
        }

        rows = []
        for scale in SCALES:
            s = state[scale]
            s.pop("tail_df")
            for m in ("replay_tail_s", "replay_full_s", "latest_s"):
                s[m] = round(s[m], 4)
            rows.append(s)

        by = {r["scale"]: r for r in rows}
        ratios = {
            m: round(by[16][m] / by[1][m], 2) if by[1][m] > 0 else None
            for m in (
                "publish_one_s",
                "latest_s",
                "replay_tail_s",
                "replay_full_s",
            )
        }
        print(
            json.dumps(
                {
                    "metric": "log_weak_scaling",
                    "unit": "sec",
                    "chunk_rows": CHUNK,
                    "sizes": rows,
                    "ratio_16x_over_1x": ratios,
                    "post_compact_16x": post_compact,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
