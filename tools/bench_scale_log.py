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
- ``replay_tail_s``  — count of a FIXED-size tail (the last base-chunk
  of rows) via ``replay(since=latest-CHUNK)``.  The offset predicate
  pushes down to parquet row-group stats, so segments entirely below
  ``since`` are skipped on their footers — time should stay ~flat
  while the topic grows 16x.
- ``replay_full_s``  — count of the WHOLE log: the deliberately linear
  control the tail number is judged against.

Topics are built from ``CHUNK``-row publishes (one segment file each),
so topic size and file count grow together — 1x/4x/16x data = 4/16/64
segments, exactly how a long-lived topic accretes.  Each metric is
min-of-REPS on a warmed session (bench.py's rule).  The tail replay's
physical plan is checked for the pushed offset filter and the result
row count is asserted, so a silently-broken pushdown fails loudly
instead of reporting a fast wrong answer.

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
        F.to_json(F.struct(F.col("id").alias("k"))).alias("message"),
    )


def _build_topic(engine, spark, name: str, n_chunks: int):
    topic = engine.prepare_topic(name)
    for i in range(n_chunks):
        topic.publish_df(_chunk_df(spark, i * CHUNK), target_files=1)
    return topic


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
        warm.replay(since=warm.latest() - 1000).count()
        warm.log().count()

        rows = []
        for scale in SCALES:
            n_chunks = BASE_CHUNKS * scale
            topic = _build_topic(engine, spark, f"t{scale}x", n_chunks)
            n_rows = n_chunks * CHUNK + 1  # +1: publish_one below appends

            publish_one_s = _min_of(
                lambda: topic.publish("e0", {"k": -1}), reps=1
            )
            n_rows = topic.latest()
            latest_s = _min_of(topic.latest)

            since = n_rows - CHUNK
            tail = topic.replay(since=since)
            plan = tail._jdf.queryExecution().executedPlan().toString()
            pushed = "offset" in plan and "PushedFilters" in plan

            got = {"n": None}

            def _count_tail():
                got["n"] = tail.count()

            replay_tail_s = _min_of(_count_tail)
            assert got["n"] == CHUNK, (got["n"], CHUNK)

            replay_full_s = _min_of(lambda: topic.log().count())

            rows.append(
                {
                    "scale": scale,
                    "rows": n_rows,
                    "segments": n_chunks,
                    "publish_one_s": publish_one_s,
                    "latest_s": latest_s,
                    "replay_tail_s": replay_tail_s,
                    "replay_full_s": replay_full_s,
                    "tail_filter_pushed": pushed,
                }
            )

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
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
