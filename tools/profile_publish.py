"""Attribute the log-layer publish/replay throughput drift (r7 verdict
item 2: publish fell 33k -> 24.7k msgs/s across r1-r7; replay
562k -> 389k).  Times the FULL publish path, then re-times it with each
per-call feature added since round 1 toggled off (bench-only monkey
patches — never production flags):

- ``no_lock``    : writer_lock replaced by a no-op (r5 single-writer
                   guard + r6/r7 hardening).
- ``no_pin``     : the persist/unpersist pin around offset assignment
                   removed (r3 crash-safety fix for AQE recompute —
                   UNSAFE in production, timing-only here).
- ``no_tail_read``: latest() forced to 0 on the known-empty topic (the
                   per-publish tail lookup is a Spark aggregate job).

The "fingerprint self-heal" and "footer-stat read" hypotheses from the
verdict do NOT appear in the publish path (self-heal is a warehouse-
fixture mechanism in tests; footer stats run in retention/fsck/
offset_for_time only, and the bench topic sets no retention), so the
table proves that negative directly: if no toggle recovers the delta,
the drift is co-tenant noise on an unchanged path.

Each variant is timed REPS times on a FRESH topic directory and the
minimum is reported (same min-of-N methodology as bench.py; the box's
co-tenant band is +/-40%).  Replay is attributed the same way:
log().count() (bare scan) vs replay(since=0).count() (filter+sort plan)
vs replay(event=...).count() (pushed event filter).

Usage: PYTHONPATH=/root/repo python tools/profile_publish.py [n] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources import topic_log  # noqa: E402
from kafkaish_spark.sources.topic_log import Engine  # noqa: E402


def _source(spark, n):
    src = spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 8).cast("string")).alias("event"),
        F.to_json(F.struct(F.col("id").alias("k"))).alias("message"),
    )
    src.count()  # materialize the range generator outside the clock
    return src


@contextlib.contextmanager
def _noop_lock(_root, _what="publish"):
    yield


def _timed_publish(spark, src, n, variant: str) -> float:
    root = tempfile.mkdtemp(prefix=f"kafkaish_prof_{variant}_")
    try:
        eng = Engine(spark, root)
        topic = eng.prepare_topic("bench")
        saved_lock = topic_log.writer_lock
        saved_latest = topic_log.Topic.latest
        saved_persist = None
        try:
            if variant == "no_lock":
                topic_log.writer_lock = _noop_lock
            elif variant == "no_tail_read":
                topic_log.Topic.latest = lambda self: 0
            elif variant == "no_pin":
                from pyspark.sql import DataFrame

                saved_persist = (DataFrame.persist, DataFrame.unpersist)
                DataFrame.persist = lambda self, *a, **k: self
                DataFrame.unpersist = lambda self, *a, **k: self
            t0 = time.perf_counter()
            topic.publish_df(src)
            return time.perf_counter() - t0
        finally:
            topic_log.writer_lock = saved_lock
            topic_log.Topic.latest = saved_latest
            if saved_persist is not None:
                from pyspark.sql import DataFrame

                DataFrame.persist, DataFrame.unpersist = saved_persist
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("kafkaish-publish-profile")
    spark.sparkContext.setLogLevel("ERROR")
    src = _source(spark, n)

    variants = ("full", "no_lock", "no_pin", "no_tail_read")
    # one untimed warm-up so the publish plans' whole-stage codegen /
    # JIT isn't billed to the first variant, then variants INTERLEAVED
    # round-robin so a monotone JIT/page-cache trend can't masquerade
    # as a component cost (the first, sequential version of this table
    # showed exactly that artifact)
    _timed_publish(spark, src, n, "full")
    best: dict[str, float] = {}
    for _ in range(reps):
        for v in variants:
            el = _timed_publish(spark, src, n, v)
            best[v] = min(best.get(v, el), el)
            print(f"# publish {v}: {el:.3f}s", file=sys.stderr)

    # isolated micro-costs of the same components
    root = tempfile.mkdtemp(prefix="kafkaish_prof_micro_")
    eng = Engine(spark, root)
    topic = eng.prepare_topic("bench")
    t0 = time.perf_counter()
    for _ in range(200):
        with topic_log.writer_lock(topic.root):
            pass
    lock_us = (time.perf_counter() - t0) / 200 * 1e6
    topic.publish_df(src)  # fill the log so latest() reads a real tail
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        topic.latest()
        lat.append(time.perf_counter() - t0)

    # replay attribution on the same 100k-row log
    rep: dict[str, float] = {}
    for name, fn in (
        ("bare_scan_count", lambda: topic.log().count()),
        ("replay_since0_count", lambda: topic.replay(since=0).count()),
        ("replay_event_count", lambda: topic.replay(event="e3").count()),
        ("replay_collect", lambda: len(topic.replay(since=0).collect())),
    ):
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            el = time.perf_counter() - t0
            rep[name] = min(rep.get(name, el), el)
            print(f"# replay {name}: {el:.3f}s", file=sys.stderr)
    shutil.rmtree(root, ignore_errors=True)

    full = best["full"]
    print(
        json.dumps(
            {
                "metric": "publish_attribution",
                "n_messages": n,
                "method": f"min-of-{reps}, fresh topic per run",
                "publish_msgs_per_sec": {
                    v: round(n / s) for v, s in best.items()
                },
                "publish_sec": {v: round(s, 3) for v, s in best.items()},
                "component_cost_sec": {
                    v: round(full - s, 3)
                    for v, s in best.items()
                    if v != "full"
                },
                "lock_acquire_release_usec": round(lock_us, 1),
                "latest_tail_read_sec_min": round(min(lat), 3),
                "replay_sec": {k: round(s, 3) for k, s in rep.items()},
                "replay_msgs_per_sec": {
                    k: round(n / s) for k, s in rep.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
