"""Log-layer throughput bench: publish / replay / streaming-drain rates.

The reference (steveliles/kafkaish) publishes no numbers; its only
envelope is ~10 messages publish+replay < 65 s on localhost mongod
(test/topic.js:223) and one-doc-at-a-time delivery (src/topic.js:81).
This measures our equivalents at meaningful sizes.

Usage: PYTHONPATH=/root/repo python tools/bench_log.py [n_messages]
Prints one JSON line.
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("kafkaish-log-bench")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="kafkaish_logbench_")
    eng = Engine(spark, root)
    topic = eng.prepare_topic("bench")

    src = spark.range(n).select(
        F.concat(F.lit("e"), (F.col("id") % 8).cast("string")).alias("event"),
        F.to_json(F.struct(F.col("id").alias("k"))).alias("message"),
    )
    src.count()  # materialize the generator outside the clock

    t0 = time.perf_counter()
    topic.publish_df(src)
    publish_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    assert topic.replay(since=0).count() == n
    replay_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    assert topic.replay(event="e3").count() == n // 8
    replay_filtered_s = time.perf_counter() - t0

    # streaming drain: full backlog through a checkpointed query
    drained = {"rows": 0}

    def sink(df, _bid):
        drained["rows"] += df.count()

    t0 = time.perf_counter()
    q = (
        topic.stream()
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(root, "drain_ck"))
        .start()
    )
    q.awaitTermination()
    drain_s = time.perf_counter() - t0
    assert drained["rows"] == n

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "log_layer_throughput",
                "n_messages": n,
                "publish_msgs_per_sec": round(n / publish_s),
                "replay_msgs_per_sec": round(n / replay_s),
                "replay_filtered_sec": round(replay_filtered_s, 3),
                "stream_drain_msgs_per_sec": round(n / drain_s),
            }
        )
    )


if __name__ == "__main__":
    main()
