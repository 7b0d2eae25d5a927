"""Headline benchmark for the driver: runs the bench-flagged queries
from the registry at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q_...": sec, ...}, "sf": 0.1}

Each query is timed as a full materialization (count of the result via
a noop write-free action) after one untimed warm-up of the session on a
trivial job, so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafkaish_spark.plans.registry import all_queries  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("kafkaish-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed JIT/codegen warm-up on the TINY sf (not the bench sf):
    # exercises the vectorized parquet reader, whole-stage-codegen hash
    # aggregate, window exec, and shuffle once so their one-time
    # compilation isn't billed to whichever bench query runs first.
    from kafkaish_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    warm = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    warm.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s")
    ).withColumn(
        "r", F.row_number().over(Window.partitionBy("l_returnflag").orderBy("s"))
    ).write.mode("overwrite").format("noop").save()

    specs = {n: s for n, s in all_queries().items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # one full materialization of every row and column, no second
        # pass and no driver-side collect: the noop sink
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
