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

    # warm up JVM / codegen / parquet footer cache outside the clock
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    specs = {n: s for n, s in all_queries().items() if s.bench}
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        # materialize every row/column, not just count: write-free action
        n = df.count()
        _ = df.limit(1).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

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
