"""Split each bench query's timed cost into PLAN-BUILD time (the
``fn(spark, sf)`` call — driver-side analysis plus any eager jobs the
builder runs: fixture validation, advisor probes, centroid collects)
and EXECUTION time (the noop write).  bench.py times the sum; this
tells the optimizer which half to attack (guide §1).

Usage: python tools/profile_fn.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkaish_spark.plans.registry import all_queries  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    spark = get_spark("profile-fn")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {
        n: s
        for n, s in all_queries().items()
        if s.bench and (not only or n in only)
    }
    # identical protocol to bench.py: tiny-sf codegen warm-up, then an
    # untimed target-sf prebuild, then interleaved reps
    warm = "/root/testdata/sf0.001"
    for name, spec in sorted(specs.items()):
        try:
            spec.fn(spark, warm).write.mode("overwrite").format("noop").save()
        except Exception as ex:
            print(f"# warmup {name} skipped: {ex}", file=sys.stderr)
    for name, spec in sorted(specs.items()):
        try:
            spec.fn(spark, sf_dir)
        except Exception as ex:
            print(f"# prebuild {name} skipped: {ex}", file=sys.stderr)

    REPS = 3
    names = sorted(specs)
    build: dict[str, list[float]] = {n: [] for n in names}
    execu: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(REPS):
        shift = (rep * 7) % max(len(names), 1)
        for name in names[shift:] + names[:shift]:
            spark.sparkContext.setJobDescription(f"profile_fn {name}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build[name].append(t1 - t0)
            execu[name].append(t2 - t1)
    spark.sparkContext.setJobDescription(None)

    print(f"{'query':42s} {'build(min)':>10s} {'exec(min)':>10s} {'total':>8s}")
    rows = sorted(
        names, key=lambda n: -(min(build[n]) + min(execu[n]))
    )
    for n in rows:
        b, e = min(build[n]), min(execu[n])
        print(f"{n:42s} {b:10.3f} {e:10.3f} {b + e:8.3f}")


if __name__ == "__main__":
    main()
