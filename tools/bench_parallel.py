"""Multi-file scan-parallelism evidence (r9 verdict item 3).

Every driver-generated testdata parquet is a SINGLE row group in a
single file (BASELINE.md r1 note), so every bench scan is one task and
local[32] parallelism is never exercised on the scan leg — the weakest
link in the engine's "scans fan out at 100 TB" claim.  This tool makes
the evidence direct:

1. re-materialize the bench sf into an N-file-per-table layout in a
   temp dir (a round-robin repartition write — what any real cluster
   load produces),
2. run the bench headliners against BOTH layouts, interleaved
   min-of-REPS (the bench.py methodology),
3. report per-query and total timings plus whether each query's
   normalized plan matches the committed bench_plans/ snapshot (it
   should: file layout must change TASK COUNT, never the plan).

Usage: PYTHONPATH=/root/repo python tools/bench_parallel.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_PAR_FILES (default 8), SPARK_GRAFT_PAR_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from kafkaish_spark.plans.registry import all_queries  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources.tables import TABLES, load_table  # noqa: E402


def rematerialize(spark, src: str, n_files: int) -> str:
    """Write every table as ``n_files`` parquet parts under a temp dir
    whose basename matches the source (fixture roots key on it)."""
    root = tempfile.mkdtemp(prefix="kafkaish_par_")
    dst = os.path.join(root, os.path.basename(src.rstrip("/")))
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        df = load_table(spark, src, name)
        # round-robin: N near-equal parts, the layout a parallel loader
        # produces.  Tiny dims produce some empty parts — harmless.
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    return dst


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("SPARK_GRAFT_PAR_FILES", "8"))
    reps = int(os.environ.get("SPARK_GRAFT_PAR_REPS", "2"))
    spark = get_spark("kafkaish-bench-parallel")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in all_queries().items() if s.bench}
    multi = rematerialize(spark, src, n_files)
    print(f"# rematerialized {src} -> {multi} ({n_files} files/table)",
          file=sys.stderr)
    try:
        _run(spark, specs, src, multi, n_files, reps)
    finally:
        # never leak the multi-GB rematerialized tree, even when a
        # timed rep raises
        shutil.rmtree(os.path.dirname(multi), ignore_errors=True)


def _run(spark, specs, src, multi, n_files, reps) -> None:

    # bench.py's two warm-up tiers: codegen at the tiny sf, then an
    # untimed DataFrame build per layout so one-time per-root fixture
    # work (CDC validation, advisor measurements) stays untimed
    for name, spec in sorted(specs.items()):
        for d in ("/root/testdata/sf0.001", src, multi):
            try:
                df = spec.fn(spark, d)
                if d == "/root/testdata/sf0.001":
                    df.write.mode("overwrite").format("noop").save()
            except Exception as ex:
                print(f"# warmup {name}@{d} skipped: {ex}", file=sys.stderr)

    names = sorted(specs)
    samples = {lay: {n: [] for n in names} for lay in ("single", "multi")}
    for rep in range(reps):
        shift = (rep * 7) % max(len(names), 1)
        for name in names[shift:] + names[:shift]:
            # adjacent single/multi runs of the SAME query: a co-tenant
            # burst taxes both layouts alike, so the per-query delta
            # survives the noise the totals can't dodge
            for lay, d in (("single", src), ("multi", multi)):
                t0 = time.perf_counter()
                specs[name].fn(spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples[lay][name].append(time.perf_counter() - t0)

    timings = {
        lay: {n: round(min(v), 4) for n, v in per.items()}
        for lay, per in samples.items()
    }
    plan_same: dict[str, bool | None] = {}
    for name, spec in sorted(specs.items()):
        snap = os.path.join(bench._PLAN_DIR, f"{name}.txt")
        try:
            got = bench._normalized_plan(spec.fn(spark, multi))
            with open(snap) as fh:
                plan_same[name] = fh.read() == got
        except Exception:
            plan_same[name] = None

    single_total = round(sum(timings["single"].values()), 4)
    multi_total = round(sum(timings["multi"].values()), 4)
    print(
        json.dumps(
            {
                "metric": "multi_file_scan_compare",
                "value": multi_total,
                "unit": "sec",
                "files_per_table": n_files,
                "single_total_sec": single_total,
                "multi_total_sec": multi_total,
                "speedup": round(single_total / multi_total, 3)
                if multi_total
                else None,
                "queries": {
                    n: {
                        "single": timings["single"][n],
                        "multi": timings["multi"][n],
                    }
                    for n in names
                },
                "plan_same_as_committed": plan_same,
                "method": f"min-of-{reps}-interleaved-adjacent-layouts",
                "sf": _sf_of(src),
            }
        )
    )


def _sf_of(src: str) -> float | None:
    try:
        return float(os.path.basename(src.rstrip("/")).removeprefix("sf"))
    except ValueError:  # non-sfX dir name: report null, never crash
        return None


if __name__ == "__main__":
    main()
