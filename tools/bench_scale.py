"""Weak-scaling evidence: 10x the DATA, same plans, ~linear time
(r10 verdict item 2).

tools/bench_parallel.py proved the scan leg fans out across FILES at
fixed data; this tool supplies the second pillar of the 100 TB story:
grow the data itself 10x and show (a) every headliner's normalized
plan is BYTE-IDENTICAL at both scales (no size-triggered plan cliff),
and (b) per-query time grows ~linearly — anything super-linear is a
hidden driver-side O(n) or a plan that stops scaling.

Method: replicate the bench sf 10x by unioning offset-shifted copies
of the FACT tables (orders/lineitem share one key stride so referential
integrity holds; events/documents/embeddings shift their own ids);
dimension tables stay 1x, exactly like a growing corpus against stable
reference data.  BOTH scales are written with the same
files-per-table, so both scans are fully parallel and the per-task
input simply grows 10x — the cleanest weak-scaling read on a fixed
local[N] box.

Scope (a deliberate, logged cap): headliners whose WORK is linear in
the corpus.  The dedup/near-dup funnels are excluded — replicating
identical documents inflates true duplicate-PAIR counts quadratically
inside each clone group, a data-semantics change that would read as a
plan flaw when it's the input's pair structure.  Their scale story is
the banded/bucketed plan shape itself (SCALE.md).

Usage: PYTHONPATH=/root/repo python tools/bench_scale.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE_REPLICAS (default 10),
     SPARK_GRAFT_SCALE_FILES (default 32),
     SPARK_GRAFT_SCALE_REPS (default 2).
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
from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.plans.registry import all_queries  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources.tables import TABLES, load_table  # noqa: E402

# Linear-work headliners across the operator families: scan+agg, star
# and as-of joins, windows, CDC, iterative ML, ANN top-k, text agg,
# the two-phase global rank (THE driver-side-O(n) suspect), and RRF.
SCALE_QUERIES = [
    "q_agg_pricing_summary",
    "q_star_revenue_by_region",
    "q_tpch_q5_local_supplier",
    "q_cdc_capture_apply_roundtrip",
    "q_window_rank_orders_per_cust",
    "q_join_asof_event_order",
    "q_embed_kmeans_lloyd2",
    "q_sim_topk_embeddings",
    "q_text_tf_top_terms",
    "q_train_global_shuffle",
    "q_rank_rrf_fusion",
]

# fact table -> id column to shift per replica; orders/lineitem share
# the ORDERS stride so l_orderkey keeps referencing o_orderkey
_FACT_KEYS = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _materialize(spark, src: str, replicas: int, n_files: int) -> str:
    """Write every table under a temp dir (basename preserved for
    fixture roots): dims as-is, facts unioned ``replicas`` times with
    key offsets, all at ``n_files`` parts per table."""
    root = tempfile.mkdtemp(prefix=f"kafkaish_scale{replicas}x_")
    dst = os.path.join(root, os.path.basename(src.rstrip("/")))
    os.makedirs(dst, exist_ok=True)
    order_stride = (
        load_table(spark, src, "orders")
        .agg(F.max("o_orderkey"))
        .first()[0]
        + 1
    )
    for name in TABLES:
        df = load_table(spark, src, name)
        key = _FACT_KEYS.get(name)
        if key and replicas > 1:
            stride = (
                order_stride
                if name in ("orders", "lineitem")
                else df.agg(F.max(key)).first()[0] + 1
            )
            out = df
            for i in range(1, replicas):
                out = out.unionByName(
                    df.withColumn(
                        key, (F.col(key) + F.lit(i * stride)).cast("long")
                    )
                )
        else:
            out = df
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    return dst


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
    n_files = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    spark = get_spark("kafkaish-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {
        n: s for n, s in all_queries().items() if n in SCALE_QUERIES
    }
    missing = [n for n in SCALE_QUERIES if n not in specs]
    if missing:
        print(f"# not in registry, skipped: {missing}", file=sys.stderr)

    base = _materialize(spark, src, 1, n_files)
    big = _materialize(spark, src, replicas, n_files)
    print(
        f"# materialized 1x -> {base}, {replicas}x -> {big} "
        f"({n_files} files/table)",
        file=sys.stderr,
    )
    try:
        _run(spark, specs, base, big, src, replicas, n_files, reps)
    finally:
        shutil.rmtree(os.path.dirname(base), ignore_errors=True)
        shutil.rmtree(os.path.dirname(big), ignore_errors=True)


def _run(spark, specs, base, big, src, replicas, n_files, reps) -> None:
    # codegen warm-up at the tiny sf, then an untimed DataFrame build
    # per layout so per-root fixture work (CDC validation, advisor
    # measurement) stays out of the timings — bench.py's methodology
    for name, spec in sorted(specs.items()):
        for d in ("/root/testdata/sf0.001", base, big):
            try:
                df = spec.fn(spark, d)
                if d == "/root/testdata/sf0.001":
                    df.write.mode("overwrite").format("noop").save()
            except Exception as ex:
                print(f"# warmup {name}@{d} skipped: {ex}", file=sys.stderr)

    # keys carry the actual multiplier so a 100x artifact can't read
    # as 10x (review r11)
    tN = f"t{replicas}"
    names = sorted(specs)
    samples = {sc: {n: [] for n in names} for sc in ("t1", tN)}
    for rep in range(reps):
        shift = (rep * 7) % max(len(names), 1)
        for name in names[shift:] + names[:shift]:
            # adjacent 1x/Nx runs of the SAME query: co-tenant bursts
            # tax both scales alike, preserving the per-query ratio
            for sc, d in (("t1", base), (tN, big)):
                t0 = time.perf_counter()
                specs[name].fn(spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples[sc][name].append(time.perf_counter() - t0)

    timings = {
        sc: {n: round(min(v), 4) for n, v in per.items()}
        for sc, per in samples.items()
    }
    plan_same: dict[str, bool | None] = {}
    for name, spec in sorted(specs.items()):
        try:
            p1 = bench._normalized_plan(spec.fn(spark, base))
            p10 = bench._normalized_plan(spec.fn(spark, big))
            plan_same[name] = p1 == p10
        except Exception:
            plan_same[name] = None

    queries = {
        n: {
            "t1": timings["t1"][n],
            tN: timings[tN][n],
            "ratio": round(timings[tN][n] / timings["t1"][n], 2)
            if timings["t1"][n]
            else None,
        }
        for n in names
    }
    superlinear = [
        n
        for n, q in queries.items()
        if q["ratio"] is not None and q["ratio"] > replicas * 1.2
    ]
    print(
        json.dumps(
            {
                "metric": "weak_scaling_compare",
                "value": round(sum(timings[tN].values()), 4),
                "unit": "sec",
                "replicas": replicas,
                "files_per_table": n_files,
                "t1_total_sec": round(sum(timings["t1"].values()), 4),
                f"{tN}_total_sec": round(sum(timings[tN].values()), 4),
                "queries": queries,
                f"plan_same_1x_vs_{replicas}x": plan_same,
                "superlinear": superlinear,
                "method": f"min-of-{reps}-interleaved-adjacent-scales",
                "sf": os.path.basename(src.rstrip("/")),
            }
        )
    )


if __name__ == "__main__":
    main()
