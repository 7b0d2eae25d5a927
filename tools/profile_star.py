"""Attribute the star join's weak-scaling tail (VERDICT r11 item 3).

BENCH_scale_r11 showed q_star_revenue_by_region as the most data-bound
row at 100x (13.5x wall at 100x data).  This tool decomposes the query
into cumulative legs and times each at 1x and Nx so the tail can be
attributed to a specific hop, then measures the BUCKETED-LAYOUT
alternative for the fact-fact hop (lineitem JOIN orders pre-bucketed
on the order key — the q_layout_bucketed_join machinery), the layout
a 100 TB deployment would pay once and amortize over every nightly
star rollup.

Legs (cumulative, each ends in a tiny aggregate so scan/join work
dominates the timing, not result transfer):
  scan_l      lineitem scan + 1-row aggregate (pure scan leg)
  join_lo     lineitem JOIN orders             (the fact-fact shuffle)
  join_loc    + customer                       (fact-dim shuffle/bcast)
  full_star   the registered query             (+ advisor dims + rollup)
  bucketed_lo the fact-fact hop over bucketBy(orderkey) tables
              (zero runtime exchange on both sides; bucket layout cost
              reported separately as bucket_write_sec)

Usage: PYTHONPATH=/root/repo python tools/profile_star.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_SCALE_REPLICAS (default 100),
     SPARK_GRAFT_SCALE_FILES (default 32),
     SPARK_GRAFT_SCALE_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_scale import _materialize  # noqa: E402
from kafkaish_spark.plans.registry import all_queries  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources.tables import load_table  # noqa: E402


def _legs(spark, d: str, star_fn) -> dict:
    l = load_table(spark, d, "lineitem")
    o = load_table(spark, d, "orders")
    c = load_table(spark, d, "customer")
    return {
        "scan_l": l.agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        ),
        "join_lo": l.join(o, l.l_orderkey == o.o_orderkey).agg(
            F.count(F.lit(1))
        ),
        "join_loc": l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .agg(F.count(F.lit(1))),
        "full_star": star_fn(spark, d),
    }


def _bucketed_lo(spark, d: str, tag: str, n_buckets: int) -> tuple:
    """Write lineitem/orders bucketed on the order key; return
    (joined-agg frame, layout write seconds)."""
    t_l, t_o = f"star_l_{tag}", f"star_o_{tag}"
    t0 = time.perf_counter()
    for name, df, key in (
        (t_l, load_table(spark, d, "lineitem"), "l_orderkey"),
        (t_o, load_table(spark, d, "orders"), "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(n_buckets, key).sortBy(key).mode(
            "overwrite"
        ).saveAsTable(name)
        spark.sql(f"REFRESH TABLE {name}")
    write_sec = time.perf_counter() - t0
    l = spark.table(t_l)
    o = spark.table(t_o)
    frame = (
        l.hint("merge")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)))
    )
    return frame, write_sec


def _time(frame, reps: int) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        frame.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "100"))
    n_files = int(os.environ.get("SPARK_GRAFT_SCALE_FILES", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
    spark = get_spark("kafkaish-profile-star")
    spark.sparkContext.setLogLevel("ERROR")
    star_fn = all_queries()["q_star_revenue_by_region"].fn

    tN = f"t{replicas}"
    out: dict = {"metric": "star_join_profile", "replicas": replicas,
                 "files_per_table": n_files, "legs": {}}
    base = big = None
    try:
        # inside the try (review r12): a mid-write failure at 100x —
        # the likeliest place to hit disk-full — must still clean the
        # already-written 1x dir and the partial 100x dir
        base = _materialize(spark, src, 1, n_files)
        big = _materialize(spark, src, replicas, n_files)
        for sc, d in (("t1", base), (tN, big)):
            legs = _legs(spark, d, star_fn)
            for name, frame in legs.items():
                frame.write.mode("overwrite").format("noop").save()  # warm
                out["legs"].setdefault(name, {})[sc] = _time(frame, reps)
            bframe, wsec = _bucketed_lo(spark, d, sc, n_files)
            bframe.write.mode("overwrite").format("noop").save()
            out["legs"].setdefault("bucketed_lo", {})[sc] = _time(
                bframe, reps
            )
            out["legs"].setdefault("bucket_write_sec", {})[sc] = round(
                wsec, 4
            )
            n_exch = (
                bframe._jdf.queryExecution().executedPlan().toString()
            ).count("Exchange")
            out["legs"].setdefault("bucketed_lo_exchanges", {})[sc] = n_exch
        for name, row in out["legs"].items():
            if "t1" in row and tN in row and row["t1"]:
                row["ratio"] = round(row[tN] / row["t1"], 2)
        print(json.dumps(out))
    finally:
        # drop the managed bucketed tables too — saveAsTable wrote
        # their (at 100x: multi-GB) bucket files into the warehouse,
        # and a profiling tool must not accumulate them run over run
        for sc in ("t1", tN):
            for name in (f"star_l_{sc}", f"star_o_{sc}"):
                try:
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                except Exception:
                    pass
        for d in (base, big):
            if d is not None:
                shutil.rmtree(os.path.dirname(d), ignore_errors=True)


if __name__ == "__main__":
    main()
