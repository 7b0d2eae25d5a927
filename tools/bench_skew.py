"""Skew-stress bench (r7 verdict item 5): the same deliberately
hot-keyed join as q_join_skew_stress_salted — ~75% of lineitem rows
collapsed onto ONE synthesized join key — measured three ways at the
bench sf, with the q_audit_join_key_skew fanout histogram printed
alongside so the MEASUREMENT that gates the remedy and the REMEDY
itself appear in one report:

- ``plain``    : unsalted sort-merge join, AQE skew split disabled —
                 the straggler shape (one task sorts 3/4 of the fact).
- ``aqe_skew`` : unsalted, AQE skew-join split enabled with the
                 skew thresholds lowered to fire at bench scale
                 (defaults are 256 MB — sized for production, not
                 sf0.1).
- ``salted``   : functions.skew.salted_join spreading the hot key over
                 16 (key, salt) buckets — the portable fix that also
                 works where AQE can't (bucketed/stream joins).

All three aggregate to the identical 7-row result (asserted).  Timing
is min-of-REPS after an untimed warm-up, same rule as bench.py.

Measured finding (r8, plans inspected): AQE's skew split NEVER fires
on this query — zero ``skew=true`` markers even with
forceOptimizeSkewedJoin — because ``OptimizeSkewedJoin`` pattern-
matches exactly ``SMJ(Sort(ShuffleStage), Sort(ShuffleStage))``, and
here the dimension side reaches the join pre-partitioned through its
DISTINCT aggregation (Sort(HashAggregate(ShuffleStage))): the reused
exchange that makes the plan cheap also makes it invisible to the skew
rule.  That is the deeper version of "AQE can't always save you":
any join whose input is already partitioned by an upstream aggregate,
bucketed scan, or stream falls outside the rule, while salting works
on all of them.  Recorded numbers at sf0.1 x20 amplification (12M fact
rows, 75% on one key), measured with per-variant conf RESET (the first
run let aqe_skew's lowered advisory sizes leak into the other
variants): plain 4.48 s / aqe 4.54 s (no split — noise) / salted
3.31 s (1.35x; the gap is the hot reducer's serial sort+merge, and it
widens with scale because the hot task grows linearly while the salted
tasks stay ~1/16th).

Usage: PYTHONPATH=/root/repo python tools/bench_skew.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.functions.skew import salted_join  # noqa: E402
from kafkaish_spark.session import get_spark  # noqa: E402
from kafkaish_spark.sources.tables import load_table  # noqa: E402

REPS = 3
SALTS = 16
# sf0.1's 600k fact rows sort in milliseconds, so the hot reducer never
# becomes the critical path (first run of this tool: all variants tied
# at ~0.6s).  The multiplier replicates each fact row AMPLIFY times —
# 12M rows, ~9M on the hot key — so the single-task sort the plain
# variant forces is actually visible against 32 cores.
AMPLIFY = 20


def _hot(col: str):
    return (
        F.when(F.col(col) % 4 != 0, F.lit(0)).otherwise(F.col(col)).cast("long")
    )


def _frames(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # repartition BEFORE the amplifying explode: the sf0.1 parquet is
    # one small file (3-4 input splits), so without this every variant
    # bottlenecks identically on 3-4 generator tasks and the join-side
    # skew never becomes the critical path
    fact = li.repartition(32).select(
        _hot("l_orderkey").alias("hot_key"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.explode(F.sequence(F.lit(1), F.lit(AMPLIFY))).alias("rep"),
    ).drop("rep")
    dim = (
        o.select(_hot("o_orderkey").alias("hot_key"))
        .distinct()
        .select("hot_key", (F.col("hot_key") % 7).cast("long").alias("band"))
    )
    return fact, dim


def _rollup(joined):
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("cents")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kafkaish-skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = _frames(spark, sf_dir)

    # the gating measurement: fanout histogram of the synthesized key
    hist = (
        fact.groupBy("hot_key")
        .agg(F.count(F.lit(1)).alias("k"))
        .orderBy(F.col("k").desc())
        .limit(5)
        .collect()
    )
    n_fact = fact.count()
    fanout_top = [
        {"hot_key": r["hot_key"], "rows": r["k"], "share": round(r["k"] / n_fact, 4)}
        for r in hist
    ]

    def plain():
        return _rollup(fact.join(dim.hint("merge"), "hot_key"))

    def aqe_skew():
        return _rollup(fact.join(dim.hint("merge"), "hot_key"))

    def salted():
        return _rollup(
            salted_join(fact, dim, "hot_key", salt_buckets=SALTS, dim_hint="merge")
        )

    confs = {
        "plain": {"spark.sql.adaptive.skewJoin.enabled": "false"},
        "aqe_skew": {
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # production thresholds (256 MB / 5x) never fire at sf0.1;
            # lower them so the split mechanism actually engages
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        },
        "salted": {"spark.sql.adaptive.skewJoin.enabled": "false"},
    }
    saved = {
        k: spark.conf.get(k, None)
        for cs in confs.values()
        for k in cs
    }

    def apply_confs(name: str) -> None:
        # restore the FULL baseline first, then apply only this
        # variant's keys: without the restore, aqe_skew's lowered
        # advisory/threshold values leak into every later plain and
        # salted run (review r8 — the first recorded numbers measured
        # that contaminated configuration)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for k, v in confs[name].items():
            spark.conf.set(k, v)

    builders = {"plain": plain, "aqe_skew": aqe_skew, "salted": salted}

    # warm-up: compile each variant's codegen once, untimed
    for name, build in builders.items():
        apply_confs(name)
        build().write.mode("overwrite").format("noop").save()

    best: dict[str, float] = {}
    results: dict[str, list] = {}
    for _ in range(REPS):
        for name, build in builders.items():
            apply_confs(name)
            t0 = time.perf_counter()
            df = build()
            df.write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            best[name] = min(best.get(name, el), el)
            print(f"# {name}: {el:.3f}s", file=sys.stderr)
            results[name] = sorted(
                (r["band"], r["n_rows"], r["cents"]) for r in df.collect()
            )
    for k, v in saved.items():  # restore session confs
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)

    assert results["plain"] == results["aqe_skew"] == results["salted"], (
        "variants disagree"
    )
    print(
        json.dumps(
            {
                "metric": "skew_stress_join",
                "sf_dir": sf_dir,
                "n_fact_rows": n_fact,
                "fanout_top": fanout_top,
                "method": f"min-of-{REPS}, warmed, identical results asserted",
                "seconds": {k: round(v, 3) for k, v in best.items()},
                "speedup_vs_plain": {
                    k: round(best["plain"] / v, 2) for k, v in best.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
