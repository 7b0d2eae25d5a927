"""Round-8 wave (operators/composites47.py): query-planning pre-flight
audits — pure-python replays on sf0.001 (the oracle gate re-proves them
vs DuckDB at sf0.01), plus the salted-join equivalence the skew-stress
bench entry rests on."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_broadcast_decision_matches_replay(spark):
    from kafkaish_spark.operators.composites47 import (
        _BROADCAST_BYTES,
        _DIMS,
        q_audit_broadcast_decision,
    )

    want = {}
    for name, _key, payload in _DIMS:
        rows = duckdb.sql(
            f"SELECT {payload} FROM '{SF}/{name}.parquet'"
        ).fetchall()
        est = 8 * len(rows) + sum(len(v.encode()) for (v,) in rows)
        want[name] = (len(rows), est, 1 if est <= _BROADCAST_BYTES else 0)
    got = {
        r["dim_table"]: (r["n_rows"], r["est_bytes"], r["broadcastable"])
        for r in q_audit_broadcast_decision(spark, SF).collect()
    }
    assert got == want
    # every testdata dim fits the 10 MiB threshold at this sf
    assert all(v[2] == 1 for v in want.values())


def test_join_cardinality_estimate_equals_actual_join(spark):
    """The core claim: sum over shared keys of fL(k)*fR(k) IS the
    inner-join row count — verified against the actually-executed
    join for every edge."""
    from kafkaish_spark.operators.composites47 import (
        _EDGES,
        q_audit_join_cardinality,
    )

    got = {
        r["edge"]: r
        for r in q_audit_join_cardinality(spark, SF).collect()
    }
    assert set(got) == {e[0] for e in _EDGES}
    for label, lt, lk, rt, rk in _EDGES:
        actual = duckdb.sql(
            f"SELECT COUNT(*) FROM '{SF}/{lt}.parquet' l "
            f"JOIN '{SF}/{rt}.parquet' r ON l.{lk} = r.{rk}"
        ).fetchone()[0]
        assert got[label]["est_join_rows"] == actual, label
        assert 0.0 <= got[label]["containment"] <= 1.0


def test_top_key_mass_matches_replay(spark):
    from kafkaish_spark.operators.composites47 import (
        _EDGES,
        q_audit_top_key_mass,
    )

    got = {r["edge"]: r for r in q_audit_top_key_mass(spark, SF).collect()}
    for label, _lt, _lk, rt, rk in _EDGES:
        keys = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {rk} FROM '{SF}/{rt}.parquet'"
            ).fetchall()
        ]
        fan = {}
        for k in keys:
            fan[k] = fan.get(k, 0) + 1
        hot_key, hot_rows = min(
            fan.items(), key=lambda kv: (-kv[1], kv[0])
        )
        r = got[label]
        assert (r["hot_key"], r["hot_rows"], r["total_rows"]) == (
            hot_key,
            hot_rows,
            len(keys),
        ), label
        assert r["share"] == round(hot_rows / len(keys), 6)


def test_scan_partition_plan_matches_replay(spark):
    from kafkaish_spark.operators.composites47 import (
        _SCANS,
        _TARGET_PARTITION_BYTES,
        q_audit_scan_partition_plan,
    )

    got = {
        r["fact_table"]: r
        for r in q_audit_scan_partition_plan(spark, SF).collect()
    }
    for name, fixed, payload in _SCANS:
        rows = duckdb.sql(
            f"SELECT {payload} FROM '{SF}/{name}.parquet'"
        ).fetchall()
        est = fixed * len(rows) + sum(len(v.encode()) for (v,) in rows)
        n_parts = max(
            1,
            (est + _TARGET_PARTITION_BYTES - 1) // _TARGET_PARTITION_BYTES,
        )
        r = got[name]
        assert (r["n_rows"], r["est_bytes"], r["n_partitions"]) == (
            len(rows),
            est,
            n_parts,
        ), name
        assert r["rows_per_partition"] == (len(rows) + n_parts - 1) // n_parts


def test_skew_stress_salted_equals_plain_join(spark):
    """The salted join's result is bit-identical to the plain join —
    the equivalence the bench entry and its oracle rest on."""
    from pyspark.sql import functions as F

    from kafkaish_spark.operators.composites46 import (
        q_join_skew_stress_salted,
    )
    from kafkaish_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")

    def hot(col):
        return (
            F.when(F.col(col) % 4 != 0, F.lit(0))
            .otherwise(F.col(col))
            .cast("long")
        )

    fact = li.select(
        hot("l_orderkey").alias("hot_key"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    dim = (
        o.select(hot("o_orderkey").alias("hot_key"))
        .distinct()
        .select("hot_key", (F.col("hot_key") % 7).cast("long").alias("band"))
    )
    plain = {
        r["band"]: (r["n_rows"], r["cents"])
        for r in fact.join(dim, "hot_key")
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("cents"))
        .collect()
    }
    salted = {
        r["band"]: (r["n_rows"], r["cents"])
        for r in q_join_skew_stress_salted(spark, SF).collect()
    }
    assert salted == plain
    # the synthesized key really is pathological: one key carries ~75%
    fan = fact.groupBy("hot_key").count().orderBy(F.desc("count")).first()
    assert fan["hot_key"] == 0
    assert fan["count"] / fact.count() > 0.5
