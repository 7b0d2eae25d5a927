"""Round-12 wave (operators/composites61.py): the bucketed star rollup
— VERDICT r11 item 3's fact-fact zero-exchange layout."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_star_fact_join_has_no_fact_side_exchange(spark):
    """The profiled tail (tools/profile_star.py: the l-o shuffle is 30x
    at 100x data) must be GONE in the bucketed variant: the fact-fact
    SortMergeJoin consumes both bucketed scans directly — no Exchange
    may feed either fact side.  Downstream exchanges (dimension hop,
    rollup) are expected and allowed."""
    from kafkaish_spark.operators.composites61 import (
        _star_bucketed_tables,
    )

    t_l, t_o = _star_bucketed_tables(spark, SF)
    l = spark.table(t_l)
    o = spark.table(t_o)
    joined = (
        l.hint("merge")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]
    # the only Exchange is the 1-row final aggregate, never a join side
    assert len(exchanges) == 1 and "SinglePartition" in exchanges[0], plan


def test_bucketed_star_matches_shuffled_twin(spark):
    """Identical results to q_star_revenue_by_region — different
    physical contract, same answer (both also oracle-checked)."""
    from kafkaish_spark.operators.composites61 import (
        q_star_revenue_bucketed,
    )
    from kafkaish_spark.operators.relational import (
        q_star_revenue_by_region,
    )

    got = {
        (r["r_name"], r["n_lines"], r["revenue"])
        for r in q_star_revenue_bucketed(spark, SF).collect()
    }
    want = {
        (r["r_name"], r["n_lines"], r["revenue"])
        for r in q_star_revenue_by_region(spark, SF).collect()
    }
    assert got == want and len(got) > 0


def test_bucketed_star_layout_self_heals(spark, tmp_path):
    """Deleting the on-disk layout rebuilds it on next use (fingerprint
    mismatch path); a second call reuses the valid files without a
    rewrite (mtime unchanged)."""
    import os
    import shutil

    from kafkaish_spark.operators import composites61 as c61

    t_l, _t_o = c61._star_bucketed_tables(spark, SF)
    tag = "sf0_001"
    loc_root = os.path.join(
        c61._REPO_ROOT, "spark-warehouse", "_bkt_star", tag
    )
    assert os.path.isdir(os.path.join(loc_root, "lineitem"))
    probe = sorted(
        os.path.getmtime(os.path.join(loc_root, "lineitem", f))
        for f in os.listdir(os.path.join(loc_root, "lineitem"))
        if f.endswith(".parquet")
    )
    # reuse path: no rewrite
    c61._star_bucketed_tables(spark, SF)
    probe2 = sorted(
        os.path.getmtime(os.path.join(loc_root, "lineitem", f))
        for f in os.listdir(os.path.join(loc_root, "lineitem"))
        if f.endswith(".parquet")
    )
    assert probe == probe2
    # heal path: wipe the files, next call rebuilds and the query runs
    shutil.rmtree(loc_root)
    spark.sql(f"DROP TABLE IF EXISTS {t_l}")  # stale catalog entry too
    rows = c61.q_star_revenue_bucketed(spark, SF).collect()
    assert len(rows) > 0
