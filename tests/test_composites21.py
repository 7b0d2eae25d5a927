"""Behavioral tests for the composites21 batch: temperature mixture
and SpaceSaving heavy hitters."""

import collections

import pyspark.sql.functions as F


def test_temperature_flattens_the_mixture(spark, sf_dir):
    """T=0.5 must move every domain's share toward uniform: larger
    domains get repeat_factor < 1, smaller ones > 1, and the ordering
    of shares is preserved."""
    from kafkaish_spark.operators.composites21 import q_sample_temperature

    rows = q_sample_temperature(spark, sf_dir).collect()
    assert len(rows) >= 2
    mean_share = 1.0 / len(rows)
    for r in rows:
        assert abs(r.temp_share - r.share) <= abs(mean_share - r.share) + 1e-9
        if r.share > mean_share:
            assert r.repeat_factor < 1.0
        elif r.share < mean_share * 0.9:
            assert r.repeat_factor > 1.0
    by_share = sorted(rows, key=lambda r: r.share)
    by_temp = sorted(rows, key=lambda r: r.temp_share)
    assert [r.source for r in by_share] == [r.source for r in by_temp]


def test_spacesaving_bounds_and_recall(spark, sf_dir):
    """Sketch invariants: est >= true >= est - err for every reported
    term, and the exact top-5 terms all surface in the sketch top-20."""
    from kafkaish_spark.operators.composites21 import q_sketch_spacesaving_topk
    from kafkaish_spark.sources.tables import load_table

    got = q_sketch_spacesaving_topk(spark, sf_dir).collect()
    assert 0 < len(got) <= 20
    assert [r.rk for r in got] == list(range(1, len(got) + 1))

    exact = collections.Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        exact.update(w for w in r.text.split(" ") if w)

    for r in got:
        true = exact[r.term]
        assert r.est >= true, (r.term, r.est, true)
        assert r.est - r.err <= true, (r.term, r.est, r.err, true)

    top5_exact = [w for w, _ in exact.most_common(5)]
    sketched = {r.term for r in got}
    assert set(top5_exact) <= sketched


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """Spark's InjectRuntimeFilter: when the dimension side of a
    shuffle join is selectively filtered, the optimizer builds a bloom
    filter from the dim keys and applies might_contain() on the FACT
    scan — rows that cannot join are dropped before the shuffle.  At
    100 TB this is the difference between shuffling the whole fact
    table and shuffling the ~matching fraction; the thresholds below
    only exist because the test data is tiny."""
    from kafkaish_spark.sources.tables import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # and the result is still correct
        rows = j.collect()
        assert len(rows) == 1 and rows[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_spacesaving_kernel_invariant_holds_on_adversarial_streams():
    """Pure-python hypothesis check of the SpaceSaving update: after
    ANY weighted stream, every tracked term's true count is inside
    [est - err, est], and any UNTRACKED term's true count is <= the
    smallest tracked est (the eviction guarantee)."""
    import collections

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafkaish_spark.operators.composites21 import spacesaving_update

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from("abcdefghij"),
                st.integers(min_value=1, max_value=9),
            ),
            max_size=200,
        ),
        st.integers(min_value=1, max_value=6),
    )
    def run(stream, cap):
        counters = {}
        true = collections.Counter()
        for term, c in stream:
            true[term] += c
            spacesaving_update(counters, term, c, cap)
        assert len(counters) <= cap
        for term, (est, err) in counters.items():
            assert est >= true[term] >= est - err
        if counters:
            min_est = min(v[0] for v in counters.values())
            for term, cnt in true.items():
                if term not in counters:
                    assert cnt <= min_est

    run()


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Write the fact partitioned by year, join it to a filtered dim
    whose predicate is NOT constant-foldable: the scan must carry a
    DynamicPruningExpression (runtime partition pruning) so only the
    dim-surviving partitions are listed/read.  At 100 TB this is the
    mechanism that turns a date-dim filter into reading 1 partition of
    2500 — table layout (SCALE.md §1) exists to feed it."""
    import pyspark.sql.functions as F

    from kafkaish_spark.sources.tables import load_table

    d = str(tmp_path / "fact_by_year")
    load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate")
    ).write.partitionBy("yr").mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = (
        spark.range(1990, 2003)
        .select(F.col("id").alias("yr2"), (F.col("id") % 7).alias("tag"))
        .filter("tag = 2")
    )
    j = fact.join(dim, fact.yr == dim.yr2).groupBy("yr").count()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()
    rows = j.collect()
    assert [r.yr for r in rows] == [1997]  # only 1997 % 7 == 2 in range
    assert rows[0]["count"] > 0


def test_kmeans_lloyd2_partitions_all_vectors(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import q_embed_kmeans_lloyd2
    from kafkaish_spark.sources.tables import load_table

    rows = q_embed_kmeans_lloyd2(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_vecs  # exact partition
    assert {r.cluster for r in rows} <= set(range(8))
    for r in rows:
        assert r.inertia_micro >= 0
        assert r.movement >= 0.0


def test_pca_power_loadings_are_unit_norm(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import q_embed_pca_power

    rows = q_embed_pca_power(spark, sf_dir).collect()
    assert len(rows) == 64
    norm2 = sum(r.loading * r.loading for r in rows)
    assert abs(norm2 - 1.0) < 1e-3  # rounded loadings, unit eigvec
    eig = {r.eigenvalue for r in rows}
    assert len(eig) == 1 and eig.pop() > 0


def test_logreg_gd2_shape_and_learning_signal(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import q_ml_logreg_gd2

    rows = q_ml_logreg_gd2(spark, sf_dir).collect()
    assert len(rows) == 8
    assert {r.dim for r in rows} == set(range(1, 9))
    n = rows[0].n_rows
    assert all(r.n_rows == n and r.n_correct == rows[0].n_correct for r in rows)
    assert 0 <= rows[0].n_correct <= n
    # step 2 actually moved the weights (gradient is not identically 0)
    assert any(abs(r.w2 - r.w1) > 0 for r in rows)


def test_stump_is_best_unique_and_counts_partition(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import q_ml_stump
    from kafkaish_spark.sources.tables import load_table

    rows = q_ml_stump(spark, sf_dir).collect()
    assert len(rows) == 9
    assert sum(r.is_best for r in rows) == 1
    n = load_table(spark, sf_dir, "orders").count()
    for r in rows:
        assert r.left_pos + r.left_neg + r.right_pos + r.right_neg == n
        assert r.err == min(
            r.left_neg + r.right_pos, r.left_pos + r.right_neg
        )
    best = next(r for r in rows if r.is_best)
    assert best.err == min(r.err for r in rows)


def test_auc_bounds_and_confusion_consistency(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import (
        q_ml_auc,
        q_ml_eval_confusion,
        q_ml_stump,
    )

    auc = q_ml_auc(spark, sf_dir).collect()[0]
    assert 0.0 <= auc.auc <= 1.0
    assert auc.npos > 0 and auc.nneg > 0

    conf = q_ml_eval_confusion(spark, sf_dir).collect()
    assert len(conf) == 1
    c = conf[0]
    best = next(
        r for r in q_ml_stump(spark, sf_dir).collect() if r.is_best
    )
    assert c.cut == best.cut and c.rule == best.rule
    assert c.fp + c.fn == best.err  # misclassifications == stump error
    assert 0.0 <= c.precision_ <= 1.0 and 0.0 <= c.recall_ <= 1.0
    assert c.f1 <= max(c.precision_, c.recall_) + 1e-9


def test_binned_auc_tracks_exact_auc(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import q_ml_auc, q_ml_auc_binned

    exact = q_ml_auc(spark, sf_dir).collect()[0]
    binned = q_ml_auc_binned(spark, sf_dir).collect()[0]
    assert (binned.npos, binned.nneg) == (exact.npos, exact.nneg)
    # binning error is bounded by the mass in mixed bins; step-1
    # scores cluster tightly around 0.5 (weights are one GD step old),
    # so a handful of [0,1]-fixed bins hold most of the mass — measured
    # error at sf0.001 is ~0.02; bound it at 2.5x that.  A production
    # evaluator would bin on score QUANTILES to keep bins balanced.
    assert abs(binned.auc_binned - exact.auc) < 0.05
