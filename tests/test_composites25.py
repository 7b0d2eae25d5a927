"""Retrieval-eval, calibration, and triangle-count kernels
(composites25)."""

from itertools import combinations

from pyspark.sql import functions as F


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    """The degree-oriented wedge count must equal a pure-python
    enumeration of the same co-purchase graph."""
    from kafkaish_spark.operators.composites25 import q_graph_triangle_count
    from kafkaish_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c  # a < b < c canonical
    )
    wedges = sum(d * (d - 1) // 2 for d in map(len, adj.values()))

    row = q_graph_triangle_count(spark, sf_dir).first()
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert abs(row.global_clustering - round(3.0 * tri / wedges, 6)) < 1e-9


def test_triangle_plan_has_no_cartesian_product(spark, sf_dir):
    from kafkaish_spark.operators.composites25 import q_graph_triangle_count

    plan = (
        q_graph_triangle_count(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan


def test_retrieval_metrics_bounds_and_consistency(spark, sf_dir):
    from kafkaish_spark.operators.composites25 import (
        _K,
        q_retrieval_eval_topk,
    )

    rows = q_retrieval_eval_topk(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.hits_at10 <= _K
        assert 0.0 <= r.recall_at10 <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        if r.n_same > 0:
            assert 0.0 <= r.ndcg_at10 <= 1.0
        # perfect-prefix consistency: a full top-k of hits means the
        # DCG numerator saturates min(k, n_same) ranks
        if r.hits_at10 == min(_K, r.n_same):
            assert r.ndcg_at10 == 1.0
        # any hit at rank 1 pins MRR
        if r.mrr == 1.0:
            assert r.hits_at10 >= 1


def test_calibration_bins_partition_the_scored_rows(spark, sf_dir):
    from kafkaish_spark.operators.composites22 import _logreg_parts
    from kafkaish_spark.operators.composites25 import q_ml_calibration_bins

    bins = q_ml_calibration_bins(spark, sf_dir).collect()
    total = _logreg_parts(spark, sf_dir)["scored"].count()
    assert sum(r.n for r in bins) == total
    for r in bins:
        assert 0 <= r.bin <= 9
        assert 0 <= r.n_pos <= r.n
        assert abs(r.frac_pos - round(r.n_pos / r.n, 6)) < 1e-9
        # mean predicted prob must live inside the bin's value range
        # (1e-6 slack for the micro-grid quantization)
        assert r.bin / 10 - 1e-6 <= r.mean_pred <= (r.bin + 1) / 10 + 1e-6


def test_matryoshka_overlap_bounds_and_self_consistency(spark, sf_dir):
    """Overlap is in [0, 10]; truncating to the FULL width must give
    overlap 10 for every query (sanity of the two-ranking machinery)."""
    from kafkaish_spark.operators import composites25 as c25

    rows = c25.q_retrieval_matryoshka_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.overlap_at10 <= c25._K
        assert abs(r.overlap_frac - round(r.overlap_at10 / c25._K, 6)) < 1e-9
    # monkeypatch-free self check: rebuild with _MRL_DIMS = 64 (full)
    orig = c25._MRL_DIMS
    try:
        c25._MRL_DIMS = 64
        full = c25.q_retrieval_matryoshka_overlap(spark, sf_dir).collect()
    finally:
        c25._MRL_DIMS = orig
    assert all(r.overlap_at10 == c25._K for r in full)
