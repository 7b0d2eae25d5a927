"""Behavioral tests for the composites19/20 batches: reservoir sample,
salted aggregation, matview refresh, snapshot diff, Benford audit,
MERGE upsert, and MMR re-ranking."""

import numpy as np
import pyspark.sql.functions as F


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    """The grouped-map MMR must equal a from-scratch numpy greedy over
    the same top-20 candidate set (rel rounded to 6dp, id tiebreak)."""
    from kafkaish_spark.operators.composites20 import (
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAMBDA,
        q_sim_mmr_rerank,
    )
    from kafkaish_spark.sources.tables import load_table

    got = {}
    for r in q_sim_mmr_rerank(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.sel_rank, r.vec_id))
    assert set(got) == {0, 1, 2}

    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    for qid in (0, 1, 2):
        qv = vecs[qid]
        qn = np.linalg.norm(qv)
        rel = sorted(
            (
                (
                    round(float(vecs[c] @ qv / (np.linalg.norm(vecs[c]) * qn)), 6),
                    c,
                )
                for c in vecs
                if c != qid
            ),
            key=lambda t: (-t[0], t[1]),
        )[:MMR_CANDIDATES]
        ids = [c for _, c in rel]
        relv = [s for s, _ in rel]
        unit = {c: vecs[c] / np.linalg.norm(vecs[c]) for c in ids}
        selected = []
        while len(selected) < MMR_K and len(selected) < len(ids):
            best_i, best_s = None, None
            for i, c in enumerate(ids):
                if c in selected:
                    continue
                pen = (
                    max(float(unit[c] @ unit[s]) for s in selected)
                    if selected
                    else 0.0
                )
                s = MMR_LAMBDA * relv[i] - (1 - MMR_LAMBDA) * pen
                if best_s is None or s > best_s + 1e-12:
                    best_i, best_s = c, s
            selected.append(best_i)
        want = [(k + 1, c) for k, c in enumerate(selected)]
        assert sorted(got[qid]) == want, f"query {qid}: {got[qid]} != {want}"


def test_mmr_first_pick_is_top_relevance(spark, sf_dir):
    """Rank 1 has an empty penalty term, so it must be the plain
    cosine argmax — MMR only reorders ranks 2..k."""
    from kafkaish_spark.operators.composites20 import q_sim_mmr_rerank
    from kafkaish_spark.operators.llm import q_sim_topk_embeddings

    first = {
        r.query_id: r.vec_id
        for r in q_sim_mmr_rerank(spark, sf_dir).filter("sel_rank = 1").collect()
    }
    top1 = {
        r.query_id: r.neighbor_id
        for r in q_sim_topk_embeddings(spark, sf_dir).filter("rn = 1").collect()
    }
    for qid, vid in first.items():
        if qid in top1:  # topk uses vec_id < 5, mmr < 3
            assert vid == top1[qid]


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_agg_salted_skew
    from kafkaish_spark.sources.tables import load_table

    got = {
        r.l_returnflag: (r.n_items, r.cents)
        for r in q_agg_salted_skew(spark, sf_dir).collect()
    }
    want = {
        r.l_returnflag: (r.n, r.c)
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).alias(
                "c"
            ),
        )
        .collect()
    }
    assert got == want


def test_diff_snapshots_covers_all_classes(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_diff_snapshots

    kinds = {r.change_kind: r.n for r in q_diff_snapshots(spark, sf_dir).collect()}
    assert set(kinds) == {"added", "removed", "changed", "unchanged"}
    assert all(v > 0 for v in kinds.values())


def test_matview_partial_merge_equals_full(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_matview_incremental
    from kafkaish_spark.sources.tables import load_table

    got = {
        (r.yr, r.o_orderpriority): (r.n_orders, r.cents)
        for r in q_matview_incremental(spark, sf_dir).collect()
    }
    want = {
        (r.yr, r.o_orderpriority): (r.n, r.c)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"), "o_orderpriority"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_benford_shares_are_consistent(spark, sf_dir):
    from kafkaish_spark.operators.composites20 import q_audit_benford

    rows = q_audit_benford(spark, sf_dir).collect()
    assert {r.d for r in rows} <= set(range(1, 10))
    total_micro = sum(r.share_micro for r in rows)
    # floors of a partition of 1e6 lose < 1 micro-unit per bucket
    assert 1_000_000 - 9 <= total_micro <= 1_000_000


def test_reservoir_sample_is_stable_and_bounded(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_sample_reservoir

    a = sorted(
        (r.c_nationkey, r.c_custkey, r.rk)
        for r in q_sample_reservoir(spark, sf_dir).collect()
    )
    b = sorted(
        (r.c_nationkey, r.c_custkey, r.rk)
        for r in q_sample_reservoir(spark, sf_dir).collect()
    )
    assert a == b  # deterministic across runs
    per_group = {}
    for nk, _, rk in a:
        per_group.setdefault(nk, []).append(rk)
    for nk, rks in per_group.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 5


def test_merge_upsert_latest_wins(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_diff_snapshots  # noqa: F401
    from kafkaish_spark.operators.composites20 import q_merge_upsert
    from kafkaish_spark.sources.tables import load_table

    merged = {
        r.o_orderkey: r.o_orderstatus
        for r in q_merge_upsert(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.year("o_orderdate").alias("yr")
    )
    for r in o.collect():
        if r.yr in (1997, 1998):
            assert merged[r.o_orderkey] == "U"
        elif r.yr < 1997:
            assert merged[r.o_orderkey] == r.o_orderstatus
        elif r.yr > 1998:
            assert r.o_orderkey not in merged


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_merge_upsert_plan_uses_group_limit(spark, sf_dir):
    """rn=1 must push into the per-key sort (WindowGroupLimit), so
    per-key state is one row — the property that makes MERGE hold at
    100 TB."""
    from kafkaish_spark.operators.composites20 import q_merge_upsert

    plan = _plan(q_merge_upsert(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_reservoir_plan_uses_group_limit_and_one_exchange(spark, sf_dir):
    from kafkaish_spark.operators.composites19 import q_sample_reservoir

    plan = _plan(q_sample_reservoir(spark, sf_dir))
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE reuse noise)


def test_salted_agg_plan_has_two_aggregation_phases(spark, sf_dir):
    """Phase 1 aggregates on (key, salt), phase 2 on key: the plan must
    contain two distinct keyed HashAggregate pairs, and the first
    exchange must partition on the SALTED key (that's the de-skew)."""
    from kafkaish_spark.operators.composites19 import q_agg_salted_skew

    plan = _plan(q_agg_salted_skew(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 phases
    assert "salt" in plan
