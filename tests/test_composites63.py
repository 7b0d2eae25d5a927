"""Properties for the round-12 resampling/robust wave (composites63):
the oracle pins exact values; these pin the statistical invariants
that hold at any scale factor."""

from kafkaish_spark.operators.composites63 import (
    _PERM_B,
    q_ab_mcnemar,
    q_agg_trimmed_mean,
    q_corpus_jackknife_sources,
    q_ml_permutation_test,
)


def test_mcnemar_is_the_discordant_ratio(spark, sf_dir):
    row = q_ab_mcnemar(spark, sf_dir).first()
    assert row["b"] >= 0 and row["c"] >= 0
    assert row["b"] + row["c"] <= row["n"]
    if row["b"] + row["c"] > 0:
        want = (row["b"] - row["c"]) ** 2 / (row["b"] + row["c"])
        assert abs(row["chi2"] - want) < 1e-6
    else:
        assert row["chi2"] is None


def test_permutation_pvalue_is_calibrated_under_the_null(spark, sf_dir):
    row = q_ml_permutation_test(spark, sf_dir).first()
    assert 0 <= row["b_exceed"] <= _PERM_B
    # add-one p-value: (1 + exceed) / (B + 1), never exactly 0
    assert abs(row["p_value"] - (1 + row["b_exceed"]) / (_PERM_B + 1)) < 1e-6
    assert 0.0 < row["p_value"] <= 1.0
    assert row["d_obs_cents"] >= 0.0
    assert row["n0"] > 0 and row["n1"] > 0


def test_jackknife_brackets_and_se(spark, sf_dir):
    rows = q_corpus_jackknife_sources(spark, sf_dir).collect()
    assert len(rows) >= 2
    ses = {r["jk_se"] for r in rows}
    assert len(ses) == 1  # the SE is a corpus-level scalar
    assert rows[0]["jk_se"] >= 0.0
    loos = [r["loo_mean"] for r in rows]
    mean_all = rows[0]["mean_all"]
    # the full mean lies inside the leave-one-out envelope
    assert min(loos) - 1e-6 <= mean_all <= max(loos) + 1e-6
    # influence really is loo - mean_all
    for r in rows:
        assert abs(r["influence"] - (r["loo_mean"] - mean_all)) < 2e-6
    assert sum(r["n_docs"] for r in rows) == rows[0]["n_total"]


def test_trimmed_mean_ranks_and_consistency(spark, sf_dir):
    rows = q_agg_trimmed_mean(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        k1 = int(0.1 * r["n"])
        assert r["n_kept"] == r["n"] - 2 * k1
        assert abs(r["trimmed_mean"] - r["trimmed_sum"] / r["n_kept"]) < 1e-6
        assert r["trimmed_sum"] > 0
