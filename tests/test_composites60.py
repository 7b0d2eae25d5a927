"""Properties for the round-11 statistics wave (composites60): the
oracle pins exact values; these pin the semantic invariants that must
hold at ANY scale factor."""

from kafkaish_spark.operators.composites60 import (
    q_drift_ks_orders,
    q_stats_bootstrap_ci,
)


def test_ks_statistic_is_a_probability_gap(spark, sf_dir):
    row = q_drift_ks_orders(spark, sf_dir).first()
    assert 0.0 <= row["ks"] <= 1.0
    assert row["ks_num"] >= 0
    # the normalized statistic IS the numerator over n_ref*n_cur
    assert abs(row["ks"] - row["ks_num"] / (row["n_ref"] * row["n_cur"])) < 1e-6
    assert row["n_ref"] > 0 and row["n_cur"] > 0


def test_bootstrap_ci_brackets_the_point_mean(spark, sf_dir):
    row = q_stats_bootstrap_ci(spark, sf_dir).first()
    # Poisson(1) resampling is unbiased: the 2.5/97.5 band of the 64
    # replicate means must bracket the point estimate, and be ordered
    assert row["ci_lo_cents"] <= row["mean_cents"] <= row["ci_hi_cents"]
    assert row["ci_lo_cents"] < row["ci_hi_cents"]
    assert row["n"] > 0


def test_poisson_ladder_mass_is_poisson_one():
    """The shared CASE-ladder thresholds really are the Poisson(1) CDF
    — guards against a typo'd literal silently skewing every weight in
    BOTH bootstrap shapes (composites60 explode / composites34
    R-column), which slice the same functions/stats.py tuple."""
    import math

    from kafkaish_spark.functions.stats import POISSON1_CDF
    from kafkaish_spark.operators.composites34 import _POIS_CDF
    from kafkaish_spark.operators.composites60 import _POIS

    cum = 0.0
    for k, lit in enumerate(POISSON1_CDF):
        cum += math.exp(-1) / math.factorial(k)
        assert abs(lit - cum) < 1e-15, (k, lit, cum)
    assert _POIS_CDF is POISSON1_CDF
    assert _POIS == tuple(repr(c) for c in POISSON1_CDF[:5])
