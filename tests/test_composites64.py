"""Properties for the round-12 vocabulary/randomness wave
(composites64): the oracle pins exact values; these pin the
statistical invariants that hold at any scale factor."""

from kafkaish_spark.operators.composites64 import (
    q_agg_bowley_skew,
    q_events_runs_test,
    q_text_good_turing,
    q_text_simpson_diversity,
)


def test_good_turing_table_shape(spark, sf_dir):
    rows = {r["r"]: r for r in q_text_good_turing(spark, sf_dir).collect()}
    assert 1 in rows  # a real long tail: hapax trigrams exist
    assert rows[1]["n_r"] > 0
    total_mass = sum(r["mass_frac"] for r in rows.values())
    assert 0.0 < total_mass <= 1.0 + 1e-6
    for r in rows.values():
        # r* really is (r+1) N_{r+1} / N_r
        want = (r["r"] + 1) * r["n_r_plus1"] / r["n_r"]
        assert abs(r["r_star"] - want) < 1e-6
        assert r["mass_frac"] >= 0.0


def test_simpson_is_a_collision_probability(spark, sf_dir):
    rows = q_text_simpson_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["simpson"] <= 1.0
        assert abs(r["simpson"] + r["gini_simpson"] - 1.0) < 1e-6
        # uniform lower bound: collision prob >= 1/vocab (Cauchy-Schwarz,
        # up to the without-replacement correction)
        assert r["simpson"] >= 1.0 / r["vocab"] - 1.0 / r["n"]
        assert r["vocab"] <= r["n"]


def test_runs_test_bounds(spark, sf_dir):
    row = q_events_runs_test(spark, sf_dir).first()
    assert row["n"] == row["n0"] + row["n1"]
    if row["n"] > 0:
        assert 1 <= row["r"] <= row["n"]
        assert 1.0 <= row["mu_r"] <= row["n"]
    if row["z"] is not None:  # NULL for one-sided sequences (tiny SF)
        assert abs(row["z"]) < 10.0  # sane magnitude for real data


def test_runs_test_z_defined_at_sf001(spark):
    # at the driver's correctness SF the sequence is two-sided and the
    # statistic must be real
    row = q_events_runs_test(spark, "/root/testdata/sf0.01").first()
    assert row["n0"] > 0 and row["n1"] > 0
    assert row["z"] is not None


def test_bowley_skew_is_bounded(spark, sf_dir):
    rows = q_agg_bowley_skew(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["q1"] <= r["q2"] <= r["q3"]
        assert r["iqr"] == r["q3"] - r["q1"]
        if r["bowley_skew"] is not None:
            assert -1.0 <= r["bowley_skew"] <= 1.0
