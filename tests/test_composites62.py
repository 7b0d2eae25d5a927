"""Properties for the round-12 eval/calibration wave (composites62):
the oracle pins exact values; these pin the semantic invariants that
must hold at ANY scale factor, plus the bit-for-bit fuzz pin of the
pandas-UDF Jaro-Winkler against the oracle's builtin."""

import random

import duckdb
import pytest

from kafkaish_spark.operators.composites62 import (
    _jaro_winkler,
    q_dedup_jaro_winkler_parts,
    q_ml_cohen_kappa,
    q_ml_conformal_interval,
    q_ml_mutual_information,
    q_ml_pinball_quantile,
    q_text_lexicon_screen,
    q_text_rouge_lead_summary,
)


def test_jaro_winkler_matches_duckdb_builtin():
    """_jaro_winkler must equal jaro_winkler_similarity BIT-FOR-BIT —
    this is what lets a pandas-UDF query hash-match a DuckDB oracle."""
    con = duckdb.connect()
    fixed = [
        ("martha", "marhta"),
        ("DWAYNE", "DUANE"),
        ("DIXON", "DICKSONX"),
        ("cold widget", "old widget"),
        ("abc", "abc"),
        ("a", ""),
        ("", ""),
        ("xy", "yx"),
        ("crate", "trace"),
        ("abcd", "dcba"),
    ]
    rng = random.Random(7)
    words = "cold small large blue green old widget bolt rod gear".split()
    fuzz = [
        (
            " ".join(rng.choices(words, k=rng.randint(1, 3))),
            " ".join(rng.choices(words, k=rng.randint(1, 3))),
        )
        for _ in range(500)
    ]
    for s1, s2 in fixed + fuzz:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert _jaro_winkler(s1, s2) == want, (s1, s2)


def test_jw_pairs_are_blocked_and_thresholded(spark, sf_dir):
    rows = q_dedup_jaro_winkler_parts(spark, sf_dir).collect()
    assert rows, "threshold should admit some near-name pairs"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        # blocked on the final token
        assert r["name_a"].split(" ")[-1] == r["name_b"].split(" ")[-1]
        assert r["jw_sim"] >= 0.84
        assert r["n_parts_a"] > 0 and r["n_parts_b"] > 0


def test_rouge_recalls_are_ratios_of_the_counted_overlaps(spark, sf_dir):
    rows = q_text_rouge_lead_summary(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["ov1"] <= 8 * r["n_docs"]  # clipped by candidate size
        assert 0 <= r["ov2"] <= 7 * r["n_docs"]
        assert 0.0 <= r["rouge2_recall"] <= r["rouge1_recall"] <= 1.0
        assert abs(r["rouge1_recall"] - r["ov1"] / r["ref1"]) < 1e-6


def test_cohen_kappa_matches_pure_python_replay(spark, sf_dir):
    row = q_ml_cohen_kappa(spark, sf_dir).first()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT n_chars, len(string_split(text, ' ')) FROM "
        f"'{sf_dir}/documents.parquet'"
    ).fetchall()
    n11 = sum(1 for c, t in docs if c >= 300 and t >= 50)
    n10 = sum(1 for c, t in docs if c >= 300 and t < 50)
    n01 = sum(1 for c, t in docs if c < 300 and t >= 50)
    n00 = sum(1 for c, t in docs if c < 300 and t < 50)
    n = len(docs)
    assert (row["n"], row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    kappa = (n * (n11 + n00) - chance) / (n * n - chance)
    assert abs(row["kappa"] - kappa) < 1e-6
    assert -1.0 <= row["kappa"] <= 1.0


def test_mutual_information_bounds(spark, sf_dir):
    row = q_ml_mutual_information(spark, sf_dir).first()
    # MI >= 0 (up to fold rounding) and bounded by both entropies
    assert row["mi_nats"] >= -1e-6
    assert row["mi_nats"] <= min(row["h_prio"], row["h_status"]) + 1e-6
    import math

    assert row["h_prio"] <= math.log(5) + 1e-9  # 5 priorities
    assert row["h_status"] <= math.log(3) + 1e-9  # 3 statuses
    assert -1e-6 <= row["nmi"] <= 1.0


def test_pinball_is_minimized_by_the_target_quantile(spark, sf_dir):
    rows = {r["label"]: r for r in q_ml_pinball_quantile(spark, sf_dir).collect()}
    assert set(rows) == {"p50", "p90", "p99"}
    # tau = 0.9 loss is minimized by the 0.9-quantile member (Koenker)
    assert rows["p90"]["rk"] == 1
    assert rows["p90"]["pinball_x10"] <= rows["p50"]["pinball_x10"]
    assert rows["p90"]["pinball_x10"] <= rows["p99"]["pinball_x10"]
    assert rows["p50"]["cand_cents"] < rows["p90"]["cand_cents"]


def test_conformal_coverage_near_nominal(spark, sf_dir):
    rows = q_ml_conformal_interval(spark, sf_dir).collect()
    assert len(rows) == 5  # one per priority
    for r in rows:
        # split-conformal guarantee: coverage ~ 0.9 (finite-sample band)
        assert 0.8 <= r["cover_rate"] <= 1.0, r
        assert r["qhat2"] >= 0 and r["med2"] > 0
        assert r["n_cal"] > 0 and r["n_test"] > 0
        assert r["covered"] <= r["n_test"]


def test_lexicon_screen_consistency(spark, sf_dir):
    rows = q_text_lexicon_screen(spark, sf_dir).collect()
    assert rows
    total_flag = sum(r["flagged_docs"] for r in rows)
    total_docs = sum(r["n_docs"] for r in rows)
    assert 0 < total_flag < total_docs  # tuned to flag a strict subset
    for r in rows:
        assert 0.0 <= r["flag_rate"] <= 1.0
        assert r["total_score"] <= 5 * r["total_toks"]
        assert abs(r["mean_density"] - r["total_score"] / r["total_toks"]) < 1e-6


@pytest.mark.parametrize(
    "s1,s2,expect",
    [
        ("", "", 0.0),  # DuckDB: empty is similar to nothing
        ("a", "a", 1.0),
        ("ab", "ba", 0.0),  # window max(2,2)//2-1 = 0: no match slack
    ],
)
def test_jw_edge_cases(s1, s2, expect):
    assert _jaro_winkler(s1, s2) == expect
