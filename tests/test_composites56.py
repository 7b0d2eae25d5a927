"""Round-9 wave 7 tests: Mann-Whitney U and Brown-Forsythe Levene
against row-level pure-python references on the same deterministic
arm split."""

import math

import pytest


@pytest.fixture(scope="module")
def arms(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_quantity")
        .collect()
    )
    a0 = [int(r["l_quantity"]) for r in rows if r["l_suppkey"] % 2 == 0]
    a1 = [int(r["l_quantity"]) for r in rows if r["l_suppkey"] % 2 == 1]
    return a0, a1


def test_mann_whitney_matches_rowlevel(spark, sf_dir, arms):
    from kafkaish_spark.operators.composites56 import q_ab_mann_whitney

    a0, a1 = arms
    got = q_ab_mann_whitney(spark, sf_dir).first()
    assert (got["n0"], got["n1"]) == (len(a0), len(a1))
    # U in half-units by brute force over the value histogram
    from collections import Counter

    c0, c1 = Counter(a0), Counter(a1)
    u2 = sum(
        (2 if v0 > v1 else 1 if v0 == v1 else 0) * n0 * n1
        for v0, n0 in c0.items()
        for v1, n1 in c1.items()
    )
    assert got["u2"] == u2
    # tie-corrected normal z
    n0, n1 = len(a0), len(a1)
    n = n0 + n1
    tall = Counter(a0 + a1)
    t3t = sum(t**3 - t for t in tall.values())
    mu = n0 * n1 / 2.0
    sigma2 = n0 * n1 / 12.0 * ((n + 1) - t3t / (n * (n - 1)))
    z = (u2 / 2.0 - mu) / math.sqrt(sigma2)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    # hash split independent of quantity -> |z| small at any sf
    assert abs(got["z"]) < 5.0


def test_levene_matches_rowlevel(spark, sf_dir, arms):
    from kafkaish_spark.operators.composites56 import q_ab_levene_variance

    a0, a1 = arms
    got = q_ab_levene_variance(spark, sf_dir).first()
    assert (got["n0"], got["n1"]) == (len(a0), len(a1))

    def med2(vals):
        s = sorted(vals)
        n = len(s)
        lo = s[(n + 1) // 2 - 1]  # smallest v with 2*cum >= n
        hi = s[(n + 2) // 2 - 1]  # smallest v with 2*cum >= n+1
        return lo + hi

    m0, m1 = med2(a0), med2(a1)
    z0 = [abs(2 * v - m0) for v in a0]
    z1 = [abs(2 * v - m1) for v in a1]
    n0, n1 = len(z0), len(z1)
    n = n0 + n1
    zb0, zb1 = sum(z0) / n0, sum(z1) / n1
    ss_within = (
        sum(v * v for v in z0)
        + sum(v * v for v in z1)
        - zb0 * zb0 * n0
        - zb1 * zb1 * n1
    )
    w = (n - 2.0) * (zb0 - zb1) ** 2 / (1.0 / n0 + 1.0 / n1) / ss_within
    assert got["w_stat"] == pytest.approx(w, rel=1e-6)
    assert got["w_stat"] >= 0.0
