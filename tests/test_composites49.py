"""Round-8 third wave (operators/composites49.py): Welch t-test and
the 2x2 chi-square of proportions — pure-python replays on sf0.001
(the oracle gate re-proves them vs DuckDB at sf0.01)."""

import math

import duckdb

SF = "/root/testdata/sf0.001"


def _orders():
    return duckdb.sql(
        f"SELECT o_custkey % 2, CAST(round(o_totalprice*100) AS BIGINT), "
        f"o_orderpriority FROM '{SF}/orders.parquet'"
    ).fetchall()


def test_welch_ttest_matches_replay(spark):
    from kafkaish_spark.operators.composites49 import q_ab_welch_ttest

    rows = _orders()
    xs = {0: [], 1: []}
    for arm, x, _p in rows:
        xs[arm].append(x)
    n0, n1 = len(xs[0]), len(xs[1])
    m0, m1 = sum(xs[0]) / n0, sum(xs[1]) / n1
    v0 = (sum(v * v for v in xs[0]) - n0 * m0 * m0) / (n0 - 1)
    v1 = (sum(v * v for v in xs[1]) - n1 * m1 * m1) / (n1 - 1)
    se0, se1 = v0 / n0, v1 / n1
    t = (m0 - m1) / math.sqrt(se0 + se1)
    df = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)
    )
    row = q_ab_welch_ttest(spark, SF).collect()[0]
    assert (row["n0"], row["n1"]) == (n0, n1)
    assert row["mean0_cents"] == round(m0, 6)
    assert row["mean1_cents"] == round(m1, 6)
    assert row["mean_diff_cents"] == round(m0 - m1, 6)
    assert row["t_stat"] == round(t, 6)
    assert row["welch_df"] == round(df, 6)
    # Welch df is bounded by min(n)-1 below and n0+n1-2 above
    assert min(n0, n1) - 1 <= row["welch_df"] <= n0 + n1 - 2


def test_chi2_proportions_matches_replay(spark):
    from kafkaish_spark.operators.composites49 import q_ab_chi2_proportions

    rows = _orders()
    a = b = c = d = 0
    for arm, _x, prio in rows:
        hit = prio == "1-URGENT"
        if arm == 0:
            a, b = a + hit, b + (not hit)
        else:
            c, d = c + hit, d + (not hit)
    n = a + b + c + d
    adbc = float(a) * d - float(b) * c
    chi2 = n * adbc * adbc / (
        float(a + b) * float(c + d) * float(a + c) * float(b + d)
    )
    row = q_ab_chi2_proportions(spark, SF).collect()[0]
    assert (row["n0_hit"], row["n0_miss"], row["n1_hit"], row["n1_miss"]) == (
        a, b, c, d,
    )
    assert row["rate0"] == round(a / (a + b), 6)
    assert row["rate1"] == round(c / (c + d), 6)
    assert row["chi2"] == round(chi2, 6)
    assert row["chi2"] >= 0


def test_power_mde_matches_replay(spark):
    import math as _m

    from kafkaish_spark.operators.composites49 import q_ab_power_mde

    rows = _orders()
    xs = {0: [], 1: []}
    for arm, x, _p in rows:
        xs[arm].append(x)
    n0, n1 = len(xs[0]), len(xs[1])
    m0, m1 = sum(xs[0]) / n0, sum(xs[1]) / n1
    mp = (sum(xs[0]) + sum(xs[1])) / (n0 + n1)
    vp = (
        (sum(v * v for v in xs[0]) - n0 * m0 * m0)
        + (sum(v * v for v in xs[1]) - n1 * m1 * m1)
    ) / (n0 + n1 - 2)
    za, zb = 1.959963984540054, 0.8416212335729143
    mde = 0.02 * mp
    need = _m.ceil(2.0 * (za + zb) * (za + zb) * vp / (mde * mde))
    row = q_ab_power_mde(spark, SF).collect()[0]
    assert row["n_obs"] == n0 + n1
    assert row["pooled_mean_cents"] == round(mp, 6)
    assert row["pooled_sd_cents"] == round(_m.sqrt(vp), 6)
    assert row["cohens_d"] == round((m0 - m1) / _m.sqrt(vp), 6)
    assert row["mde_cents"] == round(mde, 6)
    assert row["n_per_arm_required"] == need
    assert need > 0
