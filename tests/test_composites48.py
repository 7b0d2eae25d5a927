"""Round-8 second wave (operators/composites48.py): ACF from exact
moment sums and the KMV set-operation sketch — pure-python replays on
sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.001"


def test_acf_matches_replay(spark):
    from kafkaish_spark.operators.composites48 import (
        _ACF_MAX_LAG,
        q_ts_acf_daily_revenue,
    )

    daily = duckdb.sql(
        f"SELECT o_orderdate, SUM(CAST(round(o_totalprice*100) AS BIGINT)) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [x for _, x in daily]
    n = len(xs)
    sx, s2 = sum(xs), sum(v * v for v in xs)  # exact ints
    xbar = sx / n
    den = s2 - n * xbar * xbar
    want = {}
    for k in range(1, _ACF_MAX_LAG + 1):
        sxy = sum(xs[t] * xs[t + k] for t in range(n - k))
        ssum = sum(xs[t] + xs[t + k] for t in range(n - k))
        want[k] = (n - k, round((sxy - xbar * ssum + (n - k) * xbar * xbar) / den, 6))
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in q_ts_acf_daily_revenue(spark, SF).collect()
    }
    assert got == want
    assert all(-1.000001 <= v[1] <= 1.000001 for v in want.values())


def _h(uid) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)


def test_kmv_matches_replay_and_calibrates(spark):
    from kafkaish_spark.operators.composites48 import (
        _KMV_K,
        _KMV_SCALE,
        _SET_A,
        _SET_B,
        q_sketch_kmv_setops,
    )

    def users(et):
        return {
            r[0]
            for r in duckdb.sql(
                f"SELECT DISTINCT user_id FROM '{SF}/events.parquet' "
                f"WHERE event_type = '{et}'"
            ).fetchall()
        }

    ua, ub = users(_SET_A), users(_SET_B)
    ha = sorted(_h(u) for u in ua)
    hb = sorted(_h(u) for u in ub)
    hu = sorted(set(ha) | set(hb))

    def est(hs):
        if len(hs) < _KMV_K:
            return float(len(hs))
        return (_KMV_K - 1) * float(_KMV_SCALE) / hs[_KMV_K - 1]

    ku = hu[:_KMV_K]
    n_both = sum(1 for h in ku if h in set(ha) and h in set(hb))
    row = q_sketch_kmv_setops(spark, SF).collect()[0]
    assert row["k"] == _KMV_K
    assert row["exact_a"] == len(ua)
    assert row["exact_b"] == len(ub)
    assert row["exact_union"] == len(hu)
    assert row["exact_intersection"] == len(ua & ub)
    assert row["est_a"] == round(est(ha), 6)
    assert row["est_b"] == round(est(hb), 6)
    assert row["est_union"] == round(est(hu), 6)
    assert row["est_intersection"] == round(
        (n_both / len(ku)) * est(hu), 6
    )
    # calibration: bottom-k with k=64 is exact below k and within a
    # loose factor above it (SIGMOD'07 bound ~1/sqrt(k) ~ 12% typical)
    for e, x in (
        (row["est_a"], row["exact_a"]),
        (row["est_b"], row["exact_b"]),
        (row["est_union"], row["exact_union"]),
    ):
        if x < _KMV_K:
            assert e == float(x)  # degenerate branch: sketch IS the set
        else:
            assert math.isfinite(e) and abs(e / x - 1) < 0.5


def test_ljung_box_matches_replay(spark):
    from kafkaish_spark.operators.composites48 import (
        _ACF_MAX_LAG,
        q_ts_acf_daily_revenue,
        q_ts_ljung_box,
    )

    # derive from the ACF query's own (unrounded replay of) r_k values
    daily = duckdb.sql(
        f"SELECT o_orderdate, SUM(CAST(round(o_totalprice*100) AS BIGINT)) "
        f"FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    xs = [x for _, x in daily]
    n = len(xs)
    xbar = sum(xs) / n
    den = sum(v * v for v in xs) - n * xbar * xbar
    q = 0.0
    for k in range(1, _ACF_MAX_LAG + 1):
        sxy = sum(xs[t] * xs[t + k] for t in range(n - k))
        ssum = sum(xs[t] + xs[t + k] for t in range(n - k))
        rk = (sxy - xbar * ssum + (n - k) * xbar * xbar) / den
        q = q + rk * rk / (n - k)
    row = q_ts_ljung_box(spark, SF).collect()[0]
    assert row["n_obs"] == n
    assert row["max_lag"] == _ACF_MAX_LAG
    assert row["q_stat"] == round(n * (n + 2) * q, 6)
    assert row["q_stat"] >= 0
    # consistency with the per-lag report
    acfs = {r["lag"]: r["acf"] for r in q_ts_acf_daily_revenue(spark, SF).collect()}
    approx = n * (n + 2) * sum(acfs[k] ** 2 / (n - k) for k in acfs)
    assert abs(approx - row["q_stat"]) < 1e-3  # rounded-r_k reconstruction
