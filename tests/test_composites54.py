"""Round-9 wave 5 tests: rank correlation from contingency cells must
equal the textbook row-level definitions (computed in pure python on
the collected rows — feasible at test sf), and cross-correlation
basics."""

import math

import pytest


def _avg_ranks(values):
    """Average (tie-corrected) ranks, 1-based."""
    s = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and values[s[j + 1]] == values[s[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[s[k]] = r
        i = j + 1
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    return num / den


def _kendall_tau_b(xs, ys):
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    from collections import Counter

    tx = sum(m * (m - 1) / 2 for m in Counter(xs).values())
    ty = sum(m * (m - 1) / 2 for m in Counter(ys).values())
    n0 = n * (n - 1) / 2
    return (c - d) / math.sqrt((n0 - tx) * (n0 - ty)), c, d


@pytest.fixture(scope="module")
def qty_line(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_linenumber")
        .collect()
    )
    xs = [r["l_quantity"] for r in rows]
    ys = [r["l_linenumber"] for r in rows]
    return xs, ys


def test_spearman_matches_rowlevel(spark, sf_dir, qty_line):
    from kafkaish_spark.operators.composites54 import q_agg_spearman_discrete

    xs, ys = qty_line
    expect = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    got = q_agg_spearman_discrete(spark, sf_dir).first()
    assert got["n_rows"] == len(xs)
    assert got["spearman_rho"] == pytest.approx(expect, abs=1e-6)
    assert -1.0 <= got["spearman_rho"] <= 1.0


def test_kendall_matches_rowlevel(spark, sf_dir, qty_line):
    from kafkaish_spark.operators.composites54 import (
        q_agg_kendall_tau_discrete,
    )

    xs, ys = qty_line
    expect, c, d = _kendall_tau_b(xs, ys)
    got = q_agg_kendall_tau_discrete(spark, sf_dir).first()
    assert got["n_rows"] == len(xs)
    assert got["concordant"] == c
    assert got["discordant"] == d
    assert got["kendall_tau_b"] == pytest.approx(expect, abs=1e-6)


def test_xcorr_lag0_is_pearson_and_bounded(spark, sf_dir):
    """Lag 0 of the CCF with full-series normalization IS the Pearson
    correlation of the two daily series; all lags bounded by |r|<=~1
    (the truncated-window estimator can exceed 1 only pathologically —
    assert a loose envelope)."""
    from kafkaish_spark.operators.composites54 import q_ts_xcorr_daily
    from kafkaish_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = {r["lag"]: r for r in q_ts_xcorr_daily(spark, sf_dir).collect()}
    assert set(rows) == set(range(8))
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count_if(F.col("event_type") == "click").alias("x"),
            F.count_if(F.col("event_type") == "purchase").alias("y"),
        )
        .collect()
    )
    xs = [r["x"] for r in daily]
    ys = [r["y"] for r in daily]
    assert rows[0]["cnt"] == len(xs)
    assert rows[0]["xcorr"] == pytest.approx(_pearson(xs, ys), abs=1e-6)
    for r in rows.values():
        assert abs(r["xcorr"]) <= 1.5
