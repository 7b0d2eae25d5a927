"""Round-6 ninth wave (operators/composites43.py): rank-biased overlap
and Brier decomposition — checked against pure-python replays on
sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_rbo_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites43 import (
        _RBO_K,
        _RBO_P,
        q_eval_rank_rbo,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    tf = {}
    for doc_id, text in rows:
        seen = {}
        for w in text.split(" "):
            seen[w] = seen.get(w, 0) + 1
        for w, n in seen.items():
            cf, df = tf.get(w, (0, 0))
            tf[w] = (cf + n, df + 1)
    by_cf = sorted(tf, key=lambda w: (-tf[w][0], w))[:_RBO_K]
    by_mean = sorted(
        tf, key=lambda w: (-(tf[w][0] / tf[w][1]), w)
    )[:_RBO_K]
    ra = {w: i + 1 for i, w in enumerate(by_cf)}
    rb = {w: i + 1 for i, w in enumerate(by_mean)}
    mx = sorted(max(ra[w], rb[w]) for w in set(by_cf) & set(by_mean))
    rbo = 0.0
    for d in range(1, _RBO_K + 1):
        x = sum(1 for m in mx if m <= d)
        rbo += (_RBO_P ** (d - 1)) * x / d
    rbo *= 1 - _RBO_P
    got = q_eval_rank_rbo(spark, SF).first()
    assert got["k"] == _RBO_K
    assert got["overlap_at_k"] == len(mx)
    assert got["rbo_min"] == round(rbo, 6)
    assert 0.0 <= got["rbo_min"] <= 1.0


def test_brier_decomposition_identity(spark):
    from kafkaish_spark.operators.composites43 import (
        _BRIER_BINS,
        _BRIER_GRID,
        q_ml_brier_decomposition,
    )

    rows = duckdb.sql(
        f"SELECT n_chars, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    bins = {}
    for n_chars, lang in rows:
        k = min(n_chars, _BRIER_GRID)
        b = min(k * _BRIER_BINS // (_BRIER_GRID + 1), _BRIER_BINS - 1)
        n, sk, sy = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, sk + k, sy + (lang == "en"))
    nt = sum(v[0] for v in bins.values())
    syt = sum(v[2] for v in bins.values())
    obar = syt / nt
    rel = res = 0.0
    for b in sorted(bins):
        n, sk, sy = bins[b]
        pbar = sk / (n * _BRIER_GRID)
        ob = sy / n
        rel += n * (pbar - ob) ** 2
        res += n * (ob - obar) ** 2
    rel /= nt
    res /= nt
    unc = obar * (1 - obar)
    got = q_ml_brier_decomposition(spark, SF).first()
    assert got["n"] == nt
    assert got["reliability"] == round(rel, 6)
    assert got["resolution"] == round(res, 6)
    assert got["uncertainty"] == round(unc, 6)
    assert got["binned_brier"] == round(rel - res + unc, 6)
    # Murphy identity: binned Brier computed DIRECTLY from the binned
    # forecasts equals REL - RES + UNC (to the emitted rounding)
    direct = 0.0
    for b in sorted(bins):
        n, sk, sy = bins[b]
        pbar = sk / (n * _BRIER_GRID)
        # sum over members: (pbar - y)^2 = n*pbar^2 - 2*pbar*sy + sy
        direct += n * pbar * pbar - 2 * pbar * sy + sy
    direct /= nt
    assert abs(direct - (rel - res + unc)) < 1e-9
