"""Round-6 third wave (operators/composites37.py): KS/Wasserstein
drift, embedding dimension health, self-overlap diversity — checked
against pure-python replays on sf0.001 (the oracle gate re-proves
them vs DuckDB at sf0.01)."""

import math

import duckdb

SF = "/root/testdata/sf0.001"


def test_ks_wasserstein_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites37 import (
        _KSW_BIN_CENTS,
        _KSW_CUR_Y,
        _KSW_NBINS,
        _KSW_REF_Y,
        q_drift_ks_wasserstein,
    )

    rows = duckdb.sql(
        f"SELECT CAST(round(o_totalprice*100,0) AS BIGINT), "
        f"EXTRACT(year FROM o_orderdate) FROM '{SF}/orders.parquet'"
    ).fetchall()
    nr = [0] * _KSW_NBINS
    nc = [0] * _KSW_NBINS
    for cents, y in rows:
        b = min(cents // _KSW_BIN_CENTS, _KSW_NBINS - 1)
        if y == _KSW_REF_Y:
            nr[b] += 1
        elif y == _KSW_CUR_Y:
            nc[b] += 1
    tr, tc = sum(nr), sum(nc)
    # fold over OCCUPIED bins in order, exactly like both engines
    occupied = [b for b in range(_KSW_NBINS) if nr[b] or nc[b]]
    ca = cb = 0
    ks = 0.0
    w1 = 0.0
    for b in occupied:
        ca += nr[b]
        cb += nc[b]
        gap = abs(ca / tr - cb / tc)
        ks = max(ks, gap)
        w1 += gap * (_KSW_BIN_CENTS / 100.0)
    got = q_drift_ks_wasserstein(spark, SF).first()
    assert (got["n_ref"], got["n_cur"]) == (tr, tc)
    assert got["ks_stat"] == round(ks, 6)
    assert got["wasserstein_1d"] == round(w1, 6)
    assert 0.0 <= got["ks_stat"] <= 1.0
    assert tr > 20 and tc > 20


def test_embed_dim_health_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites37 import (
        _DEAD_STD,
        _DIM_GRID,
        q_embed_dim_health,
    )

    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    dims = len(rows[0][0])
    s1 = [0] * dims
    s2 = [0] * dims
    n = len(rows)
    for (emb,) in rows:
        for i, v in enumerate(emb):
            qv = round(float(v) * _DIM_GRID)
            s1[i] += qv
            s2[i] += qv * qv
    means, stds = [], []
    for i in range(dims):
        means.append(s1[i] / (n * _DIM_GRID))
        var_grid = s2[i] / n - (s1[i] / n) * (s1[i] / n)
        stds.append(math.sqrt(var_grid / (float(_DIM_GRID) ** 2)))
    got = q_embed_dim_health(spark, SF).first()
    assert got["n_dims"] == dims
    assert got["n_dead_dims"] == sum(1 for s in stds if s < _DEAD_STD)
    assert got["min_std"] == round(min(stds), 6)
    assert got["max_std"] == round(max(stds), 6)
    assert got["spread_ratio"] == round(
        max(stds) / max(min(stds), 1e-12), 6
    )
    assert got["max_abs_mean"] == round(max(abs(m) for m in means), 6)


def test_self_overlap_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites37 import q_text_self_overlap

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    docs = {r[0]: (r[1], r[2]) for r in rows}

    def bigrams(text):
        w = text.split(" ")
        out = {}
        for i in range(len(w) - 1):
            g = f"{w[i]} {w[i + 1]}"
            out[g] = out.get(g, 0) + 1
        return out

    agg = {}
    for a in sorted(docs):
        if a + 1 not in docs:
            continue
        ga, gb = bigrams(docs[a][0]), bigrams(docs[a + 1][0])
        clipped = sum(min(tf, gb.get(g, 0)) for g, tf in ga.items())
        total = sum(ga.values())
        p = clipped / total
        lang = docs[a][1]
        n, su, hi = agg.get(lang, (0, 0, 0))
        agg[lang] = (n + 1, su + round(p * 1e9), hi + (p > 0.5))
    got = {
        r["lang"]: (r["n_pairs"], r["mean_self_overlap"], r["frac_high_overlap"])
        for r in q_text_self_overlap(spark, SF).collect()
    }
    for lang, (n, su, hi) in agg.items():
        assert got[lang] == (n, round(su / n / 1e9, 6), round(hi / n, 6))
    # word-soup docs share vocabulary, so SOME overlap exists, but
    # consecutive docs are independent draws: mean far below 1
    assert all(0.0 < v[1] < 0.9 for v in got.values())
