"""Round-6 fourth wave (operators/composites38.py): windowed PSI and
quantile normalization — checked against pure-python replays on
sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import math

import duckdb

SF = "/root/testdata/sf0.001"


def _disc_quantile(sorted_vals, q):
    """percentile_disc: lowest member at-or-above the quantile."""
    n = len(sorted_vals)
    return sorted_vals[min(n - 1, math.ceil(q * n) - 1)]


def test_windowed_psi_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites38 import (
        _WPSI_SPLIT_DAY,
        q_stream_psi_windows,
    )

    rows = duckdb.sql(
        f"SELECT event_type, CAST(round(value*100,0) AS BIGINT), "
        f"EXTRACT(day FROM ts) FROM '{SF}/events.parquet'"
    ).fetchall()
    per_type = {}
    for et, cents, day in rows:
        win = "a" if day < _WPSI_SPLIT_DAY else "b"
        per_type.setdefault(et, []).append((cents, win))
    want = {}
    for et, vals in per_type.items():
        a = sorted(c for c, w in vals if w == "a")
        edges = sorted({_disc_quantile(a, x / 10.0) for x in range(1, 10)})

        def _bin(c):
            return sum(1 for e in edges if e < c)

        counts = {}
        for c, w in vals:
            b = _bin(c)
            na, nb = counts.get(b, (0, 0))
            counts[b] = (na + (w == "a"), nb + (w == "b"))
        ta = sum(v[0] for v in counts.values())
        tb = sum(v[1] for v in counts.values())
        k = len(counts)
        psi = 0.0
        for b in sorted(counts):
            na, nb = counts[b]
            p = (na + 0.5) / (ta + 0.5 * k)
            q = (nb + 0.5) / (tb + 0.5 * k)
            psi += (p - q) * math.log(p / q)
        want[et] = (ta, tb, round(psi, 6))
    got = {
        r["event_type"]: (r["n_window_a"], r["n_window_b"], r["psi"])
        for r in q_stream_psi_windows(spark, SF).collect()
    }
    assert got == want
    # both windows populated for every type
    assert all(ta > 0 and tb > 0 for ta, tb, _ in want.values())


def test_quantile_normalize_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites38 import (
        _QN_POINTS,
        q_score_quantile_normalize,
    )

    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    per_src = {}
    all_vals = []
    for src, n in rows:
        per_src.setdefault(src, []).append(n)
        all_vals.append(n)
    all_vals.sort()
    want = {}
    for src, vals in per_src.items():
        vals.sort()
        for q in _QN_POINTS:
            sv = _disc_quantile(vals, q)
            gv = _disc_quantile(all_vals, q)
            want[(src, q)] = (sv, gv, gv - sv)
    got = {
        (r["source"], r["q"]): (
            r["src_value"],
            r["global_value"],
            r["shift"],
        )
        for r in q_score_quantile_normalize(spark, SF).collect()
    }
    assert got == want
    # the map is monotone within every source (quantiles are)
    for src in per_src:
        seq = [got[(src, q)][0] for q in _QN_POINTS]
        assert seq == sorted(seq)
