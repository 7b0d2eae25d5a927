"""Round-5 fifth wave (operators/composites31.py): Fellegi-Sunter
record-linkage weights and the Wald SPRT decision walk — each checked
against a pure-python replay on sf0.001 (the oracle gate re-proves
them vs DuckDB at sf0.01)."""

import math

import duckdb

SF = "/root/testdata/sf0.001"


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fellegi_sunter_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites31 import (
        _FS_MAXDIST,
        _FS_WINDOW,
        q_dedup_fellegi_sunter,
    )

    rows = duckdb.sql(
        f"SELECT p_partkey, p_name, p_brand, p_type, p_size "
        f"FROM '{SF}/part.parquet'"
    ).fetchall()
    recs = []
    for pk, name, brand, typ, size in rows:
        k = name.lower().replace(" ", "")
        recs.append((k, pk, name, brand, typ, size, name.split(" ")[0]))
    recs.sort(key=lambda r: (r[0], r[1]))
    n = float(len(recs))

    def u_of(idx):
        hist = {}
        for r in recs:
            hist[r[idx]] = hist.get(r[idx], 0) + 1
        return sum(c * (c - 1) for c in hist.values()) / (n * (n - 1))

    us = [u_of(3), u_of(4), u_of(5), u_of(6)]
    pairs = []
    for i, a in enumerate(recs):
        for j in range(i + 1, min(i + 1 + _FS_WINDOW, len(recs))):
            b = recs[j]
            g = [int(a[x] == b[x]) for x in (3, 4, 5, 6)]
            pairs.append((a[2], b[2], g, _lev(a[0], b[0])))
    matches = [p for p in pairs if p[3] <= _FS_MAXDIST]
    ms = [
        (sum(p[2][k] for p in matches) + 1.0) / (len(matches) + 2.0)
        for k in range(4)
    ]
    want = sorted(
        (
            na,
            nb,
            g[0] * 8 + g[1] * 4 + g[2] * 2 + g[3],
            round(
                sum(
                    math.log(ms[k] / us[k])
                    if g[k]
                    else math.log((1 - ms[k]) / (1 - us[k]))
                    for k in range(4)
                ),
                6,
            ),
        )
        for na, nb, g, _d in pairs
    )
    got = sorted(
        (r["name_a"], r["name_b"], r["gamma"], r["fs_weight"])
        for r in q_dedup_fellegi_sunter(spark, SF).collect()
    )
    assert got == want


def test_sprt_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites31 import (
        _P0,
        _P1,
        q_ab_sprt_sequential,
    )

    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm, "
        f"CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = {}
    for day, arm, s in rows:
        nk = daily.setdefault((arm, day), [0, 0])
        nk[0] += 1
        nk[1] += s
    l1 = math.log(_P1 / _P0)
    l0 = math.log((1 - _P1) / (1 - _P0))
    a_bound = math.log(0.90 / 0.05)
    b_bound = math.log(0.10 / 0.95)
    want = {}
    for arm in (0, 1):
        n_cum = k_cum = 0
        for (a, day), (nn, kk) in sorted(
            (kd, v) for kd, v in daily.items() if kd[0] == arm
        ):
            n_cum += nn
            k_cum += kk
            llr = k_cum * l1 + (n_cum - k_cum) * l0
            dec = (
                "accept_h1"
                if llr >= a_bound
                else "accept_h0"
                if llr <= b_bound
                else "continue"
            )
            want[(day, arm)] = (n_cum, k_cum, round(llr, 6), dec)

    got = {
        (r["day"], r["arm"]): (r["n_cum"], r["k_cum"], r["llr"], r["decision"])
        for r in q_ab_sprt_sequential(spark, SF).collect()
    }
    assert got == want
