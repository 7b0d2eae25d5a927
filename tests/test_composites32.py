"""Round-5 sixth wave (operators/composites32.py): interpolated
Kneser-Ney bigram scoring and Turing adjusted counts — each checked
against a pure-python replay on sf0.001 (the oracle gate re-proves
them vs DuckDB at sf0.01)."""

import math

import duckdb

SF = "/root/testdata/sf0.001"


def _bigrams():
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    out = []
    for d, text in docs:
        ws = [w for w in text.split(" ") if w != ""]
        out.extend((d, a, b) for a, b in zip(ws, ws[1:]))
    return out


def test_kneser_ney_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites32 import (
        _KN_D,
        q_text_kneser_ney_bigram,
    )

    big = _bigrams()
    c12, c1, n1f, n1b, dtf = {}, {}, {}, {}, {}
    for d, a, b in big:
        c12[(a, b)] = c12.get((a, b), 0) + 1
        dtf.setdefault(d, {})
        dtf[d][(a, b)] = dtf[d].get((a, b), 0) + 1
    for (a, b), c in c12.items():
        c1[a] = c1.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    bb = float(len(c12))
    want = {}
    for d, counts in dtf.items():
        n = sum(counts.values())
        s = 0.0
        for (a, b) in sorted(counts):  # fold in bigram order, like the query
            p = (max(c12[(a, b)] - _KN_D, 0.0) / c1[a]) + (
                _KN_D / c1[a]
            ) * n1f[a] * (n1b[b] / bb)
            s += counts[(a, b)] * math.log(p)
        want[d] = (n, round(s / n, 6))

    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_logprob"])
        for r in q_text_kneser_ney_bigram(spark, SF).collect()
    }
    assert got == want


def test_turing_counts_match_pure_python_replay(spark):
    from kafkaish_spark.operators.composites32 import (
        _GT_MAX_R,
        q_text_turing_counts,
    )

    c12 = {}
    for _d, a, b in _bigrams():
        c12[(a, b)] = c12.get((a, b), 0) + 1
    fof = {}
    for r in c12.values():
        fof[r] = fof.get(r, 0) + 1
    n = float(sum(r * nr for r, nr in fof.items()))
    want = {}
    for r, nr in fof.items():
        if r > _GT_MAX_R or (r + 1) not in fof:
            continue
        r_star = (r + 1) * (fof[r + 1] / nr)
        want[r] = (
            nr,
            round(r_star, 6),
            round(nr * r / n, 6),
            round(nr * r_star / n, 6),
        )
    assert want, "degenerate fixture: no adjacent-r rows"

    got = {
        r["r"]: (r["n_r"], r["r_star"], r["raw_mass"], r["gt_mass"])
        for r in q_text_turing_counts(spark, SF).collect()
    }
    assert got == want
