"""Round-6 sixth wave (operators/composites40.py): CMS calibration
and out-of-fold target encoding — checked against pure-python replays
on sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def test_cms_calibration_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites40 import (
        _CMS_DEPTH,
        _CMS_TOPN,
        q_sketch_cms_calibration,
    )

    rows = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall()
    exact = {}
    for (text,) in rows:
        for w in text.split(" "):
            exact[w] = exact.get(w, 0) + 1
    n_total = sum(exact.values())

    def bucket(s, word):
        return hashlib.md5(f"{s}:{word}".encode()).hexdigest()[:2]

    cells = {}
    for word, cf in exact.items():
        for s in range(_CMS_DEPTH):
            k = (s, bucket(s, word))
            cells[k] = cells.get(k, 0) + cf
    top = sorted(exact.items(), key=lambda t: (-t[1], t[0]))[:_CMS_TOPN]
    want = {}
    for word, cf in top:
        est = min(cells[(s, bucket(s, word))] for s in range(_CMS_DEPTH))
        want[word] = (cf, est, est - cf, round((est - cf) / n_total, 6))
    got = {
        r["word"]: (
            r["exact_cf"],
            r["cms_est"],
            r["overestimate"],
            r["over_vs_n"],
        )
        for r in q_sketch_cms_calibration(spark, SF).collect()
    }
    assert got == want
    # structural invariant: CMS never undercounts
    assert all(v[2] >= 0 for v in got.values())
    assert len(got) == _CMS_TOPN


def test_target_encode_oof_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites40 import (
        _TE_FOLDS,
        q_feat_target_encode_oof,
    )

    rows = duckdb.sql(
        f"SELECT o_orderkey, o_orderpriority, "
        f"CAST(round(o_totalprice*100,0) AS BIGINT) "
        f"FROM '{SF}/orders.parquet'"
    ).fetchall()
    dealt = sorted(
        (hashlib.md5(str(k).encode()).hexdigest()[:4], k, cat, y)
        for k, cat, y in rows
    )
    per = {}
    for rn, (_hx, _k, cat, y) in enumerate(dealt):
        fold = rn % _TE_FOLDS
        n, s = per.get((cat, fold), (0, 0))
        per[(cat, fold)] = (n + 1, s + y)
    tot = {}
    for (cat, _f), (n, s) in per.items():
        nt, st = tot.get(cat, (0, 0))
        tot[cat] = (nt + n, st + s)
    want = {
        (cat, f): (n, round((tot[cat][1] - s) / (tot[cat][0] - n) / 100.0, 6))
        for (cat, f), (n, s) in per.items()
    }
    got = {
        (r["cat"], r["fold"]): (r["n_rows"], r["oof_mean_price"])
        for r in q_feat_target_encode_oof(spark, SF).collect()
    }
    assert got == want
    # leakage-freeness smoke: a cell's OOF mean differs from the naive
    # all-data mean whenever its own fold's mean differs from the rest
    naive = {cat: st / nt / 100.0 for cat, (nt, st) in tot.items()}
    diffs = [
        abs(v[1] - naive[cat]) for (cat, _f), v in got.items()
    ]
    assert any(d > 1e-9 for d in diffs)
