"""Round-6 fifth wave (operators/composites39.py): burstiness and
TextRank — checked against pure-python replays on sf0.001 (the oracle
gate re-proves them vs DuckDB at sf0.01)."""

import duckdb

SF = "/root/testdata/sf0.001"


def _texts():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_burstiness_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites39 import (
        _BURST_MIN_DF,
        q_text_burstiness,
    )

    stats = {}
    for _id, text in _texts():
        tf = {}
        for w in text.split(" "):
            tf[w] = tf.get(w, 0) + 1
        for w, n in tf.items():
            df, cf, df2 = stats.get(w, (0, 0, 0))
            stats[w] = (df + 1, cf + n, df2 + (n >= 2))
    want = {
        w: (df, cf, round(cf / df, 6), round(df2 / df, 6))
        for w, (df, cf, df2) in stats.items()
        if df >= _BURST_MIN_DF
    }
    got = {
        r["word"]: (r["df"], r["cf"], r["mean_tf"], r["adaptation"])
        for r in q_text_burstiness(spark, SF).collect()
    }
    assert got == want
    # sanity: adaptation is a probability, mean_tf >= 1
    assert all(0 <= v[3] <= 1 and v[2] >= 1 for v in got.values())
    assert len(got) > 5


def test_textrank_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites39 import (
        _TR_BASE,
        _TR_DAMP,
        _TR_ITERS,
        _TR_TOPK,
        q_text_textrank_terms,
    )

    pairs = set()
    for _id, text in _texts():
        w = text.split(" ")
        for i in range(len(w) - 1):
            if w[i] != w[i + 1]:
                pairs.add((w[i], w[i + 1]))
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = {}
    for s, _d in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {w: 1.0 for w in deg}
    for _ in range(_TR_ITERS):
        incoming = {}
        for s, d in edges:
            incoming.setdefault(d, []).append(s)
        new = {}
        for d, srcs in incoming.items():
            acc = 0.0
            for s in sorted(srcs):  # ascending-src fold, like both engines
                acc += ranks[s] / deg[s]
            new[d] = _TR_BASE + _TR_DAMP * acc
        ranks = new
    want = sorted(
        ((w, round(r, 6)) for w, r in ranks.items()),
        key=lambda t: (-t[1], t[0]),
    )[:_TR_TOPK]
    got = [
        (r["word"], r["textrank"])
        for r in q_text_textrank_terms(spark, SF).collect()
    ]
    assert got == want
