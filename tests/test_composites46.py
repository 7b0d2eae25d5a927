"""Round-7 second wave (operators/composites46.py): join-key skew
audit, Hill tail index, shard balance — pure-python replays on sf0.001
(the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.001"


def test_join_key_skew_matches_replay(spark):
    from kafkaish_spark.operators.composites46 import q_audit_join_key_skew

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT l_orderkey FROM '{SF}/lineitem.parquet'"
        ).fetchall()
    ]
    fan = {}
    for k in keys:
        fan[k] = fan.get(k, 0) + 1
    hist = {}
    for k, c in fan.items():
        hist[c] = hist.get(c, 0) + 1
    total = len(keys)
    want = {
        c: (nk, c * nk, round((c * nk) / total, 6)) for c, nk in hist.items()
    }
    got = {
        r["fanout"]: (r["n_keys"], r["n_rows"], r["row_share"])
        for r in q_audit_join_key_skew(spark, SF).collect()
    }
    assert got == want
    # shares partition the fact table
    assert sum(v[1] for v in want.values()) == total


def test_hill_tail_index_matches_replay(spark):
    from kafkaish_spark.operators.composites46 import (
        _HILL_K,
        q_text_hill_tail_index,
    )

    rows = duckdb.sql(f"SELECT text FROM '{SF}/documents.parquet'").fetchall()
    freq = {}
    for (text,) in rows:
        for w in text.split(" "):
            freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_HILL_K]
    ck = top[-1][1]
    # ordered fold, rank order — the engines' exact sequence
    lnsum = 0.0
    for _w, c in top[: _HILL_K - 1]:
        lnsum = lnsum + math.log(c / ck)
    alpha = round(1.0 / (lnsum / (_HILL_K - 1)), 6)
    row = q_text_hill_tail_index(spark, SF).collect()[0]
    assert row["n_vocab"] == len(freq)
    assert row["k_terms"] == _HILL_K - 1
    assert row["x_k"] == ck
    assert row["hill_alpha"] == alpha
    assert row["hill_alpha"] > 0


def test_shard_balance_matches_replay(spark):
    from kafkaish_spark.operators.composites46 import (
        _N_SHARDS,
        _SHARD_SEED,
        q_train_shard_balance,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    g = {}
    for doc_id, text in rows:
        h = hashlib.md5(f"{_SHARD_SEED}{doc_id}".encode()).hexdigest()
        shard = int(h[:8], 16) % _N_SHARDS
        nd, nt = g.get(shard, (0, 0))
        g[shard] = (nd + 1, nt + len(text.split(" ")))
    total = sum(nt for _nd, nt in g.values())
    want = {
        s: (nd, nt, round(nt / total, 6)) for s, (nd, nt) in g.items()
    }
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["token_share"])
        for r in q_train_shard_balance(spark, SF).collect()
    }
    assert got == want
    # every doc landed in exactly one shard
    assert sum(v[0] for v in want.values()) == len(rows)


def test_hill_tail_index_degenerate_vocab_yields_null(spark, tmp_path):
    """A corpus with fewer than _HILL_K distinct words must yield NULL
    x_k / hill_alpha (the oracle's empty-subquery NULL), not an ANSI
    INVALID_ARRAY_INDEX crash (r7 advice item 3 — try_element_at)."""
    from kafkaish_spark.operators.composites46 import q_text_hill_tail_index

    spark.createDataFrame(
        [(1, "alpha beta gamma alpha")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    row = q_text_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert row["n_vocab"] == 3
    assert row["x_k"] is None
    assert row["hill_alpha"] is None
