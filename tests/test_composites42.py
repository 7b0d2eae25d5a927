"""Round-6 eighth wave (operators/composites42.py): negative-sampling
table and co-occurrence profile — checked against pure-python replays
on sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _texts():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_negative_sampling_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites42 import (
        _NEG_POWER,
        _NEG_TOPK,
        q_train_negative_sampling,
    )

    cf = {}
    for _id, text in _texts():
        for w in text.split(" "):
            cf[w] = cf.get(w, 0) + 1
    n_total = sum(cf.values())
    p = {w: c ** _NEG_POWER for w, c in cf.items()}
    # two-phase ordered fold: word-ordered within md5-prefix buckets,
    # then bucket-ordered over the partials — same as both engines
    buckets = {}
    for w in p:
        buckets.setdefault(
            hashlib.md5(w.encode()).hexdigest()[:2], []
        ).append(w)
    partials = {}
    for b, ws in buckets.items():
        s = 0.0
        for w in sorted(ws):
            s += p[w]
        partials[b] = s
    z = 0.0
    for b in sorted(partials):
        z += partials[b]
    scored = sorted(
        (
            (w, cf[w], round(p[w] / z, 6), round(cf[w] / n_total, 6))
            for w in cf
        ),
        key=lambda t: (-t[2], t[0]),
    )[:_NEG_TOPK]
    got = [
        (r["word"], r["cf"], r["neg_prob"], r["unigram_prob"])
        for r in q_train_negative_sampling(spark, SF).collect()
    ]
    assert got == scored
    # the 3/4 power flattens the head: top term's neg share is below
    # its raw unigram share
    assert got[0][2] < got[0][3]


def test_cooc_profile_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites42 import (
        _COOC_WINDOW,
        q_text_cooc_profile,
    )

    pairs = {}
    vocab = set()
    for _id, text in _texts():
        w = text.split(" ")
        vocab.update(w)
        for i in range(len(w)):
            for o in range(1, _COOC_WINDOW + 1):
                if i + o < len(w) and w[i] != w[i + o]:
                    a, b = sorted((w[i], w[i + o]))
                    pairs[(a, b)] = pairs.get((a, b), 0) + 1
    nnz = len(pairs)
    mass = sum(pairs.values())
    top100 = sum(
        n
        for _k, n in sorted(
            pairs.items(), key=lambda t: (-t[1], t[0])
        )[:100]
    )
    v = len(vocab)
    got = q_text_cooc_profile(spark, SF).first()
    assert got["vocab"] == v
    assert got["nnz_pairs"] == nnz
    assert got["total_mass"] == mass
    assert got["max_pair_count"] == max(pairs.values())
    assert got["density"] == round(nnz / (v * (v - 1) / 2.0), 6)
    assert got["top100_mass_share"] == round(top100 / mass, 6)
    # mass = 2 positions per pair-slot x window, minus boundary slots:
    # for window 2 it is 2N - 3*docs adjusted by same-word skips, so
    # just sanity-bound it
    assert 0 < got["density"] <= 1.0
