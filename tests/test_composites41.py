"""Round-6 seventh wave (operators/composites41.py): RAKE keyphrases
and the DoReMi-style reweighting step — checked against pure-python
replays on sf0.001 (the oracle gate re-proves them vs DuckDB at
sf0.01)."""

import math
import re

import duckdb

SF = "/root/testdata/sf0.001"


def _texts():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet'"
    ).fetchall()


def _phrases(text):
    padded = f" {text} "
    for _ in range(2):  # double replace: overlapping stopword runs
        padded = re.sub(r" (a|the) ", " | ", padded)
    return [p.strip() for p in padded.split("|") if p.strip()]


def test_rake_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites41 import (
        _RAKE_TOPK,
        q_text_rake_keyphrases,
    )

    all_phr = []
    for _id, text, _src in _texts():
        all_phr.extend(_phrases(text))
    freq, deg = {}, {}
    for p in all_phr:
        ws = p.split(" ")
        for w in ws:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ws)
    counts = {}
    for p in all_phr:
        counts[p] = counts.get(p, 0) + 1
    scored = []
    for p, n in counts.items():
        s = 0.0
        for w in p.split(" "):  # position-ordered fold
            s += deg[w] / freq[w]
        scored.append((p, n, round(s, 6)))
    want = sorted(scored, key=lambda t: (-t[2], t[0]))[:_RAKE_TOPK]
    got = [
        (r["phrase"], r["n_occurrences"], r["rake"])
        for r in q_text_rake_keyphrases(spark, SF).collect()
    ]
    assert got == want
    # RAKE favors long phrases: the top phrase has >= 2 words
    assert len(got[0][0].split(" ")) >= 2


def test_doremi_step_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites41 import (
        _DRM_ETA,
        _DRM_TOPV,
        q_train_doremi_step,
    )

    cnt = {}
    for _id, text, src in _texts():
        for w in text.split(" "):
            cnt[(src, w)] = cnt.get((src, w), 0) + 1
    vocab = {}
    for (src, w), tf in cnt.items():
        vocab[w] = vocab.get(w, 0) + tf
    ranked = sorted(vocab, key=lambda w: (-vocab[w], w))
    keep = set(ranked[:_DRM_TOPV])
    pooled = {}
    for (src, w), tf in cnt.items():
        term = w if w in keep else "¤"
        pooled[(src, term)] = pooled.get((src, term), 0) + tf
    lm = {}
    for (src, term), tf in pooled.items():
        lm[term] = lm.get(term, 0) + tf
    n_total = sum(lm.values())
    ce, tokens = {}, {}
    for src in sorted({s for s, _ in pooled}):
        terms = sorted(term for s, term in pooled if s == src)
        acc = 0.0
        tok = 0
        for term in terms:  # term-sorted fold
            tf = pooled[(src, term)]
            acc += tf * math.log(lm[term] / float(n_total))
            tok += tf
        ce[src] = -acc / tok
        tokens[src] = tok
    srcs = sorted(ce)
    mean_ce = 0.0
    for s in srcs:
        mean_ce += ce[s]
    mean_ce /= len(srcs)
    w = {s: math.exp(_DRM_ETA * (ce[s] - mean_ce)) for s in srcs}
    z = 0.0
    for s in srcs:
        z += w[s]
    want = {
        s: (tokens[s], round(ce[s], 6), round(w[s] / z, 6)) for s in srcs
    }
    got = {
        r["source"]: (r["tokens"], r["ce_nats"], r["new_weight"])
        for r in q_train_doremi_step(spark, SF).collect()
    }
    assert got == want
    # weights form a distribution and upweight hard (high-CE) domains
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-4
    hardest = max(got, key=lambda s: got[s][1])
    assert got[hardest][2] == max(v[2] for v in got.values())
