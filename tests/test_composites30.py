"""Round-5 fourth wave (operators/composites30.py): DSIR hashed-n-gram
importance weights and Moore-Lewis cross-entropy difference — each
checked against a pure-python replay on sf0.001 (the oracle gate
re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()


def _words(text):
    return [w for w in text.split(" ") if w != ""]


def test_dsir_weights_match_pure_python_replay(spark):
    from kafkaish_spark.operators.composites30 import (
        _DSIR_BUCKETS,
        _TARGET_LANG,
        q_train_dsir_weights,
    )

    def bucket(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS

    docs = _docs()
    doc_b, pool, tgt = {}, {}, {}
    for d, lang, t in docs:
        for w in _words(t):
            b = bucket(w)
            doc_b.setdefault(d, {})
            doc_b[d][b] = doc_b[d].get(b, 0) + 1
            pool[b] = pool.get(b, 0) + 1
            if lang == _TARGET_LANG:
                tgt[b] = tgt.get(b, 0) + 1
    qn = float(sum(pool.values()))
    pn = float(sum(tgt.values()))
    lr = {
        b: math.log((tgt.get(b, 0) + 1) / (pn + _DSIR_BUCKETS))
        - math.log((qc + 1) / (qn + _DSIR_BUCKETS))
        for b, qc in pool.items()
    }
    want = {}
    for d, counts in doc_b.items():
        n = sum(counts.values())
        # fold in bucket order, like the query's array_sort
        s = 0.0
        for b in sorted(counts):
            s += counts[b] * lr[b]
        want[d] = (n, round(s / n, 6))

    got = {
        r["doc_id"]: (r["n_words"], r["dsir_logratio"])
        for r in q_train_dsir_weights(spark, SF).collect()
    }
    assert got == want


def test_moore_lewis_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites30 import (
        _TARGET_LANG,
        q_train_moore_lewis,
    )

    docs = _docs()
    qc, pc, tf = {}, {}, {}
    for d, lang, t in docs:
        for w in _words(t):
            qc[w] = qc.get(w, 0) + 1
            if lang == _TARGET_LANG:
                pc[w] = pc.get(w, 0) + 1
            tf.setdefault(d, {})
            tf[d][w] = tf[d].get(w, 0) + 1
    v = float(len(qc))
    qn = float(sum(qc.values()))
    pn = float(sum(pc.values()))
    want = {}
    for d, counts in tf.items():
        n = sum(counts.values())
        s = 0.0
        for w in sorted(counts):  # fold in word order, like the query
            s += counts[w] * (
                math.log((pc.get(w, 0) + 1) / (pn + v))
                - math.log((qc[w] + 1) / (qn + v))
            )
        want[d] = (n, round(s / n, 6))

    got = {
        r["doc_id"]: (r["n_words"], r["ce_diff"])
        for r in q_train_moore_lewis(spark, SF).collect()
    }
    assert got == want
