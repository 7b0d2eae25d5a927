"""Round-5 third wave (operators/composites29.py): BM25 ranking, PMI
collocations, Heaps-law growth, Zipf fit — each checked against a
pure-python replay on sf0.001 (the oracle gate re-proves them vs
DuckDB at sf0.01)."""

import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, lang, text FROM '{SF}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()


def test_bm25_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites29 import (
        _B,
        _BM25_TERMS,
        _K1,
        q_text_bm25_rank,
    )

    docs = _docs()
    toks = {d: t.split(" ") for d, _, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {
        w: sum(1 for v in toks.values() if w in v) for w in _BM25_TERMS
    }
    scores = {}
    for d, _, _t in docs:
        s = 0.0
        for w in sorted(_BM25_TERMS):  # fold in word order, like the query
            tf = toks[d].count(w)
            if tf == 0:
                continue
            idf = math.log(1 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            s += (
                idf
                * (tf * (_K1 + 1))
                / (tf + _K1 * (1 - _B + _B * len(toks[d]) / avgdl))
            )
        if s > 0:
            scores[d] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in q_text_bm25_rank(spark, SF).collect()
    ]
    assert got == want


def test_pmi_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites29 import (
        _PMI_MIN_COUNT,
        q_text_pmi_collocations,
    )

    bigrams = []
    for _d, _l, t in _docs():
        ws = t.split(" ")
        bigrams.extend(zip(ws, ws[1:]))
    n = len(bigrams)
    c12, c1, c2 = {}, {}, {}
    for a, b in bigrams:
        c12[(a, b)] = c12.get((a, b), 0) + 1
        c1[a] = c1.get(a, 0) + 1
        c2[b] = c2.get(b, 0) + 1
    scored = [
        (a, b, round(math.log(k * n / (c1[a] * c2[b])), 6))
        for (a, b), k in c12.items()
        if k >= _PMI_MIN_COUNT
    ]
    want = sorted(scored, key=lambda x: (-x[2], x[0], x[1]))[:20]
    got = [
        (r["w1"], r["w2"], r["pmi"])
        for r in q_text_pmi_collocations(spark, SF).collect()
    ]
    assert got == want


def test_heaps_curve_is_monotone_and_ends_at_corpus_totals(spark):
    from kafkaish_spark.operators.composites29 import q_text_heaps_law

    rows = q_text_heaps_law(spark, SF).orderBy("decile").collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    toks = [r["n_tokens"] for r in rows]
    vocab = [r["vocab"] for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    # final decile == whole corpus (threshold = max doc_id)
    docs = _docs()
    all_words = [w for _d, _l, t in docs for w in t.split(" ")]
    assert toks[-1] == len(all_words)
    assert vocab[-1] == len(set(all_words))
    # sublinearity sanity: vocab grows slower than tokens after decile 1
    assert vocab[-1] / vocab[0] < toks[-1] / toks[0]


def test_zipf_fit_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites29 import (
        _ZIPF_TOPN,
        q_text_zipf_fit,
    )

    freq = {}
    for _d, lang, t in _docs():
        for w in t.split(" "):
            freq[(lang, w)] = freq.get((lang, w), 0) + 1
    langs = sorted({k[0] for k in freq})
    want = []
    for lang in langs:
        ranked = sorted(
            ((f, w) for (lg, w), f in freq.items() if lg == lang),
            key=lambda x: (-x[0], x[1]),
        )[:_ZIPF_TOPN]
        n = len(ranked)
        sx = sy = sxy = sxx = 0.0
        for i, (f, _w) in enumerate(ranked, start=1):
            x, y = math.log(float(i)), math.log(float(f))
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        want.append(
            (lang, n, round(slope, 6), round((sy - slope * sx) / n, 6))
        )
    got = [
        (r["lang"], r["n_terms"], r["slope"], r["intercept"])
        for r in q_text_zipf_fit(spark, SF).collect()
    ]
    assert got == want
    # Zipfian corpora have negative slope
    assert all(s < 0 for _l, _n, s, _i in got)


def test_zipf_rank_window_is_group_limited(spark):
    """The per-lang top-100 rank must plan a WindowGroupLimit (map-side
    pre-filter to k winners) — the window never sees the full
    vocabulary of a language in one unfiltered task."""
    from kafkaish_spark.operators.composites29 import q_text_zipf_fit

    plan = (
        q_text_zipf_fit(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_leakage_safe_split_matches_pure_python_replay(spark):
    import hashlib

    from kafkaish_spark.operators.composites29 import q_split_leakage_safe

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 10

    def label(b):
        return "train" if b < 8 else ("val" if b == 8 else "test")

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    per_split = {}
    grp = {}
    for doc_id, n_chars, text in docs:
        gkey = hashlib.md5(text.encode()).hexdigest()
        split = label(bucket(text))
        naive = label(bucket(str(doc_id)))
        d = per_split.setdefault(split, [0, 0])
        d[0] += 1
        d[1] += n_chars
        g = grp.setdefault(gkey, (split, set()))
        g[1].add(naive)
    gps = {}
    for gkey, (split, naives) in grp.items():
        g = gps.setdefault(split, [0, 0])
        g[0] += 1
        g[1] += 1 if len(naives) > 1 else 0
    want = sorted(
        (s, per_split[s][0], per_split[s][1], gps[s][0], gps[s][1])
        for s in per_split
    )
    got = [
        (
            r["split"], r["n_docs"], r["sum_chars"], r["n_groups"],
            r["naive_leaked_groups"],
        )
        for r in q_split_leakage_safe(spark, SF).collect()
    ]
    assert got == want
    assert sum(r[1] for r in got) == len(docs)


def test_length_batching_matches_replay_and_beats_arrival_order(spark):
    from kafkaish_spark.operators.composites29 import (
        _BATCH_B,
        q_pack_length_batching,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) FROM "
        f"'{SF}/documents.parquet'"
    ).fetchall()

    def stats(order):
        n_b = tot = pad = 0
        for i in range(0, len(order), _BATCH_B):
            chunk = [n for _d, n in order[i : i + _BATCH_B]]
            n_b += 1
            tot += sum(chunk)
            pad += len(chunk) * max(chunk) - sum(chunk)
        return n_b, tot, pad

    arrival = stats(sorted(docs, key=lambda x: x[0]))
    bylen = stats(sorted(docs, key=lambda x: (x[1], x[0])))
    want = [
        ("arrival_order", *arrival,
         round(arrival[2] / (arrival[2] + arrival[1]), 6)),
        ("length_sorted", *bylen,
         round(bylen[2] / (bylen[2] + bylen[1]), 6)),
    ]
    got = [
        (
            r["strategy"], r["n_batches"], r["total_tokens"],
            r["total_padding"], r["pad_ratio"],
        )
        for r in q_pack_length_batching(spark, SF).collect()
    ]
    assert got == want
    # the whole point of length bucketing
    assert bylen[2] < arrival[2]


def test_source_overlap_matches_pure_python_replay(spark):
    import hashlib

    from kafkaish_spark.operators.composites29 import (
        q_corpus_source_overlap,
    )

    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    sets = {}
    for src, text in rows:
        fp = hashlib.md5(
            " ".join(sorted(set(text.split(" ")))).encode()
        ).hexdigest()
        sets.setdefault(src, set()).add(fp)
    want = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a >= b:
                continue
            shared = len(sets[a] & sets[b])
            if shared:
                want.append(
                    (
                        a, b, shared, len(sets[a]), len(sets[b]),
                        round(
                            shared / len(sets[a] | sets[b]), 6
                        ),
                    )
                )
    got = [
        (
            r["src_a"], r["src_b"], r["n_shared"], r["n_a"], r["n_b"],
            r["jaccard"],
        )
        for r in q_corpus_source_overlap(spark, SF).collect()
    ]
    assert got == want
    assert len(got) > 0  # the fingerprint class must actually fire
