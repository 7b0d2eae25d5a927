"""Round-7 wave (operators/composites45.py): Gopher rules, Flesch
macro, FIM plan, embedding decontamination, Wilson source ranking,
gate-agreement kappa — each checked against a pure-python replay on
sf0.001 (the oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math
import re

import duckdb

SF = "/root/testdata/sf0.001"
_STOP = ("the", "a", "of", "to", "and")


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_gopher_rules_match_replay(spark):
    from kafkaish_spark.operators.composites45 import q_text_gopher_rules

    agg = {}
    for _id, text, _lang, source in _docs():
        ws = text.split(" ")
        nw = len(ws)
        sumlen = len(text) - (nw - 1)
        nstop = len(set(ws) & set(_STOP))
        maxk = max(ws.count(w) for w in set(ws))
        f_wc = nw < 50 or nw > 100000
        f_ml = sumlen < 3 * nw or sumlen > 10 * nw
        f_sw = nstop < 2
        f_rep = maxk * 20 > nw * 3
        a = agg.setdefault(source, [0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += f_wc
        a[2] += f_ml
        a[3] += f_sw
        a[4] += f_rep
        a[5] += not (f_wc or f_ml or f_sw or f_rep)
    got = {
        r["source"]: [
            r["n_docs"],
            r["fail_word_count"],
            r["fail_mean_word_len"],
            r["fail_stopwords"],
            r["fail_repetition"],
            r["n_pass"],
        ]
        for r in q_text_gopher_rules(spark, SF).collect()
    }
    assert got == agg
    # the suite discriminates on this corpus: some docs fail, some pass
    assert sum(a[5] for a in agg.values()) > 0
    assert sum(a[1] + a[3] for a in agg.values()) > 0


def test_flesch_matches_replay(spark):
    from kafkaish_spark.operators.composites45 import (
        q_text_flesch_readability,
    )

    tot = {}
    for _id, text, lang, _src in _docs():
        d, w, s = tot.setdefault(lang, [0, 0, 0])
        tot[lang] = [
            d + 1,
            w + len(text.split(" ")),
            s + len(re.findall(r"[aeiouy]+", text)),
        ]
    want = {
        lang: (
            d,
            w,
            s,
            round(206.835 - 1.015 * (w / d) - 84.6 * (s / w), 6),
        )
        for lang, (d, w, s) in tot.items()
    }
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_words"],
            r["n_syllables"],
            r["flesch_macro"],
        )
        for r in q_text_flesch_readability(spark, SF).collect()
    }
    assert got == want


def test_fim_plan_matches_replay_and_budgets(spark):
    from kafkaish_spark.operators.composites45 import (
        _FIM_SEED,
        q_text_fim_plan,
    )

    agg = {}
    for doc_id, text, lang, _src in _docs():
        nw = len(text.split(" "))
        h = hashlib.md5(f"{_FIM_SEED}{doc_id}".encode()).hexdigest()
        apply_fim = h[0] not in "ef"
        if not apply_fim:
            mode, p, m, s = "none", nw, 0, 0
        else:
            mode = "psm" if h[1] in "01234567" else "spm"
            c1 = int(h[2:6], 16) % (nw + 1)
            c2 = int(h[6:10], 16) % (nw + 1)
            lo, hi = min(c1, c2), max(c1, c2)
            p, m, s = lo, hi - lo, nw - hi
        a = agg.setdefault((lang, mode), [0, 0, 0, 0])
        agg[(lang, mode)] = [a[0] + 1, a[1] + p, a[2] + m, a[3] + s]
    got = {
        (r["lang"], r["fim_mode"]): [
            r["n_docs"],
            r["sum_prefix_words"],
            r["sum_middle_words"],
            r["sum_suffix_words"],
        ]
        for r in q_text_fim_plan(spark, SF).collect()
    }
    assert got == agg
    # per-doc budgets always sum to the doc's word count
    n_words_total = sum(len(t.split(" ")) for _i, t, _l, _s in _docs())
    assert (
        sum(v[1] + v[2] + v[3] for v in agg.values()) == n_words_total
    )
    # FIM rate near nominal 7/8 (hash-binomial, loose band)
    n = sum(v[0] for v in agg.values())
    n_fim = sum(v[0] for k, v in agg.items() if k[1] != "none")
    assert 0.7 < n_fim / n <= 1.0


def test_decontaminate_embedding_matches_replay(spark):
    from kafkaish_spark.operators.composites45 import (
        _DECON_BENCH_MAX,
        _DECON_TAU,
        q_decontaminate_embedding,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    bench = [e for i, e in rows if i < _DECON_BENCH_MAX]
    train = [(i, e) for i, e in rows if i >= _DECON_BENCH_MAX]

    def cos(a, b):
        # sequential left-to-right folds, matching the engine kernels
        d = 0.0
        for x, y in zip(a, b):
            d = d + float(x) * float(y)
        na = 0.0
        for x in a:
            na = na + float(x) * float(x)
        nb = 0.0
        for y in b:
            nb = nb + float(y) * float(y)
        return d / (math.sqrt(na) * math.sqrt(nb))

    want = {}
    for i, e in train:
        mc = max(cos(e, b) for b in bench)
        want[i] = (round(mc, 6), int(mc >= _DECON_TAU))
    got = {
        r["vec_id"]: (r["max_cos"], r["contaminated"])
        for r in q_decontaminate_embedding(spark, SF).collect()
    }
    assert got == want
    assert set(got) == {i for i, _ in train}  # bench side excluded


def test_wilson_ranking_matches_replay(spark):
    from kafkaish_spark.operators.composites45 import (
        _WILSON_Z,
        _WILSON_Z2,
        q_source_quality_wilson,
    )

    g = {}
    for _id, text, _lang, source in _docs():
        n, k = g.setdefault(source, (0, 0))
        g[source] = (n + 1, k + (len(set(text.split(" ")) & set(_STOP)) >= 2))
    scored = {}
    for src, (n, k) in g.items():
        ph = k / n
        w = (
            ph
            + _WILSON_Z2 / (2 * n)
            - _WILSON_Z * math.sqrt((ph * (1.0 - ph) + _WILSON_Z2 / (4 * n)) / n)
        ) / (1.0 + _WILSON_Z2 / n)
        scored[src] = (n, k, w)
    order = sorted(scored, key=lambda s: (-scored[s][2], s))
    want = {
        src: (n, k, round(w, 6), order.index(src) + 1)
        for src, (n, k, w) in scored.items()
    }
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_pass"],
            r["wilson_lb"],
            r["quality_rank"],
        )
        for r in q_source_quality_wilson(spark, SF).collect()
    }
    assert got == want
    # the lower bound is conservative: always below the raw rate, in [0,1)
    for src, (n, k, w) in scored.items():
        assert 0.0 <= w < k / n + 1e-12 if k else w >= 0.0


def test_kappa_matches_replay_and_bounds(spark):
    from kafkaish_spark.operators.composites45 import q_gate_agreement_kappa

    n11 = n10 = n01 = n00 = 0
    for _id, text, _lang, _src in _docs():
        ws = text.split(" ")
        ga = len(ws) >= 50
        gb = len(set(ws) & set(_STOP)) >= 2
        n11 += ga and gb
        n10 += ga and not gb
        n01 += (not ga) and gb
        n00 += (not ga) and (not gb)
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    row = q_gate_agreement_kappa(spark, SF).collect()[0]
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    assert row["p_observed"] == round(po, 6)
    assert row["p_expected"] == round(pe, 6)
    assert row["kappa"] == round((po - pe) / (1.0 - pe), 6)
    assert -1.0 <= row["kappa"] <= 1.0
