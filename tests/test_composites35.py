"""Round-6 wave (operators/composites35.py): drift monitoring and
corpus QA — checked against pure-python replays on sf0.001 (the
oracle gate re-proves them vs DuckDB at sf0.01)."""

import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_psi_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites35 import (
        _PSI_CUR_Y,
        _PSI_REF_Y,
        q_drift_psi_orders,
    )

    rows = duckdb.sql(
        f"SELECT CAST(round(o_totalprice*100,0) AS BIGINT), "
        f"EXTRACT(year FROM o_orderdate) FROM '{SF}/orders.parquet'"
    ).fetchall()
    ref = sorted(c for c, y in rows if y == _PSI_REF_Y)
    cur = [c for c, y in rows if y == _PSI_CUR_Y]
    # discrete deciles: lowest member at-or-above the quantile
    edges = sorted(
        {ref[min(len(ref) - 1, math.ceil(x / 10.0 * len(ref)) - 1)] for x in range(1, 10)}
    )

    def _bin(c):
        return sum(1 for e in edges if e < c)

    nb = len(edges) + 1
    nr = [0] * nb
    nc = [0] * nb
    for c in ref:
        nr[_bin(c)] += 1
    for c in cur:
        nc[_bin(c)] += 1
    tr, tc = len(ref), len(cur)
    psi = 0.0
    for b in range(nb):
        p = (nr[b] + 0.5) / (tr + 5.0)
        q = (nc[b] + 0.5) / (tc + 5.0)
        psi += (p - q) * math.log(p / q)
    got = q_drift_psi_orders(spark, SF).first()
    assert (got["n_ref"], got["n_cur"]) == (tr, tc)
    assert got["psi"] == round(psi, 6)
    assert tr > 50 and tc > 50  # fixture really has both periods


def test_js_divergence_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites35 import (
        _JS_TOPV,
        q_drift_js_terms,
    )

    ca, cb = {}, {}
    for _id, text, lang, _n in _docs():
        tgt = ca if lang == "en" else cb
        for w in text.split(" "):
            tgt[w] = tgt.get(w, 0) + 1
    vocab = sorted(
        set(ca) | set(cb),
        key=lambda w: (-(ca.get(w, 0) + cb.get(w, 0)), w),
    )
    keep = set(vocab[:_JS_TOPV])
    pa, pb = {}, {}
    for w in set(ca) | set(cb):
        term = w if w in keep else "¤"
        pa[term] = pa.get(term, 0) + ca.get(w, 0)
        pb[term] = pb.get(term, 0) + cb.get(w, 0)
    ta, tb, v = sum(pa.values()), sum(pb.values()), len(pa)
    js = 0.0
    for term in sorted(pa):  # term-sorted fold, same as both engines
        p = (pa[term] + 0.5) / (ta + 0.5 * v)
        q = (pb.get(term, 0) + 0.5) / (tb + 0.5 * v)
        m = (p + q) / 2
        js += 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    got = q_drift_js_terms(spark, SF).first()
    assert (got["n_tokens_en"], got["n_tokens_other"], got["n_terms"]) == (
        ta,
        tb,
        v,
    )
    assert got["js_divergence"] == round(js, 6)
    assert 0.0 < got["js_divergence"] < math.log(2) + 1e-9  # JS bound


def test_theil_sen_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites35 import q_ts_theil_sen

    rows = duckdb.sql(
        f"SELECT event_type, date_diff('day', DATE '2024-01-01', "
        f"CAST(ts AS DATE)), COUNT(*) FROM '{SF}/events.parquet' "
        f"GROUP BY 1, 2"
    ).fetchall()
    series = {}
    for et, d, y in rows:
        series.setdefault(et, []).append((d, y))
    want = {}
    for et, pts in series.items():
        pts.sort()
        slopes = sorted(
            round((y2 - y1) * 1e6 / (d2 - d1))
            for i, (d1, y1) in enumerate(pts)
            for (d2, y2) in pts[i + 1 :]
        )
        # percentile_disc(0.5): lowest member at-or-above the median
        m = slopes[math.ceil(0.5 * len(slopes)) - 1]
        want[et] = (len(pts), len(slopes), round(m / 1e6, 6))
    got = {
        r["event_type"]: (r["n_days"], r["n_pairs"], r["sen_slope"])
        for r in q_ts_theil_sen(spark, SF).collect()
    }
    assert got == want


def test_embedding_shift_matches_pure_python_replay(spark):
    from kafkaish_spark.operators.composites35 import (
        _EMB_GRID,
        q_drift_embedding_shift,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    dims = len(rows[0][1])
    sa, sb = [0] * dims, [0] * dims
    na = nb = 0
    for vid, emb in rows:
        tgt = sa if vid % 2 == 0 else sb
        if vid % 2 == 0:
            na += 1
        else:
            nb += 1
        for i, v in enumerate(emb):
            # float32 -> double then grid-round, same as both engines
            tgt[i] += round(float(v) * _EMB_GRID)
    ab = aa = bb = 0.0
    for i in range(dims):  # dim-sorted fold
        ab += float(sa[i]) * float(sb[i])
        aa += float(sa[i]) * float(sa[i])
        bb += float(sb[i]) * float(sb[i])
    got = q_drift_embedding_shift(spark, SF).first()
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["centroid_cosine"] == round(
        ab / (math.sqrt(aa) * math.sqrt(bb)), 6
    )
    # zero-mean synthetic embeddings: the cohort centroids are noise
    # vectors, so the cosine is small but must stay a valid cosine
    assert -1.0 <= got["centroid_cosine"] <= 1.0


def test_token_fertility_matches_pure_python_replay(spark):
    import re

    from kafkaish_spark.operators.composites35 import (
        q_text_token_fertility,
    )

    agg = {}
    for _id, text, lang, _n in _docs():
        words = len(text.split(" "))
        sub = len(re.findall(r"[a-z0-9]{1,3}", text.lower()))
        by = len(text.encode("utf-8"))
        d, w, s, b = agg.get(lang, (0, 0, 0, 0))
        agg[lang] = (d + 1, w + words, s + sub, b + by)
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_words"],
            r["n_subwords"],
            r["fertility"],
            r["bytes_per_subword"],
        )
        for r in q_text_token_fertility(spark, SF).collect()
    }
    for lang, (d, w, s, b) in agg.items():
        assert got[lang] == (d, w, s, round(s / w, 6), round(b / s, 6))
    # zh should show more bytes per subword than en (multibyte chars)
    if "zh" in got and "en" in got:
        assert got["zh"][4] >= got["en"][4]


def test_encoding_audit_matches_pure_python_replay(spark):
    import re

    from kafkaish_spark.operators.composites35 import (
        q_text_encoding_audit,
    )

    ctrl = re.compile("[\x01-\x08\x0b\x0c\x0e-\x1f]")
    agg = {}
    for _id, text, lang, _n in _docs():
        by = len(text.encode("utf-8"))
        ch = len(text)
        d, rep, nb, ct, ex, tot = agg.get(lang, (0, 0, 0, 0, 0, 0))
        agg[lang] = (
            d + 1,
            rep + ("�" in text),
            nb + (" " in text),
            ct + bool(ctrl.search(text)),
            ex + (by - ch),
            tot + by,
        )
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_replacement_char"],
            r["n_nbsp"],
            r["n_ctrl"],
            r["extra_utf8_bytes"],
            r["nonascii_byte_ratio"],
        )
        for r in q_text_encoding_audit(spark, SF).collect()
    }
    for lang, (d, rep, nb, ct, ex, tot) in agg.items():
        assert got[lang] == (d, rep, nb, ct, ex, round(ex / tot, 6))
    # the synthetic corpus is pure-ASCII word soup in every lang, so
    # ratios are 0 here; the assertion pins the replay equality above
    # and the ratio's validity, not a corpus property
    assert all(0.0 <= v[5] <= 1.0 for v in got.values())


def test_kfold_is_stratified_and_deterministic(spark):
    from kafkaish_spark.operators.composites35 import (
        _KFOLDS,
        q_split_kfold_stratified,
    )

    per_lang = {}
    for doc_id, _t, lang, n in _docs():
        per_lang.setdefault(lang, []).append(
            (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id, n)
        )
    want = {}
    for lang, items in per_lang.items():
        items.sort()
        for rn, (_h, _id, n) in enumerate(items):
            key = (lang, rn % _KFOLDS)
            d, s = want.get(key, (0, 0))
            want[key] = (d + 1, s + n)
    got = {
        (r["lang"], r["fold"]): (r["n_docs"], r["sum_chars"])
        for r in q_split_kfold_stratified(spark, SF).collect()
    }
    assert got == want
    # stratification: within every lang, fold sizes differ by <= 1
    for lang in per_lang:
        sizes = [got[(lang, f)][0] for f in range(_KFOLDS) if (lang, f) in got]
        assert max(sizes) - min(sizes) <= 1
    # determinism: a second run assigns identical folds
    again = {
        (r["lang"], r["fold"]): (r["n_docs"], r["sum_chars"])
        for r in q_split_kfold_stratified(spark, SF).collect()
    }
    assert again == got


def test_two_phase_fold_equals_naive_rank_hypothesis():
    """Property check of the two-phase fold assignment's algebra: for
    ANY multiset of (stratum, key) pairs, bucketing on the first key
    byte, ranking within (stratum, bucket), and adding the bucket
    prefix offset yields EXACTLY the stratum-global rank — i.e. fold
    ids equal the naive single-window formulation the oracle states.
    Pure python, no Spark: the property is about the decomposition,
    which both engines then evaluate mechanically."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["en", "de", "zh"]),
                st.text(alphabet="0123456789abcdef", min_size=4, max_size=8),
                st.integers(0, 10_000),
            ),
            max_size=60,
        )
    )
    def check(rows):
        K = 5
        # naive: global rank per stratum over (key, tiebreak)
        naive = {}
        for lang in {r[0] for r in rows}:
            items = sorted(
                (key, tb) for lg, key, tb in rows if lg == lang
            )
            for rn, item in enumerate(items):
                naive[(lang, item)] = rn % K
        # two-phase: bucket on first TWO hex chars, rank within
        # (stratum, bucket), add prefix offset
        two = {}
        for lang in {r[0] for r in rows}:
            items = [(key, tb) for lg, key, tb in rows if lg == lang]
            buckets = {}
            for item in items:
                buckets.setdefault(int(item[0][:2], 16), []).append(item)
            offset = 0
            for b in sorted(buckets):
                for r, item in enumerate(sorted(buckets[b])):
                    two[(lang, item)] = (offset + r) % K
                offset += len(buckets[b])
        assert two == naive

    check()
