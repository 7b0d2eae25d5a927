"""Corpus-quality gates round 3 (composites26): vocab OOV and the
compression-ratio repetition filter."""

import zlib
from collections import Counter

from pyspark.sql import functions as F


def test_vocab_oov_matches_bruteforce(spark, sf_dir):
    from kafkaish_spark.operators.composites26 import _VOCAB_K, q_text_vocab_oov
    from kafkaish_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts = Counter()
    for r in docs:
        counts.update(r.text.split(" "))
    vocab = {
        term
        for term, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_VOCAB_K
        ]
    }
    got = {r.doc_id: r for r in q_text_vocab_oov(spark, sf_dir).collect()}
    assert set(got) == {r.doc_id for r in docs}
    for r in docs:
        toks = r.text.split(" ")
        n_oov = sum(1 for w in toks if w not in vocab)
        g = got[r.doc_id]
        assert (g.n_tokens, g.n_oov) == (len(toks), n_oov), r.doc_id
        assert abs(g.oov_rate - round(n_oov / len(toks), 6)) < 1e-9


def test_vocab_join_is_broadcast(spark, sf_dir):
    from kafkaish_spark.operators.composites26 import q_text_vocab_oov

    plan = (
        q_text_vocab_oov(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    from kafkaish_spark.operators.composites26 import (
        _RATIO_DROP,
        _ZLIB_LEVEL,
        q_text_compression_ratio,
    )
    from kafkaish_spark.sources.tables import load_table

    got = {
        r.doc_id: r
        for r in q_text_compression_ratio(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert set(got) == {r.doc_id for r in docs}
    n_drop = 0
    for r in docs:
        raw = r.text.encode("utf-8")
        comp = len(zlib.compress(raw, _ZLIB_LEVEL))
        g = got[r.doc_id]
        assert (g.raw_bytes, g.compressed_bytes) == (len(raw), comp), r.doc_id
        assert abs(g.ratio - round(comp / len(raw), 6)) < 1e-9
        assert g.verdict == ("drop" if g.ratio < _RATIO_DROP else "keep")
        n_drop += g.verdict == "drop"
    # the synthetic corpus embeds repetitive near-dup docs: the gate
    # must actually fire on some of them, and not on everything
    assert 0 < n_drop < len(docs)


def test_compression_kernel_flags_synthetic_spam(spark):
    """A hand-built repetitive doc must be dropped, a diverse one kept."""
    from kafkaish_spark.operators.composites26 import _compression_batches

    import pandas as pd

    import hashlib

    spam = "buy now " * 200
    prose = " ".join(
        hashlib.md5(str(i).encode()).hexdigest() for i in range(100)
    )
    out = pd.concat(
        _compression_batches(
            iter([pd.DataFrame({"doc_id": [1, 2], "text": [spam, prose]})])
        )
    ).set_index("doc_id")
    assert out.loc[1, "verdict"] == "drop"
    assert out.loc[2, "verdict"] == "keep"


def test_containment_flags_a_planted_subset_doc(spark, sf_dir):
    """Brute-force cross-check on the real corpus: containment pairs
    are exactly the (capped-)shingle-subset pairs, with the smaller
    (or higher-id on ties) doc marked contained."""
    from kafkaish_spark.operators.composites26 import q_dedup_containment
    from kafkaish_spark.operators.llm import (
        _cached_raw_shingles,
        _drop_hot_shingles,
    )

    sh = _drop_hot_shingles(_cached_raw_shingles(spark, sf_dir)).collect()
    sets = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0 or inter != min(len(sets[a]), len(sets[b])):
                continue
            if len(sets[a]) < len(sets[b]):
                want.add((a, b, len(sets[a]), len(sets[b])))
            else:  # smaller-or-tie: b contained (keep-first on ties)
                want.add((b, a, len(sets[b]), len(sets[a])))
    got = {
        (r.contained_doc, r.container_doc, r.n_contained, r.n_container)
        for r in q_dedup_containment(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "corpus should include at least one containment pair"


def test_t_closeness_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from kafkaish_spark.operators.composites26 import q_privacy_t_closeness
    from kafkaish_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.year("o_orderdate").alias("yr"), "o_orderstatus"
    ).collect()
    glob = Counter(r.o_orderstatus for r in rows)
    n = len(rows)
    by_group = {}
    for r in rows:
        by_group.setdefault((r.o_orderpriority, r.yr), Counter())[
            r.o_orderstatus
        ] += 1
    got = {
        (r.o_orderpriority, r.yr): r
        for r in q_privacy_t_closeness(spark, sf_dir).collect()
    }
    assert set(got) == set(by_group)
    for key, cnt in by_group.items():
        ng = sum(cnt.values())
        num = sum(abs(cnt.get(s, 0) * n - b * ng) for s, b in glob.items())
        tv = round(num / (2.0 * ng * n), 6)
        g = got[key]
        assert g.n_rows == ng
        assert abs(g.tv_dist - tv) < 1e-9, key
        assert g.close == (1 if tv <= 0.2 else 0)
        assert 0.0 <= g.tv_dist <= 1.0


def test_source_drift_tv_bounds_and_weighted_mean_zero(spark, sf_dir):
    """TV distances live in [0,1]; the token-weighted mean of signed
    per-term deviations is zero by construction, so the weighted mean
    TV of a source against the corpus it is part of stays well below
    the max possible — and every source appears exactly once."""
    from kafkaish_spark.operators.composites26 import q_corpus_source_drift
    from kafkaish_spark.sources.tables import load_table

    rows = q_corpus_source_drift(spark, sf_dir).collect()
    srcs = {
        r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == srcs
    for r in rows:
        assert 0.0 <= r.tv_dist <= 1.0

def test_hubness_in_degree_sums_to_k_times_n(spark, sf_dir):
    """Every vector has out-degree exactly k, so in-degrees sum to
    k * n; every vector gets a row (zero-degree anti-hubs included)."""
    from kafkaish_spark.operators.composites26 import _HUB_K, q_embed_hubness

    rows = q_embed_hubness(spark, sf_dir).collect()
    n = len(rows)
    assert sum(r.in_degree for r in rows) == _HUB_K * n
    assert all(r.in_degree >= 0 for r in rows)
    # hubness exists: the max in-degree exceeds the mean (k)
    assert max(r.in_degree for r in rows) > _HUB_K


def test_hubness_ann_structural_invariants(spark, sf_dir):
    """ANN hubness: every vector has a row, out-degree <= k caps the
    in-degree sum at k*n, and dense buckets (> k members) contribute
    exactly k per member, so the sum is strictly positive."""
    from kafkaish_spark.operators.composites26 import (
        _HUB_K,
        q_embed_hubness_ann,
    )
    from kafkaish_spark.sources.tables import load_table

    rows = q_embed_hubness_ann(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    total = sum(r.in_degree for r in rows)
    assert 0 < total <= _HUB_K * n
    assert all(r.in_degree >= 0 for r in rows)


def test_max_open_matches_bruteforce_sweep(spark, sf_dir):
    from collections import defaultdict

    from kafkaish_spark.operators.composites26 import q_orders_max_open
    from kafkaish_spark.sources.tables import load_table

    o = {r.o_orderkey: r.o_orderdate for r in load_table(
        spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()}
    last_ship = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect():
        cur = last_ship.get(r.l_orderkey)
        last_ship[r.l_orderkey] = max(cur, r.l_shipdate) if cur else r.l_shipdate
    delta = defaultdict(int)
    for k, end in last_ship.items():
        delta[o[k]] += 1
        delta[end] -= 1
    run, peak = 0, defaultdict(int)
    for d in sorted(delta):
        run += delta[d]
        key = (d.year, d.month)
        peak[key] = max(peak[key], run)
    got = {
        (r.yr, r.mo): r.peak_open
        for r in q_orders_max_open(spark, sf_dir).collect()
    }
    assert got == dict(peak)


def test_cusum_changepoint_is_the_argmax(spark, sf_dir):
    from collections import defaultdict

    from kafkaish_spark.operators.composites26 import (
        q_events_cusum_changepoint,
    )
    from kafkaish_spark.sources.tables import load_table

    daily = defaultdict(int)
    for r in load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    ).collect():
        daily[(r.event_type, r.ts.date())] += round(r.value * 1e6)
    by_type = defaultdict(list)
    for (et, d), vq in daily.items():
        by_type[et].append((d, vq))
    want = {}
    for et, rows in by_type.items():
        rows.sort()
        total = sum(v for _, v in rows)
        n = len(rows)
        cum, best = 0, None
        for k, (d, vq) in enumerate(rows, start=1):
            cum += vq
            s = n * cum - k * total
            if best is None or abs(s) > abs(best[1]):
                best = (d, s)
        want[et] = (best[0], best[1], n)
    got = {
        r.event_type: (r.cp_day, r.cusum_scaled, r.n_days)
        for r in q_events_cusum_changepoint(spark, sf_dir).collect()
    }
    assert got == want
