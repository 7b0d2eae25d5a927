"""Behavioral tests for the composites14 batch: bloom-incremental
dedup, embedding whitening, n-gram novelty, split audit."""

import pyspark.sql.functions as F


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bloom_incremental_equals_exact_anti_join(spark, sf_dir):
    """The bloom is a prefilter only: result must equal the plain
    exact anti-join of new-batch head keys against seen head keys."""
    from kafkaish_spark.operators.composites14 import (
        _HEAD_WORDS,
        q_dedup_bloom_incremental,
    )
    from kafkaish_spark.sources.tables import load_table

    got = {
        (r.doc_id, r.head_key)
        for r in q_dedup_bloom_incremental(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    head = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, _HEAD_WORDS))
    )
    keyed = d.select(
        "doc_id",
        head.alias("head_key"),
        (F.substring("source", 4, 10).cast("int") >= 10).alias("is_new"),
    )
    seen_keys = {
        r.head_key for r in keyed.filter(~F.col("is_new")).collect()
    }
    want = {
        (r.doc_id, r.head_key)
        for r in keyed.filter(F.col("is_new")).collect()
        if r.head_key not in seen_keys
    }
    assert got == want
    assert got, "expected at least one unseen doc in the new batch"


def test_bloom_bitmap_is_broadcast(spark, sf_dir):
    """Neither the bitmap join nor the false-positive anti-join may
    shuffle the seen corpus: both must be broadcast joins."""
    from kafkaish_spark.operators.composites14 import q_dedup_bloom_incremental

    plan = _executed_plan(q_dedup_bloom_incremental(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_whitening_normalizes_each_dimension(spark, sf_dir):
    """After whitening, every dimension has mean ~0 and std ~1, and
    vector length is preserved (the query now projects scalar
    invariants for the driver, so the per-dimension check runs on the
    shared whitened_dims subtree it is built from)."""
    from kafkaish_spark.operators.composites14 import (
        q_embed_whitening,
        whitened_dims,
    )

    dims = (
        whitened_dims(spark, sf_dir)
        .groupBy("pos")
        .agg(
            F.avg("wv").alias("mu"),
            F.stddev_pop("wv").alias("sd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(dims) == 64
    for r in dims:
        assert abs(r.mu) < 1e-4, (r.pos, r.mu)
        assert abs(r.sd - 1.0) < 1e-4, (r.pos, r.sd)
    lens = (
        q_embed_whitening(spark, sf_dir).select("n_dims").distinct().collect()
    )
    assert [r.n_dims for r in lens] == [64]


def test_ngram_novelty_invariants(spark, sf_dir):
    """The lowest doc_id sees only novel grams, and summing n_novel
    over docs recovers the corpus's distinct-shingle count exactly."""
    from kafkaish_spark.operators.composites14 import q_text_ngram_novelty
    from kafkaish_spark.operators.llm import _shingles_df
    from kafkaish_spark.sources.tables import load_table

    out = q_text_ngram_novelty(spark, sf_dir)
    rows = {r.doc_id: r for r in out.collect()}
    first_doc = min(rows)
    assert rows[first_doc].novelty == 1.0
    total_novel = sum(r.n_novel for r in rows.values())
    n_shingles = (
        _shingles_df(load_table(spark, sf_dir, "documents"))
        .select("shingle")
        .distinct()
        .count()
    )
    assert total_novel == n_shingles


def test_split_shares_and_coverage(spark, sf_dir):
    """Per-language shares sum to 1 and the split partitions the
    corpus (doc counts sum to the table count)."""
    from kafkaish_spark.operators.composites14 import q_split_train_valid
    from kafkaish_spark.sources.tables import load_table

    rows = q_split_train_valid(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(r.doc_share for r in rs) - 1.0) < 1e-6, lang
        assert {r.split for r in rs} <= {"train", "valid", "test"}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_pagerank_mass_conservation(spark, sf_dir):
    """Damped PageRank with uniform seed conserves total mass exactly:
    sum(r) == |V| at every round (0.15*n teleport + 0.85*n flowed), so
    after 3 rounds the rank sum must equal the node count to float
    tolerance; and all ranks are positive."""
    from kafkaish_spark.operators.composites15 import q_graph_pagerank

    rows = q_graph_pagerank(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    total = sum(r.pagerank for r in rows)
    assert abs(total - n) < 1e-3 * n, (total, n)
    assert min(r.pagerank for r in rows) >= 0.15


def test_lm_interp_score_invariants(spark, sf_dir):
    """Every doc's bigram count is exactly len(words)-1, and all MLE
    log-probs are negative (probabilities < 1)."""
    from kafkaish_spark.operators.composites16 import q_text_lm_interp_score
    from kafkaish_spark.sources.tables import load_table

    rows = {r.doc_id: r for r in q_text_lm_interp_score(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("nw")
    ).collect()
    for d in docs:
        if d.nw >= 2:
            assert rows[d.doc_id].n_bigrams == d.nw - 1, d.doc_id
    assert all(r.avg_logprob < 0 for r in rows.values())


def test_copurchase_sim_bounds(spark, sf_dir):
    """Jaccard stays in (0, 1], pairs are ordered, floors hold."""
    from kafkaish_spark.operators.composites16 import (
        _MIN_COP_JACCARD,
        _MIN_SHARED,
        q_graph_copurchase_sim,
    )

    rows = q_graph_copurchase_sim(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.supp_a < r.supp_b
        assert r.n_shared >= _MIN_SHARED
        assert _MIN_COP_JACCARD <= r.jaccard <= 1.0


def test_prefix_filter_equals_inverted_index_twin(spark, sf_dir):
    """Two independent exact algorithms, one answer: the PPJoin-style
    prefix-filtered join must return exactly the >=0.5 pairs of the
    inverted-index twin."""
    from kafkaish_spark.operators.composites17 import q_dedup_prefix_filter
    from kafkaish_spark.operators.llm import q_dedup_ngram_jaccard

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in q_dedup_prefix_filter(spark, sf_dir).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in q_dedup_ngram_jaccard(spark, sf_dir)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert got == want


def test_skyline_dominance(spark, sf_dir):
    """No skyline member dominates another; every non-member is
    dominated by some member (brute-force check at test scale)."""
    from kafkaish_spark.operators.composites17 import q_skyline_parts
    from kafkaish_spark.sources.tables import load_table

    sky = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in q_skyline_parts(spark, sf_dir).collect()
    ]
    allp = [
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    assert sky

    def dominates(a, b):
        return (
            a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
        )

    for a in sky:
        for b in sky:
            assert not dominates(a, b), (a, b)
    sky_keys = {k for k, _, _ in sky}
    for p in allp:
        if p[0] not in sky_keys:
            assert any(dominates(s, p) for s in sky), p


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """The SQL-language UDF must leave NO Python evaluation node in
    the physical plan — it is inlined as a Catalyst expression."""
    from kafkaish_spark.operators.composites18 import q_sql_udf_price_band

    plan = _executed_plan(q_sql_udf_price_band(spark, sf_dir))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_pipe_syntax_plan_matches_classic(spark, sf_dir):
    """Pipe syntax is a dialect, not an engine: its physical plan has
    the same shape as the classic SELECT (pushed filter + partial agg
    before the exchange), with no extra nodes."""
    from kafkaish_spark.operators.composites18 import q_sql_pipe_summary

    plan = _executed_plan(q_sql_pipe_summary(spark, sf_dir))
    assert "HashAggregate" in plan
    assert plan.count("Exchange") == 1, plan


def test_maha_outliers_are_top_of_full_ranking(spark, sf_dir):
    """The top-20 cut must equal the head of the full distance ranking
    (deterministic tiebreak on vec_id)."""
    from kafkaish_spark.operators.composites18 import q_embed_outliers_maha
    from kafkaish_spark.operators.composites14 import whitened_dims

    got = [(r.vec_id, r.maha) for r in q_embed_outliers_maha(spark, sf_dir).collect()]
    wh = {}
    for r in whitened_dims(spark, sf_dir).collect():
        wh.setdefault(r.vec_id, 0.0)
        wh[r.vec_id] += r.wv * r.wv
    full = sorted(
        ((vec_id, round(ssq**0.5, 6)) for vec_id, ssq in wh.items()),
        key=lambda x: (-x[1], x[0]),
    )
    want = full[: len(got)]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 1e-6
