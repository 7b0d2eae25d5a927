"""Properties of the corpus-pipeline operators (decontamination,
stratified sampling, sequence packing) that the DuckDB oracle twin
doesn't express: set-level invariants and conservation laws."""

from collections import defaultdict

from pyspark.sql import functions as F


def test_decontaminate_only_flags_training_docs(spark, sf_dir):
    """No benchmark (src0) doc may appear in the contamination report,
    and every flagged doc must share at least one 5-gram."""
    from kafkaish_spark.operators.pipeline_ops import q_decontaminate_ngram
    from kafkaish_spark.sources.tables import load_table

    out = q_decontaminate_ngram(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = out.join(docs, "doc_id").collect()
    assert all(r["source"] != "src0" for r in joined)
    assert all(r["n_shared"] >= 1 for r in joined)


def test_decontaminate_flags_planted_overlap(spark, sf_dir):
    """A training doc that textually contains a benchmark doc's text
    must be flagged (sanity via a constructed frame)."""
    from kafkaish_spark.operators import pipeline_ops as po

    bench_text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, bench_text, "en", "src0"),
            (2, "noise " + bench_text + " more noise", "en", "src9"),
            (3, "completely unrelated words here only four grams none", "en", "src9"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    grams = (
        df.select(
            "doc_id", "source", F.explode(po._kgrams(po._DECON_K)).alias("gram")
        )
        .distinct()
    )
    bench = grams.filter(F.col("source") == "src0").select("gram").distinct()
    hits = (
        grams.filter(F.col("source") != "src0")
        .join(bench, "gram")
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert {r["doc_id"] for r in hits} == {2}


def test_stratified_sample_rates(spark, sf_dir):
    """Languages without a downsample rule keep everything; en keeps a
    strict subset (md5 buckets are uniform enough at any sf)."""
    from kafkaish_spark.operators.pipeline_ops import q_sample_stratified

    rows = {r["lang"]: r for r in q_sample_stratified(spark, sf_dir).collect()}
    for lang in ("zh", "de", "es"):
        assert rows[lang]["kept_docs"] == rows[lang]["total_docs"]
    en = rows["en"]
    assert 0 < en["kept_docs"] < en["total_docs"]
    # 25% nominal rate: allow wide tolerance for small samples
    ratio = en["kept_docs"] / en["total_docs"]
    assert 0.10 <= ratio <= 0.45, ratio


def test_pack_sequences_conservation_and_fill(spark, sf_dir):
    """Token conservation per (lang, shard); bins contiguous from 0;
    every non-final bin filled past its boundary."""
    from kafkaish_spark.operators.pipeline_ops import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        q_pack_sequences,
    )
    from kafkaish_spark.sources.tables import load_table

    out = q_pack_sequences(spark, sf_dir).collect()
    truth = {
        (r["lang"], r["shard"]): r["tot"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy(
            "lang", (F.col("doc_id") % _PACK_SHARDS).alias("shard")
        )
        .agg(F.sum(F.size(F.split("text", " "))).alias("tot"))
        .collect()
    }
    groups = defaultdict(list)
    for r in out:
        groups[(r["lang"], r["shard"])].append(r)
    assert set(groups) == set(truth)
    for key, rows in groups.items():
        rows.sort(key=lambda r: r["bin"])
        assert [r["bin"] for r in rows] == list(range(len(rows)))
        assert sum(r["n_tokens"] for r in rows) == truth[key]
        cum = 0
        for r in rows[:-1]:
            cum += r["n_tokens"]
            assert cum >= (r["bin"] + 1) * _PACK_BUDGET


def test_cc_clusters_are_transitive_fixpoint(spark, sf_dir):
    """Every near-dup edge must land inside one cluster, and each
    cluster's id must equal its minimum member doc_id (the canonical
    keep doc)."""
    from kafkaish_spark.operators.llm import q_dedup_ngram_jaccard
    from kafkaish_spark.operators.pipeline_ops import q_dedup_cc_clusters

    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in q_dedup_cc_clusters(spark, sf_dir).collect()
    }
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).collect()
    for r in pairs:
        assert labels[r["doc_a"]] == labels[r["doc_b"]]
    by_cluster = {}
    for doc, c in labels.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, members in by_cluster.items():
        assert c == min(members)


def test_kmeans_assignment_is_nearest_centroid(spark, sf_dir):
    """Every vector's assigned cluster must have the true minimal
    squared-L2 distance among the seed centroids (ties broken by
    lowest centroid id), recomputed independently in Python."""
    from kafkaish_spark.operators.pipeline_ops import _KMEANS_K, q_embed_kmeans_assign
    from kafkaish_spark.sources.tables import load_table

    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cents = {cid: vecs[cid] for cid in range(_KMEANS_K)}
    out = q_embed_kmeans_assign(spark, sf_dir).collect()
    assert len(out) == len(vecs)
    for r in out:
        v = vecs[r["vec_id"]]
        dists = {
            cid: round(sum((a - b) * (a - b) for a, b in zip(v, c)), 6)
            for cid, c in cents.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        assert r["cluster"] == best[0], (r, best)


def test_domain_cap_bounds_and_determinism(spark, sf_dir):
    """No source may exceed the cap; two runs pick identical doc sets
    (the md5 shuffle is an RNG-free deterministic order)."""
    from kafkaish_spark.operators.pipeline_ops import _DOMAIN_CAP, q_sample_domain_cap

    a = q_sample_domain_cap(spark, sf_dir)
    per_source = defaultdict(int)
    kept_a = set()
    for r in a.collect():
        per_source[r["source"]] += 1
        kept_a.add(r["doc_id"])
    assert per_source and max(per_source.values()) <= _DOMAIN_CAP
    kept_b = {r["doc_id"] for r in q_sample_domain_cap(spark, sf_dir).collect()}
    assert kept_a == kept_b
