"""Corpus-preparation operators a training-data pipeline needs beyond
dedup/similarity (SURVEY.md §2.4 extension): benchmark decontamination,
stratified corpus rebalancing, and sequence packing.

The reference (steveliles/kafkaish) has no analog — these are north-star
additions over the ``documents`` table, all oracle-checked.

Oracle-exactness techniques: md5-derived buckets (same algorithm both
engines), integer token counts, integer division for bin assignment,
one IEEE division + round(6) for ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.parallelism import cut_lineage
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_BENCH_SOURCE = "src0"  # stand-in eval/benchmark slice of the corpus
_DECON_K = 5  # decontamination n-gram length
_PACK_BUDGET = 2048  # tokens per packed training sequence
_PACK_SHARDS = 8  # independent packing streams per language


def _kgrams(k: int):
    """Word k-grams (positional, may repeat) as an array column over
    ``text`` — built by
    zipping k shifted slices of the split array (each lambda element is
    touched once; per-position element_at would re-evaluate the inlined
    split per element, O(L^2) per doc)."""
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    m = n - (k - 1)
    z = F.arrays_zip(*[F.slice(w, i + 1, m) for i in range(k)])
    return F.when(
        n >= k,
        F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(k)])),
    ).otherwise(F.array().cast("array<string>"))


def _kgrams_sql(k: int) -> str:
    parts = " || ' ' || ".join(f"w[i+{j + 1}]" for j in range(k))
    return (
        f"list_transform(range(greatest(len(w) - {k - 1}, 0)), i -> {parts})"
    )


# ------------------------------------------------- benchmark decontamination
@query(
    "q_decontaminate_ngram",
    oracle=f"""
    WITH g AS (
      SELECT DISTINCT doc_id, lang, source, gram FROM (
        SELECT doc_id, lang, source, unnest({_kgrams_sql(_DECON_K)}) AS gram
        FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w
              FROM documents))),
    bench AS (SELECT DISTINCT gram FROM g WHERE source = '{_BENCH_SOURCE}')
    SELECT g.doc_id, g.lang, COUNT(*) AS n_shared
    FROM g JOIN bench ON g.gram = bench.gram
    WHERE g.source <> '{_BENCH_SOURCE}'
    GROUP BY g.doc_id, g.lang
    """,
    bench=True,
)
def q_decontaminate_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any distinct
    5-gram with the held-out benchmark slice (source='src0'), with the
    count of shared grams.  The scale shape is the point: the benchmark
    gram set is tiny relative to a 100 TB corpus, so it is BROADCAST —
    the corpus-side gram stream is filtered map-side with zero shuffle
    of corpus text, and only (doc_id, lang) pairs reach the final
    aggregate.  Per-doc gram dedup happens BEFORE the explode via
    array_distinct (row-local, no shuffle); only the tiny bench side
    pays a distinct."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    grams = F.explode(F.array_distinct(_kgrams(_DECON_K))).alias("gram")
    bench = (
        d.filter(F.col("source") == _BENCH_SOURCE)
        .select(grams)
        .distinct()
    )
    return (
        d.filter(F.col("source") != _BENCH_SOURCE)
        .repartition(cpus, "doc_id")
        .select("doc_id", "lang", grams)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# ------------------------------------------------- stratified rebalancing
# The sampling rule lives HERE and only here: q_corpus_prep_report's
# audit must apply the exact same bucket/rate expressions or its
# n_after_sample would silently disagree with the actual sampler.
_SAMPLE_RATES = {"en": 25, "fr": 50}  # percent kept; unlisted langs 100


def _sample_bucket():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )


def _sample_rate():
    rate = F.when(F.col("lang") == "en", _SAMPLE_RATES["en"])
    for lang, pct in list(_SAMPLE_RATES.items())[1:]:
        rate = rate.when(F.col("lang") == lang, pct)
    return rate.otherwise(100)


def _sample_bucket_sql(doc_id: str = "doc_id") -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({doc_id} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 100"
    )


def _sample_rate_sql(lang: str = "lang") -> str:
    whens = " ".join(
        f"WHEN {lang} = '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 100 END"


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS total_docs,
           CAST(SUM(CASE WHEN b < r THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN b < r THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM (SELECT lang, n_chars,
                 {_sample_bucket_sql()} AS b,
                 {_sample_rate_sql()} AS r
          FROM documents)
    GROUP BY lang
    """,
)
def q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified deterministic sampling for corpus rebalancing:
    downsample over-represented languages (en to 25%, fr to 50%) by an
    md5-derived bucket of doc_id.  Hash-based sampling is the only kind
    that survives distribution — no global shuffle, no RNG state, every
    executor decides keep/drop locally from the row alone, and reruns
    are reproducible.  Output is the per-language audit report (kept vs
    total docs and chars)."""
    d = t(spark, sf, "documents")
    kept = _sample_bucket() < _sample_rate()
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_docs"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("kept_chars"),
    )


# ------------------------------------------------- sequence packing
@query(
    "q_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id, doc_id % {_PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS tokens
      FROM documents),
    cum AS (
      SELECT lang, shard, doc_id, tokens,
             COALESCE(SUM(tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM toks)
    SELECT lang, shard, CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS n_tokens,
           round(CAST(SUM(tokens) AS DOUBLE) / {_PACK_BUDGET}, 6) AS fill
    FROM cum
    GROUP BY lang, shard, CAST(cum_before // {_PACK_BUDGET} AS BIGINT)
    """,
)
def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing: assign docs to fixed token-budget training
    bins (2048 tokens) by running-total order.  Packing is inherently
    sequential, so the scale design shards each language into
    {_PACK_SHARDS} independent packing streams keyed by doc_id — each
    stream is one window partition packed in parallel, instead of one
    cumsum bottleneck per language (at 1000 executors you raise the
    shard count, not the algorithm).  Bin assignment is integer
    division of an integer cumsum — exact on both engines."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("tokens").over(w), F.lit(0))
    )
    return (
        cum.groupBy(
            "lang",
            "shard",
            F.expr(f"CAST(cum_before DIV {_PACK_BUDGET} AS BIGINT)").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("tokens").cast("double") / _PACK_BUDGET, 6
            ).alias("fill"),
        )
    )


# ------------------------------------------------- dedup cluster closure
def _cc_oracle() -> str:
    # same shingle/pair CTEs and threshold as q_dedup_ngram_jaccard,
    # which the Spark side delegates to — single source of truth
    from kafkaish_spark.operators.llm import _JACCARD_THRESHOLD, _PAIR_CTES_SQL

    return f"""
    WITH RECURSIVE {_PAIR_CTES_SQL},
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN counts na ON na.doc_id = doc_a
      JOIN counts nb ON nb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= {_JACCARD_THRESHOLD}),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(u, label) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u)
    SELECT u AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY u
    """


@query("q_dedup_cc_clusters", oracle=_cc_oracle())
def q_dedup_cc_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive dedup clustering: connected components over the
    near-dup pair graph (3-gram Jaccard >= 0.2), labeling every
    clustered doc with the minimum doc_id of its component.  This is
    what turns pairwise near-dup hits into a canonical keep-set when
    duplicates chain (A~B~C but A!~C) — one-hop pointers under-merge.

    Spark side is iterative min-label propagation: each round joins the
    label frame to the (tiny relative to the corpus) edge list, takes
    the min over neighbors, and localCheckpoints to truncate lineage.
    Rounds needed = graph diameter (near-dup components are shallow —
    converges in 2-3 rounds here); each round is a pair of distributed
    hash joins, no driver-side graph state.  The DuckDB oracle is the
    reachability-closure recursive CTE over the same edges."""
    from kafkaish_spark.operators.llm import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf).select("doc_a", "doc_b")
    edges = pairs.selectExpr("doc_a AS u", "doc_b AS v").union(
        pairs.selectExpr("doc_b", "doc_a")
    )
    edges = cut_lineage(edges, eager=True)
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    while True:
        neigh = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the pre-update label through the checkpoint so the
        # convergence test is a row-local filter over the (bounded)
        # checkpointed frame — the old formulation re-joined new labels
        # to old labels per round, a full label-frame shuffle that only
        # ever produced one count (optimization r12, guide §2.4)
        new = cut_lineage(
            labels.join(neigh, "u", "left").select(
                "u",
                F.least(
                    "label", F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
                F.col("label").alias("old_label"),
            ),
            eager=True,
        )
        changed = new.filter(F.col("label") != F.col("old_label")).count()
        labels = new.select("u", "label")
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# ------------------------------------------------- embedding centroids
@query(
    "q_embed_centroids",
    oracle="""
    SELECT label, pos, COUNT(*) AS n_vectors,
           round(CAST(SUM(CAST(round(CAST(val AS DOUBLE) * 1e7) AS BIGINT))
                      AS DOUBLE) / (COUNT(*) * 1e7), 9) AS centroid
    FROM (SELECT label,
                 unnest(embedding) AS val,
                 unnest(range(1, len(embedding) + 1)) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def q_embed_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid vector (the k-means M-step / class prototype
    every embedding pipeline computes), as (label, dimension) rows.
    Cross-row float sums are order-dependent, so each element is
    quantized to a 1e-7 integer grid first — the sum is then exact
    integer arithmetic in any partition order, and the final divide is
    one IEEE op (same trick as functions.exact, tuned for unit-norm
    embedding ranges).  Shuffle carries labels x 64 dims partial sums,
    not vectors."""
    e = t(spark, sf, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("val").cast("double") * 1e7).cast("long").alias("q"),
    )
    return ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.sum("q").cast("double") / (F.count(F.lit(1)) * F.lit(1e7)), 9
        ).alias("centroid"),
    )


# ------------------------------------------------- length histogram
@query(
    "q_text_length_histogram",
    oracle="""
    SELECT lang, CAST(least(n_chars // 100, 9) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, CAST(least(n_chars // 100, 9) AS BIGINT)
    """,
)
def q_text_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Doc-length histogram per language (100-char buckets, top-capped)
    — the length-distribution audit that precedes any truncation /
    packing decision.  Pure integer binning: one partial-aggregated
    shuffle of (lang, bucket) rows."""
    d = t(spark, sf, "documents")
    bucket = F.least(F.expr("n_chars DIV 100"), F.lit(9)).cast("long")
    return d.groupBy("lang", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


# ------------------------------------------------- end-to-end prep report
def _quality_score_sql() -> str:
    return f"""
      CAST(CASE WHEN len(w) BETWEEN 20 AND 2000 THEN 1 ELSE 0 END
         + CASE WHEN CAST(len(list_distinct(w)) AS DOUBLE) / len(w) > 0.3
                THEN 1 ELSE 0 END
         + CASE WHEN CAST(length(text) - (len(w) - 1) AS DOUBLE) / len(w)
                     BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS BIGINT)
    """  # mirrors q_text_quality's composite score (three terms, no stopword term)


def _prep_oracle() -> str:
    from kafkaish_spark.operators.llm import _PAIR_CTES_SQL

    return f"""
    WITH {_PAIR_CTES_SQL},
    dups AS (
      SELECT doc_b AS doc_id
      FROM common
      JOIN counts na ON na.doc_id = doc_a
      JOIN counts nb ON nb.doc_id = doc_b
      WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= 0.5
      GROUP BY doc_b),
    exact AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
    q AS (SELECT doc_id, {_quality_score_sql()} AS score
          FROM (SELECT doc_id, text, string_split(text, ' ') AS w
                FROM documents)),
    flags AS (
      SELECT d.doc_id, d.lang,
             CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f_exact,
             CASE WHEN dup.doc_id IS NULL THEN 1 ELSE 0 END AS f_near,
             CASE WHEN q.score >= 2 THEN 1 ELSE 0 END AS f_quality,
             CASE WHEN {_sample_bucket_sql('d.doc_id')} <
                       {_sample_rate_sql('d.lang')}
                  THEN 1 ELSE 0 END AS f_sample
      FROM documents d
      LEFT JOIN exact e ON d.doc_id = e.doc_id
      LEFT JOIN dups dup ON d.doc_id = dup.doc_id
      JOIN q ON d.doc_id = q.doc_id)
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(f_exact) AS BIGINT) AS n_after_exact,
           CAST(SUM(f_exact * f_near) AS BIGINT) AS n_after_near,
           CAST(SUM(f_exact * f_near * f_quality) AS BIGINT) AS n_after_quality,
           CAST(SUM(f_exact * f_near * f_quality * f_sample) AS BIGINT)
             AS n_after_sample
    FROM flags GROUP BY lang
    """


@query("q_corpus_prep_report", oracle=_prep_oracle(), bench=True)
def q_corpus_prep_report(spark: SparkSession, sf: str) -> DataFrame:
    """The END-TO-END corpus-prep pipeline as ONE declarative plan:
    exact dedup -> near-dedup verdict -> quality filter -> stratified
    sample, reported as per-language survivor counts at every stage
    (the audit table a data team reviews before a training run).

    Flag derivation (optimization r12 wave 4): the quality gate is a
    ROW-LOCAL function of ``text``, so its score is computed inline in
    the base projection (mirroring q_text_quality's expression exactly)
    instead of joining that operator's full-size output back on doc_id
    — one documents scan and one full-corpus sort-merge join less.  The
    near-dedup verdict joins the small AGGREGATED ``dups`` side (only
    docs that HAVE a near-duplicate) as a left join — the oracle's own
    ``LEFT JOIN dups`` shape — instead of the full every-doc keep-flag
    frame, removing the second full-size doc_id join
    (q_dedup_near_documents stays the registered verdict view; its
    expensive pair funnel is shared here via q_dedup_ngram_jaccard and
    the session shingle cache).  Guide §2.4: same flags, two fewer
    shuffling consumers; each filter stays a flag column until the
    final one-shuffle rollup."""
    d = t(spark, sf, "documents")
    from kafkaish_spark.operators.llm import _words, q_dedup_ngram_jaccard

    exact = (
        d.groupBy(F.md5("text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("f_exact"))
    )
    dups = (
        q_dedup_ngram_jaccard(spark, sf)
        .filter(F.col("jaccard") >= 0.5)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("dup_of"))
    )
    # q_text_quality's composite score, verbatim (the oracle's q CTE)
    w = _words()
    n = F.size(w)
    avg_len = (F.length("text") - (n - 1)).cast("double") / n
    uniq_ratio = F.size(F.array_distinct(w)).cast("double") / n
    score = (
        F.when(n.between(20, 2000), 1).otherwise(0)
        + F.when(uniq_ratio > 0.3, 1).otherwise(0)
        + F.when(avg_len.between(3, 10), 1).otherwise(0)
    )
    flags = (
        d.select(
            "doc_id",
            "lang",
            (score >= 2).cast("int").alias("f_quality"),
            (_sample_bucket() < _sample_rate()).cast("int").alias("f_sample"),
        )
        .join(exact, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .na.fill({"f_exact": 0})
        .withColumn("f_near", F.col("dup_of").isNull().cast("long"))
    )
    fe, fn, fq, fs = (
        F.col("f_exact"),
        F.col("f_near"),
        F.col("f_quality"),
        F.col("f_sample"),
    )
    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(fe).cast("long").alias("n_after_exact"),
        F.sum(fe * fn).cast("long").alias("n_after_near"),
        F.sum(fe * fn * fq).cast("long").alias("n_after_quality"),
        F.sum(fe * fn * fq * fs).cast("long").alias("n_after_sample"),
    )


# ------------------------------------------------- domain mixture weights
@query(
    "q_corpus_mixture_weights",
    oracle="""
    WITH s AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM s)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot), 6) AS share,
           round((1.0 / (SELECT COUNT(*) FROM s)) /
                 (CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot)), 6)
             AS repeat_factor
    FROM s
    """,
)
def q_corpus_mixture_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-mixing table: each source's token share of the corpus and
    the repeat factor that would equalize the mixture to uniform target
    weights (the knob a training-data pipeline turns to up/down-sample
    domains).  Token counts are exact integers; share and repeat factor
    are single IEEE divisions of those integers, so both engines agree
    bit-for-bit before round(6).  One partial-aggregated shuffle on
    source; the totals are a broadcast of a 20-row aggregate."""
    d = t(spark, sf, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("t")
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 6).alias(
            "repeat_factor"
        ),
    )


# ------------------------------------------------- sliding-window chunking
_CHUNK_LEN = 50  # tokens per chunk
_CHUNK_STRIDE = 25  # tokens between chunk starts (50% overlap)


@query(
    "q_text_chunk_sliding",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS n
      FROM documents),
    starts AS (
      SELECT doc_id, w, n,
             unnest(range(0,
               CASE WHEN n <= {_CHUNK_LEN} THEN 1
                    ELSE (n - {_CHUNK_LEN} + {_CHUNK_STRIDE} - 1)
                         // {_CHUNK_STRIDE} + 1 END)) AS i
      FROM d)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(len(list_slice(w, i * {_CHUNK_STRIDE} + 1,
                               i * {_CHUNK_STRIDE} + {_CHUNK_LEN})) AS BIGINT)
             AS n_tokens,
           array_to_string(list_slice(w, i * {_CHUNK_STRIDE} + 1,
                                      i * {_CHUNK_STRIDE} + {_CHUNK_LEN}), ' ')
             AS chunk
    FROM starts
    """,
)
def q_text_chunk_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window chunking (50-token windows, 25-token stride): the
    doc -> overlapping-chunk fan-out that precedes embedding in every
    retrieval/RAG pipeline.  Chunk count is integer ceiling arithmetic
    (exact both engines), the chunk text is a pure slice+join
    passthrough, and both engines clamp the final partial window.  The
    fan-out runs AFTER a repartition so chunk expansion parallelizes
    across the cluster, not the (few) input files."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    n_starts = F.when(n <= _CHUNK_LEN, 1).otherwise(
        F.expr(
            f"CAST((size(split(text, ' ')) - {_CHUNK_LEN} + {_CHUNK_STRIDE} - 1) "
            f"DIV {_CHUNK_STRIDE} AS INT) + 1"
        )
    )
    base = d.repartition(cpus, "doc_id").select(
        "doc_id", w.alias("w"), F.explode(F.sequence(F.lit(0), n_starts - 1)).alias("i")
    )
    sl = F.slice(
        F.col("w"), F.col("i") * _CHUNK_STRIDE + 1, F.lit(_CHUNK_LEN)
    )
    return base.select(
        "doc_id",
        F.col("i").cast("long").alias("chunk_id"),
        F.size(sl).cast("long").alias("n_tokens"),
        F.array_join(sl, " ").alias("chunk"),
    )


# ------------------------------------------------- vector normalization
@query(
    "q_embed_normalize",
    oracle="""
    SELECT vec_id,
           norm,
           nvec[1] AS e1,
           nvec[2] AS e2,
           list_reduce(list_transform(nvec, x -> x * x), (a, b) -> a + b)
             AS unit_norm_sq
    FROM (
      SELECT vec_id, norm,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x / norm)
               AS nvec
      FROM (
        SELECT vec_id,
               sqrt(list_reduce(
                 list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                 (a, b) -> a + b)) AS norm
             , embedding
        FROM embeddings))
    """,
)
def q_embed_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """L2 vector normalization — the preprocessing step before any
    cosine/IP index build.  All JVM-side array math (zip/fold in
    DOUBLE, left-to-right — bit-identical to DuckDB's list_reduce), no
    Python in the row path, embarrassingly parallel (no shuffle at
    all).  Outputs the pre-norm, two normalized elements, and the
    post-norm sum of squares as the checkable invariant (~1.0 up to
    the same deterministic float error on both engines)."""
    from kafkaish_spark.functions.vectors import norm

    e = t(spark, sf, "embeddings")
    nv = F.transform(
        F.col("embedding"),
        lambda x: x.cast("double") / F.col("norm"),
    )
    return (
        e.select("vec_id", norm(F.col("embedding")).alias("norm"), "embedding")
        .select("vec_id", "norm", nv.alias("nvec"))
        .select(
            "vec_id",
            "norm",
            F.element_at("nvec", 1).alias("e1"),
            F.element_at("nvec", 2).alias("e2"),
            F.aggregate(
                F.transform("nvec", lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("unit_norm_sq"),
        )
    )


# ------------------------------------------------- split-then-pack
_SPLIT_BUDGET = 64  # tokens per training sequence in the split variant


@query(
    "q_pack_split_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT lang, doc_id, doc_id % {_PACK_SHARDS} AS shard,
             len(string_split(text, ' ')) AS tokens
      FROM documents),
    chunks AS (
      SELECT lang, shard, doc_id,
             unnest(range(0, (tokens + {_SPLIT_BUDGET} - 1) // {_SPLIT_BUDGET}))
               AS chunk_idx,
             tokens
      FROM toks),
    sized AS (
      SELECT lang, shard, doc_id, chunk_idx,
             least({_SPLIT_BUDGET},
                   tokens - chunk_idx * {_SPLIT_BUDGET}) AS chunk_tokens
      FROM chunks),
    cum AS (
      SELECT lang, shard, doc_id, chunk_idx, chunk_tokens,
             COALESCE(SUM(chunk_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM sized)
    SELECT lang, shard,
           CAST(cum_before // {_SPLIT_BUDGET} AS BIGINT) AS bin,
           COUNT(*) AS n_chunks,
           CAST(SUM(chunk_tokens) AS BIGINT) AS n_tokens
    FROM cum
    GROUP BY lang, shard, CAST(cum_before // {_SPLIT_BUDGET} AS BIGINT)
    """,
)
def q_pack_split_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Split-then-pack: documents longer than the 64-token training
    budget are first cut into budget-sized chunks (ceil(n/B) pieces,
    last one partial), then the chunk stream packs into bins exactly
    like q_pack_sequences — the GPT-style concat-and-split layout where
    no sequence ever exceeds the budget.  The chunk fan-out is a
    row-local explode over an integer range; everything downstream is
    the same sharded window cumsum, so the parallelism story is
    unchanged."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("tokens"),
    )
    n_chunks = F.expr(
        f"CAST((tokens + {_SPLIT_BUDGET} - 1) DIV {_SPLIT_BUDGET} AS INT)"
    )
    sized = toks.select(
        "lang",
        "shard",
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        "tokens",
    ).select(
        "lang",
        "shard",
        "doc_id",
        "chunk_idx",
        F.least(
            F.lit(_SPLIT_BUDGET),
            F.col("tokens") - F.col("chunk_idx") * _SPLIT_BUDGET,
        ).alias("chunk_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = sized.withColumn(
        "cum_before", F.coalesce(F.sum("chunk_tokens").over(w), F.lit(0))
    )
    return cum.groupBy(
        "lang",
        "shard",
        F.expr(f"CAST(cum_before DIV {_SPLIT_BUDGET} AS BIGINT)").alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").cast("long").alias("n_tokens"),
    )


# ------------------------------------------------- k-means assignment step
_KMEANS_K = 8


@query(
    "q_embed_kmeans_assign",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings WHERE vec_id < {_KMEANS_K}),
    dists AS (
      SELECT e.vec_id, c.cid,
             round(list_reduce(
               list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), c.ce),
                              s -> (s[1] - s[2]) * (s[1] - s[2])),
               (x, y) -> x + y), 6) AS dist
      FROM embeddings e CROSS JOIN cents c)
    SELECT vec_id, cid AS cluster, dist
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) AS rn
          FROM dists)
    WHERE rn = 1
    """,
)
def q_embed_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """k-means E-step (cluster assignment): every vector assigned to
    its nearest of k=8 fixed seed centroids (the first k vectors —
    deterministic seeding) by squared L2, computed as a left-to-right
    fold over the zipped difference (Spark ``zip_with``+``aggregate``
    == DuckDB ``list_zip``+``list_reduce``, bit-equal), rounded before
    the argmin so the rank tiebreak (then centroid id) is stable on
    both engines.  The centroid table broadcasts — at ANY scale, since
    k is small by construction — so assignment is shuffle-free except
    the per-vector argmin, which Spark's group-limit optimization
    keeps as a partial top-1.  The M-step twin is q_embed_centroids;
    iterating E/M is a driver loop over two cached frames."""
    e = t(spark, sf, "embeddings")
    cents = e.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("ce"),
    )
    pairs = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ve")
    ).crossJoin(F.broadcast(cents))
    diff2 = F.zip_with("ve", "ce", lambda x, y: (x - y) * (x - y))
    dist = F.round(F.aggregate(diff2, F.lit(0.0), lambda a, b: a + b), 6)
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        pairs.select("vec_id", F.col("cid").alias("cluster"), dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w.orderBy("dist", "cluster")))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster", "dist")
    )


# ------------------------------------------------- per-domain cap sampling
_DOMAIN_CAP = 15


@query(
    "q_sample_domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) AS rn
          FROM documents)
    WHERE rn <= {_DOMAIN_CAP}
    """,
)
def q_sample_domain_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document cap (keep at most N=15 docs per source) —
    the complement of q_sample_stratified's per-language RATE: caps
    protect the mixture from a single crawled domain flooding the
    corpus, a standard balancing step before training.  Selection
    order inside each domain is a deterministic md5 shuffle of doc_id
    (reproducible across runs and engines, no RNG), with doc_id as
    the total tiebreak.  One shuffle on source; Spark's group-limit
    optimization computes the per-partition top-N without sorting
    whole partitions.  At 100 TB, skewed domains are exactly why the
    cap exists — the window never materializes more than N winners
    per domain per partition."""
    d = t(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _DOMAIN_CAP)
    )
