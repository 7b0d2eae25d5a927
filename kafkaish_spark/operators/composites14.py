"""Round-2 additions, batch 2 (SURVEY.md §2.4/§2.5): incremental
bloom-prefiltered dedup, embedding whitening, n-gram novelty, and the
deterministic train/valid/test split audit.  All [NS] north-star
extensions — the reference (/root/reference/src/topic.js) has no
processing layer; these are training-corpus operators the driver
contract adds on top.

Scale stance shared by the batch: the only structure that ever crosses
the cluster whole is a fixed-size summary (an 8 KiB bloom bitmap, a
64-row per-dimension moment table, a per-language total) — the big
fact-side frames shuffle at most once on their natural key, and every
float that crosses the oracle boundary is either an exact integer-grid
sum or a single IEEE op on exact integers, so DuckDB reproduces it
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.operators.llm import _SHINGLES_SQL, _shingles_df
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------- incremental bloom dedup
# The nightly-ingest shape: a NEW batch of documents arrives and must
# be deduplicated against the already-ingested corpus.  Joining the new
# batch against 100 TB of seen keys shuffles the seen corpus every
# night; the standard fix is a bloom filter built once over the seen
# keys and broadcast (the same idea behind Spark's runtime row-level
# filtering, which local mode doesn't expose as a SQL function — so the
# bitmap is built with plain aggregates here and works on any build).
# Bloom negatives are DEFINITELY unseen and skip the join entirely;
# only bloom positives (true dups + the small false-positive tail) are
# verified with an exact anti-join, so the shuffle is proportional to
# the duplicate rate, not the corpus size.
_BLOOM_BITS = 1 << 16  # 8 KiB bitmap — sized for the test corpus;
# at 100 TB scale m with the seen-key count (~10 bits/key for 1% FPR)
_BLOOM_HASHES = 3

# "Seen" corpus = sources src0..src9; the "new" batch = src10+.  The
# dedup key is the first-8-words head fingerprint (an md5 both engines
# compute identically) rather than the full-text hash: full texts are
# all-distinct in the testdata, while head fingerprints collide, which
# is exactly what an incremental dedup must catch.
_HEAD_WORDS = 8


@query(
    "q_dedup_bloom_incremental",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5(array_to_string((string_split(text, ' '))[1:{_HEAD_WORDS}], ' '))
               AS head_key,
             CAST(substr(source, 4) AS INT) >= 10 AS is_new
      FROM documents)
    SELECT doc_id, source, head_key
    FROM keyed
    WHERE is_new
      AND head_key NOT IN (SELECT head_key FROM keyed WHERE NOT is_new)
    """,
)
def q_dedup_bloom_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup of a new ingest batch against the seen corpus,
    bloom-prefiltered: emit the new docs whose head fingerprint never
    appeared in the seen sources.

    Plan: the seen side collapses to a <=1024-row (word_idx, bits)
    bitmap via partial-aggregated bit_or — only 64-bit words cross that
    shuffle, never keys.  The bitmap broadcasts to the new batch; each
    new doc probes its {_BLOOM_HASHES} seeded-xxhash64 positions with a
    JVM-side bitwise AND.  Docs missing any bit are returned directly
    (bloom negatives cannot be dups); only the positives reach the
    exact broadcast anti-join that removes false positives.  The oracle
    is the exact NOT IN — the bloom is a pure prefilter, so the result
    is identical by construction.  At 100 TB the bitmap grows with the
    seen-key count but stays broadcastable (a few GiB covers 10^10 keys
    at 1% FPR) while the anti-join shuffles only the duplicate-rate
    fraction of the batch."""
    d = t(spark, sf, "documents")
    head = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, _HEAD_WORDS))
    keyed = d.select(
        "doc_id",
        "source",
        F.md5(head).alias("head_key"),
        (F.substring("source", 4, 10).cast("int") >= 10).alias("is_new"),
    )
    seen = keyed.filter(~F.col("is_new"))
    new = keyed.filter(F.col("is_new"))

    def probe_cols(key):
        return [
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_HASHES)
        ]

    bloom = (
        seen.select(F.explode(F.array(*probe_cols(F.col("head_key")))).alias("pos"))
        .select(
            F.shiftrightunsigned("pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probes = (
        new.select(
            "doc_id",
            "source",
            "head_key",
            F.explode(F.array(*probe_cols(F.col("head_key")))).alias("pos"),
        )
        .select(
            "doc_id",
            "source",
            "head_key",
            F.shiftrightunsigned("pos", 6).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "hit",
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("mask")) != 0),
        )
        .groupBy("doc_id", "source", "head_key")
        .agg(F.sum(F.col("hit").cast("int")).alias("n_hits"))
    )
    definite_new = probes.filter(F.col("n_hits") < _BLOOM_HASHES).select(
        "doc_id", "source", "head_key"
    )
    survivors = (
        probes.filter(F.col("n_hits") == _BLOOM_HASHES)
        .join(
            F.broadcast(seen.select("head_key").distinct()),
            "head_key",
            "left_anti",
        )
        .select("doc_id", "source", "head_key")
    )
    return definite_new.unionByName(survivors)


# ------------------------------------------------- embedding whitening
def whitened_dims(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, pos, wv): per-dimension z-scores of the embedding
    column on the 1e-6 integer grid — the ONE whitening subtree shared
    by q_embed_whitening (array reassembly) and
    kafkaish_spark.operators.composites18.q_embed_outliers_maha
    (whitened norm), so a change to the grid, the moment math, or the
    zero-std guard can never desynchronize the two kernels and their
    oracles."""
    e = t(spark, sf, "embeddings")
    q = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.round(F.col("v").cast("double") * 1e6).cast("long").alias("qv"),
    )
    st = q.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    std = F.sqrt(F.col("ss").cast("double") / F.col("n") - mean * mean)
    wv = F.round(
        (F.col("qv").cast("double") - mean) / F.nullif(std, F.lit(0.0)), 6
    )
    return q.join(F.broadcast(st), "pos").select(
        "vec_id", "pos", wv.alias("wv")
    )


@query(
    "q_embed_whitening",
    oracle="""
    WITH ex AS (
      SELECT vec_id, i AS pos, embedding[i+1] AS v
      FROM embeddings, unnest(range(len(embedding))) AS u(i)),
    q AS (
      SELECT vec_id, pos,
             CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM ex),
    st AS (
      SELECT pos, COUNT(*) AS n, SUM(qv) AS s, SUM(qv * qv) AS ss
      FROM q GROUP BY pos),
    w AS (
      SELECT vec_id, pos,
             round((CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
                   / nullif(sqrt(CAST(ss AS DOUBLE) / n
                                 - (CAST(s AS DOUBLE) / n)
                                   * (CAST(s AS DOUBLE) / n)), 0),
                   6) AS wv
      FROM q JOIN st USING (pos))
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT) AS n_dims,
           MAX(CASE WHEN pos = 0 THEN wv END) AS w1,
           MAX(CASE WHEN pos = 1 THEN wv END) AS w2,
           CAST(SUM(CAST(round(wv * 1000000) AS BIGINT)) AS BIGINT) AS sum_q
    FROM w GROUP BY vec_id
    """,
)
def q_embed_whitening(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension z-score whitening of the embedding column — the
    standard retrieval preprocessing step (mean-center, unit-variance)
    before cosine/IP search.

    Exactness: raw float32 values are quantized to a 1e-6 integer grid
    first, so the per-dimension sum and sum-of-squares are EXACT int64
    arithmetic (order-independent — same trick as q_embed_centroids);
    z = (qv - mean)/std is then scale-invariant to the grid factor, so
    no de-quantization ever happens and every float op is the same
    single IEEE expression DuckDB evaluates on the same exact integers.
    Plan: one posexplode -> 64-row moment table (partial agg, only
    int64 moments cross the shuffle) -> broadcast back -> per-vector
    regroup.  At 100 TB the moment table is still 64 rows — the only
    full-data passes are the explode and the vec_id regroup, both
    embarrassingly parallel.

    Driver-facing projection is SCALAR on purpose (the driver's pandas
    canonicalizer cannot sort list-typed cells): per-vector dimension
    count, the first two whitened values, and the EXACT int64 sum of
    all whitened values on the 1e-6 grid — order-independent, so it
    pins every element of the whitened vector without emitting the
    array itself (same pattern as q_embed_normalize's invariants)."""
    dims = whitened_dims(spark, sf)
    return dims.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.max(F.when(F.col("pos") == 0, F.col("wv"))).alias("w1"),
        F.max(F.when(F.col("pos") == 1, F.col("wv"))).alias("w2"),
        F.sum(F.round(F.col("wv") * 1e6).cast("long")).alias("sum_q"),
    )


# ------------------------------------------------- n-gram novelty curve
@query(
    "q_text_ngram_novelty",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    firsts AS (SELECT shingle, MIN(doc_id) AS first_doc
               FROM sh GROUP BY shingle)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM sh JOIN firsts USING (shingle)
    GROUP BY doc_id
    """,
)
def q_text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-grams whose FIRST corpus appearance (lowest doc_id) is this doc.
    The corpus-growth audit behind "is new data still adding new
    content?" — a crawl snapshot whose novelty collapses toward 0 is
    recrawling what the corpus already holds.

    Plan: distinct (doc, shingle) pairs -> min(doc_id) per shingle
    (partial agg; only one int64 per shingle crosses the shuffle) ->
    join back on shingle (the natural key both sides are already
    hashed on) -> per-doc counts.  The novelty ratio is one IEEE
    division of two exact int64 counts, bit-equal in DuckDB.  At
    100 TB this is two shuffles of the shingle frame and nothing else;
    no per-pair work exists anywhere (contrast the dedup pair joins),
    so it scales linearly in corpus size."""
    d = t(spark, sf, "documents")
    sh = _shingles_df(d)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
    n = F.count(F.lit(1))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            n.alias("n_grams"),
            novel.alias("n_novel"),
            F.round(novel.cast("double") / n, 6).alias("novelty"),
        )
    )


# ------------------------------------------------- train/valid/test split audit
_SPLIT_BUCKETS = 100
_TRAIN_LT, _VALID_LT = 80, 90  # 80/10/10


@query(
    "q_split_train_valid",
    oracle=f"""
    WITH bucketed AS (
      SELECT lang,
             CASE
               WHEN b < {_TRAIN_LT} THEN 'train'
               WHEN b < {_VALID_LT} THEN 'valid'
               ELSE 'test'
             END AS split,
             len(string_split(text, ' ')) AS n_tok
      FROM (
        SELECT lang, text,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_SPLIT_BUCKETS} AS b
        FROM documents)),
    agg AS (
      SELECT lang, split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM bucketed GROUP BY lang, split),
    tot AS (SELECT lang, SUM(n_docs) AS lang_docs FROM agg GROUP BY lang)
    SELECT agg.lang, split, n_docs, n_tokens,
           round(CAST(n_docs AS DOUBLE) / lang_docs, 6) AS doc_share
    FROM agg JOIN tot ON agg.lang = tot.lang
    """,
)
def q_split_train_valid(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split audit: assignment
    is an md5 bucket of doc_id (same algorithm both engines — the
    hash-based-sampling idiom from q_sample_stratified), so membership
    is reproducible across reruns, cluster sizes, and engines with NO
    random state and NO shuffle for the assignment itself.  Output is
    the per-language x split doc/token census plus each split's share
    of its language — the leakage/imbalance audit run before training.

    Plan: one scan -> partial-aggregated (lang, split) census (60 rows
    at any scale) -> tiny self-join for language totals.  At 100 TB the
    only full-data work is the scan; everything after the first partial
    aggregate is constant-size."""
    d = t(spark, sf, "documents")
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(_SPLIT_BUCKETS),
    )
    split = (
        F.when(b < _TRAIN_LT, "train")
        .when(b < _VALID_LT, "valid")
        .otherwise("test")
    )
    agg = (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )
    tot = agg.groupBy("lang").agg(F.sum("n_docs").alias("lang_docs"))
    return (
        agg.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "split",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_docs").cast("double") / F.col("lang_docs"), 6
            ).alias("doc_share"),
        )
    )
