"""Round-5 fourth wave: data-selection operators — DSIR hashed-n-gram
importance weights (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") and the Moore-Lewis cross-entropy
difference criterion (Moore & Lewis 2010, "Intelligent Selection of
Language Model Training Data").

Both answer the same pretraining question — "which raw-corpus documents
look most like the target domain?" — from opposite feature spaces:
Moore-Lewis scores each document under two word-level unigram LMs
(in-domain minus out-domain log-likelihood), DSIR under two multinomial
models over HASHED n-gram buckets (robust to unbounded vocabulary: the
feature space is a fixed B regardless of corpus size, which is what
makes it the 100 TB-scale choice).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes none of these — [NS] north-star extensions per
SURVEY.md §2.4.  Exactness follows the house rules: md5-derived
buckets (cross-engine identical, unlike xxhash/murmur), exact integer
counts into 1-row broadcast totals, per-doc float sums folded over
bucket-sorted arrays (Spark ``aggregate`` == DuckDB ``list_reduce``),
round(…, 6) to absorb libm tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# Target-domain predicate: English documents stand in for "looks like
# the curated target set"; everything (target included) is the raw
# pool, exactly the paper's setup where the raw pool contains the
# target distribution as a subset.
_TARGET_LANG = "en"
_DSIR_BUCKETS = 64  # fixed feature dimension B — corpus-size-free


@query(
    "q_train_dsir_weights",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents),
    wb AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(word), 1, 8)) AS BIGINT)
               % {_DSIR_BUCKETS} AS b
      FROM words WHERE word <> ''),
    doc_b AS (
      SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM wb GROUP BY 1, 2),
    pool AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS qc FROM wb GROUP BY 1),
    tgt AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS pc
      FROM wb WHERE lang = '{_TARGET_LANG}' GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(qc) AS DOUBLE) AS qn,
             (SELECT CAST(SUM(pc) AS DOUBLE) FROM tgt) AS pn
      FROM pool),
    ratio AS (
      SELECT pool.b,
             ln((COALESCE(pc, 0) + 1) / (pn + {_DSIR_BUCKETS}))
               - ln((qc + 1) / (qn + {_DSIR_BUCKETS})) AS lr
      FROM pool LEFT JOIN tgt ON pool.b = tgt.b CROSS JOIN tot),
    terms AS (
      SELECT doc_id,
             list(c * lr ORDER BY doc_b.b) AS vs,
             CAST(SUM(c) AS BIGINT) AS n_words
      FROM doc_b JOIN ratio ON doc_b.b = ratio.b
      GROUP BY doc_id)
    SELECT doc_id, n_words,
           round(list_reduce(vs, (a, x) -> a + x) / n_words, 6)
             AS dsir_logratio
    FROM terms
    """,
)
def q_train_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance log-weights: hash every token into one of
    B={_DSIR_BUCKETS} md5-derived buckets, fit Laplace-smoothed
    multinomials over the buckets for the TARGET slice (lang = 'en')
    and the RAW pool, and score each document by its mean per-token
    log importance ratio sum_b c_b*(ln p_b - ln q_b)/n — the quantity
    DSIR resamples on (the actual resampling adds Gumbel noise, which
    is the nondeterministic step the paper itself treats as
    exchangeable; the weights ARE the algorithm).

    Scale: this is the whole point of DSIR over word-space methods —
    the model state is B buckets, CONSTANT in corpus size.  One
    explode feeds three aggregates (per-doc-bucket counts, pool
    totals, target totals); the 64-row log-ratio table broadcasts
    back; one groupBy(doc_id) folds the bucket-sorted term array
    bit-identically on both engines.  No vocabulary shuffle, no
    driver collect; at 100 TB each stage is a linear scan plus a
    64-row broadcast."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    words = (
        d.repartition(cpus, "doc_id")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    wb = words.select("doc_id", "lang", bucket.alias("b"))
    doc_b = wb.groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pool = wb.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("qc"))
    tgt = (
        wb.filter(F.col("lang") == _TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("pc"))
    )
    tot = pool.agg(F.sum("qc").cast("double").alias("qn")).crossJoin(
        tgt.agg(F.sum("pc").cast("double").alias("pn"))
    )
    lr = F.log((F.coalesce(F.col("pc"), F.lit(0)) + 1) / (F.col("pn") + _DSIR_BUCKETS)) - F.log(
        (F.col("qc") + 1) / (F.col("qn") + _DSIR_BUCKETS)
    )
    ratio = (
        pool.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select("b", lr.alias("lr"))
    )
    terms = (
        doc_b.join(F.broadcast(ratio), "b")
        .select("doc_id", F.struct("b", (F.col("c") * F.col("lr")).alias("v")).alias("term"), "c")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list("term")).alias("terms"),
            F.sum("c").cast("long").alias("n_words"),
        )
    )
    score = F.aggregate(
        F.transform("terms", lambda s: s["v"]), F.lit(0.0), lambda a, x: a + x
    )
    return terms.select(
        "doc_id",
        "n_words",
        F.round(score / F.col("n_words"), 6).alias("dsir_logratio"),
    )


@query(
    "q_train_moore_lewis",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
      FROM documents),
    w AS (SELECT * FROM words WHERE word <> ''),
    vocab AS (
      SELECT word,
             CAST(COUNT(*) AS BIGINT) AS qc,
             CAST(COUNT(*) FILTER (lang = '{_TARGET_LANG}') AS BIGINT) AS pc
      FROM w GROUP BY 1),
    vsize AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM vocab),
    tot AS (
      SELECT CAST(SUM(qc) AS DOUBLE) AS qn, CAST(SUM(pc) AS DOUBLE) AS pn
      FROM vocab),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2),
    terms AS (
      SELECT doc_id,
             list(c * (ln((pc + 1) / (pn + v)) - ln((qc + 1) / (qn + v)))
                  ORDER BY word) AS vs,
             CAST(SUM(c) AS BIGINT) AS n_words
      FROM tf JOIN vocab USING (word) CROSS JOIN tot CROSS JOIN vsize
      GROUP BY doc_id)
    SELECT doc_id, n_words,
           round(list_reduce(vs, (a, x) -> a + x) / n_words, 6)
             AS ce_diff
    FROM terms
    """,
)
def q_train_moore_lewis(spark: SparkSession, sf: str) -> DataFrame:
    """Moore-Lewis cross-entropy difference: score each document by
    its mean per-token log-likelihood ratio between a unigram LM fit
    on the TARGET slice (lang = 'en') and one fit on the raw pool —
    positive means "more like the target than like average data", the
    classic in-domain selection criterion.  Both LMs are add-one
    smoothed over the SHARED vocabulary, so the two ln() arguments are
    rationals with a common denominator structure and the difference
    is a single fold term per distinct word.

    Scale: unlike DSIR the state here is vocabulary-sized — the
    tf-vocab join shuffles on word once the vocab outgrows a
    broadcast; the per-doc fold over the word-sorted term array is
    unchanged (the same plan as q_text_unigram_logprob, which this
    generalizes from one LM to an LM ratio).  That contrast IS the
    lesson of the pair: same selection question, word-space cost vs
    fixed-B cost."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    w = (
        d.repartition(cpus, "doc_id")
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = w.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("qc"),
        F.count(F.when(F.col("lang") == _TARGET_LANG, 1))
        .cast("long")
        .alias("pc"),
    )
    vsize = vocab.agg(F.count(F.lit(1)).cast("double").alias("v"))
    tot = vocab.agg(
        F.sum("qc").cast("double").alias("qn"),
        F.sum("pc").cast("double").alias("pn"),
    )
    tf = w.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    term_v = F.col("c") * (
        F.log((F.col("pc") + 1) / (F.col("pn") + F.col("v")))
        - F.log((F.col("qc") + 1) / (F.col("qn") + F.col("v")))
    )
    terms = (
        tf.join(F.broadcast(vocab), "word")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", F.struct("word", term_v.alias("v")).alias("term"), "c")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list("term")).alias("terms"),
            F.sum("c").cast("long").alias("n_words"),
        )
    )
    score = F.aggregate(
        F.transform("terms", lambda s: s["v"]), F.lit(0.0), lambda a, x: a + x
    )
    return terms.select(
        "doc_id",
        "n_words",
        F.round(score / F.col("n_words"), 6).alias("ce_diff"),
    )
