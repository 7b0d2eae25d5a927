"""Round-5 second wave: web-corpus URL dedup, CCNet perplexity
buckets, curriculum ordering, margin-based bitext mining, bucketed
zero-exchange joins, and the stream-stream interval-join batch twin.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes none of these — all [NS] north-star extensions per
SURVEY.md §2.4's LLM-pipeline mandate.  Each query pairs with a DuckDB
oracle; exactness follows the house rules (integer cents grid, rounded
cosines with id tiebreaks, sorted-array float folds, BIGINT casts on
every aggregate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.vectors import cosine_sim
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_DOT_SQL = (
    "list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])),"
    " s -> s[1] * s[2]), (x, y) -> x + y)"
)


# ------------------------------------------------------- URL canonical dedup
# The first dedup pass every web-scale corpus pipeline runs: collapse
# crawl records that differ only in tracking params / host case /
# trailing slash.  The testdata has no URL column, so one is
# SYNTHESIZED deterministically (same expression in the oracle); the
# operator under test is the canonicalizer, which is real string work
# on both engines.
_RAW_URL_SQL = (
    "'HTTPS://WWW.' || upper(source) || '.Example.com/' || lang || '/p' || "
    "CAST(doc_id % 10 AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || "
    "'?utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR)"
)

_CANON_SQL = (
    # strip query string -> lowercase scheme+host (path case kept) ->
    # drop a www. prefix -> strip ALL trailing slashes ('/+$': one
    # slash would leave '//' non-idempotent — hypothesis-found edge)
    "replace(lower(regexp_extract(regexp_replace({u}, '\\?.*$', ''), "
    "'^([^/]*//[^/]*)', 1)), '://www.', '://') || "
    "regexp_replace(regexp_replace(regexp_replace({u}, '\\?.*$', ''), "
    "'^[^/]*//[^/]*', ''), '/+$', '')"
)


def _raw_url():
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".Example.com/"),
        F.col("lang"),
        F.lit("/p"),
        (F.col("doc_id") % 10).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_campaign=c"),
        (F.col("doc_id") % 7).cast("string"),
    )


def _canon(url):
    no_q = F.regexp_replace(url, r"\?.*$", "")
    schemehost = F.replace(
        F.lower(F.regexp_extract(no_q, r"^([^/]*//[^/]*)", 1)),
        F.lit("://www."),
        F.lit("://"),
    )
    path = F.regexp_replace(
        F.regexp_replace(no_q, r"^[^/]*//[^/]*", ""), r"/+$", ""
    )
    return F.concat(schemehost, path)


@query(
    "q_dedup_url_canonical",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, lang, source, {_RAW_URL_SQL} AS raw_url FROM documents),
    canon AS (
      SELECT doc_id, lang, source,
             {_CANON_SQL.format(u='raw_url')} AS canon_url
      FROM urls),
    groups AS (
      SELECT lang, source, canon_url,
             COUNT(*) AS n_docs, MIN(doc_id) AS kept_doc
      FROM canon GROUP BY 1, 2, 3)
    SELECT lang, source,
           CAST(SUM(n_docs) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dup_docs,
           CAST(SUM(kept_doc) AS BIGINT) AS kept_doc_sum
    FROM groups GROUP BY 1, 2
    """,
)
def q_dedup_url_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """URL-canonicalization dedup: strip the query string, lowercase
    scheme+host (path case preserved), drop the www. prefix, strip the
    trailing slash, then keep the lowest doc_id per canonical URL.

    Scale: the shuffle key is the canonical URL string (grows with the
    data); the groupBy is one hash shuffle with map-side partials —
    identical shape to exact text dedup (llm.py M1), applied to the
    crawl-metadata column instead of the content digest."""
    d = t(spark, sf, "documents")
    canon = d.select(
        "doc_id", "lang", "source", _canon(_raw_url()).alias("canon_url")
    )
    groups = canon.groupBy("lang", "source", "canon_url").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("kept_doc"),
    )
    return groups.groupBy("lang", "source").agg(
        F.sum("n_docs").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_canonical"),
        (F.sum("n_docs") - F.count(F.lit(1)))
        .cast("long")
        .alias("n_dup_docs"),
        F.sum("kept_doc").cast("long").alias("kept_doc_sum"),
    )


# ------------------------------------------------------- CCNet LM buckets
@query(
    "q_text_ccnet_buckets",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    vocab AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY 1),
    n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n_tok FROM vocab),
    terms AS (
      SELECT doc_id, n_tok,
             list({'tf': tf, 'cnt': cnt} ORDER BY word) AS terms,
             SUM(tf) AS n_words
      FROM tf JOIN vocab USING (word) CROSS JOIN n
      GROUP BY doc_id, n_tok),
    scored AS (
      SELECT doc_id,
             round(list_reduce(
               list_transform(terms, s -> s.tf * ln(s.cnt / n_tok)),
               (a, b) -> a + b) / n_words, 6) AS score
      FROM terms),
    bucketed AS (
      SELECT d.lang, d.n_chars, s.score,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id) AS bucket
      FROM scored s JOIN documents d USING (doc_id))
    SELECT lang, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(score) AS min_score, MAX(score) AS max_score
    FROM bucketed GROUP BY 1, 2
    """,
)
def q_text_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets"): per language, docs
    split into head/middle/tail terciles of their LM score (here the
    corpus-unigram log-prob of q_text_unigram_logprob — bucket 1 =
    best-scoring third).  The standard first quality gate of a
    multilingual corpus: train on head+middle, drop tail.

    Exactness: the per-doc score reuses the bit-equal sorted-fold
    pattern and is rounded to 6 places, so bucket assignment is
    engine-independent.  Scale: the tercile does NOT sort each
    language in one task — it is the two-phase rank of composites24
    applied per (lang, score-range bucket): rank within buckets in
    parallel, add a per-lang broadcast prefix-sum over the bounded
    (lang x bucket) histogram, then map the exact per-lang rank r to
    its tercile with the ntile identity ``floor((r-1)*k/n) + 1``
    (equal scores land in equal buckets, so ties never straddle a
    bucket boundary).  The oracle states the naive per-lang ntile
    window, so the decomposition is PROVEN equal to the one-task sort,
    not just argued."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    words = d.repartition(cpus, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    glob = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    n = glob.agg(F.sum("cnt").cast("double").alias("n_tok"))
    terms = (
        tf.join(F.broadcast(glob), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "n_tok", "tf",
            F.struct("word", "tf", "cnt").alias("term"),
        )
        .groupBy("doc_id", "n_tok")
        .agg(
            F.array_sort(F.collect_list("term")).alias("terms"),
            F.sum("tf").cast("long").alias("n_words"),
        )
    )
    logp = F.aggregate(
        F.transform(
            "terms", lambda s: s["tf"] * F.log(s["cnt"] / F.col("n_tok"))
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    scored = terms.select(
        "doc_id", F.round(logp / F.col("n_words"), 6).alias("score")
    ).join(d.select("doc_id", "lang", "n_chars"), "doc_id")
    # two-phase per-lang rank: range-bucket the (rounded) score so the
    # bucket order matches the sort order (score DESC == -score ASC;
    # equal scores share a bucket), rank inside (lang, bucket) in
    # parallel, add the per-lang prefix of the bounded histogram
    keyed = scored.withColumn(
        "rbucket", F.floor(-F.col("score") * 8).cast("long")
    )
    hist = keyed.groupBy("lang", "rbucket").agg(
        F.count(F.lit(1)).alias("hn")
    )
    w_pre = (
        Window.partitionBy("lang")
        .orderBy("rbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = hist.select(
        "lang",
        "rbucket",
        F.coalesce(F.sum("hn").over(w_pre), F.lit(0)).alias("off0"),
    )
    n_lang = hist.groupBy("lang").agg(F.sum("hn").alias("n_lang"))
    w_b = Window.partitionBy("lang", "rbucket").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    bucketed = (
        keyed.withColumn("r_in_b", F.row_number().over(w_b))
        .join(F.broadcast(prefix), ["lang", "rbucket"])
        .join(F.broadcast(n_lang), "lang")
        .select(
            "lang",
            "n_chars",
            "score",
            # the ntile identity over the exact per-lang rank
            (
                F.floor(
                    (F.col("off0") + F.col("r_in_b") - 1)
                    * 3
                    / F.col("n_lang")
                )
                + 1
            )
            .cast("long")
            .alias("bucket"),
        )
    )
    return bucketed.groupBy("lang", F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# ------------------------------------------------------- curriculum order
_CURR_SEED = "seedC:"


@query(
    "q_train_curriculum_order",
    oracle=f"""
    SELECT doc_id,
           CAST(LEAST(CAST(floor(n_chars / 100.0) AS BIGINT), 5) AS BIGINT)
             AS stage,
           md5('{_CURR_SEED}' || CAST(doc_id AS VARCHAR)) AS skey,
           CAST(ROW_NUMBER() OVER (
             ORDER BY LEAST(CAST(floor(n_chars / 100.0) AS BIGINT), 5),
                      md5('{_CURR_SEED}' || CAST(doc_id AS VARCHAR)))
             AS BIGINT) AS position
    FROM documents
    """,
)
def q_train_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum ordering: short (easy) docs first, in deterministic
    shuffled order within each length stage — the classic
    easy-to-hard data schedule, with the stage boundaries FIXED
    (floor(n_chars/100), capped) so binning is not data-dependent.

    Scale: same two-phase rank as q_train_global_shuffle, extended to
    a composite (stage, shuffle-key) order: bucket = stage * 256 +
    first key byte, rank within buckets in parallel, add a broadcast
    prefix-sum over the <=1536-row bucket histogram.  No corpus-scale
    global window; the oracle states the naive one-window rank, so the
    decomposition is proven exact."""
    d = t(spark, sf, "documents")
    stage = F.least(
        F.floor(F.col("n_chars") / 100.0).cast("long"), F.lit(5).cast("long")
    )
    skey = F.md5(F.concat(F.lit(_CURR_SEED), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id", stage.alias("stage"), skey.alias("skey")
    ).withColumn(
        "bucket",
        F.col("stage") * 256
        + F.conv(F.substring("skey", 1, 2), 16, 10).cast("long"),
    )
    hist = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w_prefix = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = hist.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_prefix), F.lit(0)).alias("offset0"),
    )
    w_bucket = Window.partitionBy("bucket").orderBy("skey")
    return (
        keyed.withColumn("r", F.row_number().over(w_bucket))
        .join(F.broadcast(prefix), "bucket")
        .select(
            "doc_id",
            "stage",
            "skey",
            (F.col("offset0") + F.col("r")).cast("long").alias("position"),
        )
    )


# ------------------------------------------------------- bitext margin mining
_BT_K = 4


@query(
    "q_sim_margin_bitext",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id % 2 = 0 AND vec_id < 60),
    c AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings
          WHERE vec_id % 2 = 1),
    pairs AS (
      SELECT query_id, cand_id,
             round({_DOT_SQL.format(a='qe', b='ce')}
                   / (sqrt({_DOT_SQL.format(a='qe', b='qe')})
                      * sqrt({_DOT_SQL.format(a='ce', b='ce')})), 6)
               AS cos_sim
      FROM q, c),
    topk AS (
      SELECT query_id, cand_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, cand_id) AS rn
      FROM pairs),
    den AS (
      SELECT query_id,
             list_reduce(list(cos_sim ORDER BY cos_sim), (a, b) -> a + b)
               AS denom
      FROM topk WHERE rn <= {_BT_K} GROUP BY 1)
    SELECT t.query_id, t.cand_id, t.cos_sim,
           round(t.cos_sim * {_BT_K} / d.denom, 6) AS margin
    FROM topk t JOIN den d USING (query_id) WHERE t.rn = 1
    """,
)
def q_sim_margin_bitext(spark: SparkSession, sf: str) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk, "
    Margin-based Parallel Corpus Mining with Multilingual Sentence
    Embeddings"): for each query-side vector, the best candidate-side
    match scored by its cosine RELATIVE to the query's top-k cosine
    neighborhood (margin = cos * k / sum(top-k cos)) — absolute-cosine
    thresholds misfire in hubby embedding spaces; the margin
    normalizes per query.

    Exactness: cosines rounded then the k-element denominator summed
    as a value-sorted fold (bit-equal across engines).  Scale: query
    side broadcast, candidate scan partitioned (the sim_topk plan);
    at 100 TB both sides go through the IVF/LSH bucketed path first
    and the margin formula is unchanged."""
    e = t(spark, sf, "embeddings")
    q = e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < 60)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce")
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    topk = pairs.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _BT_K
    )
    den = topk.groupBy("query_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("cos_sim")),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("denom")
    )
    return (
        topk.filter(F.col("rn") == 1)
        .join(den, "query_id")
        .select(
            "query_id",
            "cand_id",
            "cos_sim",
            F.round(F.col("cos_sim") * _BT_K / F.col("denom"), 6).alias(
                "margin"
            ),
        )
    )


# ------------------------------------------------------- bucketed co-located join
_BKT_N = 8


def _bucketed_tables(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Materialize orders + customer as BUCKETED tables (bucketBy on
    the join key, one file per bucket) under the repo warehouse via
    the shared self-healed layout protocol (sources/bucketed.py, the
    r12 extraction of this function's original body).  Bucket layout
    is the offline half of the zero-exchange join: both sides
    pre-hashed into the same ``_BKT_N`` buckets on disk, so the join
    needs no runtime Exchange at any scale — the bucketing pattern
    every nightly big-join pipeline amortizes its shuffle into.  The
    fingerprint covers every column the query reads on both tables
    (count + key/content checksums), so regenerated fixture data can
    never silently serve stale buckets (review r12)."""
    from kafkaish_spark.sources.bucketed import ensure_bucketed_layout

    tag = (os.path.basename(sf.rstrip("/")) or "default").replace(".", "_")
    loc_root = os.path.join(_REPO_ROOT, "spark-warehouse", "_bkt", tag)
    t_o, t_c = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")

    def _fp_orders(df):
        return df.agg(
            F.count(F.lit(1)),
            F.sum("o_custkey").cast("long"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
        ).first()

    def _fp_customer(df):
        # pmod-bounded per-row hash term: a raw xxhash64 sum overflows
        # int64 under ANSI mode
        return df.agg(
            F.count(F.lit(1)),
            F.sum("c_custkey").cast("long"),
            F.sum(F.pmod(F.xxhash64("c_mktsegment"), F.lit(1_000_000_007))),
        ).first()

    ensure_bucketed_layout(
        spark,
        loc_root,
        sides=(
            (t_o, o, "o_custkey", "orders"),
            (t_c, c, "c_custkey", "customer"),
        ),
        n_buckets=_BKT_N,
        fingerprints=(
            ("orders", _fp_orders),
            ("customer", _fp_customer),
        ),
    )
    return t_o, t_c


@query(
    "q_layout_bucketed_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def q_layout_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-exchange co-located join: orders and customer pre-bucketed
    on the join key into the same bucket count, so the SortMergeJoin
    reads bucket i against bucket i with NO runtime shuffle on either
    side — the only Exchange left in the plan is the final
    segment-rollup (plan-asserted in tests/test_composites28.py).
    This is how a 100 TB fact table joins its dimensions nightly
    without re-paying the shuffle: pay it once at layout time
    (bucketBy write), amortize it over every subsequent join."""
    t_o, t_c = _bucketed_tables(spark, sf)
    o = spark.table(t_o)
    c = spark.table(t_c)
    joined = o.hint("merge").join(
        c, o["o_custkey"] == c["c_custkey"]
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


# ------------------------------------------------------- interval-join twin
@query(
    "q_stream_join_interval_counts",
    oracle="""
    SELECT c.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(round(c.value * 100) AS BIGINT)) AS BIGINT)
             AS click_cents
    FROM events c JOIN events v
      ON v.user_id = c.user_id
     AND c.event_type = 'click' AND v.event_type = 'view'
     AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE
    GROUP BY 1
    """,
)
def q_stream_join_interval_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/joins.py interval_join, pytest-covered inner+outer in
    tests/test_streaming_analytics.py): every click paired with the
    views by the same user in the preceding 10 minutes, rolled up per
    user.  The SAME library call runs here on batch frames, so the
    oracle proves the interval-join semantics as data — watermarks
    only bound state in the streaming run, they don't change the
    match set for in-order input."""
    from kafkaish_spark.streaming.joins import interval_join

    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    j = interval_join(clicks, views, "user_id", max_delay="10 minutes")
    return j.groupBy(F.col("l_user_id").alias("user_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.round(F.col("l_value") * 100).cast("long"))
        .cast("long")
        .alias("click_cents"),
    )


# ------------------------------------------------------- in-text PII scrub
# The redaction gate every public-corpus pipeline runs before
# training: find-and-replace emails/phones INSIDE the text, with
# per-language audit counts.  The synthetic corpus carries no PII, so
# deterministic PII is injected first (same expression in the oracle);
# the operator under test is the scrubber.
_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' || "
    "CAST(doc_id % 5 AS VARCHAR) || '.com or +1-555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "q_text_pii_scrub",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, lang, {_PII_TEXT_SQL} AS ptext FROM documents),
    scrubbed AS (
      SELECT lang,
             length(ptext) AS len_before,
             len(regexp_extract_all(ptext, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(ptext, '{_PHONE_RE}')) AS n_phones,
             length(regexp_replace(regexp_replace(ptext,
               '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_PHONE_RE}', '<PHONE>', 'g'))
               AS len_after
      FROM seeded)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS emails_scrubbed,
           CAST(SUM(n_phones) AS BIGINT) AS phones_scrubbed,
           CAST(SUM(len_before) AS BIGINT) AS sum_len_before,
           CAST(SUM(len_after) AS BIGINT) AS sum_len_after
    FROM scrubbed GROUP BY 1
    """,
)
def q_text_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """In-text PII redaction with audit counts: emails and phone
    numbers replaced by typed placeholders, per-language totals of
    what was scrubbed and how many bytes it cost — the redaction
    report a compliance review wants next to the cleaned corpus.

    Scale: pure per-row JVM regex (whole-stage codegen, no shuffle
    until the final per-lang rollup); the regex subset is portable
    (character classes + bounded repetition, no backrefs), so the
    DuckDB oracle runs the byte-identical patterns."""
    d = t(spark, sf, "documents")
    ptext = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    seeded = d.select("lang", ptext.alias("ptext"))
    scrub = F.regexp_replace(
        F.regexp_replace("ptext", _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    scrubbed = seeded.select(
        "lang",
        F.length("ptext").alias("len_before"),
        F.size(F.regexp_extract_all("ptext", F.lit(_EMAIL_RE), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("ptext", F.lit(_PHONE_RE), 0)).alias(
            "n_phones"
        ),
        F.length(scrub).alias("len_after"),
    )
    return scrubbed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_emails").cast("long").alias("emails_scrubbed"),
        F.sum("n_phones").cast("long").alias("phones_scrubbed"),
        F.sum("len_before").cast("long").alias("sum_len_before"),
        F.sum("len_after").cast("long").alias("sum_len_after"),
    )


# ------------------------------------------------------- DP noisy counts
# Laplace-mechanism release of per-(lang, source) document counts.
# The "noise" draw is a seeded md5-uniform pushed through the Laplace
# inverse CDF so BOTH engines compute the identical release — which
# also means this is a DEMO of the mechanism's shape and calibration,
# not a formal DP deployment (real DP requires fresh randomness per
# release; a seeded draw is deterministic by construction).  The
# sensitivity-1 / epsilon calibration, the inverse-CDF algebra, and
# the group-by plan are exactly the production shape.
_DP_EPS = 0.5
_DP_SEED = "seedDP"


@query(
    "q_privacy_dp_counts",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2),
    u AS (
      SELECT lang, source, n,
             (list_reduce(
                list_transform(
                  regexp_extract_all(
                    substr(md5(lang || '|' || source || '|{_DP_SEED}'), 1, 8),
                    '.'),
                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
                (a, b) -> a * 16 + b) + 0.5) / 4294967296.0 AS uu
      FROM g)
    SELECT lang, source,
           round(n + (1.0 / {_DP_EPS})
                     * (CASE WHEN uu < 0.5 THEN 1.0 ELSE -1.0 END)
                     * ln(1.0 - 2.0 * abs(uu - 0.5)), 6) AS noisy_count
    FROM u
    """,
)
def q_privacy_dp_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Laplace-mechanism noisy counts per (lang, source) — the
    epsilon-DP histogram release (sensitivity 1, b = 1/eps), the
    fourth member of the privacy family after k-anonymity,
    l-diversity, and t-closeness.  Inverse-CDF draw:
    noise = sign(0.5-u)/eps * ln(1-2|u-0.5|) with u a seeded
    md5-uniform over the GROUP KEY (never the count), so the release
    is engine-reproducible; the docstring-level caveat is explicit —
    deterministic seeds demo the mechanism, production DP draws fresh
    randomness.  Plan: one partial-aggregated shuffle on the group
    key, then pure per-row scalar math."""
    d = t(spark, sf, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws("|", F.col("lang"), F.col("source"), F.lit(_DP_SEED))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    noise = (
        F.lit(1.0 / _DP_EPS)
        * F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return g.select(
        "lang",
        "source",
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    )


# ------------------------------------------------------- sorted-neighborhood ER
# The classic entity-resolution blocking method this engine's dedup
# family did not yet cover (alongside FastSS deletion neighborhoods,
# MinHash/SimHash LSH, prefix filtering, and containment): sort all
# records by a normalized key and compare only records within a
# fixed-width window of the sort order.  Candidate volume is O(N * w)
# BY CONSTRUCTION — the pair budget every ER pipeline wants.
_SN_WINDOW = 3
_SN_MAXDIST = 2


@query(
    "q_dedup_sorted_neighborhood",
    oracle=f"""
    WITH parts_n AS (
      SELECT p_partkey, p_name,
             replace(lower(p_name), ' ', '') AS k
      FROM part),
    r AS (
      SELECT p_partkey, p_name, k,
             ROW_NUMBER() OVER (ORDER BY k, p_partkey) AS rn
      FROM parts_n),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             levenshtein(a.k, b.k) AS dist
      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {_SN_WINDOW})
    SELECT name_a, name_b, CAST(dist AS BIGINT) AS dist
    FROM pairs WHERE dist <= {_SN_MAXDIST}
    """,
)
def q_dedup_sorted_neighborhood(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood duplicate detection over part names
    (Hernandez & Stolfo's merge/purge): normalize (lowercase, strip
    spaces), sort by the normalized key, compare each record only to
    its w = {w} successors in the sort order, keep pairs within edit
    distance {d}.

    Scale: the global sort rank is the TWO-PHASE decomposition again —
    buckets are 4-char key prefixes (a DATA-GROWN block key: prefix
    cardinality grows with the vocabulary, so buckets stay ~corpus/|V|
    sized), ranked in parallel, stitched with a broadcast prefix-sum
    over the bucket histogram; the neighborhood join is w rank-shifted
    EQUI-joins on the unique rank (shuffle on rank — perfectly
    balanced), so candidate volume is exactly N*w, never a quadratic
    block.  The oracle states the naive one-window rank + range join,
    proving the decomposition and the window semantics together."""
    p = t(spark, sf, "part")
    keyed = p.select(
        "p_partkey",
        "p_name",
        F.replace(F.lower(F.col("p_name")), F.lit(" "), F.lit("")).alias("k"),
    ).withColumn("kb", F.substring("k", 1, 4))
    hist = keyed.groupBy("kb").agg(F.count(F.lit(1)).alias("n"))
    w_pre = Window.orderBy("kb").rowsBetween(Window.unboundedPreceding, -1)
    prefix = hist.select(
        "kb", F.coalesce(F.sum("n").over(w_pre), F.lit(0)).alias("off0")
    )
    w_in = Window.partitionBy("kb").orderBy("k", "p_partkey")
    ranked = (
        keyed.withColumn("r_in", F.row_number().over(w_in))
        .join(F.broadcast(prefix), "kb")
        .select(
            "p_name", "k", (F.col("off0") + F.col("r_in")).alias("rn")
        )
    )
    shifted = [
        ranked.select(
            (F.col("rn") + F.lit(i)).alias("rn"),
            F.col("p_name").alias("name_a"),
            F.col("k").alias("k_a"),
        )
        for i in range(1, _SN_WINDOW + 1)
    ]
    lefts = shifted[0]
    for s in shifted[1:]:
        lefts = lefts.unionByName(s)
    pairs = lefts.join(
        ranked.select(
            "rn", F.col("p_name").alias("name_b"), F.col("k").alias("k_b")
        ),
        "rn",
    )
    dist = F.levenshtein("k_a", "k_b")
    return (
        pairs.select("name_a", "name_b", dist.cast("long").alias("dist"))
        .filter(F.col("dist") <= _SN_MAXDIST)
    )


q_dedup_sorted_neighborhood.__doc__ = q_dedup_sorted_neighborhood.__doc__.format(
    w=_SN_WINDOW, d=_SN_MAXDIST
)


# ------------------------------------------------------- exponential smoothing
_SES_ALPHA = 0.3


@query(
    "q_ts_exp_smoothing",
    oracle=f"""
    WITH days AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, day, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS tt
      FROM days),
    terms AS (
      SELECT event_type, tt,
             CASE WHEN rn = 1
                  THEN pow(1 - {_SES_ALPHA}, tt - 1) * y
                  ELSE {_SES_ALPHA} * pow(1 - {_SES_ALPHA}, tt - rn) * y
             END AS term,
             rn
      FROM r)
    SELECT event_type,
           CAST(MIN(tt) AS BIGINT) AS n_days,
           round(list_reduce(list(term ORDER BY rn), (a, b) -> a + b), 6)
             AS ses_level
    FROM terms GROUP BY event_type
    """,
)
def q_ts_exp_smoothing(spark: SparkSession, sf: str) -> DataFrame:
    """Simple exponential smoothing of daily event counts per type
    (alpha = 0.3): the recursion S_t = a*y_t + (1-a)*S_(t-1), S_1 =
    y_1, evaluated in CLOSED FORM as the weight-decayed sum
    a*(1-a)^(T-t)*y_t (+ the (1-a)^(T-1) seed term) — the smoothed
    level is the 1-step-ahead forecast every capacity dashboard plots.

    Exactness: each term is one pow+multiply (bit-equal IEEE on both
    engines), and the per-type sum folds a DAY-ORDERED array
    (Spark ``aggregate`` == DuckDB ``list_reduce``), so accumulation
    order is pinned; the result rounds to 6.  Scale: the windows run
    over the collapsed (type, day) frame — calendar-bounded, exempt
    from the constant-key window gate by input size (whitelisted with
    that argument)."""
    ev = t(spark, sf, "events")
    days = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    w_rn = Window.partitionBy("event_type").orderBy("day")
    w_all = Window.partitionBy("event_type")
    r = days.select(
        "event_type",
        "y",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("tt"),
    )
    a = _SES_ALPHA
    term = F.when(
        F.col("rn") == 1,
        F.pow(F.lit(1 - a), F.col("tt") - 1) * F.col("y"),
    ).otherwise(
        F.lit(a) * F.pow(F.lit(1 - a), F.col("tt") - F.col("rn")) * F.col("y")
    )
    terms = r.select(
        "event_type",
        "tt",
        F.struct(F.col("rn"), term.alias("t")).alias("s"),
    )
    folded = terms.groupBy("event_type").agg(
        F.min("tt").cast("long").alias("n_days"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("s")),
                F.lit(0.0),
                lambda acc, s: acc + s["t"],
            ),
            6,
        ).alias("ses_level"),
    )
    return folded


# ------------------------------------------------------- cleaning funnel
@query(
    "q_corpus_clean_funnel",
    bench=True,  # the nightly corpus-cleaning path a 100 TB user runs
    # (r5 verdict item 6): URL-canonical dedup + exact dedup + quality
    # gate composed as flag columns in one DAG — two data-grown-key
    # window shuffles plus one rollup, no per-gate materialization
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, lang, n_chars, md5(text) AS digest,
             {_CANON_SQL.format(u=_RAW_URL_SQL)} AS canon_url
      FROM documents),
    flags AS (
      SELECT lang, n_chars, doc_id,
             doc_id = MIN(doc_id) OVER (PARTITION BY canon_url)
               AS keep_url,
             digest
      FROM urls),
    flags2 AS (
      SELECT lang, n_chars, keep_url,
             keep_url AND doc_id = MIN(CASE WHEN keep_url THEN doc_id END)
               OVER (PARTITION BY digest) AS keep_exact
      FROM flags)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(count_if(keep_url) AS BIGINT) AS n_url_kept,
           CAST(count_if(keep_exact) AS BIGINT) AS n_exact_kept,
           CAST(count_if(keep_exact AND n_chars >= 100) AS BIGINT)
             AS n_survivors,
           CAST(SUM(CASE WHEN keep_exact AND n_chars >= 100
                         THEN n_chars END) AS BIGINT)
             AS sum_chars_survivors
    FROM flags2 GROUP BY lang
    """,
)
def q_corpus_clean_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """The cleaning-funnel report of the round-5 gates composed in ONE
    DAG: canonical-URL dedup -> exact content dedup (among URL
    survivors) -> length quality gate, with per-language counts at
    each stage — the attrition table every corpus-cleaning run ships
    with its output (how many docs each gate cost, per language).

    Plan shape is the corpus_prep_report discipline: gates become flag
    COLUMNS (two windows over data-grown keys — canonical URL and
    content digest — never a per-gate materialization), then one
    rollup shuffle.  Three passes of logic, one job."""
    d = t(spark, sf, "documents")
    urls = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5("text").alias("digest"),
        _canon(_raw_url()).alias("canon_url"),
    )
    w_url = Window.partitionBy("canon_url")
    flags = urls.select(
        "lang",
        "n_chars",
        "doc_id",
        "digest",
        (F.col("doc_id") == F.min("doc_id").over(w_url)).alias("keep_url"),
    )
    w_dig = Window.partitionBy("digest")
    keep_exact = F.col("keep_url") & (
        F.col("doc_id")
        == F.min(
            F.when(F.col("keep_url"), F.col("doc_id"))
        ).over(w_dig)
    )
    flags2 = flags.select(
        "lang", "n_chars", "keep_url", keep_exact.alias("keep_exact")
    )
    survivor = F.col("keep_exact") & (F.col("n_chars") >= 100)
    return flags2.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_if(F.col("keep_url")).cast("long").alias("n_url_kept"),
        F.count_if(F.col("keep_exact")).cast("long").alias("n_exact_kept"),
        F.count_if(survivor).cast("long").alias("n_survivors"),
        F.sum(F.when(survivor, F.col("n_chars")))
        .cast("long")
        .alias("sum_chars_survivors"),
    )
