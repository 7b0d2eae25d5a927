"""Round-5 third wave: corpus-statistics and training-layout
operators — BM25 ranking, PMI collocation mining, Heaps-law
vocabulary growth, a Zipf rank-frequency fit, leakage-safe
group-aware splitting, and length-bucketed batch packing.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes none of these — all [NS] north-star extensions per
SURVEY.md §2.4's LLM-pipeline mandate (corpus health metrics and
retrieval scoring are standard pretraining-data diagnostics).  Each
query pairs with a DuckDB oracle; exactness follows the house rules:
exact integer counts everywhere, one IEEE op per row where possible,
sorted-array folds for any multi-term float sum, round(…, 6) to
absorb libm tails, and explicit tie-breaks on every top-k cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ----------------------------------------------------------- BM25 ranking
# Okapi BM25 with the standard free parameters.  Integer-halves
# (k1 = 6/5, b = 3/4) so both engines build the constants from exact
# decimal literals.
_K1 = 1.2
_B = 0.75
_BM25_TERMS = ("spark", "merge", "vector")
_TERMS_SQL = ", ".join(f"'{w}'" for w in _BM25_TERMS)


@query(
    "q_text_bm25_rank",
    bench=False,
    oracle=f"""
    WITH w AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    dl AS (SELECT doc_id, lang, len(ws) AS dl FROM w),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl),
    tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE word IN ({_TERMS_SQL}) GROUP BY 1, 2),
    df AS (
      SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok WHERE word IN ({_TERMS_SQL}) GROUP BY 1),
    term_score AS (
      SELECT tf.doc_id, tf.word,
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({_K1} + 1))
               / (tf + {_K1} * (1 - {_B} + {_B} * dl.dl / avgdl)) AS s
      FROM tf
      JOIN df USING (word)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats),
    doc_score AS (
      SELECT doc_id,
             round(list_reduce(list(s ORDER BY word), (a, b) -> a + b),
                   6) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM term_score GROUP BY doc_id)
    SELECT d.doc_id, dl.lang, n_terms_hit, score
    FROM doc_score d JOIN dl ON d.doc_id = dl.doc_id
    ORDER BY score DESC, d.doc_id
    LIMIT 10
    """,
)
def q_text_bm25_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-10 documents for a fixed 3-term query
    (k1=1.2, b=0.75): idf = ln(1 + (N-df+0.5)/(df+0.5)) per term,
    tf saturation with document-length normalization against the
    corpus average length.

    Exactness: tf/df/dl/N are exact integers off one token relation;
    avgdl is a single long/long IEEE division; each per-term score is
    the same double expression on both engines, and the per-doc sum
    folds the (≤3) term scores in word order via a sorted-array fold
    (DuckDB ``list(s ORDER BY word)`` + left fold == Spark
    ``array_sort(collect_list(struct(word, s)))`` + ``aggregate`` —
    0.0 + s1 is bit-equal to s1, so the init makes no difference);
    round(…, 6) absorbs any libm ln tail.  Top-10 tie-breaks doc_id.

    Scale: the token explode shuffles once per aggregate (tf keyed by
    (doc, word) after the IN-list filter prunes ~|Q|/|V| of tokens at
    the map side; df is over |Q| terms -> broadcast; dl is a per-doc
    length, no explode needed).  No all-pairs anything: cost is
    O(tokens matching the query terms), the same inverted-index slice
    a search engine reads.  Cites SURVEY.md §2.4 [NS]."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    ws = F.split("text", " ")
    base = d.repartition(cpus, "doc_id").select(
        "doc_id", "lang", ws.alias("ws")
    )
    dl = base.select("doc_id", "lang", F.size("ws").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tok = base.select(
        "doc_id", F.explode("ws").alias("word")
    ).filter(F.col("word").isin(*_BM25_TERMS))
    tf = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tok.groupBy("word").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = (
        idf
        * (F.col("tf") * (_K1 + 1))
        / (
            F.col("tf")
            + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )
    )
    term_score = (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.struct("word", s.alias("s")).alias("ts"))
    )
    doc_score = term_score.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list("ts")), lambda x: x["s"]
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ),
            6,
        ).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    return (
        doc_score.join(dl.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_terms_hit", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# ------------------------------------------------- PMI collocation mining
_PMI_MIN_COUNT = 30


@query(
    "q_text_pmi_collocations",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    big AS (
      SELECT ws[i+1] AS w1, ws[i+2] AS w2
      FROM w, LATERAL unnest(range(len(ws) - 1)) AS u(i)),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
            FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n1 FROM big GROUP BY 1),
    c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n2 FROM big GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM big)
    SELECT w1, w2, n12, n1, n2,
           round(ln(CAST(n12 AS DOUBLE) * n_big
                    / (CAST(n1 AS DOUBLE) * n2)), 6) AS pmi
    FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
    WHERE n12 >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
    """,
)
def q_text_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Pointwise mutual information over adjacent word pairs —
    PMI(x,y) = ln(P(x,y) / (P(x)P(y))) with the left marginal for x
    and the right marginal for y, all three counts off the SAME bigram
    relation (so the probabilities share one denominator N and the
    statistic is ln of an exact integer ratio).  The classic
    collocation miner (Church & Hanks 1990) and the signal behind
    phrase-vocabulary induction; min-count {_PMI_MIN_COUNT} kills the
    low-frequency PMI bias.

    Exactness: one ln per surviving pair on an exact-integer-built
    double; round 6; top-20 tie-breaks (w1, w2).

    Scale: one explode pass builds the pair relation; three hash
    aggregates over it (n12 keyed by the pair, marginals by one word)
    all get map-side partials; marginals are vocabulary-sized ->
    broadcast joins.  No token-stream self-join."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    ws = F.split("text", " ")
    pairs = (
        d.repartition(cpus, "doc_id")
        .select(
            F.explode(
                F.transform(
                    F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                    lambda x, i: F.struct(
                        x.alias("w1"), F.get(ws, i + 1).alias("w2")
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n12")
    )
    c1 = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n1")
    )
    c2 = pairs.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n2")
    )
    n = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_big"))
    pmi = F.round(
        F.log(
            F.col("n12").cast("double")
            * F.col("n_big")
            / (F.col("n1").cast("double") * F.col("n2"))
        ),
        6,
    )
    return (
        c12.filter(F.col("n12") >= _PMI_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n))
        .select("w1", "w2", "n12", "n1", "n2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------- Heaps-law vocab growth
@query(
    "q_text_heaps_law",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    m AS (SELECT MAX(doc_id) AS max_id FROM w),
    th AS (
      SELECT CAST(d AS BIGINT) AS decile,
             (max_id * d) // 10 AS threshold
      FROM generate_series(1, 10) AS g(d) CROSS JOIN m),
    dl AS (SELECT doc_id, len(ws) AS dl FROM w),
    first_seen AS (
      SELECT word, MIN(doc_id) AS first_doc
      FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY word)
    SELECT decile, threshold,
           CAST((SELECT COALESCE(SUM(dl), 0) FROM dl
                 WHERE doc_id <= threshold) AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(*) FROM first_seen
                 WHERE first_doc <= threshold) AS BIGINT) AS vocab
    FROM th
    ORDER BY decile
    """,
)
def q_text_heaps_law(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law curve: distinct-vocabulary size and total token count
    at 10 growing corpus prefixes (doc_id deciles) — the sublinearity
    diagnostic every pretraining-corpus report plots (V ~ k·N^beta).

    The oracle states the naive form (10 correlated inequality
    subqueries); the Spark plan is PROVEN equal but never expands the
    data 10x: each doc (resp. each vocabulary word) is mapped to the
    FIRST decile whose threshold covers it by a pure 10-step fold
    expression over a broadcast max, then one tiny hash aggregate per
    side, and the running totals are a cumulative window over the
    <= 11-row histograms (bounded SinglePartition by construction —
    registry-contract exempt as a documented bounded window).

    Scale: the heavy inputs (per-doc token counts; per-word first
    occurrence = one min-aggregate keyed by word) are single linear
    shuffles; everything after is on O(10)-row frames."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    ws = F.split("text", " ")
    base = d.repartition(cpus, "doc_id").select(
        "doc_id", ws.alias("ws")
    )
    m = base.agg(F.max("doc_id").alias("max_id"))

    def first_decile(idcol):
        # smallest d in 1..10 with id <= (max_id*d)//10; 11 = beyond
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(10)),
            F.lit(11),
            lambda acc, dd: F.when(
                idcol
                <= F.floor(
                    (F.col("max_id") * dd) / 10
                ).cast("long"),
                F.least(acc, dd),
            ).otherwise(acc),
        )

    dl = (
        base.select("doc_id", F.size("ws").alias("dl"))
        .crossJoin(F.broadcast(m))
        .select(first_decile(F.col("doc_id")).alias("dec"), "dl")
        .groupBy("dec")
        .agg(F.sum("dl").cast("long").alias("toks"))
    )
    first_seen = (
        base.select("doc_id", F.explode("ws").alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(m))
        .select(first_decile(F.col("first_doc")).alias("dec"))
        .groupBy("dec")
        .agg(F.count(F.lit(1)).cast("long").alias("new_words"))
    )
    deciles = (
        spark.range(1, 11)
        .select(F.col("id").cast("long").alias("decile"))
        .crossJoin(F.broadcast(m))
        .select(
            "decile",
            F.floor((F.col("max_id") * F.col("decile")) / 10)
            .cast("long")
            .alias("threshold"),
        )
    )
    w_cum = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        deciles.join(
            dl.withColumnRenamed("dec", "decile"), "decile", "left"
        )
        .join(
            first_seen.withColumnRenamed("dec", "decile"),
            "decile",
            "left",
        )
        .select(
            "decile",
            "threshold",
            F.sum(F.coalesce(F.col("toks"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("n_tokens"),
            F.sum(F.coalesce(F.col("new_words"), F.lit(0)))
            .over(w_cum)
            .cast("long")
            .alias("vocab"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------- Zipf rank-frequency fit
_ZIPF_TOPN = 100


@query(
    "q_text_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents),
    freq AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok GROUP BY 1, 2),
    ranked AS (
      SELECT lang, word, freq,
             row_number() OVER (PARTITION BY lang
                                ORDER BY freq DESC, word) AS rnk
      FROM freq),
    top AS (SELECT * FROM ranked WHERE rnk <= {_ZIPF_TOPN}),
    folded AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
             list_reduce(
               list([ln(CAST(rnk AS DOUBLE)),
                     ln(CAST(freq AS DOUBLE)),
                     ln(CAST(rnk AS DOUBLE)) * ln(CAST(freq AS DOUBLE)),
                     ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))]
                    ORDER BY rnk),
               (a, b) -> [a[1]+b[1], a[2]+b[2], a[3]+b[3], a[4]+b[4]]
             ) AS s
      FROM top GROUP BY lang)
    SELECT lang, n_terms,
           round((n_terms * s[3] - s[1] * s[2])
                 / (n_terms * s[4] - s[1] * s[1]), 6) AS slope,
           round((s[2] - (n_terms * s[3] - s[1] * s[2])
                         / (n_terms * s[4] - s[1] * s[1]) * s[1])
                 / n_terms, 6) AS intercept
    FROM folded
    ORDER BY lang
    """,
)
def q_text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit per language: least-squares slope and
    intercept of ln(freq) on ln(rank) over the top-{_ZIPF_TOPN} terms
    — slope near -1 is the classic naturalness check for a text
    corpus (a corpus whose slope drifts far from -1 is boilerplate- or
    template-heavy).

    Exactness: the four regression sums (Sx, Sy, Sxy, Sxx) are folded
    in RANK ORDER on both engines — DuckDB ``list(… ORDER BY rnk)`` +
    ``list_reduce`` over 4-vectors == Spark ``array_sort(collect_list
    (struct(rnk, …)))`` + ``aggregate`` with ``zip_with`` addition
    (the 0-vector init adds bit-equal zeros) — then one closed-form
    slope/intercept expression on identical doubles, round 6.

    Scale: word frequencies are one hash aggregate; the top-k ranks
    over the per-language VOCABULARY (Heaps-sublinear in the corpus,
    ~|V| rows, not |tokens|), the same dictionary-sized window the
    FastSS dedup blocks on; the fold state is 4 doubles per language.
    """
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    tok = d.repartition(cpus, "doc_id").select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    freq = tok.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "word")
    top = freq.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _ZIPF_TOPN
    )
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    folded = (
        top.select(
            "lang",
            F.struct(
                F.col("rnk").alias("rnk"),
                F.array(x, y, x * y, x * x).alias("v"),
            ).alias("p"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list("p")), lambda p: p["v"]
                ),
                F.array(
                    F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)
                ),
                lambda a, b: F.zip_with(a, b, lambda u, v: u + v),
            ).alias("s"),
        )
    )
    n = F.col("n_terms").cast("double")
    sx, sy, sxy, sxx = (
        F.element_at("s", 1),
        F.element_at("s", 2),
        F.element_at("s", 3),
        F.element_at("s", 4),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return folded.select(
        "lang",
        "n_terms",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    ).orderBy("lang")


# ------------------------------------------- leakage-safe train/val/test split
def _hex8_bucket(col, n: int):
    """md5-derived bucket 0..n-1, identical across engines (the
    hashing-vectorizer idiom, llm.py)."""
    return F.conv(F.substring(col, 1, 8), 16, 10).cast("long") % n


_SPLIT_CASE = (
    "CASE WHEN {b} < 8 THEN 'train' WHEN {b} = 8 THEN 'val' "
    "ELSE 'test' END"
)


@query(
    "q_split_leakage_safe",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, n_chars, md5(text) AS gkey,
             CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) % 10
               AS gb,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10 AS nb
      FROM documents),
    lab AS (
      SELECT doc_id, n_chars, gkey,
             {_SPLIT_CASE.format(b='gb')} AS split,
             {_SPLIT_CASE.format(b='nb')} AS naive_split
      FROM b),
    docs_per_split AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM lab GROUP BY 1),
    grp AS (
      SELECT gkey, MIN(split) AS split,
             COUNT(DISTINCT naive_split) AS n_naive
      FROM lab GROUP BY 1),
    groups_per_split AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS naive_leaked_groups
      FROM grp GROUP BY 1)
    SELECT split, n_docs, sum_chars, n_groups, naive_leaked_groups
    FROM docs_per_split JOIN groups_per_split USING (split)
    ORDER BY split
    """,
)
def q_split_leakage_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test splitting: the split is decided per
    DUPLICATE GROUP (here the exact-dup class, md5 of the content —
    the same key the near-dup clusters would supply), not per
    document, so two copies of one document can never land in both
    train and test.  The ``naive_leaked_groups`` column quantifies
    what doc-level hashing would have leaked: groups whose members the
    per-doc hash scatters across >1 split.  By construction the
    group-keyed rule leaks zero — the oracle proves the count of
    WOULD-BE leaks, the standard argument for group-aware splits
    (Kandpal et al.'s dedup-before-split finding).

    Exactness: both engines derive the 0..9 bucket from the first 8
    hex chars of the same md5, so assignment is bit-identical.

    Scale: one hash shuffle on the digest (the exact-dedup shape), one
    tiny (3-row) aggregate each side, broadcast-free join on the
    3-value split key at negligible width."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    gkey = F.md5("text")

    def _split(b):
        return (
            F.when(b < 8, F.lit("train"))
            .when(b == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    lab = d.repartition(cpus, "doc_id").select(
        "doc_id",
        "n_chars",
        gkey.alias("gkey"),
        _split(_hex8_bucket(gkey, 10)).alias("split"),
        _split(
            _hex8_bucket(F.md5(F.col("doc_id").cast("string")), 10)
        ).alias("naive_split"),
    )
    docs_per_split = lab.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    grp = lab.groupBy("gkey").agg(
        F.min("split").alias("split"),
        F.countDistinct("naive_split").alias("n_naive"),
    )
    groups_per_split = grp.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n_naive") > 1, 1).otherwise(0))
        .cast("long")
        .alias("naive_leaked_groups"),
    )
    return (
        docs_per_split.join(groups_per_split, "split")
        .select(
            "split", "n_docs", "sum_chars", "n_groups",
            "naive_leaked_groups",
        )
        .orderBy("split")
    )


# ------------------------------------------- length-bucketed batch packing
_BATCH_B = 32


@query(
    "q_pack_length_batching",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents),
    s1 AS (SELECT n_tok,
                  row_number() OVER (ORDER BY n_tok, doc_id) AS rnk
           FROM tok),
    s2 AS (SELECT n_tok, row_number() OVER (ORDER BY doc_id) AS rnk
           FROM tok),
    b1 AS (SELECT (rnk - 1) // {_BATCH_B} AS batch, COUNT(*) AS cnt,
                  MAX(n_tok) AS mx, SUM(n_tok) AS s
           FROM s1 GROUP BY 1),
    b2 AS (SELECT (rnk - 1) // {_BATCH_B} AS batch, COUNT(*) AS cnt,
                  MAX(n_tok) AS mx, SUM(n_tok) AS s
           FROM s2 GROUP BY 1),
    a AS (
      SELECT 'arrival_order' AS strategy,
             CAST(COUNT(*) AS BIGINT) AS n_batches,
             CAST(SUM(s) AS BIGINT) AS total_tokens,
             CAST(SUM(cnt * mx - s) AS BIGINT) AS total_padding
      FROM b2
      UNION ALL
      SELECT 'length_sorted', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(s) AS BIGINT), CAST(SUM(cnt * mx - s) AS BIGINT)
      FROM b1)
    SELECT strategy, n_batches, total_tokens, total_padding,
           round(CAST(total_padding AS DOUBLE)
                 / (total_padding + total_tokens), 6) AS pad_ratio
    FROM a ORDER BY strategy
    """,
)
def q_pack_length_batching(spark: SparkSession, sf: str) -> DataFrame:
    """Length-bucketed batch packing: fixed-size batches of
    {_BATCH_B}, each padded to its own max length — comparing
    arrival-order batching against length-sorted batching by total
    padding waste (the inference/training throughput lever; sorting
    by length routinely cuts pad waste by an order of magnitude).

    The oracle states both strategies as naive global row_numbers; the
    Spark plan computes BOTH ranks with the house two-phase
    decomposition (PROVEN equal): the length-sorted rank is a counting
    sort — histogram over distinct token lengths (bounded by max doc
    length), broadcast prefix sums, row_number only within one length
    — and the arrival rank buckets doc_id into 256 ranges off the
    broadcast max so no task ever sorts more than ~1/256th of the
    corpus.  Batch stats then reduce by batch id (one hash shuffle)
    and collapse to 2 rows.

    Exactness: every column is an exact integer until the single
    final rounded division."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    tok = d.repartition(cpus, "doc_id").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )

    def _batch_stats(ranked: DataFrame, strategy: str) -> DataFrame:
        b = ranked.select(
            F.expr(f"(rank - 1) div {_BATCH_B}").alias("batch"), "n_tok"
        )
        per = b.groupBy("batch").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("n_tok").alias("mx"),
            F.sum("n_tok").alias("s"),
        )
        return per.agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("s").cast("long").alias("total_tokens"),
            F.sum(F.col("cnt") * F.col("mx") - F.col("s"))
            .cast("long")
            .alias("total_padding"),
        ).select(F.lit(strategy).alias("strategy"), "*")

    # length-sorted rank: counting sort over the bounded length domain
    hist_l = tok.groupBy("n_tok").agg(F.count(F.lit(1)).alias("hn"))
    w_pre_l = (
        Window.orderBy("n_tok")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_l = hist_l.select(
        "n_tok",
        F.coalesce(F.sum("hn").over(w_pre_l), F.lit(0)).alias("off0"),
    )
    w_in_l = Window.partitionBy("n_tok").orderBy("doc_id")
    ranked_l = (
        tok.withColumn("r", F.row_number().over(w_in_l))
        .join(F.broadcast(prefix_l), "n_tok")
        .select((F.col("off0") + F.col("r")).alias("rank"), "n_tok")
    )
    # arrival-order rank: 256 doc_id range buckets off the broadcast max
    m = tok.agg(F.max("doc_id").alias("max_id"))
    keyed = tok.crossJoin(F.broadcast(m)).withColumn(
        "rb",
        F.floor(
            F.col("doc_id") * 256 / (F.col("max_id") + 1)
        ).cast("long"),
    )
    hist_n = keyed.groupBy("rb").agg(F.count(F.lit(1)).alias("hn"))
    w_pre_n = (
        Window.orderBy("rb").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_n = hist_n.select(
        "rb",
        F.coalesce(F.sum("hn").over(w_pre_n), F.lit(0)).alias("off0"),
    )
    w_in_n = Window.partitionBy("rb").orderBy("doc_id")
    ranked_n = (
        keyed.withColumn("r", F.row_number().over(w_in_n))
        .join(F.broadcast(prefix_n), "rb")
        .select((F.col("off0") + F.col("r")).alias("rank"), "n_tok")
    )
    out = _batch_stats(ranked_n, "arrival_order").unionByName(
        _batch_stats(ranked_l, "length_sorted")
    )
    ratio = F.round(
        F.col("total_padding").cast("double")
        / (F.col("total_padding") + F.col("total_tokens")),
        6,
    )
    return out.select(
        "strategy", "n_batches", "total_tokens", "total_padding",
        ratio.alias("pad_ratio"),
    ).orderBy("strategy")


# ------------------------------------------- cross-source overlap matrix
@query(
    "q_corpus_source_overlap",
    oracle="""
    WITH digests AS (
      SELECT DISTINCT source,
             md5(array_to_string(
                 list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS gkey
      FROM documents),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM digests GROUP BY 1),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM digests a JOIN digests b
        ON a.gkey = b.gkey AND a.source < b.source
      GROUP BY 1, 2)
    SELECT src_a, src_b, n_shared,
           pa.n_distinct AS n_a, pb.n_distinct AS n_b,
           round(CAST(n_shared AS DOUBLE)
                 / (pa.n_distinct + pb.n_distinct - n_shared), 6)
             AS jaccard
    FROM pairs
    JOIN per_src pa ON pairs.src_a = pa.source
    JOIN per_src pb ON pairs.src_b = pb.source
    ORDER BY src_a, src_b
    """,
)
def q_corpus_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source duplicate-overlap matrix: for every source pair,
    how many distinct documents both sources carry, and the Jaccard of
    their fingerprint sets — the diagnostic that finds sources
    re-crawling or mirroring each other before mixture weights are
    chosen (double-counted content silently up-weights itself).  The
    fingerprint is the digest of the SORTED DISTINCT WORD SET (the
    bag-of-words-exact near-dup class: reordered or repeated-word
    template twins collide, novel vocabulary does not), the same
    family the MinHash pipeline approximates.

    Scale: the join key is the content DIGEST (never the text), so the
    heavy shuffle is the exact-dedup shape; a digest shared by k
    sources expands to k(k-1)/2 pairs with k bounded by the source
    COUNT (a catalog dimension, tens), not the corpus — the
    all-pairs space is sources^2, not docs^2.  Per-source distinct
    counts are one aggregate off the same distinct-digest frame."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    digests = (
        d.repartition(cpus, "doc_id")
        .select(
            "source",
            F.md5(
                F.concat_ws(
                    " ",
                    F.array_sort(F.array_distinct(F.split("text", " "))),
                )
            ).alias("gkey"),
        )
        .distinct()
    )
    per_src = digests.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    a = digests.select(
        F.col("source").alias("src_a"), "gkey"
    )
    b = digests.select(F.col("source").alias("src_b"), "gkey")
    pairs = (
        a.join(b, "gkey")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        6,
    )
    return (
        pairs.join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_a"),
                    F.col("n_distinct").alias("n_a"),
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                per_src.select(
                    F.col("source").alias("src_b"),
                    F.col("n_distinct").alias("n_b"),
                )
            ),
            "src_b",
        )
        .select(
            "src_a", "src_b", "n_shared", "n_a", "n_b",
            jac.alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )
