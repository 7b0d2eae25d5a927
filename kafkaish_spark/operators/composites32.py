"""Round-5 sixth wave: language-model smoothing — interpolated
Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen & Goodman 1999's
interpolated form) and the Turing frequency-of-frequencies estimator
(Good 1953), the two classic count-smoothing methods a corpus-quality
pipeline uses to score text under an n-gram LM without assigning zero
mass to rare events.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes neither — [NS] north-star extensions per SURVEY.md
§2.4.  House exactness rules: every model quantity (bigram counts,
continuation counts, frequency-of-frequencies) is an exact integer;
probabilities are a FIXED short sequence of IEEE divisions written
identically on both engines; per-doc log sums fold over
bigram-sorted arrays (Spark ``aggregate`` == DuckDB ``list_reduce``);
round(…, 6) absorbs libm tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_KN_D = 0.75  # absolute discount (exactly representable in binary)


def _bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, w1, w2) adjacent-token pairs: explode with positions,
    drop empty tokens, pair each remaining token with its successor in
    the filtered sequence (lead over the per-doc position order)."""
    d = t(spark, sf, "documents")
    cpus = spark.sparkContext.defaultParallelism
    toks = (
        d.repartition(cpus, "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.select(
            "doc_id",
            F.col("word").alias("w1"),
            F.lead("word").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )


@query(
    "q_text_kneser_ney_bigram",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, word, pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents) WHERE word <> ''),
    toks AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM raw),
    big AS (
      SELECT a.doc_id, a.word AS w1, b.word AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
    c12 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      FROM big GROUP BY 1, 2),
    c1 AS (
      SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1f
      FROM c12 GROUP BY 1),
    cont AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c12 GROUP BY 1),
    bb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS b FROM c12),
    dtf AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM big GROUP BY 1, 2, 3),
    terms AS (
      SELECT doc_id,
             list(c * ln(
               (greatest(c12 - {_KN_D}, 0.0) / c1)
               + ({_KN_D} / c1) * n1f * (n1b / b)
             ) ORDER BY w1, w2) AS vs,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM dtf
      JOIN c12 USING (w1, w2) JOIN c1 USING (w1) JOIN cont USING (w2)
      CROSS JOIN bb
      GROUP BY doc_id)
    SELECT doc_id, n_bigrams,
           round(list_reduce(vs, (a, x) -> a + x) / n_bigrams, 6)
             AS kn_logprob
    FROM terms
    """,
)
def q_text_kneser_ney_bigram(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram log-probability per document:
    P(w2|w1) = max(c(w1,w2) - D, 0)/c(w1) + (D/c(w1)) * N1+(w1,.) *
    Pcont(w2), with the continuation distribution Pcont(w2) =
    N1+(.,w2)/|bigram types| — the smoothing that made n-gram LMs
    competitive (Kneser & Ney 1995) and the classic perplexity filter
    a corpus pipeline scores text with.  Scoring the training corpus
    under its own counts means every scored bigram exists, so the
    discounted term never needs the unseen branch — the backoff weight
    still redistributes D of mass through the continuation model,
    which is what separates KN from naive add-k.

    Scale: the model is three count tables keyed on data-grown
    dictionaries — (w1,w2) bigram types, w1 fan-out, w2 fan-in — all
    produced by partial-aggregated shuffles of the one exploded token
    stream; the scalar |types| broadcasts.  Scoring joins the per-doc
    bigram TF frame against the three tables on their natural keys
    (never broadcast: bigram dictionaries outgrow memory at corpus
    scale) and folds per doc in bigram-sorted order.  No driver
    state, no quadratic blocks.  Reference: [NS] — no analog in
    kafkaish."""
    big = _bigrams(spark, sf)
    c12 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1b"))
    bb = c12.agg(F.count(F.lit(1)).cast("double").alias("b"))
    dtf = big.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    p = (
        F.greatest(F.col("c12") - _KN_D, F.lit(0.0)) / F.col("c1")
    ) + (F.lit(_KN_D) / F.col("c1")) * F.col("n1f") * (
        F.col("n1b") / F.col("b")
    )
    terms = (
        dtf.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(bb))
        .select(
            "doc_id",
            F.struct("w1", "w2", (F.col("c") * F.log(p)).alias("v")).alias(
                "term"
            ),
            "c",
        )
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list("term")).alias("terms"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    score = F.aggregate(
        F.transform("terms", lambda s: s["v"]), F.lit(0.0), lambda a, x: a + x
    )
    return terms.select(
        "doc_id",
        "n_bigrams",
        F.round(score / F.col("n_bigrams"), 6).alias("kn_logprob"),
    )


_GT_MAX_R = 30


@query(
    "q_text_turing_counts",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, word, pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents) WHERE word <> ''),
    toks AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM raw),
    big AS (
      SELECT a.word AS w1, b.word AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
    uni AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS r
      FROM big GROUP BY 1, 2),
    fof AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM uni GROUP BY 1),
    tot AS (SELECT CAST(SUM(r * n_r) AS DOUBLE) AS n FROM fof)
    SELECT f.r, f.n_r,
           round((f.r + 1) * (CAST(g.n_r AS DOUBLE) / f.n_r), 6) AS r_star,
           round(f.n_r * f.r / n, 6) AS raw_mass,
           round(f.n_r * ((f.r + 1) * (CAST(g.n_r AS DOUBLE) / f.n_r)) / n, 6)
             AS gt_mass
    FROM fof f JOIN fof g ON g.r = f.r + 1 CROSS JOIN tot
    WHERE f.r <= {_GT_MAX_R}
    """,
)
def q_text_turing_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Turing frequency-of-frequencies estimator over the corpus
    BIGRAM-type distribution (the event space sparse enough to have a
    populated low-r band — this synthetic corpus's unigram vocabulary
    is uniform at ~900 occurrences per word, so unigram N_1..N_10 are
    all zero): for each observed count r (up to {mr}), the
    adjusted count r* = (r+1) * N_(r+1) / N_r and the probability mass
    the vocabulary slice holds before (r*N_r/N) and after (r**N_r/N)
    adjustment — Good (1953)'s estimate of how much mass belongs to
    unseen events (the r=1 row's raw_mass IS the unseen-mass estimate
    N_1/N).  Rows where N_(r+1) = 0 drop out by the inner join,
    exactly where the raw Turing estimate is undefined and the
    regression-smoothed variant (simple Good-Turing) takes over.

    Scale: two partial-aggregated shuffles (word -> r, r -> N_r); the
    frequency-of-frequencies table is tiny (r <= {mr} kept), the
    self-join on r+1 is over that table, and the corpus total N is a
    1-row broadcast.  Reference: [NS] — no analog in kafkaish."""
    big = _bigrams(spark, sf)
    uni = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("r")
    )
    fof = uni.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("double").alias("n")
    )
    g = fof.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r1"))
    r_star = (F.col("r") + 1) * (F.col("n_r1").cast("double") / F.col("n_r"))
    return (
        fof.filter(F.col("r") <= _GT_MAX_R)
        .join(g, "r")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.round(r_star, 6).alias("r_star"),
            F.round(F.col("n_r") * F.col("r") / F.col("n"), 6).alias(
                "raw_mass"
            ),
            F.round(F.col("n_r") * r_star / F.col("n"), 6).alias("gt_mass"),
        )
    )


q_text_turing_counts.__doc__ = q_text_turing_counts.__doc__.format(
    mr=_GT_MAX_R
)
