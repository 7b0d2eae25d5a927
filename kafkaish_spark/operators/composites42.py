"""Round-6 eighth wave: embedding-training preprocessing — the two
corpus-to-matrix steps word2vec/GloVe-class trainers run before any
gradient: the smoothed negative-sampling table and the windowed
co-occurrence matrix profile.

- negative-sampling distribution (Mikolov et al., NeurIPS 2013): the
  unigram distribution raised to 3/4, renormalized — the table every
  skip-gram trainer broadcasts to draw negatives from (the 3/4 power
  is THE empirical constant of that paper);
- windowed co-occurrence profile (Pennington et al., GloVe, EMNLP
  2014): symmetric window-{w} pair counts — matrix size, density,
  mass concentration, and the top pairs, i.e. the feasibility
  numbers (nnz -> shuffle size, density -> format choice) checked
  before materializing the X matrix at corpus scale.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: pair/term counts exact; pow
folds run over term-sorted bounded arrays; divisions are single IEEE
ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------- negative sampling table
_NEG_POWER = 0.75
_NEG_TOPK = 25


@query(
    "q_train_negative_sampling",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    cnt AS (SELECT word, COUNT(*) AS cf FROM words GROUP BY word),
    powed AS (
      SELECT word, cf, pow(CAST(cf AS DOUBLE), {_NEG_POWER}) AS p,
             substr(md5(word), 1, 2) AS bucket
      FROM cnt),
    bsum AS (
      SELECT bucket,
             list_reduce(list_prepend(0.0, list(p ORDER BY word)),
                         (a, b) -> a + b) AS s
      FROM powed GROUP BY bucket),
    z AS (
      SELECT list_reduce(list_prepend(0.0, list(s ORDER BY bucket)),
                         (a, b) -> a + b) AS z
      FROM bsum)
    SELECT word,
           CAST(cf AS BIGINT) AS cf,
           round(p / (SELECT z FROM z), 6) AS neg_prob,
           round(CAST(cf AS DOUBLE)
                 / (SELECT SUM(cf) FROM cnt), 6) AS unigram_prob
    FROM powed
    ORDER BY neg_prob DESC, word LIMIT {_NEG_TOPK}
    """,
)
def q_train_negative_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """The word2vec negative-sampling table: unigram counts raised to
    the 3/4 power and renormalized, reported beside the raw unigram
    probability for the top-{k} terms — the 3/4 power visibly
    FLATTENS the head (neg_prob < unigram_prob for the most frequent
    terms, the reverse in the tail), which is the whole point: rare
    words get sampled as negatives often enough to learn from.

    Scale: one explode + one term rollup; the normalizer Z is a
    TWO-PHASE ordered fold — word-ordered partial sums within 256
    md5-prefix buckets, then a bucket-ordered fold of the 256
    partials — so no vocabulary-sized array ever materializes while
    both engines still execute the identical reduction sequence.
    Exactness: counts exact; pow terms fold deterministically; two
    divisions per emitted row."""
    from kafkaish_spark.functions.folds import ordered_sum

    d = t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    cnt = words.groupBy("word").agg(F.count(F.lit(1)).alias("cf"))
    n_total = cnt.agg(F.sum("cf")).first()[0]
    powed = cnt.select(
        "word",
        "cf",
        F.pow(F.col("cf").cast("double"), _NEG_POWER).alias("p"),
        F.substring(F.md5("word"), 1, 2).alias("bucket"),
    )
    bsum = powed.groupBy("bucket").agg(
        ordered_sum(F.col("word"), F.col("p")).alias("s")
    )
    z_val = bsum.agg(
        ordered_sum(F.col("bucket"), F.col("s")).alias("z")
    ).first()["z"]
    return (
        powed.select(
            "word",
            F.col("cf").cast("long").alias("cf"),
            F.round(F.col("p") / F.lit(float(z_val)), 6).alias("neg_prob"),
            F.round(
                F.col("cf").cast("double") / F.lit(int(n_total)), 6
            ).alias("unigram_prob"),
        )
        .orderBy(F.col("neg_prob").desc(), F.col("word"))
        .limit(_NEG_TOPK)
    )


q_train_negative_sampling.__doc__ = q_train_negative_sampling.__doc__.format(
    k=_NEG_TOPK
)


# ------------------------------------------- co-occurrence profile
_COOC_WINDOW = 2  # symmetric context window


@query(
    "q_text_cooc_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pairs AS (
      SELECT CASE WHEN w[x] < w[x + o] THEN w[x] ELSE w[x + o] END AS a,
             CASE WHEN w[x] < w[x + o] THEN w[x + o] ELSE w[x] END AS b,
             COUNT(*) AS n
      FROM toks,
           (SELECT unnest(range(1, 10000)) AS x),
           (SELECT unnest(range(1, {_COOC_WINDOW + 1})) AS o)
      WHERE x + o <= len(w) AND w[x] <> w[x + o]
      GROUP BY 1, 2),
    vocab AS (
      SELECT COUNT(DISTINCT word) AS v FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents)),
    stats AS (
      SELECT COUNT(*) AS nnz, SUM(n) AS mass, MAX(n) AS max_n
      FROM pairs),
    topmass AS (
      SELECT SUM(n) AS tm FROM (
        SELECT n FROM pairs ORDER BY n DESC, a, b LIMIT 100))
    SELECT CAST((SELECT v FROM vocab) AS BIGINT) AS vocab,
           CAST(nnz AS BIGINT) AS nnz_pairs,
           CAST(mass AS BIGINT) AS total_mass,
           CAST(max_n AS BIGINT) AS max_pair_count,
           round(CAST(nnz AS DOUBLE)
                 / ((SELECT v FROM vocab) * ((SELECT v FROM vocab) - 1)
                    / 2.0), 6) AS density,
           round(CAST((SELECT tm FROM topmass) AS DOUBLE) / mass, 6)
             AS top100_mass_share
    FROM stats
    """,
)
def q_text_cooc_profile(spark: SparkSession, sf: str) -> DataFrame:
    """GloVe-style co-occurrence matrix profile for a symmetric
    window-{w} context: vocabulary size, nnz of the (unordered) pair
    matrix, total co-occurrence mass, the hottest pair's count, the
    matrix density, and the mass share of the top-100 pairs — the
    feasibility card read before materializing X at 100 TB (nnz
    bounds the shuffle, density picks the format, the mass share
    tells you whether a frequency cap is needed — GloVe's f(x)
    weighting exists because this share is always extreme).

    Scale: pair generation is one explode over {w} offsets (linear in
    tokens x window), one (a, b)-keyed count shuffle; the profile
    collapses it to ONE row, and the top-100 mass uses
    TakeOrderedAndProject — no vocab^2 anything, the matrix is never
    materialized wide.  Exactness: all counts exact; two divisions."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(_COOC_WINDOW)),
            lambda o: F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("w") - o, F.lit(0))),
                lambda i: F.struct(
                    F.least(
                        F.element_at("w", i), F.element_at("w", i + o)
                    ).alias("a"),
                    F.greatest(
                        F.element_at("w", i), F.element_at("w", i + o)
                    ).alias("b"),
                ),
            ),
        )
    )
    pairs = (
        toks.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .agg(F.count_distinct("word"))
        .first()[0]
    )
    top_mass = (
        pairs.orderBy(F.col("n").desc(), "a", "b")
        .limit(100)
        .agg(F.sum("n"))
        .first()[0]
    )
    return pairs.agg(
        F.lit(int(vocab)).cast("long").alias("vocab"),
        F.count(F.lit(1)).cast("long").alias("nnz_pairs"),
        F.sum("n").cast("long").alias("total_mass"),
        F.max("n").cast("long").alias("max_pair_count"),
        F.round(
            F.count(F.lit(1)).cast("double")
            / F.lit(float(vocab * (vocab - 1) / 2.0)),
            6,
        ).alias("density"),
        F.round(
            F.lit(int(top_mass)).cast("double") / F.sum("n"), 6
        ).alias("top100_mass_share"),
    )


q_text_cooc_profile.__doc__ = q_text_cooc_profile.__doc__.format(
    w=_COOC_WINDOW
)
