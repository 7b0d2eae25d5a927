"""Round-6 seventh wave: keyphrase extraction and domain reweighting.

- RAKE (Rose et al., "Automatic Keyword Extraction from Individual
  Documents", 2010): stopword-delimited candidate phrases, word score
  deg/freq, phrase score = sum of member scores — the no-model
  keyphrase extractor that still anchors document-tagging pipelines;
- a DoReMi-style domain-reweighting step (Xie et al., NeurIPS 2023,
  simplified to one exponentiated-gradient update): per-source
  cross-entropy under the global unigram LM (capped-vocabulary — the
  q_drift_js_terms scale pattern) exponentiated into a new mixture
  weight per source — the "which domains deserve more epochs" table
  a data-mixing run emits.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: counts exact; every float
reduction folds a key-sorted bounded array; stopword splitting uses
the RE2-safe double-replace (no lookahead) so both regex engines
produce identical phrase lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------------------ RAKE
_RAKE_STOP = "(a|the)"  # the corpus' two function words
_RAKE_TOPK = 20


@query(
    "q_text_rake_keyphrases",
    oracle=f"""
    WITH phr AS (
      SELECT trim(p) AS phrase
      FROM (
        SELECT unnest(string_split(
          regexp_replace(
            regexp_replace(' ' || text || ' ',
                           ' {_RAKE_STOP} ', ' | ', 'g'),
            ' {_RAKE_STOP} ', ' | ', 'g'),
          '|')) AS p
        FROM documents)
      WHERE trim(p) <> ''),
    members AS (
      SELECT phrase, g.w AS word, len(string_split(phrase, ' ')) AS plen
      FROM phr, LATERAL (SELECT unnest(string_split(phrase, ' ')) AS w) g),
    counts AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phr GROUP BY phrase),
    wscore AS (
      SELECT word,
             CAST(SUM(plen) AS DOUBLE) / COUNT(*) AS score
      FROM members GROUP BY word),
    dmem AS (
      SELECT phrase, g.i, g.w AS word
      FROM (SELECT DISTINCT phrase FROM phr) d,
           LATERAL (SELECT unnest(string_split(phrase, ' ')) AS w,
                    generate_subscripts(string_split(phrase, ' '), 1)
                      AS i) g),
    pscore AS (
      SELECT phrase,
             round(list_reduce(list_prepend(0.0,
               list(score ORDER BY i)), (x, y) -> x + y), 6) AS rake
      FROM dmem JOIN wscore USING (word)
      GROUP BY phrase)
    SELECT phrase, n_occurrences, rake
    FROM pscore JOIN counts USING (phrase)
    ORDER BY rake DESC, phrase LIMIT {_RAKE_TOPK}
    """,
)
def q_text_rake_keyphrases(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyphrases: candidate phrases are maximal stopword-free
    runs (split on the corpus' function words with the RE2-safe
    double regexp_replace — both engines produce the identical phrase
    multiset), each word scores degree/frequency (degree = total
    length of phrases it appears in — co-occurrence credit), and a
    phrase scores the sum of its members — long phrases of
    well-connected words win, the RAKE signature.  Top-{k} phrases
    with occurrence counts.

    Scale: phrase extraction is one codegen projection + explode;
    word scores are one (word) rollup; phrase scores fold each
    DISTINCT phrase's member array in position order (bounded by
    phrase length) — all linear, vocabulary-bounded state.
    Exactness: deg/freq are exact-int divisions; the phrase fold is
    position-ordered; round 6 before the top-k (score DESC, phrase
    ASC) tiebreak."""
    d = t(spark, sf, "documents")
    stripped = F.regexp_replace(
        F.regexp_replace(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")),
            f" {_RAKE_STOP} ",
            " | ",
        ),
        f" {_RAKE_STOP} ",
        " | ",
    )
    phr = (
        d.select(F.explode(F.split(stripped, "\\|")).alias("p"))
        .select(F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    members = phr.select(
        "phrase",
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wscore = members.groupBy("word").agg(
        (F.sum("plen").cast("double") / F.count(F.lit(1))).alias("score")
    )
    counts = phr.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    dmembers = counts.select(
        "phrase",
        "n_occurrences",
        F.posexplode(F.split("phrase", " ")).alias("i", "word"),
    )
    pscore = (
        dmembers.join(wscore, "word")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("i", "score"))
                        ),
                        lambda s: s["score"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("rake")
        )
    )
    return (
        pscore.select("phrase", "n_occurrences", "rake")
        .orderBy(F.col("rake").desc(), F.col("phrase"))
        .limit(_RAKE_TOPK)
    )


q_text_rake_keyphrases.__doc__ = q_text_rake_keyphrases.__doc__.format(
    k=_RAKE_TOPK
)


# ------------------------------------------------- DoReMi-style step
_DRM_TOPV = 500
_DRM_ETA = 1.0


@query(
    "q_train_doremi_step",
    oracle=f"""
    WITH words AS (
      SELECT source, unnest(string_split(text, ' ')) AS word
      FROM documents),
    cnt AS (SELECT source, word, COUNT(*) AS tf
            FROM words GROUP BY source, word),
    vocab AS (
      SELECT word, SUM(tf) AS cf,
             ROW_NUMBER() OVER (ORDER BY SUM(tf) DESC, word) AS rk
      FROM cnt GROUP BY word),
    pooled AS (
      SELECT source,
             CASE WHEN rk <= {_DRM_TOPV} THEN cnt.word
                  ELSE chr(164) END AS term,
             SUM(tf) AS tf
      FROM cnt JOIN vocab ON cnt.word = vocab.word
      GROUP BY 1, 2),
    lm AS (
      SELECT term, SUM(tf) AS cf FROM pooled GROUP BY term),
    n AS (SELECT SUM(cf) AS n FROM lm),
    ce AS (
      SELECT source,
             SUM(tf) AS tokens,
             -list_reduce(list_prepend(0.0,
               list(tf * ln(CAST(cf AS DOUBLE) / (SELECT n FROM n))
                    ORDER BY term)),
               (x, y) -> x + y) / SUM(tf) AS ce
      FROM pooled JOIN lm USING (term)
      GROUP BY source),
    m AS (
      SELECT list_reduce(list_prepend(0.0, list(ce ORDER BY source)),
                         (x, y) -> x + y) / COUNT(*) AS mean_ce
      FROM ce),
    ew AS (
      SELECT source, tokens, ce,
             exp({_DRM_ETA} * (ce - (SELECT mean_ce FROM m))) AS w
      FROM ce),
    z AS (SELECT list_reduce(list_prepend(0.0,
            list(w ORDER BY source)), (x, y) -> x + y) AS z FROM ew)
    SELECT source,
           CAST(tokens AS BIGINT) AS tokens,
           round(ce, 6) AS ce_nats,
           round(w / (SELECT z FROM z), 6) AS new_weight
    FROM ew
    """,
)
def q_train_doremi_step(spark: SparkSession, sf: str) -> DataFrame:
    """One DoReMi-style exponentiated-gradient step over domain
    mixture weights: per source, the unigram cross-entropy under the
    GLOBAL capped-vocabulary LM (hard domains read high), the excess
    over the mean CE, and the renormalized weight
    exp(eta * excess) / Z — domains the current model finds hardest
    get upweighted, the core of learned data-mixing (full DoReMi
    iterates this with a proxy model; the step's algebra is
    identical).

    Scale: the vocabulary is capped at {v}+OOV by the
    q_drift_js_terms pattern, so per-source folds are bounded; the
    weight normalization folds the SOURCE frame (20 rows).
    Exactness: token counts exact; CE folds term-sorted arrays; the
    mean-CE, exp, and normalization all run on the bounded source
    frame in source order."""
    d = t(spark, sf, "documents")
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    cnt = words.groupBy("source", "word").agg(F.count(F.lit(1)).alias("tf"))
    vocab = cnt.groupBy("word").agg(F.sum("tf").alias("cf"))
    topv = (
        vocab.orderBy(F.col("cf").desc(), F.col("word"))
        .limit(_DRM_TOPV)
        .select("word", F.lit(True).alias("keep"))
    )
    pooled = (
        cnt.join(F.broadcast(topv), "word", "left")
        .select(
            "source",
            F.when(F.col("keep"), F.col("word"))
            .otherwise(F.lit("¤"))
            .alias("term"),
            "tf",
        )
        .groupBy("source", "term")
        .agg(F.sum("tf").alias("tf"))
    )
    lm = pooled.groupBy("term").agg(F.sum("tf").alias("cf"))
    n_total = lm.agg(F.sum("cf")).first()[0]
    joined = pooled.join(lm, "term")
    ce = joined.groupBy("source").agg(
        F.sum("tf").alias("tokens"),
        (
            -F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "term",
                                (
                                    F.col("tf")
                                    * F.log(
                                        F.col("cf").cast("double")
                                        / F.lit(float(n_total))
                                    )
                                ).alias("v"),
                            )
                        )
                    ),
                    lambda s: s["v"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.sum("tf")
        ).alias("ce"),
    )
    packed = ce.agg(
        F.array_sort(
            F.collect_list(F.struct("source", "tokens", "ce"))
        ).alias("rows")
    )
    mean_ce = F.aggregate(
        F.transform("rows", lambda r: r["ce"]), F.lit(0.0), lambda a, x: a + x
    ) / F.size("rows")
    exploded = packed.select(
        mean_ce.alias("mean_ce"), F.explode("rows").alias("r")
    ).select(
        F.col("r.source").alias("source"),
        F.col("r.tokens").alias("tokens"),
        F.col("r.ce").alias("ce"),
        F.exp(F.lit(_DRM_ETA) * (F.col("r.ce") - F.col("mean_ce"))).alias(
            "w"
        ),
    )
    z_packed = exploded.agg(
        F.array_sort(
            F.collect_list(F.struct("source", "tokens", "ce", "w"))
        ).alias("rows")
    )
    z = F.aggregate(
        F.transform("rows", lambda r: r["w"]), F.lit(0.0), lambda a, x: a + x
    )
    return (
        z_packed.select(z.alias("z"), F.explode("rows").alias("r"))
        .select(
            F.col("r.source").alias("source"),
            F.col("r.tokens").cast("long").alias("tokens"),
            F.round(F.col("r.ce"), 6).alias("ce_nats"),
            F.round(F.col("r.w") / F.col("z"), 6).alias("new_weight"),
        )
    )


q_train_doremi_step.__doc__ = q_train_doremi_step.__doc__.format(v=_DRM_TOPV)
