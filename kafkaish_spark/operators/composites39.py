"""Round-6 fifth wave: term-level corpus statistics — burstiness and
graph-ranked keywords, the two classic "which words matter" measures
a corpus-analysis layer ships beside TF-IDF/BM25.

- term burstiness (Church & Gale, 1995): a word's tendency to clump —
  documents either don't mention it or mention it repeatedly.  The
  adaptation probability P(tf >= 2 | tf >= 1) and the within-doc mean
  tf separate bursty content words from uniformly-sprinkled function
  words at equal corpus frequency, which is exactly what TF-IDF can't
  see;
- TextRank keywords (Mihalcea & Tarau, EMNLP 2004): damped PageRank
  over the word-adjacency graph, 2 power-iteration rounds with the
  house ordered-fold float discipline (the q_graph_pagerank recipe
  applied to text) — the unsupervised keyword ranking that beats raw
  frequency by rewarding words that co-occur with other central
  words.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ----------------------------------------------------- term burstiness
_BURST_MIN_DF = 20  # report terms with at least this many docs


@query(
    "q_text_burstiness",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
    per_doc AS (
      SELECT word, doc_id, COUNT(*) AS tf
      FROM tf GROUP BY word, doc_id),
    stats AS (
      SELECT word,
             COUNT(*) AS df,
             SUM(tf) AS cf,
             count_if(tf >= 2) AS df2
      FROM per_doc GROUP BY word)
    SELECT word,
           CAST(df AS BIGINT) AS df,
           CAST(cf AS BIGINT) AS cf,
           round(CAST(cf AS DOUBLE) / df, 6) AS mean_tf,
           round(CAST(df2 AS DOUBLE) / df, 6) AS adaptation
    FROM stats WHERE df >= {_BURST_MIN_DF}
    """,
)
def q_text_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Church-Gale burstiness per term: document frequency, collection
    frequency, within-doc mean tf (cf/df — how hard a word is used
    where it IS used), and the adaptation probability
    P(tf >= 2 | tf >= 1) — the probability a document that mentions
    the word mentions it AGAIN.  Function words sit near the corpus
    base rate; bursty content words adapt far above it at the same
    total frequency — the signal TF-IDF's df-only view misses, used
    for stopword induction and topical-term mining.

    Scale: one explode, one (word, doc) count shuffle, one word
    rollup — the q_text_token_entropy cost envelope, embarrassingly
    parallel, no global state.  Exactness: df/cf/df2 exact BIGINTs;
    the two ratios are single IEEE divisions."""
    d = t(spark, sf, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    per_doc = words.groupBy("word", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = per_doc.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.count_if(F.col("tf") >= 2).alias("df2"),
    )
    return stats.filter(F.col("df") >= _BURST_MIN_DF).select(
        "word",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.round(F.col("cf").cast("double") / F.col("df"), 6).alias(
            "mean_tf"
        ),
        F.round(F.col("df2").cast("double") / F.col("df"), 6).alias(
            "adaptation"
        ),
    )


# ------------------------------------------------------ TextRank keywords
_TR_DAMP = 0.85
_TR_BASE = 0.15
_TR_ITERS = 2
_TR_TOPK = 20


def _tr_iter_cte(prev: str, out: str) -> str:
    # one damped round; contributions fold in ascending-src order from
    # a 0.0 seed, the exact sequence Spark's array_sort + aggregate runs
    return f"""
    {out} AS (
      SELECT e.dst AS word,
             CAST({_TR_BASE} AS DOUBLE) + CAST({_TR_DAMP} AS DOUBLE) *
               list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(p.r / deg.d ORDER BY e.src)),
                 (a, b) -> a + b) AS r
      FROM e
      JOIN deg ON e.src = deg.src
      JOIN {prev} p ON e.src = p.word
      GROUP BY e.dst)"""


@query(
    "q_text_textrank_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    adj AS (
      SELECT DISTINCT doc_id, w[x] AS a, w[x+1] AS b
      FROM toks, (SELECT unnest(range(1, 10000)) AS x)
      WHERE x + 1 <= len(w) AND w[x] <> w[x+1]),
    e AS (
      SELECT a AS src, b AS dst FROM (SELECT DISTINCT a, b FROM adj)
      UNION ALL
      SELECT b AS src, a AS dst FROM (SELECT DISTINCT a, b FROM adj)),
    deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT src AS word, CAST(1.0 AS DOUBLE) AS r FROM deg),
    {_tr_iter_cte('r0', 'r1')},
    {_tr_iter_cte('r1', 'r2')}
    SELECT word, round(r, 6) AS textrank
    FROM r2 ORDER BY round(r, 6) DESC, word LIMIT {_TR_TOPK}
    """,
)
def q_text_textrank_terms(spark: SparkSession, sf: str) -> DataFrame:
    """TextRank keyword extraction: damped PageRank ({i} rounds) over
    the undirected word-adjacency graph (distinct per-doc adjacent
    pairs), top-{k} terms — the unsupervised keyword ranker that
    rewards words co-occurring with other central words rather than
    merely frequent ones.  The graph edge set is DISTINCT (doc, a, b)
    collapsed to distinct (a, b): adjacency, not frequency, per the
    original paper's unweighted variant.

    Bit-reproducibility is the q_graph_pagerank contract verbatim:
    per-node contributions fold in ascending-neighbor order from a
    0.0 seed on both engines, ranks round to 6 before the top-k
    tiebreak (rank DESC, word ASC).  Scale: vocabulary-sized graph
    (Heaps-law bounded), O(E) join + aggregate per round, top-k via
    TakeOrderedAndProject — no corpus-scale sort."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    adj = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at("w", i).alias("a"),
                        F.element_at("w", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = adj.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        adj.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(F.col("src").alias("word"), F.lit(1.0).alias("r"))
    withdeg = edges.join(deg, "src")
    for _ in range(_TR_ITERS):
        contrib = withdeg.join(
            ranks, withdeg["src"] == ranks["word"]
        ).select("dst", "src", (F.col("r") / F.col("d")).alias("cb"))
        summed = F.aggregate(
            F.array_sort(F.collect_list(F.struct("src", "cb"))),
            F.lit(0.0),
            lambda a, s: a + s["cb"],
        )
        ranks = contrib.groupBy(F.col("dst").alias("word")).agg(
            (F.lit(_TR_BASE) + F.lit(_TR_DAMP) * summed).alias("r")
        )
    return (
        ranks.select("word", F.round("r", 6).alias("textrank"))
        .orderBy(F.col("textrank").desc(), F.col("word"))
        .limit(_TR_TOPK)
    )


q_text_textrank_terms.__doc__ = q_text_textrank_terms.__doc__.format(
    i=_TR_ITERS, k=_TR_TOPK
)
