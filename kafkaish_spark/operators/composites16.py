"""Round-2 additions, batch 4: language-model document scoring and
co-purchase similarity.  [NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer.

q_text_lm_interp_score is the CCNet/KenLM-style corpus-quality filter:
score every document by its mean log-probability under an interpolated
bigram/unigram model estimated from the corpus itself, so
out-of-distribution word salad ranks low.  q_graph_copurchase_sim is
the collaborative-filtering neighbor operator (entities similar when
their customer sets overlap) built on the same inverted-index pair
pattern as the dedup family, but over the relational graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_LAMBDA = 0.7  # interpolation weight on the bigram term


@query(
    "q_text_lm_interp_score",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    uni AS (
      SELECT u.word, COUNT(*) AS nu
      FROM w, LATERAL unnest(ws) AS u(word) GROUP BY u.word),
    ntot AS (SELECT SUM(nu) AS n FROM uni),
    big AS (
      SELECT doc_id, i AS pos, ws[i+1] AS w1, ws[i+2] AS w2
      FROM w, LATERAL unnest(range(len(ws) - 1)) AS u(i)),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS n1 FROM big GROUP BY w1),
    terms AS (
      SELECT big.doc_id, big.pos,
             ln(CAST({_LAMBDA} AS DOUBLE)
                  * (CAST(n12 AS DOUBLE) / n1)
                + CAST({1 - _LAMBDA} AS DOUBLE)
                  * (CAST(nu AS DOUBLE) / n)) AS lp
      FROM big
      JOIN c12 ON big.w1 = c12.w1 AND big.w2 = c12.w2
      JOIN c1 ON big.w1 = c1.w1
      JOIN uni ON big.w2 = uni.word
      CROSS JOIN ntot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                          list(lp ORDER BY pos)),
                             (a, b) -> a + b) / COUNT(*), 6)
             AS avg_logprob
    FROM terms GROUP BY doc_id
    """,
)
def q_text_lm_interp_score(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated bigram/unigram LM score per document — the KenLM-
    perplexity quality filter: avg over token positions of
    ln(0.7 * P(w2|w1) + 0.3 * P(w2)), both probabilities MLE-estimated
    from the corpus itself.  Low scores flag docs whose word sequences
    don't look like the corpus (gibberish, boilerplate soup) for the
    quality-filtering stage of corpus prep.

    Bit-reproducibility: counts are exact integers; each position's
    log term is one IEEE expression on them, and the per-doc sum folds
    the terms in POSITION order from a 0.0 seed (array_sort +
    aggregate vs DuckDB's list(... ORDER BY pos) + list_reduce — the
    same fold contract as q_graph_pagerank), so the mean is identical
    across engines and cluster sizes.

    Scale: bigram pairs come from one indexed array lambda (never a
    token-stream self-join); the count tables shuffle on their own
    keys with map-side combine, then join back to the pair stream on
    those keys; the corpus token total is a 1-row broadcast cross
    join.  The vocab-squared bigram table is the only thing that grows
    super-linearly, and it's the LM itself — at 100 TB you'd threshold
    it (min-count pruning) exactly like any n-gram LM toolkit."""
    d = t(spark, sf, "documents")
    ws = F.split("text", " ")
    uni = (
        d.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("nu"))
    )
    ntot = uni.agg(F.sum("nu").cast("double").alias("n"))
    pairs = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda x, i: F.struct(
                    x.alias("w1"), F.get(ws, i + 1).alias("w2")
                ),
            )
        ).alias("pos", "b"),
    ).select("doc_id", "pos", "b.w1", "b.w2")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    lp = F.log(
        F.lit(float(_LAMBDA)) * (F.col("n12").cast("double") / F.col("n1"))
        + F.lit(float(1 - _LAMBDA)) * (F.col("nu").cast("double") / F.col("n"))
    )
    terms = (
        pairs.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(uni), pairs["w2"] == uni["word"])
        .crossJoin(F.broadcast(ntot))
        .select("doc_id", "pos", lp.alias("lp"))
    )
    summed = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "lp"))),
        F.lit(0.0),
        lambda a, s: a + s["lp"],
    )
    n_terms = F.count(F.lit(1))
    return terms.groupBy("doc_id").agg(
        n_terms.alias("n_bigrams"),
        F.round(summed / n_terms, 6).alias("avg_logprob"),
    )


_MIN_SHARED = 3  # co-purchase pairs need >= this many shared customers
_MIN_COP_JACCARD = 0.22  # similarity floor — keeps the top decile of
# pairs at the test scales instead of the (dense) complete pair graph


@query(
    "q_graph_copurchase_sim",
    oracle=f"""
    WITH cs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT sk, COUNT(*) AS n FROM cs GROUP BY sk),
    shared AS (
      SELECT a.sk AS supp_a, b.sk AS supp_b, COUNT(*) AS c
      FROM cs a JOIN cs b ON a.ck = b.ck AND a.sk < b.sk
      GROUP BY a.sk, b.sk
      HAVING COUNT(*) >= {_MIN_SHARED})
    SELECT supp_a, supp_b, c AS n_shared,
           round(CAST(c AS DOUBLE) / (na.n + nb.n - c), 6) AS jaccard
    FROM shared
    JOIN deg na ON na.sk = supp_a
    JOIN deg nb ON nb.sk = supp_b
    WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= {_MIN_COP_JACCARD}
    """,
)
def q_graph_copurchase_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Supplier co-purchase similarity: Jaccard over customer sets for
    supplier pairs sharing >= 3 customers — the collaborative-filtering
    "related items" operator, same inverted-index-join skeleton as the
    n-gram dedup family but keyed on the relational graph (the index
    key is the customer; only suppliers sharing a customer ever pair).

    Scale: identical profile to q_dedup_ngram_jaccard — a customer
    with k suppliers makes k^2/2 pair rows, so a hot-key corpus would
    take the same DF-cap guard (dropping whale customers who buy from
    everyone loses no discriminative signal); counts are exact
    integers off one distinct edge list, the Jaccard one IEEE
    division.  The HAVING floor keeps the output the top of the
    similarity graph rather than every coincidental pair."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    deg = cs.groupBy("sk").agg(F.count(F.lit(1)).alias("n"))
    a, b = cs.alias("a"), cs.alias("b")
    shared = (
        a.join(b, (F.col("a.ck") == F.col("b.ck")) & (F.col("a.sk") < F.col("b.sk")))
        .groupBy(F.col("a.sk").alias("supp_a"), F.col("b.sk").alias("supp_b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _MIN_SHARED)
    )
    na, nb = deg.alias("na"), deg.alias("nb")
    jac = F.col("c").cast("double") / (F.col("na.n") + F.col("nb.n") - F.col("c"))
    return (
        shared.join(F.broadcast(na), F.col("supp_a") == F.col("na.sk"))
        .join(F.broadcast(nb), F.col("supp_b") == F.col("nb.sk"))
        .filter(jac >= _MIN_COP_JACCARD)
        .select(
            "supp_a",
            "supp_b",
            F.col("c").alias("n_shared"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
