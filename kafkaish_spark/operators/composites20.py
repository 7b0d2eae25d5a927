"""Round-2 additions, batch 8: privacy/audit/warehouse kernels and
retrieval diversification — l-diversity, Benford's-law digit audit,
MERGE-style upsert, and MMR re-ranking over embedding top-k.
[NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer; these round
out the governance (privacy audits before a corpus ships), fraud/QA
(digit-distribution drift), warehouse-maintenance (MERGE latest-wins)
and retrieval (diversified context selection) surfaces.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.vectors import cosine_sim
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


# ------------------------------------------------------------- privacy
@query(
    "q_privacy_l_diversity",
    oracle="""
    SELECT o_orderpriority, EXTRACT(year FROM o_orderdate) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS l,
           CAST(COUNT(DISTINCT o_orderstatus) >= 3 AS BIGINT) AS diverse
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_privacy_l_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """l-diversity audit (the follow-up to q_privacy_k_anonymity):
    within each quasi-identifier group (priority, year), count the
    DISTINCT values of the sensitive attribute (order status).  A
    group with l=1 leaks the sensitive value of every member even
    when it is k-anonymous — k-anonymity bounds re-identification,
    l-diversity bounds attribute disclosure.

    Scale: one hash aggregate with a distinct-within-group; Spark
    plans count(distinct) as a two-stage expand+aggregate, so the
    shuffle carries (QI, sensitive) pairs — bounded by the distinct
    pair count, not the row count.  For very wide sensitive domains
    swap in approx_count_distinct (the audit needs 'l >= threshold',
    not the exact l)."""
    o = t(spark, sf, "orders")
    return (
        o.select(
            "o_orderpriority",
            F.year("o_orderdate").alias("yr"),
            "o_orderstatus",
        )
        .groupBy("o_orderpriority", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_orderstatus").alias("l"),
            (F.countDistinct("o_orderstatus") >= 3).cast("long").alias("diverse"),
        )
    )


# --------------------------------------------------------------- audit
# Benford first-digit expectation log10(1 + 1/d), in micro-units so the
# whole audit stays on the integer grid (same literals in the oracle).
_BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@query(
    "q_audit_benford",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders
    ), counted AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    )
    SELECT d, n,
           CAST(floor(1e6 * n / SUM(n) OVER ()) AS BIGINT) AS share_micro,
           CAST(floor(1e6 * n / SUM(n) OVER ()) AS BIGINT)
             - CASE d {' '.join(f'WHEN {k} THEN {v}' for k, v in _BENFORD_MICRO.items())}
               END AS dev_micro
    FROM counted
    """,
)
def q_audit_benford(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals: natural
    multi-scale amounts follow P(d) = log10(1+1/d); a ledger whose
    digit shares deviate hard is synthetic or manipulated.  Shares and
    deviations are in exact micro-units (floor of an IEEE division of
    two exact integers — bit-identical across engines); the Benford
    expectations are shared integer literals.

    Scale: a 9-group aggregate over one projected column — map-side
    partial combine collapses each task to <= 9 rows, the final
    exchange moves KBs regardless of fact size.  The window total is
    over a 9-row frame, not the data."""
    o = t(spark, sf, "orders")
    counted = (
        o.select(
            F.substring(F.expr(_CENTS).cast("string"), 1, 1)
            .cast("long")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.floor(F.lit(1e6) * F.col("n") / F.sum("n").over(Window.partitionBy()))
    bexp = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_MICRO.items() for x in kv]
        ),
        F.col("d").cast("int"),
    )
    return counted.select(
        "d",
        "n",
        share.cast("long").alias("share_micro"),
        (share.cast("long") - bexp).alias("dev_micro"),
    )


# ------------------------------------------------------- MERGE / upsert
@query(
    "q_merge_upsert",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_orderpriority, {_CENTS} AS cents,
             0 AS src
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <= 1997
    ), upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, o_orderpriority,
             {_CENTS} AS cents, 1 AS src
      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1997, 1998)
    ), merged AS (
      SELECT * FROM base UNION ALL SELECT * FROM upd
    )
    SELECT o_orderkey, o_orderstatus, o_orderpriority, cents FROM (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                   ORDER BY src DESC) AS rn
      FROM merged)
    WHERE rn = 1
    """,
)
def q_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO semantics (upsert latest-wins) without a table
    format: base snapshot UNION update batch, rank by source priority
    per key, keep rank 1 — matched keys take the update's row
    (status rewritten to 'U'), unmatched update keys insert (1998),
    untouched base keys survive (<= 1996).

    Scale: one shuffle on the merge key; Spark's group-limit pushes
    rn=1 into the per-key sort, so state per key is one row.  On a
    partitioned 100 TB table the same plan runs per affected
    partition only (dynamic partition pruning from the update batch's
    key range) — which is exactly how Delta/Iceberg MERGE schedules
    its rewrite, here expressed engine-free."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    cents = F.expr(_CENTS)
    base = o.filter(yr <= 1997).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        cents.alias("cents"),
        F.lit(0).alias("src"),
    )
    upd = o.filter(yr.isin(1997, 1998)).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        "o_orderpriority",
        cents.alias("cents"),
        F.lit(1).alias("src"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("src").desc())
    return (
        base.unionByName(upd)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "cents")
    )


# ------------------------------------------------- MMR diversification
MMR_LAMBDA = 0.7
MMR_K = 5
MMR_CANDIDATES = 20


@query("q_sim_mmr_rerank", oracle=None)
def q_sim_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking: for each query vector,
    take the brute-force cosine top-20 candidates, then greedily pick
    k=5 maximizing ``lambda*rel - (1-lambda)*max_sim_to_selected`` —
    the standard diversification step between retrieval and a RAG /
    few-shot context window, where plain top-k returns five
    paraphrases of the same document.

    Greedy selection is inherently sequential PER QUERY, so it runs as
    a grouped-map Pandas UDF over the query_id groups: each group is a
    bounded 20-row candidate set (the ANN/brute-force stage already
    cut the corpus down), the O(k * N * dim) numpy loop touches only
    that, and queries parallelize embarrassingly across tasks.  At
    100 TB the candidate stage is the sublinear ANN path
    (q_sim_ann_lsh / q_sim_ivf_ann); MMR cost is independent of corpus
    size by construction.  Rows-only check by design (greedy float
    argmax has no SQL twin); tests/test_composites20.py pins the
    selection against a pure-python reference.
    """
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(
            e.select(
                F.col("vec_id").alias("cand_id"),
                F.col("embedding").alias("ce"),
            )
        )
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("cand_id")
    )
    cand = (
        pairs.select(
            "query_id",
            "cand_id",
            "ce",
            F.round(cosine_sim(F.col("qe"), F.col("ce")), 6).alias("rel"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= MMR_CANDIDATES)
    )

    out_schema = "query_id long, sel_rank int, vec_id long, mmr_score double"

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        # applyInPandas does NOT guarantee intra-group row order; the
        # tie-break below assumes rel-desc/id-asc, so establish it here
        # instead of relying on the upstream window sort surviving the
        # physical plan.
        pdf = pdf.sort_values(
            ["rel", "cand_id"], ascending=[False, True]
        ).reset_index(drop=True)
        qid = int(pdf["query_id"].iloc[0])
        ids = pdf["cand_id"].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["ce"]]
        )
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T  # candidate-candidate cosine, 20x20
        selected: list[int] = []
        scores: list[float] = []
        remaining = list(range(len(ids)))
        while remaining and len(selected) < MMR_K:
            best_i, best_s = None, None
            for i in remaining:
                penalty = max(sim[i, j] for j in selected) if selected else 0.0
                s = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * penalty
                # deterministic: strict improvement, ties keep the
                # earlier candidate (list is rel-desc, id-asc ordered)
                if best_s is None or s > best_s + 1e-12:
                    best_i, best_s = i, s
            selected.append(best_i)
            scores.append(round(float(best_s), 6))
            remaining.remove(best_i)
        return pd.DataFrame(
            {
                "query_id": qid,
                "sel_rank": range(1, len(selected) + 1),
                "vec_id": [int(ids[i]) for i in selected],
                "mmr_score": scores,
            }
        )

    return (
        cand.select("query_id", "cand_id", "ce", "rel")
        .groupBy("query_id")
        .applyInPandas(mmr, schema=out_schema)
    )
