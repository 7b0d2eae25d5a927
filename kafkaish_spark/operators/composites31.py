"""Round-5 fifth wave: probabilistic record linkage and sequential
experimentation — the Fellegi-Sunter match weight (Fellegi & Sunter
1969, "A Theory for Record Linkage", JASA; the model behind Splink /
RecordLinkage toolkits) scored over the sorted-neighborhood candidate
frame, and Wald's sequential probability ratio test (Wald 1945) as the
always-valid A/B decision walk.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes neither — [NS] north-star extensions per SURVEY.md
§2.4.  Both follow the house exactness rules: every probability is a
single division of exact integer counts, log terms are a FIXED short
expression sequence (identical operation order on both engines),
round(…, 6) absorbs libm tails.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# --- Fellegi-Sunter over sorted-neighborhood candidates ---------------
# Comparison vector fields on part records: brand, type, size, and the
# first name token.  Candidate pairs come from the same merge/purge
# construction as q_dedup_sorted_neighborhood (composites28) — compare
# only records within _FS_WINDOW successors in normalized-name order —
# so the pair budget is O(N*w) by construction, never quadratic.
_FS_WINDOW = 3
_FS_MAXDIST = 2  # edit-distance cutoff defining the m-estimation set


@query(
    "q_dedup_fellegi_sunter",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             string_split(p_name, ' ')[1] AS p_tok,
             replace(lower(p_name), ' ', '') AS k
      FROM part),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY k, p_partkey) AS rn FROM p),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(a.p_brand = b.p_brand AS BIGINT) AS g1,
             CAST(a.p_type  = b.p_type  AS BIGINT) AS g2,
             CAST(a.p_size  = b.p_size  AS BIGINT) AS g3,
             CAST(a.p_tok   = b.p_tok   AS BIGINT) AS g4,
             levenshtein(a.k, b.k) AS dist
      FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {_FS_WINDOW}),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM p),
    u AS (
      SELECT
        (SELECT CAST(SUM(c * (c - 1)) AS DOUBLE) FROM
          (SELECT COUNT(*) AS c FROM p GROUP BY p_brand)) / (n * (n - 1)) AS u1,
        (SELECT CAST(SUM(c * (c - 1)) AS DOUBLE) FROM
          (SELECT COUNT(*) AS c FROM p GROUP BY p_type)) / (n * (n - 1)) AS u2,
        (SELECT CAST(SUM(c * (c - 1)) AS DOUBLE) FROM
          (SELECT COUNT(*) AS c FROM p GROUP BY p_size)) / (n * (n - 1)) AS u3,
        (SELECT CAST(SUM(c * (c - 1)) AS DOUBLE) FROM
          (SELECT COUNT(*) AS c FROM p GROUP BY p_tok)) / (n * (n - 1)) AS u4
      FROM nn),
    m AS (
      SELECT
        (COALESCE(CAST(SUM(g1) AS DOUBLE), 0) + 1) / (COUNT(*) + 2) AS m1,
        (COALESCE(CAST(SUM(g2) AS DOUBLE), 0) + 1) / (COUNT(*) + 2) AS m2,
        (COALESCE(CAST(SUM(g3) AS DOUBLE), 0) + 1) / (COUNT(*) + 2) AS m3,
        (COALESCE(CAST(SUM(g4) AS DOUBLE), 0) + 1) / (COUNT(*) + 2) AS m4
      FROM pairs WHERE dist <= {_FS_MAXDIST})
    SELECT name_a, name_b,
           CAST(g1 * 8 + g2 * 4 + g3 * 2 + g4 AS BIGINT) AS gamma,
           round(
             (CASE WHEN g1 = 1 THEN ln(m1 / u1) ELSE ln((1 - m1) / (1 - u1)) END)
           + (CASE WHEN g2 = 1 THEN ln(m2 / u2) ELSE ln((1 - m2) / (1 - u2)) END)
           + (CASE WHEN g3 = 1 THEN ln(m3 / u3) ELSE ln((1 - m3) / (1 - u3)) END)
           + (CASE WHEN g4 = 1 THEN ln(m4 / u4) ELSE ln((1 - m4) / (1 - u4)) END),
           6) AS fs_weight
    FROM pairs CROSS JOIN u CROSS JOIN m
    """,
)
def q_dedup_fellegi_sunter(spark: SparkSession, sf: str) -> DataFrame:
    """Fellegi-Sunter probabilistic match weights over the merge/purge
    candidate frame: each sorted-neighborhood pair gets the comparison
    vector gamma = (brand, type, size, first-name-token agreement) and
    the log-odds weight sum_k gamma_k ? ln(m_k/u_k) : ln((1-m_k)/(1-u_k)).
    u-probabilities are the random-agreement rates computed exactly
    from the field value histograms (u_k = sum_v n_v(n_v-1) / N(N-1) —
    the chance two RANDOM records agree on field k); m-probabilities
    are add-one-smoothed agreement rates over the edit-distance<=
    {d}-defined match set — the standard unsupervised bootstrap before
    EM refinement.

    Scale: candidates are O(N*w) from the two-phase bucket-rank
    construction (4-char-prefix buckets ranked in parallel, stitched by
    a broadcast prefix-sum — no global window); the model state is 8
    scalars (4 u, 4 m) broadcast back onto the pair frame.  Field
    histograms shuffle on data-grown value dictionaries.  Integer
    headroom: n_v(n_v-1) overflows int64 only when one field value
    exceeds ~3e9 rows; at that cardinality regime widen the histogram
    count to double before the product (the division is double anyway).
    Reference: [NS] — no analog in kafkaish."""
    p = (
        t(spark, sf, "part")
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.split("p_name", " ")[0].alias("p_tok"),
            F.replace(F.lower(F.col("p_name")), F.lit(" "), F.lit("")).alias("k"),
        )
        .withColumn("kb", F.substring("k", 1, 4))
    )
    # two-phase global rank (same construction as q_dedup_sorted_neighborhood)
    hist = p.groupBy("kb").agg(F.count(F.lit(1)).alias("nb"))
    w_pre = Window.orderBy("kb").rowsBetween(Window.unboundedPreceding, -1)
    prefix = hist.select(
        "kb", F.coalesce(F.sum("nb").over(w_pre), F.lit(0)).alias("off0")
    )
    w_in = Window.partitionBy("kb").orderBy("k", "p_partkey")
    fields = ["p_brand", "p_type", "p_size", "p_tok"]
    ranked = (
        p.withColumn("r_in", F.row_number().over(w_in))
        .join(F.broadcast(prefix), "kb")
        .select(
            "p_name", "k", *fields, (F.col("off0") + F.col("r_in")).alias("rn")
        )
    )
    a_side = ranked.select(
        F.col("rn"),
        F.col("p_name").alias("name_a"),
        F.col("k").alias("k_a"),
        *[F.col(c).alias(c + "_a") for c in fields],
    )
    shifted = [
        a_side.withColumn("rn", F.col("rn") + F.lit(i))
        for i in range(1, _FS_WINDOW + 1)
    ]
    lefts = shifted[0]
    for s in shifted[1:]:
        lefts = lefts.unionByName(s)
    pairs = lefts.join(
        ranked.select(
            "rn",
            F.col("p_name").alias("name_b"),
            F.col("k").alias("k_b"),
            *[F.col(c).alias(c + "_b") for c in fields],
        ),
        "rn",
    ).select(
        "name_a",
        "name_b",
        *[
            (F.col(c + "_a") == F.col(c + "_b"))
            .cast("long")
            .alias(f"g{i + 1}")
            for i, c in enumerate(fields)
        ],
        F.levenshtein("k_a", "k_b").alias("dist"),
    )
    # u: exact random-agreement probability per field from value histograms
    n_row = p.agg(F.count(F.lit(1)).cast("double").alias("n"))
    u_aggs = [
        p.groupBy(c)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1))
            .cast("double")
            .alias(f"s{i + 1}")
        )
        for i, c in enumerate(fields)
    ]
    u = n_row
    for ua in u_aggs:
        u = u.crossJoin(F.broadcast(ua))
    u = u.select(
        *[
            (F.col(f"s{i + 1}") / (F.col("n") * (F.col("n") - 1))).alias(
                f"u{i + 1}"
            )
            for i in range(4)
        ]
    )
    # m: add-one-smoothed agreement rates over the edit-distance match set
    m = pairs.filter(F.col("dist") <= _FS_MAXDIST).agg(
        *[
            (
                (F.coalesce(F.sum(f"g{i + 1}").cast("double"), F.lit(0.0)) + 1)
                / (F.count(F.lit(1)) + 2)
            ).alias(f"m{i + 1}")
            for i in range(4)
        ]
    )
    scored = pairs.crossJoin(F.broadcast(u)).crossJoin(F.broadcast(m))
    terms = [
        F.when(
            F.col(f"g{i + 1}") == 1,
            F.log(F.col(f"m{i + 1}") / F.col(f"u{i + 1}")),
        ).otherwise(
            F.log((1 - F.col(f"m{i + 1}")) / (1 - F.col(f"u{i + 1}")))
        )
        for i in range(4)
    ]
    weight = ((terms[0] + terms[1]) + terms[2]) + terms[3]
    gamma = (
        F.col("g1") * 8 + F.col("g2") * 4 + F.col("g3") * 2 + F.col("g4")
    ).cast("long")
    return scored.select(
        "name_a",
        "name_b",
        gamma.alias("gamma"),
        F.round(weight, 6).alias("fs_weight"),
    )


q_dedup_fellegi_sunter.__doc__ = q_dedup_fellegi_sunter.__doc__.format(
    d=_FS_MAXDIST
)


# --- Wald SPRT sequential A/B decision walk ---------------------------
# One-sided Bernoulli SPRT per arm: H0 p = _P0 vs H1 p = _P1, alpha =
# 0.05, beta = 0.10.  Each event is a trial, success = 'purchase'.
_P0 = 0.18
_P1 = 0.22
_A_BOUND = "ln(0.90 / 0.05)"  # accept H1 at/above
_B_BOUND = "ln(0.10 / 0.95)"  # accept H0 at/below


@query(
    "q_ab_sprt_sequential",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day,
             user_id % 2 AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s
      FROM events),
    d AS (
      SELECT day, arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS k
      FROM e GROUP BY 1, 2),
    c AS (
      SELECT day, arm,
             CAST(SUM(n) OVER w AS BIGINT) AS n_cum,
             CAST(SUM(k) OVER w AS BIGINT) AS k_cum
      FROM d WINDOW w AS (PARTITION BY arm ORDER BY day)),
    l AS (
      SELECT day, arm, n_cum, k_cum,
             k_cum * ln({_P1} / {_P0})
               + (n_cum - k_cum) * ln((1 - {_P1}) / (1 - {_P0})) AS llr
      FROM c)
    SELECT day, arm, n_cum, k_cum, round(llr, 6) AS llr,
           CASE WHEN llr >= {_A_BOUND} THEN 'accept_h1'
                WHEN llr <= {_B_BOUND} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM l
    """,
)
def q_ab_sprt_sequential(spark: SparkSession, sf: str) -> DataFrame:
    """Wald's sequential probability ratio test as an A/B decision
    walk: per arm (deterministic user-key split) and day, the
    cumulative Bernoulli log-likelihood ratio for H1: p = {p1} against
    H0: p = {p0} over purchase conversions, with the classic
    (alpha = .05, beta = .10) acceptance boundaries — the always-valid
    sequential alternative to the fixed-horizon tests in the ab family
    (CUPED, diff-in-diff).

    Determinism: daily (n, k) are exact integer counts; the cumulative
    sums are integer window folds over the per-day aggregate (bounded:
    2 x n_days rows); the LLR is k*ln(p1/p0) + (n-k)*ln(q1/q0) — two
    in-engine ln() calls on constant rationals, one fixed expression,
    round(6) at the end (decisions compare the unrounded double, which
    both engines compute with the identical operation sequence).

    Scale: one shuffle to the (day, arm) aggregate; the decision walk
    runs over day-level rows (bounded by the calendar, not the
    corpus), the same post-aggregate-cumsum class as
    q_agg_pareto_customers.  Reference: [NS] — no analog in
    kafkaish."""
    e = t(spark, sf, "events")
    d = (
        e.select(
            F.to_date("ts").alias("day"),
            (F.col("user_id") % 2).alias("arm"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("s"),
        )
        .groupBy("day", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("s").cast("long").alias("k"),
        )
    )
    w = (
        Window.partitionBy("arm")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.select(
        "day",
        "arm",
        F.sum("n").over(w).cast("long").alias("n_cum"),
        F.sum("k").over(w).cast("long").alias("k_cum"),
    )
    llr = F.col("k_cum") * F.log(F.lit(_P1) / F.lit(_P0)) + (
        F.col("n_cum") - F.col("k_cum")
    ) * F.log(F.lit(1 - _P1) / F.lit(1 - _P0))
    a_bound = F.log(F.lit(0.90) / F.lit(0.05))
    b_bound = F.log(F.lit(0.10) / F.lit(0.95))
    return c.select(
        "day",
        "arm",
        "n_cum",
        "k_cum",
        F.round(llr, 6).alias("llr"),
        F.when(llr >= a_bound, "accept_h1")
        .when(llr <= b_bound, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


q_ab_sprt_sequential.__doc__ = q_ab_sprt_sequential.__doc__.format(
    p0=_P0, p1=_P1
)
