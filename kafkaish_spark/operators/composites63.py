"""Round-12 wave 3: resampling inference and robust estimation.

Four operators closing the remaining gaps in the statistics family:

- McNemar's test — the PAIRED-difference question over the same
  two-rater frame q_ml_cohen_kappa scores for agreement (did gate B
  flip decisions relative to gate A, beyond symmetry?);
- a deterministic permutation test (randomization inference) — the
  nonparametric sibling of q_ab_welch_ttest, built on the same
  md5-seeded replicate machinery as the Poisson bootstrap
  (composites60) but re-assigning ARMS instead of weights;
- delete-one-source jackknife — the drop-one-source sensitivity audit
  a corpus owner runs before trusting an aggregate (how much does any
  single source move the corpus mean, and what is the jackknife SE?);
- trimmed mean — the robust estimator that DROPS the tails, completing
  the robust-location family next to q_agg_winsorized_mean (which
  clamps them), exactly via discrete-CDF partial-cell clipping.

Reference parity note: the reference engine (steveliles/kafkaish,
src/topic.js) has no analytics surface — north-star capability work.

Exactness: the house rules (SURVEY.md §6) — integer grids until one
mirrored IEEE composition; the only cross-row float sums fold
source-sorted bounded arrays identically on both engines; replicate
pseudo-randomness is md5-hex string comparison, never a float draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# shared with q_ml_cohen_kappa (composites62): the two deterministic
# document raters whose agreement kappa scores — McNemar asks the
# complementary marginal-homogeneity question over the SAME frame, so
# the thresholds are IMPORTED, not copied (review r12: a copied
# literal would silently desynchronize the pair)
from kafkaish_spark.operators.composites62 import (  # noqa: E402
    _KAPPA_CHARS as _GATE_CHARS,
    _KAPPA_TOKS as _GATE_TOKS,
)

_PERM_B = 64  # permutation replicates
_PERM_SEED = "perm63"

_TRIM_FRAC = 0.1  # trim 10% of ranks from each side


@query(
    "q_ab_mcnemar",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {_GATE_CHARS} THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(string_split(text, ' ')) >= {_GATE_TOKS}
                  THEN 1 ELSE 0 END AS rb
      FROM documents),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ra * (1 - rb)) AS BIGINT) AS b,
                 CAST(SUM((1 - ra) * rb) AS BIGINT) AS c
          FROM r)
    SELECT n, b, c,
      round(CAST((b - c) * (b - c) AS DOUBLE) / NULLIF(b + c, 0), 6)
        AS chi2
    FROM c
    """,
)
def q_ab_mcnemar(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's test over the two document gates q_ml_cohen_kappa
    rates for agreement: only the DISCORDANT pairs matter — b = docs
    gate A admits but B rejects, c = the reverse — and the statistic
    chi2 = (b-c)^2/(b+c) (1 df) asks whether the two gates disagree
    SYMMETRICALLY or one is systematically stricter (McNemar 1947,
    the paired 2x2 test; kappa answers "do they agree", this answers
    "when they don't, is it one-sided").  Exact integer counts, one
    division, NULL when there are no discordant pairs at all (both
    engines via the same NULLIF guard)."""
    d = t(spark, sf, "documents")
    ra = F.when(F.col("n_chars") >= _GATE_CHARS, 1).otherwise(0)
    rb = F.when(F.size(F.split("text", " ")) >= _GATE_TOKS, 1).otherwise(0)
    c = d.select(ra.alias("ra"), rb.alias("rb")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("b"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("c"),
    )
    diff = F.col("b") - F.col("c")
    return c.select(
        "n",
        "b",
        "c",
        F.round(
            (diff * diff).cast("double")
            / F.nullif(F.col("b") + F.col("c"), F.lit(0)),
            6,
        ).alias("chi2"),
    )


@query(
    "q_ml_permutation_test",
    oracle=f"""
    WITH o AS (SELECT o_orderkey AS k, o_custkey % 2 AS arm,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
               FROM orders),
    obs AS (
      SELECT abs(CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN arm = 0 THEN 1 END)
               - CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN arm = 1 THEN 1 END)) AS d_obs,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM o),
    reps AS (
      SELECT b, v,
             CASE WHEN substring(md5('{_PERM_SEED}:' || CAST(k AS VARCHAR)
                    || ':' || CAST(b AS VARCHAR)), 1, 1) <= '7'
                  THEN 0 ELSE 1 END AS parm
      FROM o CROSS JOIN (SELECT unnest(range(0, {_PERM_B})) AS b)),
    rd AS (
      SELECT b,
             abs(CAST(SUM(CASE WHEN parm = 0 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN parm = 0 THEN 1 END)
               - CAST(SUM(CASE WHEN parm = 1 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN parm = 1 THEN 1 END)) AS d
      FROM reps GROUP BY b)
    SELECT n0, n1, round(d_obs, 6) AS d_obs_cents,
           CAST(SUM(CASE WHEN d >= d_obs THEN 1 ELSE 0 END) AS BIGINT)
             AS b_exceed,
           round(CAST(1 + SUM(CASE WHEN d >= d_obs THEN 1 ELSE 0 END)
                      AS DOUBLE) / {_PERM_B + 1}, 6) AS p_value
    FROM rd CROSS JOIN obs GROUP BY n0, n1, d_obs
    """,
)
def q_ml_permutation_test(spark: SparkSession, sf: str) -> DataFrame:
    """Permutation (randomization) test of the arm difference in mean
    order value — the distribution-free sibling of q_ab_welch_ttest:
    B={_PERM_B} deterministic re-assignments of orders to pseudo-arms
    (an md5 hex-digit COIN per (order, replicate) — a pure string
    compare, no float randomness), the |mean difference| recomputed
    per replicate, and the add-one p-value (1 + #exceed)/(B + 1)
    (Phipson & Smyth 2010).  The deterministic o_custkey%2 "arms" are
    null by construction, so the p-value calibrates high — the
    machinery, not the verdict, is the operator.

    Scale: the composites60 bootstrap shape — a constant B-way fan-out
    riding ONE scan into a 2B-group hash aggregate with map-side
    partials; no resampling shuffle, no window.  Each replicate mean
    is exact BIGINT sums with one division; the double compare
    d >= d_obs is identical on both engines because both sides are
    identically-composed IEEE values."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 2).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    mean0 = F.sum(F.when(F.col("arm") == 0, F.col("v"))).cast(
        "double"
    ) / F.sum(F.when(F.col("arm") == 0, 1))
    mean1 = F.sum(F.when(F.col("arm") == 1, F.col("v"))).cast(
        "double"
    ) / F.sum(F.when(F.col("arm") == 1, 1))
    obs = o.agg(
        F.abs(mean0 - mean1).alias("d_obs"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    reps = o.select(
        "k",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
    ).select(
        "b",
        "v",
        F.when(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{_PERM_SEED}:"),
                        F.col("k").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                1,
            )
            <= "7",
            0,
        )
        .otherwise(1)
        .alias("parm"),
    )
    pmean0 = F.sum(F.when(F.col("parm") == 0, F.col("v"))).cast(
        "double"
    ) / F.sum(F.when(F.col("parm") == 0, 1))
    pmean1 = F.sum(F.when(F.col("parm") == 1, F.col("v"))).cast(
        "double"
    ) / F.sum(F.when(F.col("parm") == 1, 1))
    rd = reps.groupBy("b").agg(F.abs(pmean0 - pmean1).alias("d"))
    exceed = F.sum(
        F.when(F.col("d") >= F.col("d_obs"), 1).otherwise(0)
    ).cast("long")
    return (
        rd.crossJoin(F.broadcast(obs))
        .groupBy("n0", "n1", "d_obs")
        .agg(exceed.alias("b_exceed"))
        .select(
            "n0",
            "n1",
            F.round("d_obs", 6).alias("d_obs_cents"),
            "b_exceed",
            F.round(
                (1 + F.col("b_exceed")).cast("double") / (_PERM_B + 1), 6
            ).alias("p_value"),
        )
    )


@query(
    "q_corpus_jackknife_sources",
    oracle="""
    WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g,
                      CAST(SUM(n_chars) AS BIGINT) AS s_g
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS gk FROM g),
    loo AS (SELECT source, n_g,
                   CAST(s - s_g AS DOUBLE) / (n - n_g) AS loo_mean,
                   CAST(s AS DOUBLE) / n AS mean_all, gk, n
            FROM g CROSS JOIN tot),
    bar AS (SELECT list_reduce(list_prepend(0.0,
                     list(loo_mean ORDER BY source)), (a, b) -> a + b)
                   / MIN(gk) AS loo_bar FROM loo),
    ssq AS (SELECT list_reduce(list_prepend(0.0,
                     list((loo_mean - loo_bar) * (loo_mean - loo_bar)
                          ORDER BY source)), (a, b) -> a + b) AS ss
            FROM loo CROSS JOIN bar)
    SELECT source, n_g AS n_docs, round(loo_mean, 6) AS loo_mean,
           round(loo_mean - mean_all, 6) AS influence,
           n AS n_total, round(mean_all, 6) AS mean_all,
           round(sqrt((gk - 1.0) / gk * ss), 6) AS jk_se
    FROM loo CROSS JOIN ssq
    """,
)
def q_corpus_jackknife_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Delete-one-source jackknife over the corpus mean document
    length: per source, the leave-that-source-out mean (computed from
    TOTALS — (S - s_g)/(N - n_g), no second scan), its influence on
    the corpus mean, and the delete-one-group jackknife standard error
    sqrt((G-1)/G * sum (loo_g - loo_bar)^2) — the sensitivity audit
    that says whether any single source is quietly carrying an
    aggregate (the group-level sibling of the Poisson bootstrap's
    row-level CI).

    Exactness: group sums are exact BIGINTs; each loo mean is one IEEE
    division; the two cross-group float sums (loo_bar, the squared
    deviations) fold source-sorted arrays identically on both engines.
    Scale: one scan to the 20-row source frame; everything after is
    arithmetic on that bounded frame."""
    d = t(spark, sf, "documents")
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("n_chars").cast("long").alias("s_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("gk"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_g",
        (
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g"))
        ).alias("loo_mean"),
        (F.col("s").cast("double") / F.col("n")).alias("mean_all"),
        "gk",
        "n",
    )
    from kafkaish_spark.functions.folds import ordered_sum

    bar = loo.agg(
        (
            ordered_sum(F.col("source"), F.col("loo_mean")) / F.min("gk")
        ).alias("loo_bar")
    )
    ssq = loo.crossJoin(F.broadcast(bar)).agg(
        ordered_sum(
            F.col("source"),
            (F.col("loo_mean") - F.col("loo_bar"))
            * (F.col("loo_mean") - F.col("loo_bar")),
        ).alias("ss")
    )
    return loo.crossJoin(F.broadcast(ssq)).select(
        "source",
        F.col("n_g").alias("n_docs"),
        F.round("loo_mean", 6).alias("loo_mean"),
        F.round(F.col("loo_mean") - F.col("mean_all"), 6).alias(
            "influence"
        ),
        F.col("n").alias("n_total"),
        F.round("mean_all", 6).alias("mean_all"),
        F.round(
            F.sqrt((F.col("gk") - 1.0) / F.col("gk") * F.col("ss")), 6
        ).alias("jk_se"),
    )


@query(
    "q_agg_trimmed_mean",
    oracle=f"""
    WITH o AS (SELECT o_orderpriority AS p,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
               FROM orders),
    cells AS (SELECT p, v, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM o GROUP BY p, v),
    cdf AS (SELECT p, v, cnt,
                   SUM(cnt) OVER (PARTITION BY p ORDER BY v) AS cum,
                   SUM(cnt) OVER (PARTITION BY p) AS n FROM cells),
    kept AS (SELECT p, n,
                    CAST(floor({_TRIM_FRAC} * n) AS BIGINT) AS k1,
                    n - CAST(floor({_TRIM_FRAC} * n) AS BIGINT) AS k2,
                    v, cnt, cum FROM cdf),
    contrib AS (SELECT p, n, k1, k2, v,
                       greatest(CAST(0 AS BIGINT),
                                least(cum, k2) - greatest(cum - cnt, k1))
                         AS kc
                FROM kept)
    SELECT p AS priority, CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(k2 - k1) AS BIGINT) AS n_kept,
           CAST(SUM(v * kc) AS BIGINT) AS trimmed_sum,
           round(CAST(SUM(v * kc) AS DOUBLE)
                 / CAST(MIN(k2 - k1) AS BIGINT), 6) AS trimmed_mean
    FROM contrib GROUP BY p
    """,
)
def q_agg_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    """10%-trimmed mean of order value per priority — the robust
    estimator that DROPS the tail ranks (vs q_agg_winsorized_mean,
    which clamps them): ranks (k1, k2] with k1 = floor(0.1n),
    k2 = n - k1 survive, computed EXACTLY from the discrete value CDF
    by partial-cell clipping — a cell of cnt equal values contributes
    min(cum, k2) - max(cum - cnt, k1) of them (clamped at 0), so ties
    straddling a trim boundary are handled without any row-level rank.
    The trimmed sum is an exact BIGINT; one final division.

    Scale: value-DISTINCT cells per group (bounded by the price grid),
    windows partitioned by the 5-value priority domain — the same
    shape as the house median/percentile kernels."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    cells = o.groupBy("p", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("p")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("p")
    cdf = cells.select(
        "p",
        "v",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    k1 = F.floor(_TRIM_FRAC * F.col("n")).cast("long")
    kept = cdf.select(
        "p",
        "n",
        k1.alias("k1"),
        (F.col("n") - k1).alias("k2"),
        "v",
        "cnt",
        "cum",
    )
    kc = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), F.col("k2"))
        - F.greatest(F.col("cum") - F.col("cnt"), F.col("k1")),
    )
    contrib = kept.select("p", "n", "k1", "k2", "v", kc.alias("kc"))
    return contrib.groupBy("p").agg(
        F.min("n").cast("long").alias("n"),
        F.min(F.col("k2") - F.col("k1")).cast("long").alias("n_kept"),
        F.sum(F.col("v") * F.col("kc")).cast("long").alias("trimmed_sum"),
        (
            F.sum(F.col("v") * F.col("kc")).cast("double")
            / F.min(F.col("k2") - F.col("k1")).cast("long")
        ).alias("trimmed_mean_raw"),
    ).select(
        F.col("p").alias("priority"),
        "n",
        "n_kept",
        "trimmed_sum",
        F.round("trimmed_mean_raw", 6).alias("trimmed_mean"),
    )
