"""Round-8 third wave: formal A/B hypothesis tests on exact moments.

The A/B family (CUPED, diff-in-diff, SPRT) reports effect sizes and
sequential decisions; these add the two classical FIXED-horizon tests
an experimentation platform actually prints next to them:

- Welch's unequal-variance t-test on order value between the two
  deterministic arms — mean difference, t statistic, and the
  Welch-Satterthwaite degrees of freedom;
- the 2x2 chi-square test of proportions (urgent-priority rate per
  arm) — the categorical counterpart.

House exactness: every count and sum is an exact integer (cents sums
on decimal(38,0)); means/variances/statistics are the SAME fixed
sequence of IEEE ops in both engines (the corr/regr recipe), so the
driver hash-matches them.  Arm assignment is the registry-wide
deterministic ``o_custkey % 2`` split (composites21's convention).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_WELCH_ORACLE = """
WITH o AS (
  SELECT o_custkey % 2 AS arm,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
m AS (
  SELECT COUNT(*) FILTER (arm = 0) AS n0,
         COUNT(*) FILTER (arm = 1) AS n1,
         SUM(x) FILTER (arm = 0) AS sx0,
         SUM(x) FILTER (arm = 1) AS sx1,
         SUM(CAST(x AS DECIMAL(38,0)) * x) FILTER (arm = 0) AS s20,
         SUM(CAST(x AS DECIMAL(38,0)) * x) FILTER (arm = 1) AS s21
  FROM o),
d AS (
  SELECT n0, n1,
         CAST(sx0 AS DOUBLE) / n0 AS m0,
         CAST(sx1 AS DOUBLE) / n1 AS m1,
         (CAST(s20 AS DOUBLE) - n0 * (CAST(sx0 AS DOUBLE) / n0)
            * (CAST(sx0 AS DOUBLE) / n0)) / (n0 - 1) AS v0,
         (CAST(s21 AS DOUBLE) - n1 * (CAST(sx1 AS DOUBLE) / n1)
            * (CAST(sx1 AS DOUBLE) / n1)) / (n1 - 1) AS v1
  FROM m)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(m0, 6) AS mean0_cents, round(m1, 6) AS mean1_cents,
       round(m0 - m1, 6) AS mean_diff_cents,
       round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
       round((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
             / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                + (v1 / n1) * (v1 / n1) / (n1 - 1)), 6) AS welch_df
FROM d
"""


def _arm_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Per-arm exact cents moments (n, sum, sum-of-squares on
    decimal(38,0)) in ONE conditional-aggregation scan of orders —
    shared by the Welch t-test and the power/MDE planner."""
    o = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 2).alias("arm"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("x"),
    )

    def arm(v, a):
        return F.when(F.col("arm") == a, v)

    return o.agg(
        F.count(arm(F.lit(1), 0)).alias("n0"),
        F.count(arm(F.lit(1), 1)).alias("n1"),
        F.sum(arm(F.col("x"), 0)).alias("sx0"),
        F.sum(arm(F.col("x"), 1)).alias("sx1"),
        F.sum(arm(F.col("x").cast("decimal(38,0)") * F.col("x"), 0)).alias(
            "s20"
        ),
        F.sum(arm(F.col("x").cast("decimal(38,0)") * F.col("x"), 1)).alias(
            "s21"
        ),
    )


@query("q_ab_welch_ttest", oracle=_WELCH_ORACLE)
def q_ab_welch_ttest(spark: SparkSession, sf: str) -> DataFrame:
    """Welch's unequal-variance t-test of order value between the two
    deterministic arms (o_custkey % 2 — composites21's split): per-arm
    exact moments in ONE conditional-aggregation scan, then mean
    difference, t = (m0-m1)/sqrt(v0/n0 + v1/n1), and the
    Welch-Satterthwaite df — the fixed-horizon test an experimentation
    readout prints next to CUPED's variance-reduced effect (Welch,
    Biometrika 1947).

    Exactness: counts and cents sums exact (squares on decimal(38,0) —
    int64 overflows past ~2e5 orders); sample variances from the
    moment identity (S2 - n*mean^2)/(n-1) and every statistic composed
    in the same IEEE order in both engines.  Scale: ONE linear scan,
    conditional partial aggregates, a single 1-row finalize — no
    join, no shuffle wider than the 1-row merge."""
    m = _arm_moments(spark, sf)
    m0 = F.col("sx0").cast("double") / F.col("n0")
    m1 = F.col("sx1").cast("double") / F.col("n1")
    v0 = (F.col("s20").cast("double") - F.col("n0") * m0 * m0) / (
        F.col("n0") - 1
    )
    v1 = (F.col("s21").cast("double") - F.col("n1") * m1 * m1) / (
        F.col("n1") - 1
    )
    se0, se1 = v0 / F.col("n0"), v1 / F.col("n1")
    return m.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(m0, 6).alias("mean0_cents"),
        F.round(m1, 6).alias("mean1_cents"),
        F.round(m0 - m1, 6).alias("mean_diff_cents"),
        F.round((m0 - m1) / F.sqrt(se0 + se1), 6).alias("t_stat"),
        F.round(
            (se0 + se1) * (se0 + se1)
            / (se0 * se0 / (F.col("n0") - 1) + se1 * se1 / (F.col("n1") - 1)),
            6,
        ).alias("welch_df"),
    )


_CHI2_ORACLE = """
WITH o AS (
  SELECT o_custkey % 2 AS arm,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS hit
  FROM orders),
c AS (
  SELECT COUNT(*) FILTER (arm = 0 AND hit = 1) AS a,
         COUNT(*) FILTER (arm = 0 AND hit = 0) AS b,
         COUNT(*) FILTER (arm = 1 AND hit = 1) AS c,
         COUNT(*) FILTER (arm = 1 AND hit = 0) AS d
  FROM o)
SELECT CAST(a AS BIGINT) AS n0_hit, CAST(b AS BIGINT) AS n0_miss,
       CAST(c AS BIGINT) AS n1_hit, CAST(d AS BIGINT) AS n1_miss,
       round(CAST(a AS DOUBLE) / (a + b), 6) AS rate0,
       round(CAST(c AS DOUBLE) / (c + d), 6) AS rate1,
       round((a + b + c + d)
             * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
             * (CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)
             / ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d)
                * (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)),
             6) AS chi2
FROM c
"""


@query("q_ab_chi2_proportions", oracle=_CHI2_ORACLE)
def q_ab_chi2_proportions(spark: SparkSession, sf: str) -> DataFrame:
    """2x2 chi-square test of proportions between the deterministic
    arms: did the urgent-priority order RATE differ?  chi2 =
    N*(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — the closed 2x2 form, the
    categorical sibling of q_ab_welch_ttest (compare to chi-square
    with 1 df; q_audit_chi2_drift is the multi-bucket version of the
    same idea for distribution drift).

    Exactness: the four cells are exact counts from ONE conditional-
    aggregation scan; the statistic promotes to double BEFORE the
    products (a*d overflows int64 once both cells pass ~3e9 at
    100 TB) in the same fixed IEEE sequence in both engines.  Scale:
    one linear scan, one 1-row finalize."""
    o = t(spark, sf, "orders").select(
        (F.col("o_custkey") % 2).alias("arm"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("hit"),
    )
    cells = o.agg(
        F.count(F.when((F.col("arm") == 0) & (F.col("hit") == 1), 1)).alias("a"),
        F.count(F.when((F.col("arm") == 0) & (F.col("hit") == 0), 1)).alias("b"),
        F.count(F.when((F.col("arm") == 1) & (F.col("hit") == 1), 1)).alias("c"),
        F.count(F.when((F.col("arm") == 1) & (F.col("hit") == 0), 1)).alias("d"),
    )
    ad_bc = F.col("a").cast("double") * F.col("d") - F.col("b").cast(
        "double"
    ) * F.col("c")
    denom = (
        (F.col("a").cast("double") + F.col("b"))
        * (F.col("c").cast("double") + F.col("d"))
        * (F.col("a").cast("double") + F.col("c"))
        * (F.col("b").cast("double") + F.col("d"))
    )
    return cells.select(
        F.col("a").cast("long").alias("n0_hit"),
        F.col("b").cast("long").alias("n0_miss"),
        F.col("c").cast("long").alias("n1_hit"),
        F.col("d").cast("long").alias("n1_miss"),
        F.round(F.col("a").cast("double") / (F.col("a") + F.col("b")), 6).alias(
            "rate0"
        ),
        F.round(F.col("c").cast("double") / (F.col("c") + F.col("d")), 6).alias(
            "rate1"
        ),
        F.round(
            (F.col("a") + F.col("b") + F.col("c") + F.col("d"))
            * ad_bc
            * ad_bc
            / denom,
            6,
        ).alias("chi2"),
    )


# two-sided alpha = 0.05, power = 0.80, MDE = 2% of the pooled mean
_Z_ALPHA = "1.959963984540054"
_Z_BETA = "0.8416212335729143"
_MDE_FRAC = "0.02"

_POWER_ORACLE = f"""
WITH o AS (
  SELECT o_custkey % 2 AS arm,
         CAST(round(o_totalprice * 100) AS BIGINT) AS x
  FROM orders),
m AS (
  SELECT COUNT(*) FILTER (arm = 0) AS n0,
         COUNT(*) FILTER (arm = 1) AS n1,
         SUM(x) FILTER (arm = 0) AS sx0,
         SUM(x) FILTER (arm = 1) AS sx1,
         SUM(CAST(x AS DECIMAL(38,0)) * x) FILTER (arm = 0) AS s20,
         SUM(CAST(x AS DECIMAL(38,0)) * x) FILTER (arm = 1) AS s21
  FROM o),
d AS (
  SELECT n0, n1,
         CAST(sx0 AS DOUBLE) / n0 AS m0,
         CAST(sx1 AS DOUBLE) / n1 AS m1,
         (CAST(sx0 AS DOUBLE) + sx1) / (n0 + n1) AS mp,
         ((CAST(s20 AS DOUBLE) - n0 * (CAST(sx0 AS DOUBLE) / n0)
             * (CAST(sx0 AS DOUBLE) / n0))
          + (CAST(s21 AS DOUBLE) - n1 * (CAST(sx1 AS DOUBLE) / n1)
             * (CAST(sx1 AS DOUBLE) / n1))) / (n0 + n1 - 2) AS vp
  FROM m)
SELECT CAST(n0 + n1 AS BIGINT) AS n_obs,
       round(mp, 6) AS pooled_mean_cents,
       round(sqrt(vp), 6) AS pooled_sd_cents,
       round((m0 - m1) / sqrt(vp), 6) AS cohens_d,
       round({_MDE_FRAC} * mp, 6) AS mde_cents,
       CAST(CEIL(2.0 * ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
                 * vp / (({_MDE_FRAC} * mp) * ({_MDE_FRAC} * mp)))
            AS BIGINT) AS n_per_arm_required
FROM d
"""


@query("q_ab_power_mde", oracle=_POWER_ORACLE)
def q_ab_power_mde(spark: SparkSession, sf: str) -> DataFrame:
    """A/B power analysis from the SAME one-scan moments as the Welch
    test: the pooled mean/variance of order value, the observed effect
    as Cohen's d, the minimum detectable effect at {_MDE_FRAC} of the
    pooled mean, and the required n PER ARM for two-sided alpha = 0.05
    / power = 0.80 via the normal-approximation formula
    n = 2 (z_a + z_b)^2 sigma^2 / delta^2 — the sizing arithmetic run
    BEFORE an experiment (and the sanity check after: is the observed
    n anywhere near powered for the effect being claimed?).

    Exactness: z quantiles are double literals identical in both
    engines; pooled variance from exact decimal(38,0) moments by the
    (S2 - n*mean^2) identity summed across arms; every derived number
    is one fixed IEEE composition.  Scale: ONE linear scan, single
    1-row finalize."""
    m = _arm_moments(spark, sf)
    m0 = F.col("sx0").cast("double") / F.col("n0")
    m1 = F.col("sx1").cast("double") / F.col("n1")
    mp = (F.col("sx0").cast("double") + F.col("sx1")) / (
        F.col("n0") + F.col("n1")
    )
    vp = (
        (F.col("s20").cast("double") - F.col("n0") * m0 * m0)
        + (F.col("s21").cast("double") - F.col("n1") * m1 * m1)
    ) / (F.col("n0") + F.col("n1") - 2)
    z2 = (F.lit(float(_Z_ALPHA)) + F.lit(float(_Z_BETA))) * (
        F.lit(float(_Z_ALPHA)) + F.lit(float(_Z_BETA))
    )
    mde = F.lit(float(_MDE_FRAC)) * mp
    return m.select(
        (F.col("n0") + F.col("n1")).cast("long").alias("n_obs"),
        F.round(mp, 6).alias("pooled_mean_cents"),
        F.round(F.sqrt(vp), 6).alias("pooled_sd_cents"),
        F.round((m0 - m1) / F.sqrt(vp), 6).alias("cohens_d"),
        F.round(mde, 6).alias("mde_cents"),
        F.ceil(F.lit(2.0) * z2 * vp / (mde * mde))
        .cast("long")
        .alias("n_per_arm_required"),
    )
