"""Round-9 wave 7: the nonparametric A/B tests — Mann-Whitney U and
the Brown-Forsythe/Levene variance-equality test — completing the
experimentation readout next to Welch's t (means, composites49), the
2x2 chi-square (rates, composites49), and CUPED (variance reduction,
composites21).  Welch answers "did the mean move"; Mann-Whitney
answers it without the normality assumption (pure rank evidence),
and Levene answers "did the SPREAD move" — a treatment that widens
variance with a flat mean passes Welch and fails here.

Both run on the deterministic arm split (l_suppkey % 2 — the
composites21 convention lifted to lineitem) over the discrete
quantity column, so both reduce to the same sort-free cell machinery
as the rank-correlation wave (composites54):

- ``q_ab_mann_whitney``: U from CROSS-ARM CELL PRODUCTS — for cells
  (v0, n0) in arm 0 and (v1, n1) in arm 1, pairs with v0 > v1
  contribute n0*n1 wins, v0 == v1 contribute n0*n1 half-wins — a
  bounded |V| x |V| broadcast join on the 50-value domain, never a
  row-pair join.  Half-units keep U exact (U2 = 2U), accumulated in
  decimal(38,0) like the Kendall twin (2*n0*n1 overflows BIGINT past
  ~4.3e9 rows per arm).
  The normal approximation with TIE CORRECTION gives z:
  sigma^2 = n0*n1/12 * ((n+1) - sum(t^3 - t)/(n(n-1))) — every term
  an exact integer ratio assembled in one fixed IEEE sequence.
- ``q_ab_levene_variance``: Brown-Forsythe variant (deviations from
  the MEDIAN — robust, the recommended form): per-arm exact median
  from the discrete CDF (integer half-units: med2 = 2 x median), per
  cell |2v - med2| * cnt exact sums, then the one-way ANOVA F on the
  deviations from exact moment sums.  W large => spreads differ.

Exactness: all counts/ranks/deviations exact BIGINTs (decimal(38,0)
for the cubed tie terms); each statistic is one fixed IEEE
composition rounded to 6.  Scale: one conditional hash aggregate to
<= 2 x |value domain| cells; everything downstream runs on the
bounded cell frame.

Reference parity: [NS] — north-star analytics; the reference
(/root/reference/src/topic.js) is pub/sub only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_CELLS_SQL = """
      SELECT CAST(l_suppkey % 2 AS BIGINT) AS arm,
             CAST(l_quantity AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_suppkey % 2, CAST(l_quantity AS BIGINT)
"""


def _arm_cells(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.groupBy(
        (F.col("l_suppkey") % 2).cast("long").alias("arm"),
        F.col("l_quantity").cast("long").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


_MW_ORACLE = f"""
    WITH cells AS ({_CELLS_SQL}),
    a0 AS (SELECT v, cnt FROM cells WHERE arm = 0),
    a1 AS (SELECT v, cnt FROM cells WHERE arm = 1),
    u AS (
      -- cell products in decimal(38,0): U2 <= 2*n0*n1 overflows
      -- BIGINT past ~4.3e9 rows per arm (review r9 — the Kendall
      -- twin's accumulation pattern)
      SELECT SUM(CASE WHEN a0.v > a1.v
                      THEN 2 * CAST(a0.cnt AS DECIMAL(38,0)) * a1.cnt
                      WHEN a0.v = a1.v
                      THEN CAST(a0.cnt AS DECIMAL(38,0)) * a1.cnt
                      ELSE 0 END) AS u2
      FROM a0 CROSS JOIN a1),
    ns AS (
      SELECT SUM(CASE WHEN arm = 0 THEN cnt END) AS n0,
             SUM(CASE WHEN arm = 1 THEN cnt END) AS n1
      FROM cells),
    ties AS (
      SELECT SUM(CAST(tc AS DECIMAL(38,0)) * tc * tc - tc) AS t3t
      FROM (SELECT SUM(cnt) AS tc FROM cells GROUP BY v))
    SELECT CAST(ns.n0 AS BIGINT) AS n0, CAST(ns.n1 AS BIGINT) AS n1,
           CAST(u.u2 AS BIGINT) AS u2,
           round((CAST(u.u2 AS DOUBLE) / 2.0
                  - CAST(ns.n0 AS DOUBLE) * ns.n1 / 2.0)
                 / sqrt(CAST(ns.n0 AS DOUBLE) * ns.n1 / 12.0
                        * ((ns.n0 + ns.n1 + 1)
                           - CAST(ties.t3t AS DOUBLE)
                             / ((ns.n0 + ns.n1)
                                * CAST(ns.n0 + ns.n1 - 1 AS DOUBLE)))), 6)
             AS z
    FROM u, ns, ties
"""


@query("q_ab_mann_whitney", oracle=_MW_ORACLE)
def q_ab_mann_whitney(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Whitney U between the deterministic arms on quantity: U
    counted from cross-arm cell products in half-units (win = 2,
    tie = 1 — U2 = 2U stays an exact BIGINT), the tie-corrected
    normal z from exact integer moments.  The |V| x |V| cell-pair
    join is bounded by the value domain (50 x 50), broadcast, never
    a row-pair join.  z near 0 here is the expected null: the arm
    split is a hash of the supplier key, independent of quantity."""
    cells = _arm_cells(spark, sf)
    a0 = cells.where(F.col("arm") == 0).select(
        F.col("v").alias("v0"), F.col("cnt").alias("c0")
    )
    a1 = cells.where(F.col("arm") == 1).select(
        F.col("v").alias("v1"), F.col("cnt").alias("c1")
    )
    c0d = F.col("c0").cast("decimal(38,0)")
    u = a0.crossJoin(F.broadcast(a1)).agg(
        F.sum(
            F.when(F.col("v0") > F.col("v1"), 2 * c0d * F.col("c1"))
            .when(F.col("v0") == F.col("v1"), c0d * F.col("c1"))
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("u2")
    )
    ns = cells.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("cnt"))).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("cnt"))).alias("n1"),
    )
    tc = F.col("tc").cast("decimal(38,0)")
    ties = (
        cells.groupBy("v")
        .agg(F.sum("cnt").alias("tc"))
        .agg(F.sum(tc * F.col("tc") * F.col("tc") - F.col("tc")).alias("t3t"))
    )
    j = u.crossJoin(F.broadcast(ns)).crossJoin(F.broadcast(ties))
    n0d = F.col("n0").cast("double")
    z = (
        F.col("u2").cast("double") / 2.0 - n0d * F.col("n1") / 2.0
    ) / F.sqrt(
        n0d * F.col("n1") / 12.0
        * (
            (F.col("n0") + F.col("n1") + 1)
            - F.col("t3t").cast("double")
            / (
                (F.col("n0") + F.col("n1"))
                * (F.col("n0") + F.col("n1") - 1).cast("double")
            )
        )
    )
    return j.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.col("u2").cast("long").alias("u2"),
        F.round(z, 6).alias("z"),
    )


_LEV_ORACLE = f"""
    WITH cells AS ({_CELLS_SQL}),
    cdf AS (
      SELECT arm, v, cnt,
             SUM(cnt) OVER (PARTITION BY arm ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum_incl,
             SUM(cnt) OVER (PARTITION BY arm) AS n
      FROM cells),
    med AS (
      -- 2 x median from the discrete CDF: lower + upper middle values
      SELECT arm,
             MIN(CASE WHEN 2 * cum_incl >= n THEN v END)
             + MIN(CASE WHEN 2 * cum_incl >= n + 1 THEN v END) AS med2
      FROM cdf GROUP BY arm),
    dev AS (
      -- z_ij = |x - median| in half-units: d2 = |2v - med2|
      SELECT c.arm, c.cnt, abs(2 * c.v - m.med2) AS d2
      FROM cells c JOIN med m ON c.arm = m.arm),
    g AS (
      SELECT arm, SUM(cnt) AS n_i,
             SUM(CAST(cnt AS DECIMAL(38,0)) * d2) AS s_i,
             SUM(CAST(cnt AS DECIMAL(38,0)) * d2 * d2) AS ss_i
      FROM dev GROUP BY arm),
    tot AS (
      SELECT SUM(n_i) AS n, SUM(ss_i) AS ss,
             MIN(CASE WHEN arm = 0 THEN n_i END) AS n0,
             MIN(CASE WHEN arm = 0 THEN s_i END) AS s0,
             MIN(CASE WHEN arm = 1 THEN n_i END) AS n1,
             MIN(CASE WHEN arm = 1 THEN s_i END) AS s1
      FROM g)
    -- the w composition below mirrors the Spark column expression
    -- token-for-token (same association, same cast points), so both
    -- engines execute the identical IEEE sequence — the Welch-test
    -- house pattern
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(n0 AS BIGINT) AS n0,
           CAST(n1 AS BIGINT) AS n1,
           round(
             (CAST(n AS DOUBLE) - 2.0)
             * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             / (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                  * CAST(n0 AS DOUBLE)
                - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                  * CAST(n1 AS DOUBLE)), 6) AS w_stat
    FROM tot
"""


@query("q_ab_levene_variance", oracle=_LEV_ORACLE)
def q_ab_levene_variance(spark: SparkSession, sf: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) test of variance
    equality between the deterministic arms on quantity: per-arm
    exact medians from the discrete CDF (half-unit med2 = lower +
    upper middle value, so even-n medians are exact), per-cell
    |2v - med2| deviations as exact integers, then the two-group
    one-way ANOVA W on the deviations:

        W = (N - 2) * (zbar0 - zbar1)^2
            / (1/n0 + 1/n1) / SS_within

    assembled from decimal(38,0) moment sums in one fixed IEEE
    sequence mirrored token-for-token in the oracle SQL (the Welch
    house pattern), rounded to 6; also pinned by the pure-python
    replay in tests/test_composites56.py."""
    cells = _arm_cells(spark, sf)
    w = (
        Window.partitionBy("arm")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = cells.select(
        "arm",
        "v",
        "cnt",
        F.sum("cnt").over(w).alias("cum_incl"),
        F.sum("cnt").over(Window.partitionBy("arm")).alias("n"),
    )
    med = cdf.groupBy("arm").agg(
        (
            F.min(F.when(2 * F.col("cum_incl") >= F.col("n"), F.col("v")))
            + F.min(
                F.when(2 * F.col("cum_incl") >= F.col("n") + 1, F.col("v"))
            )
        ).alias("med2")
    )
    dev = cells.join(F.broadcast(med), "arm").select(
        "arm", "cnt", F.abs(2 * F.col("v") - F.col("med2")).alias("d2")
    )
    dc = F.col("cnt").cast("decimal(38,0)")
    g = dev.groupBy("arm").agg(
        F.sum("cnt").alias("n_i"),
        F.sum(dc * F.col("d2")).alias("s_i"),
        F.sum(dc * F.col("d2") * F.col("d2")).alias("ss_i"),
    )
    r = g.agg(
        F.sum("n_i").alias("n"),
        F.sum("ss_i").alias("ss"),
        F.min(F.when(F.col("arm") == 0, F.col("n_i"))).alias("n0"),
        F.min(F.when(F.col("arm") == 0, F.col("s_i"))).alias("s0"),
        F.min(F.when(F.col("arm") == 1, F.col("n_i"))).alias("n1"),
        F.min(F.when(F.col("arm") == 1, F.col("s_i"))).alias("s1"),
    )
    zbar0 = F.col("s0").cast("double") / F.col("n0").cast("double")
    zbar1 = F.col("s1").cast("double") / F.col("n1").cast("double")
    diff = zbar0 - zbar1
    ss_within = (
        F.col("ss").cast("double")
        - zbar0 * zbar0 * F.col("n0").cast("double")
        - zbar1 * zbar1 * F.col("n1").cast("double")
    )
    n = F.col("n").cast("double")
    w_stat = (
        (n - 2.0)
        * diff
        * diff
        / (1.0 / F.col("n0").cast("double") + 1.0 / F.col("n1").cast("double"))
        / ss_within
    )
    return r.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(w_stat, 6).alias("w_stat"),
    )
