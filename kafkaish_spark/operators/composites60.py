"""Round-11 wave 2: distribution testing and uncertainty
quantification — two staples of corpus QA the drift family
(composites35) didn't yet cover.

- Two-sample Kolmogorov-Smirnov on fixed-width integer bins: PSI and
  JS answer "how different are the histograms"; KS answers "what is
  the largest CDF gap and where" — the classic alarm for a shifted
  price/score distribution between data slices.
- Poisson bootstrap CI (Chamandy et al., "Estimating Uncertainty for
  Massive Data Streams", Google 2012): THE bootstrap that works at
  100 TB.  Classical resampling needs B full shuffles of the corpus;
  the Poisson bootstrap gives every (row, replicate) an independent
  Poisson(1) weight derived from a hash, so all B replicates ride ONE
  scan.  This module is the EXPLODE shape (B-way row fan-out into one
  ordinary hash aggregate — B can grow without widening the aggregate
  row); composites34's q_ml_poisson_bootstrap is the R-COLUMN shape
  (2R+2 weighted partials in a single aggregate, zero row
  multiplication — cheapest at modest R).  Both slice the same shared
  Poisson(1) CDF literals (functions/stats.py).

Reference parity: [NS] — the reference (kafkaish, ~350 LoC pub/sub,
/root/reference/src/topic.js) has no query surface.

House exactness: bin ids and counts exact BIGINTs; the KS statistic's
numerator is an exact integer cross-multiplication (|cum_ref*n_cur -
cum_cur*n_ref|), divided once at the end; bootstrap weights come from
an md5-derived uniform through one shared CASE ladder of double
literals (both engines compare the same IEEE values), replicate sums
stay integer cents, and each replicate mean is ONE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_KS_REF_Y, _KS_CUR_Y = 1996, 1997
_KS_BIN_CENTS = 500_000  # $5k-wide bins over the order-price domain

_B = 64  # bootstrap replicates
_SEED = "r11boot"
# cumulative Poisson(1) CDF thresholds: P(X<=k) for k = 0..4; a
# uniform u maps to the weight k whose cumulative first exceeds it
# (w=5 for the ~0.37% tail P(X>=5); composites34's R-column bootstrap
# runs the same ladder at depth 7, truncating at ~0.01% instead — the
# two are intentionally different fidelity tiers).  The literals live
# in ONE shared home
# (functions/stats.py — composites34's R-column bootstrap uses the
# same tuple at depth 7) and are repr-mirrored into the oracle SQL,
# so both engines compare the same IEEE doubles.
from kafkaish_spark.functions.stats import POISSON1_CDF as _P1

_POIS = tuple(repr(c) for c in _P1[:5])


def _ks_oracle() -> str:
    return f"""
    WITH binned AS (
      SELECT CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT)
                        / {_KS_BIN_CENTS}.0) AS BIGINT) AS bin,
             EXTRACT(year FROM o_orderdate) AS y
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN ({_KS_REF_Y}, {_KS_CUR_Y})),
    counts AS (
      SELECT bin,
             CAST(count_if(y = {_KS_REF_Y}) AS BIGINT) AS n_ref,
             CAST(count_if(y = {_KS_CUR_Y}) AS BIGINT) AS n_cur
      FROM binned GROUP BY bin),
    cums AS (
      SELECT bin,
             SUM(n_ref) OVER (ORDER BY bin) AS c_ref,
             SUM(n_cur) OVER (ORDER BY bin) AS c_cur
      FROM counts),
    tot AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
             CAST(SUM(n_cur) AS BIGINT) AS tc
      FROM counts),
    gaps AS (
      SELECT bin, abs(c_ref * tc - c_cur * tr) AS num
      FROM cums CROSS JOIN tot)
    SELECT (SELECT tr FROM tot) AS n_ref,
           (SELECT tc FROM tot) AS n_cur,
           bin AS ks_bin,
           CAST(num AS BIGINT) AS ks_num,
           round(CAST(num AS DOUBLE)
                 / ((SELECT tr FROM tot) * (SELECT tc FROM tot)), 6) AS ks
    FROM gaps ORDER BY num DESC, bin LIMIT 1
    """


@query("q_drift_ks_orders", oracle=_ks_oracle())
def q_drift_ks_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over the order-price distribution,
    {1996} reference vs {1997} current, on fixed $5k integer-cent
    bins: the statistic is the largest gap between the two binned
    CDFs, reported with WHERE it occurs (ks_bin) — the actionable part
    a drift dashboard wants next to PSI's single number.

    Scale: one linear scan feeds one hash aggregation to ~100 bin
    rows; the cumulative window, the totals row, and the top-1 all
    operate on that bounded bin frame (whitelisted bounded-window
    class), so corpus size touches only the scan.  Exactness: the gap
    numerator is an exact BIGINT cross-multiplication |c_ref*n_cur -
    c_cur*n_ref| (overflow-safe to ~3e9 rows per side; move the
    products to DECIMAL(38,0) beyond that), ONE division at the end,
    deterministic (gap DESC, bin) tie-break."""
    o = t(spark, sf, "orders").select(
        F.expr(
            f"CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT)"
            f" / {_KS_BIN_CENTS}.0) AS BIGINT)"
        ).alias("bin"),
        F.year("o_orderdate").alias("y"),
    ).filter(F.col("y").isin(_KS_REF_Y, _KS_CUR_Y))
    counts = o.groupBy("bin").agg(
        F.count_if(F.col("y") == _KS_REF_Y).alias("n_ref"),
        F.count_if(F.col("y") == _KS_CUR_Y).alias("n_cur"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cums = counts.select(
        "bin",
        F.sum("n_ref").over(w).alias("c_ref"),
        F.sum("n_cur").over(w).alias("c_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    gaps = cums.crossJoin(F.broadcast(tot)).select(
        "bin",
        "tr",
        "tc",
        F.abs(
            F.col("c_ref") * F.col("tc") - F.col("c_cur") * F.col("tr")
        ).alias("num"),
    )
    return (
        gaps.orderBy(F.col("num").desc(), "bin")
        .limit(1)
        .select(
            F.col("tr").alias("n_ref"),
            F.col("tc").alias("n_cur"),
            F.col("bin").alias("ks_bin"),
            F.col("num").cast("long").alias("ks_num"),
            F.round(
                F.col("num").cast("double") / (F.col("tr") * F.col("tc")), 6
            ).alias("ks"),
        )
    )


def _w_case(u_sql: str) -> str:
    """The shared Poisson(1) inverse-CDF ladder, one text for both
    engines (the CASE compares the same double literals)."""
    return (
        f"CASE WHEN {u_sql} < {_POIS[0]} THEN 0 "
        f"WHEN {u_sql} < {_POIS[1]} THEN 1 "
        f"WHEN {u_sql} < {_POIS[2]} THEN 2 "
        f"WHEN {u_sql} < {_POIS[3]} THEN 3 "
        f"WHEN {u_sql} < {_POIS[4]} THEN 4 "
        f"ELSE 5 END"
    )


def _boot_oracle() -> str:
    u = (
        f"(CAST(('0x' || substring(md5('{_SEED}:' || CAST(o_orderkey AS "
        f"VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" / 4294967296.0)"
    )
    return f"""
    WITH reps AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             unnest(range({_B})) AS b
      FROM orders),
    weighted AS (
      SELECT b, cents, {_w_case(u)} AS w FROM reps),
    means AS (
      SELECT b,
             CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
               AS m
      FROM weighted GROUP BY b),
    arr AS (SELECT list_sort(list(m)) AS ms FROM means),
    pt AS (
      SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DOUBLE) / COUNT(*) AS mean_cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders)
    SELECT n,
           round(mean_cents, 6) AS mean_cents,
           round(ms[2], 6) AS ci_lo_cents,
           round(ms[{_B - 1}], 6) AS ci_hi_cents
    FROM pt, arr
    """


@query("q_stats_bootstrap_ci", oracle=_boot_oracle())
def q_stats_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the mean order
    value (cents): every (order, replicate) pair draws a deterministic
    Poisson(1) weight from an md5-derived uniform through the shared
    inverse-CDF ladder, each of B=64 replicates is an exact weighted
    integer sum divided ONCE, and the CI is the discrete 2.5/97.5
    band of the sorted replicate means (2nd and 63rd of 64).

    Scale: this is the Google massive-streams bootstrap — no
    resampling shuffle exists; the explode is a constant B=64 fan-out
    riding the single scan into one hash aggregation with map-side
    partials (64 groups), and everything after operates on the 64-row
    replicate frame (sorted as one in-row array, no window).
    Exactness: weights are exact ints from identical double compares
    on both engines, replicate sums exact BIGINTs, one IEEE division
    per mean, sort order of 64 doubles identical."""
    o = t(spark, sf, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    reps = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    )
    u = (
        f"(CAST(conv(substring(md5(concat('{_SEED}:', "
        f"CAST(o_orderkey AS STRING), ':', CAST(b AS STRING))), 1, 8),"
        f" 16, 10) AS BIGINT) / 4294967296.0)"
    )
    weighted = reps.withColumn("w", F.expr(_w_case(u)))
    means = weighted.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / F.sum("w").cast("double")
        ).alias("m")
    )
    arr = means.agg(F.sort_array(F.collect_list("m")).alias("ms"))
    pt = o.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1))).alias(
            "mean_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return pt.crossJoin(F.broadcast(arr)).select(
        "n",
        F.round("mean_cents", 6).alias("mean_cents"),
        F.round(F.element_at("ms", 2), 6).alias("ci_lo_cents"),
        F.round(F.element_at("ms", _B - 1), 6).alias("ci_hi_cents"),
    )
