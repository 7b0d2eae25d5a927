"""Round-8 second wave: time-series autocorrelation and KMV set-
operation sketches.

- ACF (autocorrelation function) of the daily revenue series at lags
  1..7 — the seasonality/persistence diagnostic behind "is this metric
  weekly-periodic?" and the residual-whiteness check after a forecast
  (q_ts_mase / q_ts_exp_smoothing's missing companion).  House
  exactness: every sum is an exact integer-cents moment on
  decimal(38,0); the mean and each r_k are the SAME fixed sequence of
  IEEE ops in both engines (the corr/regr_slope recipe).
- KMV (k-minimum-values / bottom-k) sketch with SET OPERATIONS — the
  cardinality sketch family member HLL cannot replace: two bottom-k
  sketches union by merging (keep k smallest) and estimate the
  INTERSECTION via the Jaccard share of the union sketch
  (Beyer et al., SIGMOD 2007).  Deterministic by construction: the
  "random" hash is md5 (the house seeded-hash pattern), so Spark and
  DuckDB see the identical sketch.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    pair_selects = " UNION ALL ".join(
        f"SELECT {k} AS lag, x, lead(x, {k}) OVER (ORDER BY d) AS xk FROM daily"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY 1),
    g AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS s2
      FROM daily),
    p AS ({pair_selects}),
    a AS (
      SELECT lag, COUNT(*) AS cnt,
             SUM(CAST(x AS DECIMAL(38,0)) * xk) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) + xk) AS ssum
      FROM p WHERE xk IS NOT NULL GROUP BY lag)
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(cnt AS BIGINT) AS n_pairs,
           round((CAST(sxy AS DOUBLE)
                  - (CAST(sx AS DOUBLE) / n) * CAST(ssum AS DOUBLE)
                  + cnt * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                 / (CAST(s2 AS DOUBLE)
                    - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)),
                 6) AS acf
    FROM a, g
    """


def _acf_components(spark: SparkSession, sf: str):
    """Shared ACF pipeline: the collapsed daily-cents frame's global
    moment row ``g`` (n, sx, s2 — exact decimal sums) and the per-lag
    pair-moment frame ``a`` (lag, cnt, sxy, ssum) for lags
    1..{_ACF_MAX_LAG}, all from ONE daily rollup + ONE window pass.
    Used by q_ts_acf_daily_revenue (the per-lag r_k report) and
    q_ts_ljung_box (the portmanteau fold over the same r_k)."""
    daily = (
        t(spark, sf, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "x"
            )
        )
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("s2"),
    )
    w = Window.orderBy("d")
    leads = daily.select(
        "x",
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.lead("x", k).over(w).alias("xk"),
                )
                for k in range(1, _ACF_MAX_LAG + 1)
            ]
        ).alias("ls"),
    )
    pairs = leads.select(
        "x", F.explode("ls").alias("p")
    ).select("x", F.col("p.lag").alias("lag"), F.col("p.xk").alias("xk"))
    a = (
        pairs.filter(F.col("xk").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("xk")).alias("sxy"),
            F.sum(F.col("x").cast("decimal(38,0)") + F.col("xk")).alias("ssum"),
        )
    )
    return g, a


def _acf_exprs():
    """(numerator, denominator) Column expressions for r_k over the
    joined (a x g) frame — built lazily (Columns need a live session,
    so module import must not construct them)."""
    xbar = F.col("sx").cast("double") / F.col("n")
    num = (
        F.col("sxy").cast("double")
        - xbar * F.col("ssum").cast("double")
        + F.col("cnt") * xbar * xbar
    )
    den = F.col("s2").cast("double") - F.col("n") * xbar * xbar
    return num, den


@query("q_ts_acf_daily_revenue", oracle=_acf_oracle())
def q_ts_acf_daily_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Sample autocorrelation of the daily order-revenue series at lags
    1..{_ACF_MAX_LAG}: r_k = sum_t (x_t - xbar)(x_t+k - xbar) /
    sum_t (x_t - xbar)^2 with the full-series mean and denominator
    (the standard sample ACF) — the weekly-seasonality / persistence
    diagnostic next to q_ts_mase and q_ts_exp_smoothing, and the
    whiteness check run on forecast residuals.  Lags index the
    date-ordered OBSERVED series (one row per distinct order date).

    Exactness (the corr/regr recipe): the numerator expands to
    sxy - xbar*ssum + cnt*xbar^2 over EXACT integer-cents moment sums
    on decimal(38,0) (a plain double sum would be accumulation-order-
    dependent and int64 products of daily totals overflow at scale),
    combined in one fixed IEEE sequence identical in both engines.

    Scale: ONE shuffle collapses orders to the daily frame (map-side
    partial sums); every window/lead below runs on that BOUNDED
    #days frame (the whitelisted collapsed-days class), and the 7
    lags come from one window pass (7 leads -> explode) rather than 7
    scans."""
    g, a = _acf_components(spark, sf)
    num, den = _acf_exprs()
    return a.crossJoin(F.broadcast(g)).select(
        F.col("lag").cast("long").alias("lag"),
        F.col("cnt").cast("long").alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    )


_KMV_K = 64
_KMV_SCALE = 16**15  # md5 15-hex-digit prefix -> uniform in [0, 16^15)
_SET_A = "click"
_SET_B = "purchase"


def _kmv_oracle() -> str:
    return f"""
    WITH ua AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = '{_SET_A}'),
    ub AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = '{_SET_B}'),
    ha AS (SELECT CAST(('0x' || substring(
             md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM ua),
    hb AS (SELECT CAST(('0x' || substring(
             md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM ub),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
    hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
    ku AS (SELECT h FROM hu ORDER BY h LIMIT {_KMV_K}),
    sa AS (SELECT COUNT(*) AS c, MAX(h) AS hk FROM ka),
    sb AS (SELECT COUNT(*) AS c, MAX(h) AS hk FROM kb),
    su AS (SELECT COUNT(*) AS c, MAX(h) AS hk FROM ku),
    sj AS (
      SELECT COUNT(*) AS n_both FROM ku
      WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)),
    ex AS (
      SELECT (SELECT COUNT(*) FROM ua) AS na,
             (SELECT COUNT(*) FROM ub) AS nb,
             (SELECT COUNT(*) FROM hu) AS nu,
             (SELECT COUNT(*) FROM ua JOIN ub USING (user_id)) AS ni)
    SELECT CAST({_KMV_K} AS BIGINT) AS k,
           CAST(na AS BIGINT) AS exact_a, CAST(nb AS BIGINT) AS exact_b,
           CAST(nu AS BIGINT) AS exact_union,
           CAST(ni AS BIGINT) AS exact_intersection,
           round(CASE WHEN (SELECT c FROM sa) < {_KMV_K}
                 THEN (SELECT c FROM sa)
                 ELSE ({_KMV_K} - 1) * {float(_KMV_SCALE)} / (SELECT hk FROM sa)
                 END, 6) AS est_a,
           round(CASE WHEN (SELECT c FROM sb) < {_KMV_K}
                 THEN (SELECT c FROM sb)
                 ELSE ({_KMV_K} - 1) * {float(_KMV_SCALE)} / (SELECT hk FROM sb)
                 END, 6) AS est_b,
           round(CASE WHEN (SELECT c FROM su) < {_KMV_K}
                 THEN (SELECT c FROM su)
                 ELSE ({_KMV_K} - 1) * {float(_KMV_SCALE)} / (SELECT hk FROM su)
                 END, 6) AS est_union,
           round((CAST((SELECT n_both FROM sj) AS DOUBLE)
                  / (SELECT c FROM su))
                 * CASE WHEN (SELECT c FROM su) < {_KMV_K}
                   THEN (SELECT c FROM su)
                   ELSE ({_KMV_K} - 1) * {float(_KMV_SCALE)}
                        / (SELECT hk FROM su) END,
                 6) AS est_intersection
    FROM ex
    """


@query("q_sketch_kmv_setops", oracle=_kmv_oracle())
def q_sketch_kmv_setops(spark: SparkSession, sf: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) cardinality sketch with SET
    OPERATIONS (Beyer et al., SIGMOD 2007): keep the {_KMV_K} smallest
    md5-hash values per set; |S| ~ (k-1)/R_k where R_k is the k-th
    smallest normalized hash.  Two sketches UNION by merging (keep the
    k smallest of both — trivially mergeable, like HLL), and — the
    part HLL cannot do — estimate the INTERSECTION as
    (|union sketch members in both sets| / k) * est_union (the union
    sketch is a uniform sample of the union, so the share in A AND B
    estimates Jaccard).  A set smaller than k is carried exactly
    (the sketch IS the set) — both engines apply the same rule, so
    the tiny sf exercises the degenerate branch deterministically.
    Exact counterparts ride along for calibration, mirroring
    q_dedup_minhash_calibration's estimate-vs-exact house pattern.

    Determinism: the "random" hash is md5 (seeded-hash pattern) — both
    engines build the IDENTICAL sketch; estimators are single fixed
    IEEE expressions on exact ints.  Scale: per set, one distinct
    shuffle then TakeOrdered({_KMV_K}); membership of the <= {_KMV_K}
    union-sketch hashes is resolved with broadcast semi-joins — the
    corpus is never sorted globally."""
    ev = t(spark, sf, "events")

    def users(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .select("user_id")
            .distinct()
        )

    def hashed(u: DataFrame) -> DataFrame:
        return u.select(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias("h")
        )

    ua, ub = users(_SET_A), users(_SET_B)
    ha, hb = hashed(ua), hashed(ub)
    hu = ha.union(hb).distinct()

    def sketch(h: DataFrame, name: str) -> DataFrame:
        return (
            h.orderBy("h")
            .limit(_KMV_K)
            .agg(
                F.count(F.lit(1)).alias(f"c_{name}"),
                F.max("h").alias(f"hk_{name}"),
            )
        )

    ku = hu.orderBy("h").limit(_KMV_K)
    both = (
        ku.join(ha, "h", "left_semi")
        .join(hb, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact = (
        ua.agg(F.count(F.lit(1)).alias("na"))
        .crossJoin(ub.agg(F.count(F.lit(1)).alias("nb")))
        .crossJoin(hu.agg(F.count(F.lit(1)).alias("nu")))
        .crossJoin(
            # user-based like the oracle (hash-based would silently
            # merge colliding users)
            ua.join(ub, "user_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("ni"))
        )
    )

    def est(c: str, hk: str):
        return F.when(F.col(c) < _KMV_K, F.col(c).cast("double")).otherwise(
            F.lit(float(_KMV_K - 1)) * F.lit(float(_KMV_SCALE)) / F.col(hk)
        )

    row = (
        exact.crossJoin(sketch(ha, "a"))
        .crossJoin(sketch(hb, "b"))
        .crossJoin(sketch(hu, "u"))
        .crossJoin(both)
    )
    return row.select(
        F.lit(_KMV_K).cast("long").alias("k"),
        F.col("na").cast("long").alias("exact_a"),
        F.col("nb").cast("long").alias("exact_b"),
        F.col("nu").cast("long").alias("exact_union"),
        F.col("ni").cast("long").alias("exact_intersection"),
        F.round(est("c_a", "hk_a"), 6).alias("est_a"),
        F.round(est("c_b", "hk_b"), 6).alias("est_b"),
        F.round(est("c_u", "hk_u"), 6).alias("est_union"),
        F.round(
            (F.col("n_both").cast("double") / F.col("c_u"))
            * est("c_u", "hk_u"),
            6,
        ).alias("est_intersection"),
    )


def _ljung_box_oracle() -> str:
    pair_selects = " UNION ALL ".join(
        f"SELECT {k} AS lag, x, lead(x, {k}) OVER (ORDER BY d) AS xk FROM daily"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
      FROM orders GROUP BY 1),
    g AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS s2
      FROM daily),
    p AS ({pair_selects}),
    a AS (
      SELECT lag, COUNT(*) AS cnt,
             SUM(CAST(x AS DECIMAL(38,0)) * xk) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0)) + xk) AS ssum
      FROM p WHERE xk IS NOT NULL GROUP BY lag),
    r AS (
      SELECT lag,
             (CAST(sxy AS DOUBLE)
              - (CAST(sx AS DOUBLE) / n) * CAST(ssum AS DOUBLE)
              + cnt * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
             / (CAST(s2 AS DOUBLE)
                - n * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
               AS rk,
             n
      FROM a, g)
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_obs,
           CAST({_ACF_MAX_LAG} AS BIGINT) AS max_lag,
           round(ANY_VALUE(n) * (ANY_VALUE(n) + 2)
                 * list_reduce(list_prepend(0.0,
                     list(rk * rk / (n - lag) ORDER BY lag)),
                   (acc, v) -> acc + v),
                 6) AS q_stat
    FROM r
    """


@query("q_ts_ljung_box", oracle=_ljung_box_oracle())
def q_ts_ljung_box(spark: SparkSession, sf: str) -> DataFrame:
    """Ljung-Box portmanteau statistic over the same daily-revenue ACF:
    Q = n(n+2) * sum_k r_k^2 / (n-k) for k = 1..{_ACF_MAX_LAG} — the
    standard "is this series white noise?" test (compare to a
    chi-square with {_ACF_MAX_LAG} df), run on forecast residuals or
    on the raw series as a seasonality detector.  Shares the exact
    moment pipeline with q_ts_acf_daily_revenue: each r_k comes from
    decimal(38,0) integer-cents sums combined in one fixed IEEE
    sequence, and the k-term sum is an ORDERED fold by lag (house
    ordered-fold rule — a 7-term double sum must not depend on
    aggregation order).

    Scale: identical to the ACF — one shuffle to the daily frame,
    window math on the bounded collapsed-days frame, the fold over
    {_ACF_MAX_LAG} already-aggregated rows."""
    g, a = _acf_components(spark, sf)
    num, den = _acf_exprs()
    terms = a.crossJoin(F.broadcast(g)).select(
        "lag",
        "n",
        ((num / den) * (num / den)
         / (F.col("n") - F.col("lag"))).alias("term"),
    )
    folded = terms.agg(
        F.first("n").alias("n"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("lag"), F.col("term")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["term"],
        ).alias("qsum"),
    )
    return folded.select(
        F.col("n").cast("long").alias("n_obs"),
        F.lit(_ACF_MAX_LAG).cast("long").alias("max_lag"),
        F.round(
            F.col("n") * (F.col("n") + F.lit(2)) * F.col("qsum"), 6
        ).alias("q_stat"),
    )
