"""Round-9 wave 5: rank correlation WITHOUT a global sort, and lagged
cross-correlation between two event series.

- ``q_agg_spearman_discrete`` / ``q_agg_kendall_tau_discrete``: the
  two standard rank-correlation coefficients next to the existing
  Pearson (q_agg_corr_quantity_price).  The naive computation ranks
  every row — a corpus-scale sort per column, exactly the plan the
  house window-gate exists to forbid.  For DISCRETE columns both
  coefficients are exact functions of the (x, y) CONTINGENCY TABLE:
  average ranks fall out of the cumulative marginals
  (rank_v = cum_below + (cnt_v + 1)/2), concordant/discordant pair
  counts out of cell-pair products.  So the plan is: one hash
  aggregate to <= |X| x |Y| cells (lineitem's quantity 1..50 x
  linenumber 1..7 = 350 rows), then closed-form integer arithmetic
  on a bounded frame — Spearman from decimal moment sums over cells,
  Kendall from a declared-bounded 350x350 broadcast cell-pair join.
  This is how rank statistics actually scale: the shuffle carries
  cells, never ranks.
- ``q_ts_xcorr_daily``: lagged cross-correlation r_k between the
  daily click and purchase counts (k = 0..7) — the lead/lag
  dependency question ("do clicks predict purchases days ahead?")
  that the ACF (q_ts_acf_daily_revenue) answers only within one
  series.  Same skeleton: exact integer daily counts, lead-k pairs
  on the calendar-bounded collapsed frame, decimal(38,0) moment
  sums combined in one fixed IEEE sequence, rounded to 6.

Exactness notes: all rank/pair arithmetic in half-unit integers
(2x average rank is an exact BIGINT); moment products accumulate in
decimal(38,0) (exact up to ~1e12 rows per discrete pair — noted
honestly: beyond that, pre-scale the ranks); each statistic is a
fixed sequence of IEEE ops on exact integers, rounded to 6 — the
same contract as the Pearson/ACF family.

Reference parity: [NS] — north-star analytics; the reference
(/root/reference/src/topic.js) has no query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_XCORR_MAX_LAG = 7


# ------------------------------------------------- discrete rank stats
#
# Shared construction (both engines, same arithmetic):
#   cells(x, y, cnt)                 -- one hash aggregate
#   marginals: mx(x, cx), my(y, cy)  -- cnt per value, cum below
#   r2x = 2*cumx + mx + 1            -- 2 x average rank, exact BIGINT

_CELLS_SQL = """
      SELECT l_quantity AS x, l_linenumber AS y,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_quantity, l_linenumber
"""

_SPEARMAN_ORACLE = f"""
    WITH cells AS ({_CELLS_SQL}),
    mx AS (
      SELECT x, SUM(cnt) AS m,
             SUM(SUM(cnt)) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum
      FROM cells GROUP BY x),
    my AS (
      SELECT y, SUM(cnt) AS m,
             SUM(SUM(cnt)) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum
      FROM cells GROUP BY y),
    ranked AS (
      SELECT c.cnt,
             2 * COALESCE(mx.cum, 0) + mx.m + 1 AS r2x,
             2 * COALESCE(my.cum, 0) + my.m + 1 AS r2y
      FROM cells c JOIN mx ON c.x = mx.x JOIN my ON c.y = my.y),
    mom AS (
      SELECT CAST(SUM(cnt) AS DECIMAL(38,0)) AS n,
             SUM(CAST(cnt AS DECIMAL(38,0)) * r2x) AS sx,
             SUM(CAST(cnt AS DECIMAL(38,0)) * r2y) AS sy,
             SUM(CAST(cnt AS DECIMAL(38,0)) * r2x * r2x) AS sxx,
             SUM(CAST(cnt AS DECIMAL(38,0)) * r2y * r2y) AS syy,
             SUM(CAST(cnt AS DECIMAL(38,0)) * r2x * r2y) AS sxy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_rows,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS spearman_rho
    FROM mom
"""


def _cells(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .groupBy(
            F.col("l_quantity").alias("x"), F.col("l_linenumber").alias("y")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _marginal(cells: DataFrame, key: str) -> DataFrame:
    """(key, m, cum) — per discrete value: its count and the count of
    strictly smaller values.  The window runs over <= |distinct|
    rows (bounded by the value domain, not the corpus)."""
    m = cells.groupBy(key).agg(F.sum("cnt").alias("m"))
    w = (
        Window.orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return m.select(
        key, "m", F.coalesce(F.sum("m").over(w), F.lit(0)).alias("cum")
    )


@query("q_agg_spearman_discrete", oracle=_SPEARMAN_ORACLE)
def q_agg_spearman_discrete(spark: SparkSession, sf: str) -> DataFrame:
    """Spearman's rank correlation between l_quantity and l_linenumber
    from the contingency table — tie-corrected (average ranks) by
    construction, Pearson over the half-unit integer ranks weighted by
    cell counts.  Scale: ONE hash aggregate to <= 350 cells; the
    marginal windows and the moment fold run on the bounded cell
    frame; no row-level rank, no corpus-scale sort.  Exactness: ranks
    and moments exact integers in decimal(38,0); rho is one fixed IEEE
    combination rounded to 6."""
    cells = _cells(spark, sf)
    mx = _marginal(cells, "x").withColumnsRenamed(
        {"m": "mxm", "cum": "mxc"}
    )
    my = _marginal(cells, "y").withColumnsRenamed(
        {"m": "mym", "cum": "myc"}
    )
    ranked = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .select(
            "cnt",
            (2 * F.col("mxc") + F.col("mxm") + 1).alias("r2x"),
            (2 * F.col("myc") + F.col("mym") + 1).alias("r2y"),
        )
    )
    d = F.col("cnt").cast("decimal(38,0)")
    mom = ranked.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
        F.sum(d * F.col("r2x")).alias("sx"),
        F.sum(d * F.col("r2y")).alias("sy"),
        F.sum(d * F.col("r2x") * F.col("r2x")).alias("sxx"),
        F.sum(d * F.col("r2y") * F.col("r2y")).alias("syy"),
        F.sum(d * F.col("r2x") * F.col("r2y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    return mom.select(
        n.cast("long").alias("n_rows"),
        F.round(
            (n * F.col("sxy") - sx * sy).cast("double")
            / F.sqrt(
                (n * F.col("sxx") - sx * sx).cast("double")
                * (n * F.col("syy") - sy * sy).cast("double")
            ),
            6,
        ).alias("spearman_rho"),
    )


_KENDALL_ORACLE = f"""
    WITH cells AS ({_CELLS_SQL}),
    pairs AS (
      SELECT SUM(CASE WHEN b.x > a.x AND b.y > a.y
                      THEN CAST(a.cnt AS DECIMAL(38,0)) * b.cnt END) AS c,
             SUM(CASE WHEN b.x > a.x AND b.y < a.y
                      THEN CAST(a.cnt AS DECIMAL(38,0)) * b.cnt END) AS d
      FROM cells a JOIN cells b
        ON b.x > a.x AND (b.y > a.y OR b.y < a.y)),
    tot AS (
      SELECT CAST(SUM(cnt) AS DECIMAL(38,0)) AS n,
             SUM(CAST(cnt AS DECIMAL(38,0)) * (cnt - 1)) AS tcell
      FROM cells),
    tx AS (SELECT SUM(CAST(m AS DECIMAL(38,0)) * (m - 1)) AS v FROM
           (SELECT SUM(cnt) AS m FROM cells GROUP BY x)),
    ty AS (SELECT SUM(CAST(m AS DECIMAL(38,0)) * (m - 1)) AS v FROM
           (SELECT SUM(cnt) AS m FROM cells GROUP BY y))
    SELECT CAST(tot.n AS BIGINT) AS n_rows,
           CAST(pairs.c AS BIGINT) AS concordant,
           CAST(pairs.d AS BIGINT) AS discordant,
           round(CAST(pairs.c - pairs.d AS DOUBLE)
                 / sqrt(CAST(tot.n * (tot.n - 1) - tx.v AS DOUBLE)
                        * CAST(tot.n * (tot.n - 1) - ty.v AS DOUBLE)
                        / 4.0), 6) AS kendall_tau_b
    FROM pairs, tot, tx, ty
"""


@query("q_agg_kendall_tau_discrete", oracle=_KENDALL_ORACLE)
def q_agg_kendall_tau_discrete(spark: SparkSession, sf: str) -> DataFrame:
    """Kendall's tau-b between l_quantity and l_linenumber from
    cell-PAIR products: concordant/discordant counts are sums of
    cnt_a x cnt_b over ordered cell pairs — a declared-bounded
    350 x 350 broadcast join on the aggregated frame, never a
    row-pair join (which is O(n^2) and dead at any scale).  Tie
    corrections (tau-b) from the marginals: denominator
    sqrt((n(n-1) - Tx)(n(n-1) - Ty))/2 with T = sum m(m-1) per tied
    value.  Exactness: pair products in decimal(38,0); one IEEE
    sqrt+division rounded to 6."""
    cells = _cells(spark, sf)
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.col("cnt").alias("acnt"),
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"),
        F.col("cnt").alias("bcnt"),
    )
    prod = F.col("acnt").cast("decimal(38,0)") * F.col("bcnt")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("bx") > F.col("ax"))
            & ((F.col("by") > F.col("ay")) | (F.col("by") < F.col("ay"))),
        )
        .agg(
            F.sum(
                F.when((F.col("by") > F.col("ay")), prod)
            ).alias("c"),
            F.sum(
                F.when((F.col("by") < F.col("ay")), prod)
            ).alias("d"),
        )
    )
    dec = F.col("cnt").cast("decimal(38,0)")
    tot = cells.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("cnt").alias("m"))
        .agg(F.sum(F.col("m").cast("decimal(38,0)") * (F.col("m") - 1)).alias("txv"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("cnt").alias("m"))
        .agg(F.sum(F.col("m").cast("decimal(38,0)") * (F.col("m") - 1)).alias("tyv"))
    )
    joined = (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
    )
    n = F.col("n")
    return joined.select(
        n.cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(
                (n * (n - 1) - F.col("txv")).cast("double")
                * (n * (n - 1) - F.col("tyv")).cast("double")
                / 4.0
            ),
            6,
        ).alias("kendall_tau_b"),
    )


# ------------------------------------------------- cross-correlation

_XCORR_ORACLE = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(count_if(event_type = 'click') AS BIGINT) AS x,
             CAST(count_if(event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY CAST(ts AS DATE)),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy,
             SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
             SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
      FROM daily),
    lagged AS (
      SELECT l.lag, d.x,
             lead(d.y, l.lag) OVER (PARTITION BY l.lag ORDER BY d.d) AS yk
      FROM daily d CROSS JOIN
           (SELECT UNNEST(range(0, {_XCORR_MAX_LAG + 1})) AS lag) l),
    a AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             SUM(CAST(x AS DECIMAL(38,0)) * yk) AS sxy,
             SUM(CAST(x AS DECIMAL(38,0))) AS px,
             SUM(CAST(yk AS DECIMAL(38,0))) AS py
      FROM lagged WHERE yk IS NOT NULL GROUP BY lag)
    SELECT a.lag, a.cnt,
           round((CAST(a.sxy AS DOUBLE)
                  - CAST(a.px AS DOUBLE) * (CAST(g.sy AS DOUBLE) / g.n)
                  - CAST(a.py AS DOUBLE) * (CAST(g.sx AS DOUBLE) / g.n)
                  + a.cnt * (CAST(g.sx AS DOUBLE) / g.n)
                          * (CAST(g.sy AS DOUBLE) / g.n))
                 / sqrt((CAST(g.sxx AS DOUBLE)
                         - g.n * (CAST(g.sx AS DOUBLE) / g.n)
                               * (CAST(g.sx AS DOUBLE) / g.n))
                        * (CAST(g.syy AS DOUBLE)
                           - g.n * (CAST(g.sy AS DOUBLE) / g.n)
                                 * (CAST(g.sy AS DOUBLE) / g.n))), 6)
             AS xcorr
    FROM a CROSS JOIN g ORDER BY a.lag
"""


@query("q_ts_xcorr_daily", oracle=_XCORR_ORACLE)
def q_ts_xcorr_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Lagged cross-correlation between daily click and purchase
    counts, k = 0..7: does today's click volume co-move with purchase
    volume k days later?  The ACF's one-series skeleton extended to
    two series: exact integer daily counts in ONE conditional-
    aggregation scan, lead-k pairing on the calendar-bounded daily
    frame (the per-lag windows run over days, not events), full-series
    means/variances for the normalization (the standard sample CCF),
    decimal(38,0) moment sums, one fixed IEEE combination per lag
    rounded to 6.  Scale: one shuffle to the daily frame; everything
    after is bounded by the calendar."""
    ev = t(spark, sf, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count_if(F.col("event_type") == "click").cast("long").alias("x"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("long")
        .alias("y"),
    )
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    g = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dy * F.col("y")).alias("syy"),
    )
    w = Window.orderBy("d")
    leads = daily.select(
        "x",
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.lead("y", k).over(w).alias("yk"),
                )
                for k in range(0, _XCORR_MAX_LAG + 1)
            ]
        ).alias("ls"),
    )
    pairs = leads.select("x", F.explode("ls").alias("p")).select(
        "x", F.col("p.lag").alias("lag"), F.col("p.yk").alias("yk")
    )
    a = (
        pairs.filter(F.col("yk").isNotNull())
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.col("x").cast("decimal(38,0)") * F.col("yk")).alias(
                "sxy"
            ),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("px"),
            F.sum(F.col("yk").cast("decimal(38,0)")).alias("py"),
        )
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    ybar = F.col("sy").cast("double") / F.col("n")
    num = (
        F.col("sxy").cast("double")
        - F.col("px").cast("double") * ybar
        - F.col("py").cast("double") * xbar
        + F.col("cnt") * xbar * ybar
    )
    den = F.sqrt(
        (F.col("sxx").cast("double") - F.col("n") * xbar * xbar)
        * (F.col("syy").cast("double") - F.col("n") * ybar * ybar)
    )
    return (
        a.crossJoin(F.broadcast(g))
        .select("lag", "cnt", F.round(num / den, 6).alias("xcorr"))
        .orderBy("lag")
    )
