"""Fourth operator batch: the feature-engineering / behavioral-
analytics surface a training-data warehouse runs daily — Markov
transition matrices, point-in-time (leakage-safe) dimension lookups,
trailing feature extraction, marketing attribution, RFM scoring,
robust (MAD) outlier detection, time-weighted averages, multi-distinct
aggregates, and the GROUP BY ALL SQL surface.

Shared design rules (same as ``relational.py``):

* As-of / point-in-time lookups never pairwise-join fact x history —
  they union both sides into ONE per-key timeline and take
  ``max(struct(...))`` over the preceding frame: one shuffle on the
  key, linear state, no quadratic hot-key blowup at 100 TB.  The
  struct carries the full payload, so no lossy composite-integer
  encoding and no key-range assumption.
* Money and metric doubles fold as exact integers (cents / micro
  units) so every aggregate is order-independent and bit-equal to the
  DuckDB oracle regardless of partitioning (see functions/exact.py).
* Every computed column is aliased identically in the Spark plan and
  the oracle SQL (driver hashes columns sorted by name).

Reference parity: the reference (kafkaish) computes none of these —
[NS] north-star processing-layer operators per SURVEY.md §2.2/§2.4;
its only query shapes are the offset scan/sort/limit cited in
SURVEY.md §2.2 (src/topic.js:144-148,226-229).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum_sql
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ------------------------------------------------- Markov transitions
@query(
    "q_events_markov_transitions",
    oracle="""
    WITH tr AS (
      SELECT lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
      FROM events),
    c AS (SELECT from_type, to_type, COUNT(*) AS n
          FROM tr WHERE from_type IS NOT NULL GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def q_events_markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag(event_type) pairs each event with its predecessor,
    then (from, to) counts normalize into row-stochastic transition
    probabilities.  One shuffle keys user_id for the lag; the second
    window runs over the 25-row transition table — effectively free.
    The session-path model behind next-event prediction and funnel
    anomaly detection."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    counts = tr.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    row_tot = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / row_tot, 6).alias("p"),
    )


# ------------------------------------------------- point-in-time lookup
@query(
    "q_join_pit_priority",
    oracle=f"""
    WITH li AS (
      SELECT l.l_shipdate AS ts, o.o_custkey,
             l.l_extendedprice, l.l_discount
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    tl AS (
      SELECT o_custkey, o_orderdate AS ts, 0 AS kind,
             {{'d': epoch_ms(o_orderdate), 'k': o_orderkey,
               'p': o_orderpriority}} AS pkey,
             CAST(NULL AS DOUBLE) AS l_extendedprice,
             CAST(NULL AS DOUBLE) AS l_discount
      FROM orders
      UNION ALL
      SELECT o_custkey, ts, 1, NULL, l_extendedprice, l_discount FROM li),
    m AS (
      SELECT *, max(pkey) OVER (
               PARTITION BY o_custkey ORDER BY ts, kind
               ROWS UNBOUNDED PRECEDING) AS pit
      FROM tl)
    SELECT pit.p AS pit_priority, COUNT(*) AS n_lines,
           {dsum_sql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM m WHERE kind = 1 GROUP BY pit.p
    """,
)
def q_join_pit_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension lookup (the feature-store join): each
    lineitem resolves the priority of its customer's LATEST order as of
    the ship date — never a later one, which is exactly the
    leakage-safety rule a training pipeline must enforce when joining
    features to labels.  Scale path: instead of the quadratic
    fact x history band join, anchors (orders) and probes (lineitems)
    union into one per-customer timeline and ``max(struct(date_ms,
    orderkey, priority))`` over the preceding frame resolves the as-of
    winner in one shuffle with linear state; anchors sort before probes
    at equal ts, giving inclusive <= semantics, and the orderkey field
    makes same-day ties deterministic on both engines."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    anchors = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("kind"),
        F.struct(
            epoch_ms(F.col("o_orderdate")).alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("p"),
        ).alias("pkey"),
    )
    probes = li.join(o.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == F.col("o_orderkey")).select(
        "o_custkey",
        F.col("l_shipdate").alias("ts"),
        F.lit(1).alias("kind"),
        "l_extendedprice",
        "l_discount",
    )
    tl = anchors.unionByName(probes, allowMissingColumns=True)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = tl.withColumn("pit", F.max("pkey").over(w))
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return (
        m.filter(F.col("kind") == 1)
        .groupBy(F.col("pit.p").alias("pit_priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


# ------------------------------------------------- trailing features
@query(
    "q_feature_trailing_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER wp AS BIGINT) AS n_prior_orders,
           CAST(COALESCE(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                         OVER wp, 0) AS BIGINT) AS prior_spend_cents,
           CAST(date_diff('day', CAST(lag(o_orderdate) OVER wo AS DATE),
                          CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_prev
    FROM orders
    WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wp AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    """,
)
def q_feature_trailing_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe trailing features per order: how many orders the
    customer placed STRICTLY before this one, their total spend, and
    days since the previous order — the standard label-time feature
    row a churn/LTV model trains on.  The 1-PRECEDING frame bound is
    the leakage guard: the current order never sees itself.  One
    shuffle on custkey serves all three features (Spark computes the
    two frames over the same sort without re-exchanging); money folds
    as integer cents so the running sum is exact and order-independent."""
    o = t(spark, sf, "orders")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = wo.rowsBetween(Window.unboundedPreceding, -1)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.select(
        "o_orderkey",
        F.count(F.lit(1)).over(wp).alias("n_prior_orders"),
        F.coalesce(F.sum(cents).over(wp), F.lit(0))
        .cast("long")
        .alias("prior_spend_cents"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(wo))
        .cast("long")
        .alias("days_since_prev"),
    )


# ------------------------------------------------- last-touch attribution
_ATTR_WINDOW_MS = 30 * 60 * 1000  # purchases attribute to clicks <= 30 min back


@query(
    "q_events_attribution_last_touch",
    oracle=f"""
    WITH tl AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
             CASE WHEN event_type = 'click'
                  THEN {{'ts_ms': epoch_ms(ts), 'id': event_id}} END AS ckey
      FROM events WHERE event_type IN ('click', 'purchase')),
    m AS (
      SELECT *, max(ckey) OVER (
               PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS UNBOUNDED PRECEDING) AS lc
      FROM tl)
    SELECT event_id AS purchase_id,
           CASE WHEN lc IS NOT NULL
                 AND epoch_ms(ts) - lc.ts_ms <= {_ATTR_WINDOW_MS}
                THEN lc.id END AS click_id,
           CASE WHEN lc IS NOT NULL
                 AND epoch_ms(ts) - lc.ts_ms <= {_ATTR_WINDOW_MS}
                THEN CAST(epoch_ms(ts) - lc.ts_ms AS BIGINT) END AS gap_ms
    FROM m WHERE kind = 1
    """,
)
def q_events_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase attributes to the same
    user's latest click at most 30 minutes earlier (ties at the same
    timestamp attribute — clicks sort before purchases).  Same
    union-timeline/max(struct) as-of kernel as q_join_pit_priority:
    one shuffle on user_id, linear state, no click x purchase pairwise
    join — the difference between O(events) and O(hot-user²) on a
    100 TB clickstream.  Output is per-purchase: the winning click id
    and the gap, NULL when no click qualifies (organic purchase).
    Kernel extracted as ``last_touch_attribution`` so the hypothesis
    property test can drive it with arbitrary synthetic timelines."""
    ev = t(spark, sf, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return last_touch_attribution(ev)


def last_touch_attribution(ev: DataFrame) -> DataFrame:
    """The reusable kernel: ``ev`` needs (user_id, ts, event_id,
    event_type in {click, purchase})."""
    tl = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
        F.when(
            F.col("event_type") == "click",
            F.struct(
                epoch_ms(F.col("ts")).alias("ts_ms"),
                F.col("event_id").alias("id"),
            ),
        ).alias("ckey"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = tl.withColumn("lc", F.max("ckey").over(w))
    gap = epoch_ms(F.col("ts")) - F.col("lc.ts_ms")
    hit = F.col("lc").isNotNull() & (gap <= _ATTR_WINDOW_MS)
    return m.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_id"),
        F.when(hit, F.col("lc.id")).alias("click_id"),
        F.when(hit, gap).cast("long").alias("gap_ms"),
    )


# ------------------------------------------------- multi-distinct
@query(
    "q_agg_multi_distinct",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                               THEN user_id END) AS n_buyers
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def q_agg_multi_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple COUNT(DISTINCT ...) over different columns in ONE
    aggregate — the daily-active report (events, users, types, buying
    users).  Catalyst plans this with Expand: each input row fans out
    once per distinct group and a single two-phase aggregate dedups
    them all together, instead of one self-join per distinct column
    (the naive plan).  Cost is x3 rows through one Exchange — at
    100 TB that beats three separate shuffled dedups; for
    hundreds-of-millions-distinct cardinalities you'd swap in the
    mergeable sketches (q_sketch_hll_cardinality)."""
    ev = t(spark, sf, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_buyers"),
    )


# ------------------------------------------------- RFM segmentation
@query(
    "q_rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
                  AS BIGINT) AS r_days,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, r_days, n_orders, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY r_days DESC, o_custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY n_orders ASC, o_custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey)
                AS BIGINT) AS m_score,
           CAST(ntile(5) OVER (ORDER BY r_days DESC, o_custkey) AS VARCHAR)
             || CAST(ntile(5) OVER (ORDER BY n_orders ASC, o_custkey)
                     AS VARCHAR)
             || CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey)
                     AS VARCHAR) AS segment
    FROM base
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer scoring: recency / frequency / monetary quintiles
    (5 = most recent / most frequent / biggest spender) concatenated
    into the classic 3-digit segment.  Quintile assignment must be
    deterministic to be reproducible, so every ntile orders by
    (metric, custkey) — a total order, same on both engines.  The
    ntile windows are global (one partition); that is fine for the
    per-customer AGGREGATE (1 row per customer, millions at 100 TB,
    they fit one task's sort), and the scale-out alternative when they
    don't is percentile-threshold assignment à la q_outliers_above_p95
    — compute 4 cut points, broadcast, bin by comparison."""
    o = t(spark, sf, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("monetary_cents"),
    )
    maxd = o.agg(F.max("o_orderdate").alias("maxd"))
    base = base.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.to_date("maxd"), F.to_date("last_order"))
        .cast("long")
        .alias("r_days"),
        "n_orders",
        "monetary_cents",
    )
    r = F.ntile(5).over(Window.orderBy(F.desc("r_days"), "o_custkey"))
    f_ = F.ntile(5).over(Window.orderBy("n_orders", "o_custkey"))
    m = F.ntile(5).over(Window.orderBy("monetary_cents", "o_custkey"))
    return base.select(
        "o_custkey",
        "r_days",
        "n_orders",
        "monetary_cents",
        r.cast("long").alias("r_score"),
        f_.cast("long").alias("f_score"),
        m.cast("long").alias("m_score"),
        F.concat(
            r.cast("string"), f_.cast("string"), m.cast("string")
        ).alias("segment"),
    )


# ------------------------------------------------- MAD robust outliers
@query(
    "q_agg_mad_robust",
    oracle="""
    WITH e AS (SELECT event_type,
                      CAST(round(value * 100, 0) AS BIGINT) AS v_c
               FROM events),
    med AS (SELECT event_type, median(v_c) AS med_c FROM e GROUP BY 1),
    dev AS (SELECT e.event_type, e.v_c, abs(e.v_c - m.med_c) AS adev
            FROM e JOIN med m USING (event_type)),
    mad AS (SELECT event_type, median(adev) AS mad_c FROM dev GROUP BY 1)
    SELECT d.event_type,
           COUNT(*) AS n,
           round(MIN(me.med_c) / 100, 6) AS med,
           round(MIN(ma.mad_c) / 100, 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * ma.mad_c
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med me USING (event_type)
    JOIN mad ma USING (event_type)
    GROUP BY d.event_type
    """,
)
def q_agg_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per
    event type, median, MAD, and the count of values beyond the
    3-sigma-equivalent fence (1.4826·MAD ≈ one robust sigma).  Unlike
    z-scores (q_events_rate_anomaly), the fence itself is immune to the
    outliers it hunts.  Values fold to integer cents FIRST, so both
    medians interpolate on integers (exactly representable halves) and
    every engine agrees bit-for-bit — the same trick that makes all the
    moment queries reproducible.  Plan: two grouped exact percentiles
    and a counting pass, with the tiny per-type stats broadcast back
    onto the fact scan each time — three scans, zero fact shuffles."""
    ev = t(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("v_c")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("v_c", F.lit(0.5)).alias("med_c")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "v_c", F.abs(F.col("v_c") - F.col("med_c")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("med_c") / 100, 6).alias("med"),
            F.round(F.min("mad_c") / 100, 6).alias("mad"),
            F.sum(
                F.when(F.col("adev") > 3 * 1.4826 * F.col("mad_c"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ------------------------------------------------- time-weighted average
@query(
    "q_events_time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CAST(round(value * 100, 0) AS BIGINT) AS v_c,
             lead(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events),
    a AS (SELECT user_id, COUNT(*) AS n_events,
                 MIN(ms) AS first_ms, MAX(ms) AS last_ms,
                 CAST(SUM(v_c * (nxt - ms)) AS BIGINT) AS wsum
          FROM e GROUP BY user_id)
    SELECT user_id, n_events,
           CAST(last_ms - first_ms AS BIGINT) AS span_ms,
           round(CAST(wsum AS DOUBLE) / (100.0 * (last_ms - first_ms)), 6)
             AS twa
    FROM a WHERE last_ms > first_ms
    """,
)
def q_events_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average of a sampled signal per user (the
    TimescaleDB ``time_weight`` analog): each value is held until the
    next observation, so TWA = Σ value·Δt / span — the honest mean for
    irregularly-sampled metrics, where the arithmetic mean over-weights
    bursts.  Weights are integer cents x integer ms (worst case
    49002 x 2.6e9·30d ≈ 2.6e14 per user — no int64 overflow), so the
    weighted sum is exact and mergeable; the single final division is
    the only IEEE op.  One shuffle on user_id feeds both the lead()
    and the aggregate."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms(F.col("ts"))
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        ms.alias("ms"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_c"),
    ).withColumn("nxt", F.lead("ms").over(w))
    a = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ms").alias("first_ms"),
        F.max("ms").alias("last_ms"),
        F.sum(F.col("v_c") * (F.col("nxt") - F.col("ms")))
        .cast("long")
        .alias("wsum"),
    )
    span = F.col("last_ms") - F.col("first_ms")
    return a.filter(span > 0).select(
        "user_id",
        "n_events",
        span.cast("long").alias("span_ms"),
        F.round(F.col("wsum").cast("double") / (F.lit(100.0) * span), 6).alias(
            "twa"
        ),
    )


# ------------------------------------------------- GROUP BY ALL surface
@query(
    "q_sql_group_by_all",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events
    GROUP BY ALL
    """,
)
def q_sql_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL SQL surface (Spark 3.4+/DuckDB both speak it):
    every non-aggregate select item becomes a grouping key — the
    ergonomic form analysts actually type.  Semantically identical to
    listing the keys; Catalyst resolves it during analysis so the
    physical plan is the ordinary partial-agg + one Exchange."""
    t(spark, sf, "events").createOrReplaceTempView("gba_events_v")
    return spark.sql(
        """
        SELECT event_type, CAST(ts AS DATE) AS day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM gba_events_v
        GROUP BY ALL
        """
    )
