"""Round-9 wave 4: multi-touch attribution — the position-based
(U-shaped) and time-decay models next to the existing last-touch one
(composites4).

Last-touch answers "which click gets THE credit"; a marketing /
growth pipeline also wants the models that SPLIT credit across the
journey:

- ``q_events_attribution_position``: U-shaped 40/20/40 — the first
  and last qualifying click get 40% each, the middle clicks split
  the remaining 20% evenly.  Credits are EXACT INTEGER basis points
  (one purchase = 10 000 bp): n=1 -> 10 000, n=2 -> 5 000/5 000,
  n>=3 -> 4 000 / even-integer middle split with the remainder
  pinned to the last touch — so conservation (sum of credit =
  10 000 x attributed purchases) is an exact-arithmetic invariant,
  pytest-pinned, not a float approximation.
- ``q_events_attribution_time_decay``: linear decay — each
  qualifying click earns (window_ms - gap_ms) exact integer weight
  units, so fresher touches weigh more; per-channel mass is an
  exact BIGINT sum and the channel share is ONE IEEE division
  rounded to 6.

Both share the clicks-in-window candidate kernel: purchases join the
same user's clicks at most 30 minutes older.  Unlike last-touch
(which the as-of/max-struct kernel solves in O(events)), multi-touch
genuinely needs every (purchase, qualifying click) PAIR — the output
itself is O(pairs) — so the join is the honest plan: one shuffle on
user_id with the time-range residual, pair count bounded by window
length x per-user click rate, never all-pairs across users.
"Channel" is derived deterministically from the click id (the
testdata has no channel column): ch_<event_id % 4>.

Reference parity: [NS] — north-star analytics; the reference
(/root/reference/src/topic.js) is pub/sub only.

House exactness: all credits/weights exact BIGINTs; shares a single
IEEE division rounded to 6; ms gaps via epoch_ms (NTZ-safe on the
Spark side, builtin on DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_WINDOW_MS = 30 * 60 * 1000

_CAND_SQL = f"""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           'ch_' || CAST(c.event_id % 4 AS VARCHAR) AS channel,
           epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_ms(p.ts) - epoch_ms(c.ts) BETWEEN 0 AND {_WINDOW_MS}
"""


def _candidates(spark: SparkSession, sf: str) -> DataFrame:
    """(purchase_id, click_id, channel, gap_ms) for every click of the
    same user at most 30 min before the purchase (ties at gap 0
    attribute, like last-touch).  One equi-join on user_id; the range
    predicate rides along as the join residual."""
    ev = t(spark, sf, "events")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            epoch_ms("ts").alias("p_ms"),
        )
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            epoch_ms("ts").alias("c_ms"),
        )
    )
    j = p.join(c, "user_id").where(
        (F.col("p_ms") - F.col("c_ms") >= 0)
        & (F.col("p_ms") - F.col("c_ms") <= _WINDOW_MS)
    )
    return j.select(
        "purchase_id",
        "click_id",
        F.concat(F.lit("ch_"), (F.col("click_id") % 4).cast("string")).alias(
            "channel"
        ),
        (F.col("p_ms") - F.col("c_ms")).alias("gap_ms"),
    )


# position weight in basis points; n = touches in the purchase's
# window, rn = 1-based rank by recency-ascending ts (rank 1 = OLDEST =
# "first touch").  Exact integers: the middle split is the floor
# division, its remainder rides on the last touch.
_WEIGHT_SQL = """
    CASE WHEN n = 1 THEN 10000
         WHEN n = 2 AND rn = 1 THEN 5000
         WHEN n = 2 THEN 5000
         WHEN rn = 1 THEN 4000
         WHEN rn = n
           THEN 4000 + CAST(2000 % (n - 2) AS BIGINT)
         ELSE CAST((2000 - (2000 % (n - 2))) / (n - 2) AS BIGINT)
    END
"""


@query(
    "q_events_attribution_position",
    oracle=f"""
    WITH cand AS ({_CAND_SQL}),
    ranked AS (
      SELECT channel, purchase_id,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY gap_ms DESC, click_id) AS rn,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n
      FROM cand)
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           CAST(SUM({_WEIGHT_SQL}) AS BIGINT) AS credit_bp
    FROM ranked
    GROUP BY channel ORDER BY channel
    """,
)
def q_events_attribution_position(spark: SparkSession, sf: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) multi-touch attribution:
    per channel, touch count, purchases touched, and total credit in
    exact basis points.  Rank 1 = the OLDEST qualifying click (gap
    DESC; click_id tie-break), rank n = the freshest.  Conservation —
    sum(credit_bp) == 10000 x attributed purchases — holds exactly by
    integer construction (tests/test_composites53.py).  Scale: one
    user-keyed join for candidates + one purchase-keyed window (both
    high-cardinality keys) + the channel group-by."""
    cand = _candidates(spark, sf)
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("gap_ms").desc(), F.col("click_id")
    )
    wn = Window.partitionBy("purchase_id")
    ranked = cand.select(
        "channel",
        "purchase_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.countDistinct("purchase_id").cast("long").alias("n_purchases"),
            F.sum(F.expr(_WEIGHT_SQL)).cast("long").alias("credit_bp"),
        )
        .orderBy("channel")
    )


@query(
    "q_events_attribution_time_decay",
    oracle=f"""
    WITH cand AS ({_CAND_SQL}),
    per_ch AS (
      SELECT channel,
             CAST(COUNT(*) AS BIGINT) AS n_touches,
             CAST(SUM({_WINDOW_MS} - gap_ms) AS BIGINT) AS decay_mass
      FROM cand GROUP BY channel)
    SELECT channel, n_touches, decay_mass,
           round(CAST(decay_mass AS DOUBLE)
                 / (SELECT SUM(decay_mass) FROM per_ch), 6) AS mass_share
    FROM per_ch ORDER BY channel
    """,
)
def q_events_attribution_time_decay(spark: SparkSession, sf: str) -> DataFrame:
    """Linear time-decay attribution: each qualifying click earns
    (30 min - gap) in exact integer milliseconds — a click seconds
    before the purchase weighs ~2x one from 15 minutes out — and the
    per-channel mass plus its share of the total.  Mass is an exact
    BIGINT sum (no float accumulation); the share is one IEEE division
    by the broadcast scalar total, rounded to 6.  Scale: candidates
    join + one channel group-by; the total is a 1-row broadcast."""
    cand = _candidates(spark, sf)
    per_ch = cand.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.lit(_WINDOW_MS) - F.col("gap_ms")).cast("long").alias(
            "decay_mass"
        ),
    )
    total = per_ch.agg(F.sum("decay_mass").alias("total_mass"))
    return (
        per_ch.crossJoin(F.broadcast(total))
        .select(
            "channel",
            "n_touches",
            "decay_mass",
            F.round(
                F.col("decay_mass").cast("double") / F.col("total_mass"), 6
            ).alias("mass_share"),
        )
        .orderBy("channel")
    )
