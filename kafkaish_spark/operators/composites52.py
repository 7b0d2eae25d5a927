"""Round-9 wave 3: Holt linear-trend smoothing and the t-digest
quantile sketch.

- ``q_ts_holt_linear``: double exponential smoothing (Holt 1957) of
  daily event counts — the trend-aware sibling of the SES query
  (composites28's q_ts_exp_smoothing).  The coupled recursion
  (level, trend) has no per-term closed form, so it runs as a FOLD
  over the day-ordered series: Spark ``aggregate`` with an explicit
  zero == DuckDB ``list_reduce`` seeded by the prepended first
  element — the same order-pinned-fold trick SES uses, lifted from
  scalars to a 2-element [level, trend] array accumulator.  The
  lambda body is the same arithmetic text on both engines (indexing
  base aside), so every IEEE op sequence is identical; results
  round to 6.
- ``q_sketch_tdigest_quantiles``: the quantile member of the sketch
  family (HLL cardinality / KMV set ops / CMS point counts /
  SpaceSaving top-k — and now t-digest for percentiles): each
  partition compresses its values into <= DELTA (mean, weight)
  centroids (Dunning's merging digest with a uniform weight cap),
  the bounded summaries re-compress per group, and quantiles read
  off the cumulative-weight midpoints.  The shuffle moves
  #partitions x DELTA centroid rows — KBs — never the values, which
  is the whole point at 100 TB where exact percentile = a full sort.
  Rows-only by design (centroid means depend on partition layout);
  tests/test_composites52.py pins the rank-error bound |rank(est) -
  q| <= 2/DELTA against exact quantiles, which holds for ANY
  partitioning of the input.

Reference parity: [NS] — north-star analytics beyond the reference's
pub/sub surface (/root/reference/src/topic.js).

House exactness: counts exact; fold arithmetic identical-text IEEE;
rounds to 6.  Scale: Holt folds a calendar-bounded (type, day) frame;
t-digest is one linear scan + a DELTA-bounded merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_A = "0.3"  # level smoothing
_G = "0.2"  # trend smoothing
_H = 7  # forecast horizon (days)

# identical arithmetic text on both engines; only the array indexing
# base differs (Spark arrays 0-based, DuckDB lists 1-based).  The
# accumulator is a 2-element DOUBLE array [level, trend] rather than a
# struct: DuckDB 1.0's list_reduce miscomputes the SECOND field of a
# struct-literal lambda body when it embeds the first field's
# expression (verified by a step-by-step probe — step 2's trend came
# back 1.754 instead of 1.82 while the level stayed exact); the array
# form folds bit-exactly against the plain python recurrence.
def _l_next(i0: int) -> str:
    return (
        f"{_A} * e[{i0}] + (1.0 - {_A}) * (acc[{i0}] + acc[{i0 + 1}])"
    )


def _b_next(i0: int) -> str:
    return (
        f"{_G} * (({_l_next(i0)}) - acc[{i0}])"
        f" + (1.0 - {_G}) * acc[{i0 + 1}]"
    )


@query(
    "q_ts_holt_linear",
    oracle=f"""
    WITH days AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    ser AS (
      SELECT event_type, list(y ORDER BY day) AS ys
      FROM days GROUP BY event_type HAVING COUNT(*) >= 2),
    fold AS (
      SELECT event_type,
             list_reduce(
               list_prepend(
                 [ys[1], ys[2] - ys[1]],
                 list_transform(ys[2:], x -> [x, 0.0])),
               (acc, e) -> [{_l_next(1)}, {_b_next(1)}]) AS st
      FROM ser)
    SELECT event_type,
           round(st[1], 6) AS level,
           round(st[2], 6) AS trend,
           round(st[1] + {_H} * st[2], 6) AS forecast_7d
    FROM fold ORDER BY event_type
    """,
)
def q_ts_holt_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Holt's linear-trend smoothing of daily event counts per type
    (alpha=0.3, gamma=0.2; init l1=y1, b1=y2-y1) and the 7-day-ahead
    forecast l + 7b — the capacity-planning number SES can't give
    because it has no trend state.

    The recursion folds the day-ordered series: Spark
    ``aggregate(struct-tail, seed, merge)`` == DuckDB
    ``list_reduce(seed-prepended list, merge)`` — both left folds in
    day order with a struct accumulator, same lambda arithmetic text,
    so the IEEE sequence is bit-identical (indexing differs only
    syntactically: Spark arrays are 0-based, DuckDB lists 1-based).
    Scale: the fold runs on the collapsed (type, day) frame —
    calendar-bounded rows per group — after one partial-agg shuffle
    of the daily counts."""
    ev = t(spark, sf, "events")
    days = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    ser = (
        days.groupBy("event_type")
        .agg(
            F.expr(
                "array_sort(collect_list(struct(day, y)))"
            ).alias("dys")
        )
        .where(F.size("dys") >= 2)
        .selectExpr("event_type", "transform(dys, x -> x.y) AS ys")
    )
    st = ser.selectExpr(
        "event_type",
        f"""aggregate(
              transform(slice(ys, 2, size(ys) - 1),
                        x -> array(x, CAST(0.0 AS DOUBLE))),
              array(ys[0], ys[1] - ys[0]),
              (acc, e) -> array({_l_next(0)}, {_b_next(0)})
            ) AS st""",
    )
    return st.selectExpr(
        "event_type",
        "round(st[0], 6) AS level",
        "round(st[1], 6) AS trend",
        f"round(st[0] + {_H} * st[1], 6) AS forecast_7d",
    ).orderBy("event_type")


# ------------------------------------------------------------ t-digest
DELTA = 200  # max centroids per digest (uniform weight cap)
_QS = (0.5, 0.9, 0.99)


def tdigest_compress(pairs, delta: int):
    """Re-cluster (mean, weight)-sorted pairs into <= delta centroids
    under a uniform weight cap ceil(W/delta) (Dunning's merging digest
    with the k0 scale): greedy left-to-right merge while the running
    centroid stays under the cap.  With the uniform cap every centroid
    holds <= W/delta + max single weight of the mass, so a quantile
    read off cumulative midpoints has rank error O(1/delta) for ANY
    input partitioning — the invariant tests/test_composites52.py
    pins.  Pure python on bounded summaries (caller keeps inputs
    <= #partitions x delta rows)."""
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    if total == 0:
        return []
    cap = -(-total // delta)  # ceil
    out: list[list[float]] = []
    for m, w in pairs:
        if out and out[-1][1] + w <= cap:
            c = out[-1]
            c[0] += (m - c[0]) * (w / (c[1] + w))
            c[1] += w
        else:
            out.append([m, w])
    return out


def tdigest_quantile(cents, q: float) -> float:
    """Quantile by linear interpolation over cumulative centroid
    midpoints (Dunning & Ertl §2.9)."""
    total = sum(w for _, w in cents)
    target = q * total
    cum = 0.0
    prev_mid, prev_mean = 0.0, cents[0][0]
    for m, w in cents:
        mid = cum + w / 2.0
        if target <= mid:
            if mid == prev_mid:
                return m
            fr = (target - prev_mid) / (mid - prev_mid)
            return prev_mean + fr * (m - prev_mean)
        prev_mid, prev_mean = mid, m
        cum += w
    return cents[-1][0]


@query("q_sketch_tdigest_quantiles", oracle=None)
def q_sketch_tdigest_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """t-digest approximate quantiles of event value per event type:
    each partition compresses its (type, value) stream into <= DELTA
    centroids (sorted merge under the uniform weight cap), the
    per-partition summaries shuffle ONCE on event_type (#partitions x
    DELTA rows — KBs), and a grouped re-compression reads p50/p90/p99
    off the merged digest.  This is how a 100 TB percentile dashboard
    avoids the full sort exact percentile needs — same shuffle shape
    as the SpaceSaving and KMV sketches.  Rows-only by design
    (centroid means are partition-layout-dependent); the rank-error
    bound is property-tested instead."""
    import pandas as pd

    ev = t(spark, sf, "events").select("event_type", "value")

    def summarize(batches):
        # Bounded state: per key, re-compress whenever the buffer
        # exceeds 10x DELTA — the executor holds O(DELTA) centroids
        # per key, never the partition's raw values (the whole point
        # of a sketch; review r9 replaced a buffer-everything dict).
        cap = 10 * DELTA
        accum: dict[str, list] = {}
        for pdf in batches:
            for et, g in pdf.groupby("event_type"):
                buf = accum.setdefault(et, [])
                buf.extend((float(v), 1) for v in g["value"].dropna())
                if len(buf) > cap:
                    accum[et] = [
                        (m, w) for m, w in tdigest_compress(buf, DELTA)
                    ]
        rows = []
        for et, pairs in accum.items():
            for m, w in tdigest_compress(pairs, DELTA):
                rows.append((et, m, float(w)))
        yield pd.DataFrame(
            rows, columns=["event_type", "mean", "weight"]
        )

    summaries = ev.mapInPandas(
        summarize, "event_type string, mean double, weight double"
    )

    def merge(key, pdf):
        import pandas as pd

        cents = tdigest_compress(
            list(zip(pdf["mean"], pdf["weight"])), DELTA
        )
        return pd.DataFrame(
            [
                {
                    "event_type": key[0],
                    "q": q,
                    "value_est": tdigest_quantile(cents, q),
                    "n_centroids": len(cents),
                }
                for q in _QS
            ]
        )

    return (
        summaries.groupBy("event_type")
        .applyInPandas(
            merge,
            "event_type string, q double, value_est double, n_centroids int",
        )
        .orderBy("event_type", "q")
    )
