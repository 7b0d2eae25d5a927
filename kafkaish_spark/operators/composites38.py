"""Round-6 fourth wave: windowed drift and score calibration — the
drift dashboard extended along time and across sources.

- per-type PSI between consecutive time windows of the event stream
  (the batch twin of a tumbling-window drift monitor: what a
  Structured Streaming job would emit per trigger, proven here
  against the oracle on the same math);
- quantile-normalization mapping table between per-source score
  distributions and the global one (Bolstad et al., Bioinformatics
  2003, the standard cross-batch calibration): the broadcast-sized
  table that remaps each source's quality scores onto a common scale
  before mixing — heterogeneous scorers are the rule, not the
  exception, in assembled training corpora.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: integer-cent grids,
percentile_disc member values, bin-ordered folds, one IEEE division
per emitted float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------ windowed PSI (events)
# Window A = days 1-15, window B = days 16-30 of the fixture month;
# bins = window-A deciles per event_type in integer value-cents.
_WPSI_SPLIT_DAY = 16


@query(
    "q_stream_psi_windows",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN EXTRACT(day FROM ts) < {_WPSI_SPLIT_DAY}
                  THEN 'a' ELSE 'b' END AS win
      FROM events),
    edges AS (
      SELECT event_type, list_sort(list(DISTINCT e)) AS es FROM (
        SELECT event_type,
               unnest(quantile_disc(cents,
                 [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS e
        FROM v WHERE win = 'a' GROUP BY event_type)
      GROUP BY event_type),
    binned AS (
      SELECT v.event_type, win,
             len(list_filter(es, e -> e < cents)) AS bin
      FROM v JOIN edges ON v.event_type = edges.event_type),
    counts AS (
      SELECT event_type, bin,
             count_if(win = 'a') AS na,
             count_if(win = 'b') AS nb
      FROM binned GROUP BY event_type, bin),
    tot AS (
      SELECT event_type, SUM(na) AS ta, SUM(nb) AS tb,
             COUNT(*) AS k
      FROM counts GROUP BY event_type),
    terms AS (
      SELECT counts.event_type, bin, ta, tb,
             ((na + 0.5) / (ta + 0.5 * k) - (nb + 0.5) / (tb + 0.5 * k))
             * ln(((na + 0.5) / (ta + 0.5 * k))
                  / ((nb + 0.5) / (tb + 0.5 * k))) AS term
      FROM counts JOIN tot ON counts.event_type = tot.event_type)
    SELECT event_type,
           CAST(MIN(ta) AS BIGINT) AS n_window_a,
           CAST(MIN(tb) AS BIGINT) AS n_window_b,
           round(list_reduce(list_prepend(0.0, list(term ORDER BY bin)),
                 (x, y) -> x + y), 6) AS psi
    FROM terms GROUP BY event_type
    """,
)
def q_stream_psi_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window PSI per event type: the value distribution of
    the first half of the month against the second, binned on the
    FIRST window's deciles — the per-trigger output of a streaming
    drift monitor, stated as its batch twin so the oracle can check
    the math (the house pattern for every S-layer operator).  A type
    whose PSI jumps is a schema-silent semantic change: same column,
    different meaning — the failure data contracts don't catch.

    Scale: the per-type decile edges are a types x 9 frame (BROADCAST
    join back onto the stream — never a shuffle of the corpus by
    edge), binning is a codegen projection, and each type's fold runs
    over its <= 10 bin rows.  Exactness: counts exact; smoothed-share
    terms are fixed IEEE expressions; folds are bin-ordered."""
    ev = t(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.when(F.dayofmonth("ts") < _WPSI_SPLIT_DAY, "a")
        .otherwise("b")
        .alias("win"),
    )
    ev.filter(F.col("win") == "a").createOrReplaceTempView("wpsi_a_v")
    cols = ", ".join(
        f"percentile_disc({x / 10.0}) WITHIN GROUP (ORDER BY cents) AS e{x}"
        for x in range(1, 10)
    )
    edges = spark.sql(
        f"SELECT event_type, array_sort(array_distinct(array("
        f"{', '.join(f'e{x}' for x in range(1, 10))}))) AS es FROM ("
        f"SELECT event_type, {cols} FROM wpsi_a_v GROUP BY event_type)"
    )
    binned = ev.join(F.broadcast(edges), "event_type").select(
        "event_type",
        "win",
        F.size(F.filter("es", lambda e: e < F.col("cents"))).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count_if(F.col("win") == "a").alias("na"),
        F.count_if(F.col("win") == "b").alias("nb"),
    )
    packed = counts.groupBy("event_type").agg(
        F.sum("na").alias("ta"),
        F.sum("nb").alias("tb"),
        F.count(F.lit(1)).alias("k"),
        F.array_sort(F.collect_list(F.struct("bin", "na", "nb"))).alias(
            "bins"
        ),
    )

    def _term(b):
        p = (b["na"] + 0.5) / (F.col("ta") + 0.5 * F.col("k"))
        q = (b["nb"] + 0.5) / (F.col("tb") + 0.5 * F.col("k"))
        return (p - q) * F.log(p / q)

    return packed.select(
        "event_type",
        F.col("ta").cast("long").alias("n_window_a"),
        F.col("tb").cast("long").alias("n_window_b"),
        F.round(
            F.aggregate(
                F.transform("bins", _term), F.lit(0.0), lambda a, b: a + b
            ),
            6,
        ).alias("psi"),
    )


# ------------------------------------------- quantile normalization map
_QN_POINTS = (0.1, 0.25, 0.5, 0.75, 0.9)
_QN_LIST = ", ".join(str(p) for p in _QN_POINTS)


@query(
    "q_score_quantile_normalize",
    oracle=f"""
    WITH per_src0 AS (
      SELECT source,
             quantile_disc(n_chars, [{_QN_LIST}]) AS vs
      FROM documents GROUP BY source),
    per_src AS (
      SELECT source, CAST([{_QN_LIST}][g.i] AS DOUBLE) AS q,
             vs[g.i] AS src_value
      FROM per_src0,
           LATERAL (SELECT unnest(generate_series(1,
             {len(_QN_POINTS)})) AS i) g),
    gq0 AS (
      SELECT quantile_disc(n_chars, [{_QN_LIST}]) AS vs
      FROM documents),
    gq AS (
      SELECT CAST([{_QN_LIST}][g.i] AS DOUBLE) AS q,
             vs[g.i] AS global_value
      FROM gq0,
           LATERAL (SELECT unnest(generate_series(1,
             {len(_QN_POINTS)})) AS i) g)
    SELECT source, q,
           CAST(src_value AS BIGINT) AS src_value,
           CAST(global_value AS BIGINT) AS global_value,
           CAST(global_value - src_value AS BIGINT) AS shift
    FROM per_src JOIN gq USING (q)
    """,
)
def q_score_quantile_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-normalization mapping table: for each source and each
    anchor quantile, the source's own score value (here n_chars as
    the stand-in quality score) and the GLOBAL value at the same
    quantile — the piecewise-linear remap that puts every source's
    scorer on one scale before corpus mixing (a source whose p50 sits
    at another's p90 would otherwise dominate any threshold gate).
    The ``shift`` column is the correction applied at that anchor.

    Scale: both quantile frames are DISC percentiles over one scan
    each (sources x 5 and 1 x 5 rows — broadcast-sized output, which
    is the point: the map ships to executors, the corpus never
    reshuffles).  Exactness: percentile_disc picks actual member
    values — integers in, integers out, zero float anywhere."""
    d = t(spark, sf, "documents")
    d.createOrReplaceTempView("qn_docs_v")
    qcols = ", ".join(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_chars) AS q{i}"
        for i, p in enumerate(_QN_POINTS)
    )
    stack = ", ".join(
        f"{p}D, q{i}" for i, p in enumerate(_QN_POINTS)
    )
    per_src = spark.sql(
        f"SELECT source, stack({len(_QN_POINTS)}, {stack}) AS (q, src_value)"
        f" FROM (SELECT source, {qcols} FROM qn_docs_v GROUP BY source)"
    )
    glob = spark.sql(
        f"SELECT stack({len(_QN_POINTS)}, {stack}) AS (q, global_value)"
        f" FROM (SELECT {qcols} FROM qn_docs_v)"
    )
    return (
        per_src.join(F.broadcast(glob), "q")
        .select(
            "source",
            "q",
            F.col("src_value").cast("long").alias("src_value"),
            F.col("global_value").cast("long").alias("global_value"),
            (F.col("global_value") - F.col("src_value"))
            .cast("long")
            .alias("shift"),
        )
    )
