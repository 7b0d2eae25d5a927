"""Round-9 wave 6: FULL quantile normalization across sources via the
sort-free CDF machinery of the rank-correlation wave (composites54):
ONE hash aggregate to bounded (value, count) cells, cumulative
marginals on the bounded cell frame, exact integer rank arithmetic,
never a row-level rank or global sort.

``q_corpus_quantile_norm`` maps EVERY per-source document length onto
the POOLED length distribution — the standard "make source
distributions comparable" transform (microarray normalization
lineage) a corpus mixer applies before setting per-source thresholds:
a doc at its source's median maps to the pooled median even if the
source skews long.  This is the exact full remap; the existing
``q_score_quantile_normalize`` (composites38) is its broadcast-sized
sibling — a 5-anchor piecewise-linear mapping TABLE for shipping to
executors; this query materializes the complete discrete mapping and
proves it end-to-end (per-source normalized means converge to the
pooled mean).  Mechanics: each source cell's tie-averaged rank
(half-unit integer r2 = 2*cum + cnt + 1 over 2*n_s) is rescaled to
the pooled axis by CROSS MULTIPLICATION (r2 * N vs boundary * 2*n_s —
exact BIGINTs, no division), and a band join onto the pooled
cumulative intervals picks the pooled value whose CDF interval
contains the scaled rank (percentile_disc semantics).  Both cell
frames are bounded by the value domain, so the band join is
broadcast-tiny.

Exactness limit stated honestly: the cross-multiplied rank products
are exact in BIGINT to ~1e9 x 1e9 rows; upgrade to decimal(38,0)
beyond.

Reference parity: [NS] — north-star corpus-prep analytics; the
reference (/root/reference/src/topic.js) is pub/sub only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_QN_ORACLE = """
    WITH cells AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY source, n_chars),
    src AS (
      SELECT source, v, cnt,
             COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
             SUM(cnt) OVER (PARTITION BY source) AS ns
      FROM cells),
    pooled AS (
      SELECT v, SUM(cnt) AS pcnt FROM cells GROUP BY v),
    pcdf AS (
      SELECT v AS pv, pcnt,
             COALESCE(SUM(pcnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pcum,
             SUM(pcnt) OVER () AS n
      FROM pooled),
    mapped AS (
      SELECT s.source, s.cnt, s.v, p.pv
      FROM src s JOIN pcdf p
        ON (2 * s.cum + s.cnt + 1) * p.n >  2 * p.pcum * s.ns
       AND (2 * s.cum + s.cnt + 1) * p.n <= 2 * (p.pcum + p.pcnt) * s.ns)
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_docs,
           round(CAST(SUM(cnt * v) AS DOUBLE) / SUM(cnt), 6) AS mean_raw,
           round(CAST(SUM(cnt * pv) AS DOUBLE) / SUM(cnt), 6) AS mean_norm
    FROM mapped GROUP BY source ORDER BY source
"""


@query("q_corpus_quantile_norm", oracle=_QN_ORACLE)
def q_corpus_quantile_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-normalize per-source document length onto the pooled
    distribution: each (source, length) cell's tie-averaged rank is
    rescaled to the pooled axis by exact cross multiplication and
    band-joined onto the pooled CDF intervals (percentile_disc pick).
    Report per source: docs, raw mean length, normalized mean length
    — after normalization the means converge toward the pooled mean,
    which is the point.  Scale: one hash aggregate to (source, value)
    cells + bounded-frame windows + a broadcast band join between two
    value-domain-bounded frames; sums exact integers, means one
    division rounded to 6 (BIGINT rank products exact to ~1e9 x 1e9
    rows; upgrade to decimal(38,0) beyond)."""
    d = t(spark, sf, "documents")
    cells = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    ws = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    src = cells.select(
        "source",
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(ws), F.lit(0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("source")).alias("ns"),
    )
    pooled = cells.groupBy("v").agg(F.sum("cnt").alias("pcnt"))
    wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    total = pooled.agg(F.sum("pcnt").alias("n"))
    pcdf = pooled.select(
        F.col("v").alias("pv"),
        "pcnt",
        F.coalesce(F.sum("pcnt").over(wp), F.lit(0)).alias("pcum"),
    ).crossJoin(F.broadcast(total))
    r2n = (2 * F.col("cum") + F.col("cnt") + 1) * F.col("n")
    mapped = src.join(
        F.broadcast(pcdf),
        (r2n > 2 * F.col("pcum") * F.col("ns"))
        & (r2n <= 2 * (F.col("pcum") + F.col("pcnt")) * F.col("ns")),
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("cnt") * F.col("v")).cast("double")
                / F.sum("cnt"),
                6,
            ).alias("mean_raw"),
            F.round(
                F.sum(F.col("cnt") * F.col("pv")).cast("double")
                / F.sum("cnt"),
                6,
            ).alias("mean_norm"),
        )
        .orderBy("source")
    )
