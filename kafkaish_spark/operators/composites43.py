"""Round-6 ninth wave: evaluation metrics over the pipeline's own
rankings and scores.

- rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010): the
  top-weighted agreement between two rankings of the same items —
  here the corpus term ranking by raw frequency vs by burstiness
  (within-doc mean tf), i.e. "do my two importance signals agree
  where it matters".  RBO is THE metric for comparing indefinite
  rankings (Kendall/Spearman need conjoint full lists);
- Murphy decomposition of the Brier score (Murphy, J. Appl. Met.
  1973): reliability - resolution + uncertainty == binned Brier, the
  classical calibration/sharpness split — computed over a
  deterministic length-based pseudo-forecast of a language label,
  with the IDENTITY itself emitted as a checked column (the
  decomposition is an algebraic invariant; a nonzero residual means
  the implementation is wrong).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: ranks and bin sums are exact
integers; RBO's geometric weights fold depth-ordered; every division
is one IEEE op on exact inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------------------- RBO
_RBO_P = 0.9
_RBO_K = 50


@query(
    "q_eval_rank_rbo",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents) GROUP BY doc_id, word),
    stats AS (
      SELECT word, SUM(tf) AS cf,
             CAST(SUM(tf) AS DOUBLE) / COUNT(*) AS mean_tf
      FROM tf GROUP BY word),
    ra AS (
      SELECT word, ROW_NUMBER() OVER (ORDER BY cf DESC, word) AS r
      FROM stats),
    rb AS (
      SELECT word, ROW_NUMBER() OVER (ORDER BY mean_tf DESC, word) AS r
      FROM stats),
    joined AS (
      SELECT ra.word, GREATEST(ra.r, rb.r) AS mx
      FROM ra JOIN rb USING (word)
      WHERE ra.r <= {_RBO_K} AND rb.r <= {_RBO_K}),
    depths AS (
      SELECT d,
             (SELECT COUNT(*) FROM joined WHERE mx <= d) AS x
      FROM (SELECT unnest(range(1, {_RBO_K + 1})) AS d)),
    terms AS (
      SELECT d, pow({_RBO_P}, d - 1) * x / d AS term FROM depths)
    SELECT CAST({_RBO_K} AS BIGINT) AS k,
           CAST((SELECT x FROM depths WHERE d = {_RBO_K}) AS BIGINT)
             AS overlap_at_k,
           round((1 - {_RBO_P}) * list_reduce(
             list_prepend(0.0, list(term ORDER BY d)),
             (a, b) -> a + b), 6) AS rbo_min
    FROM terms
    """,
)
def q_eval_rank_rbo(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-biased overlap (p = {p}, truncated at depth {k}) between
    the term ranking by corpus frequency and by burstiness (within-
    doc mean tf): rbo_min = (1-p) * sum_d p^(d-1) * |A_d n B_d| / d —
    the top-weighted agreement, reported with the raw top-{k}
    overlap.  The per-depth intersection sizes come from ONE
    cumulative histogram of max(rank_a, rank_b) (an item is in both
    prefixes of depth d iff its worse rank <= d) — never a per-depth
    set comparison.

    Scale: term stats are one (doc, word) + one (word) rollup; both
    rankings are TakeOrderedAndProject top-{k} frames; the depth fold
    runs over {k} rows.  Exactness: ranks and intersection counts
    exact; geometric weights fold depth-ordered; round 6."""
    d = t(spark, sf, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("word").agg(
        F.sum("tf").alias("cf"),
        (F.sum("tf").cast("double") / F.count(F.lit(1))).alias("mean_tf"),
    )
    # both rankings are bounded top-k frames: collect them (k rows —
    # the driver-scalar class) and do the depth fold in one pass
    top_a = [
        r["word"]
        for r in stats.orderBy(F.col("cf").desc(), "word")
        .limit(_RBO_K)
        .collect()
    ]
    top_b = [
        r["word"]
        for r in stats.orderBy(F.col("mean_tf").desc(), "word")
        .limit(_RBO_K)
        .collect()
    ]
    rank_a = {w: i + 1 for i, w in enumerate(top_a)}
    rank_b = {w: i + 1 for i, w in enumerate(top_b)}
    mx = sorted(
        max(rank_a[w], rank_b[w]) for w in set(top_a) & set(top_b)
    )
    rbo = 0.0
    xk = 0
    for depth in range(1, _RBO_K + 1):
        x = sum(1 for m in mx if m <= depth)
        rbo += (_RBO_P ** (depth - 1)) * x / depth
        if depth == _RBO_K:
            xk = x
    rbo *= 1 - _RBO_P
    return spark.createDataFrame(
        [(int(_RBO_K), int(xk), float(round(rbo, 6)))],
        "k long, overlap_at_k long, rbo_min double",
    )


q_eval_rank_rbo.__doc__ = q_eval_rank_rbo.__doc__.format(p=_RBO_P, k=_RBO_K)


# ------------------------------------------- Brier decomposition
_BRIER_BINS = 10
_BRIER_GRID = 999  # p = min(n_chars, 999)/999 — integer-grid forecast


@query(
    "q_ml_brier_decomposition",
    oracle=f"""
    WITH base AS (
      SELECT LEAST(n_chars, {_BRIER_GRID}) AS k,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents),
    binned AS (
      SELECT LEAST(CAST(floor(k * {_BRIER_BINS} / {_BRIER_GRID + 1})
                   AS BIGINT), {_BRIER_BINS - 1}) AS bin,
             COUNT(*) AS n, SUM(k) AS sk, SUM(y) AS sy
      FROM base GROUP BY 1),
    tot AS (SELECT SUM(n) AS nt, SUM(sy) AS syt FROM binned),
    terms AS (
      SELECT bin, n,
             n * pow(CAST(sk AS DOUBLE) / (n * {_BRIER_GRID})
                     - CAST(sy AS DOUBLE) / n, 2) AS rel_t,
             n * pow(CAST(sy AS DOUBLE) / n
                     - CAST((SELECT syt FROM tot) AS DOUBLE)
                       / (SELECT nt FROM tot), 2) AS res_t
      FROM binned),
    folded AS (
      SELECT
        list_reduce(list_prepend(0.0, list(rel_t ORDER BY bin)),
                    (a, b) -> a + b) / (SELECT nt FROM tot) AS rel,
        list_reduce(list_prepend(0.0, list(res_t ORDER BY bin)),
                    (a, b) -> a + b) / (SELECT nt FROM tot) AS res
      FROM terms),
    unc AS (
      SELECT (CAST(syt AS DOUBLE) / nt) * (1 - CAST(syt AS DOUBLE) / nt)
               AS unc
      FROM tot)
    SELECT CAST((SELECT nt FROM tot) AS BIGINT) AS n,
           round(rel, 6) AS reliability,
           round(res, 6) AS resolution,
           round((SELECT unc FROM unc), 6) AS uncertainty,
           round(rel - res + (SELECT unc FROM unc), 6)
             AS binned_brier
    FROM folded
    """,
)
def q_ml_brier_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Murphy decomposition of the Brier score for a deterministic
    length-based pseudo-forecast of "document is English": forecast
    p = min(n_chars, {g})/{g} in {b} bins, REL = mean squared gap
    between each bin's mean forecast and its observed rate
    (calibration error), RES = how far bin outcomes spread from the
    base rate (sharpness that pays), UNC = base-rate variance — and
    the emitted binned_brier = REL - RES + UNC, which EQUALS the
    Brier score of the binned forecast by algebra (the replay test
    pins the identity to the 1e-6 rounding).  The table
    q_ml_calibration_bins plots; this is its one-row summary with
    the decomposition made explicit.

    Scale: one scan into {b} integer bin cells, folds over the bin
    frame.  Exactness: forecasts live on the /{g} integer grid, so
    bin sums are exact; every term is a fixed IEEE expression of
    exact integers, folded bin-ordered."""
    d = t(spark, sf, "documents")
    base = d.select(
        F.least(F.col("n_chars"), F.lit(_BRIER_GRID)).alias("k"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = base.select(
        F.least(
            F.floor(
                F.col("k") * _BRIER_BINS / (_BRIER_GRID + 1)
            ).cast("long"),
            F.lit(_BRIER_BINS - 1).cast("long"),
        ).alias("bin"),
        "k",
        "y",
    ).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum("y").alias("sy"),
    )
    packed = binned.agg(
        F.sum("n").alias("nt"),
        F.sum("sy").alias("syt"),
        F.array_sort(
            F.collect_list(F.struct("bin", "n", "sk", "sy"))
        ).alias("bins"),
    )
    obar = F.col("syt").cast("double") / F.col("nt")

    def _rel(b):
        return b["n"] * F.pow(
            b["sk"].cast("double") / (b["n"] * _BRIER_GRID)
            - b["sy"].cast("double") / b["n"],
            F.lit(2.0),
        )

    def _res(b):
        return b["n"] * F.pow(
            b["sy"].cast("double") / b["n"] - obar, F.lit(2.0)
        )

    rel = (
        F.aggregate(
            F.transform("bins", _rel), F.lit(0.0), lambda a, x: a + x
        )
        / F.col("nt")
    )
    res = (
        F.aggregate(
            F.transform("bins", _res), F.lit(0.0), lambda a, x: a + x
        )
        / F.col("nt")
    )
    unc = obar * (1 - obar)
    return packed.select(
        F.col("nt").cast("long").alias("n"),
        F.round(rel, 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(unc, 6).alias("uncertainty"),
        F.round(rel - res + unc, 6).alias("binned_brier"),
    )


q_ml_brier_decomposition.__doc__ = q_ml_brier_decomposition.__doc__.format(
    g=_BRIER_GRID, b=_BRIER_BINS
)
