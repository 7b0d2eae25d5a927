"""Round-12 wave 2: evaluation metrics, calibrated prediction, and
fuzzy matching — the quality-measurement layer of a training-data
pipeline.

Seven operators the registry did not yet cover:

- ROUGE-N summary overlap (the generation-eval counterpart of the
  existing BLEU query) micro-averaged per source;
- a severity-lexicon screen (the toxicity/profanity-gate shape every
  corpus filter chain runs, with a deterministic in-repo lexicon);
- Cohen's kappa inter-rater agreement between two label rules (the
  annotation-QA metric);
- mutual information between two categorical columns (the
  feature-dependency audit, same ordered-fold exactness recipe as
  q_text_token_entropy);
- pinball (quantile) loss scoring of candidate predictors — the
  evaluation side of quantile regression, demonstrating the loss is
  minimized by the true tau-quantile;
- split-conformal prediction intervals with finite-sample coverage
  measured on a held-out half (Vovk et al.; the modern distribution-free
  calibration wrapper) — fully exact via half-unit medians and
  discrete-CDF residual quantiles;
- Jaro-Winkler fuzzy matching within dictionary blocks, the classic
  entity-resolution similarity (complements the levenshtein /
  ngram-jaccard / FastSS family) via an Arrow-batched pandas UDF that
  reproduces the oracle's builtin bit-for-bit.

Reference parity note: the reference engine (steveliles/kafkaish,
src/topic.js) has no analytics surface — this is north-star capability
work like the rest of the ML/eval family.

Exactness: everything integer until one mirrored IEEE composition
(see functions/exact.py and the house rules in SURVEY.md §6); the only
cross-row float sums fold sorted bounded arrays left-to-right on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ---- ROUGE: lead-K summary vs the document body -----------------------
_LEAD_K = 8  # candidate "summary" = first 8 tokens; reference = the rest
_MIN_TOKS = 16  # need a non-trivial reference tail

# ---- lexicon screen: severity-weighted blocklist ----------------------
# The corpus vocabulary is synthetic, so the lexicon is too — the
# OPERATOR is the real thing (a toxicity/profanity gate is exactly a
# severity-weighted token-count screen).  Flag when weighted density
# exceeds 1/_LEX_MULT of the token count.
_LEXICON = (("dup", 5), ("slow", 2))
_LEX_MULT = 10

# ---- Cohen's kappa rater rules ----------------------------------------
_KAPPA_CHARS = 300  # rater A: long document by characters
_KAPPA_TOKS = 50  # rater B: long document by tokens

# ---- Jaro-Winkler fuzzy matching --------------------------------------
_JW_THRESH = 0.84


@query(
    "q_text_rouge_lead_summary",
    oracle=f"""
    WITH base AS (
      SELECT source, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= {_MIN_TOKS}),
    split_ AS (
      SELECT source,
             list_slice(toks, 1, {_LEAD_K}) AS cand,
             list_slice(toks, {_LEAD_K + 1}, len(toks)) AS ref
      FROM base),
    feats AS (
      SELECT source,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(list_distinct(cand),
            w -> least(len(list_filter(cand, x -> x = w)),
                       len(list_filter(ref, x -> x = w))))),
          (a, b) -> a + b) AS ov1,
        len(ref) AS ref1,
        list_transform(range(1, {_LEAD_K}),
                       i -> cand[i] || ' ' || cand[i+1]) AS candb,
        list_transform(range(1, len(ref)),
                       i -> ref[i] || ' ' || ref[i+1]) AS refb
      FROM split_),
    feats2 AS (
      SELECT source, ov1, ref1,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(list_distinct(candb),
            w -> least(len(list_filter(candb, x -> x = w)),
                       len(list_filter(refb, x -> x = w))))),
          (a, b) -> a + b) AS ov2,
        len(refb) AS ref2
      FROM feats)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(ov1) AS BIGINT) AS ov1,
      CAST(SUM(ref1) AS BIGINT) AS ref1,
      round(CAST(SUM(ov1) AS DOUBLE) / CAST(SUM(ref1) AS BIGINT), 6)
        AS rouge1_recall,
      CAST(SUM(ov2) AS BIGINT) AS ov2,
      CAST(SUM(ref2) AS BIGINT) AS ref2,
      round(CAST(SUM(ov2) AS DOUBLE) / CAST(SUM(ref2) AS BIGINT), 6)
        AS rouge2_recall
    FROM feats2 GROUP BY source
    """,
)
def q_text_rouge_lead_summary(spark: SparkSession, sf: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 recall of the lead-{_LEAD_K} "summary" against
    the rest of each document, micro-averaged per source (Lin 2004) —
    the generation-eval counterpart of q_eval_bleu_selfref: clipped
    n-gram overlap counts stay exact BIGINTs per doc, summed per source,
    with ONE final division (micro-averaging instead of mean-of-ratios
    keeps the whole statistic on the integer grid until the last op).

    Scale shape: per-row array HOFs over <=100-token docs (no explode,
    no join — the n-gram multisets never leave the row), then one
    source-keyed partial aggregate.  Embarrassingly parallel."""
    d = t(spark, sf, "documents")
    base = d.select(
        "source", F.split("text", " ").alias("toks")
    ).filter(F.size("toks") >= _MIN_TOKS)
    k = _LEAD_K
    split_ = base.select(
        "source",
        F.expr(f"slice(toks, 1, {k})").alias("cand"),
        F.expr(f"slice(toks, {k + 1}, size(toks) - {k})").alias("ref"),
    )
    clipped = (
        "aggregate(array_distinct({c}), 0L, (a, w) -> a + "
        "least(size(filter({c}, x -> x = w)), "
        "size(filter({r}, x -> x = w))))"
    )
    feats = split_.select(
        "source",
        F.expr(clipped.format(c="cand", r="ref")).alias("ov1"),
        F.size("ref").cast("long").alias("ref1"),
        F.expr(
            f"transform(sequence(1, {k - 1}), "
            "i -> concat(element_at(cand, i), ' ', element_at(cand, i + 1)))"
        ).alias("candb"),
        F.expr(
            "transform(sequence(1, size(ref) - 1), "
            "i -> concat(element_at(ref, i), ' ', element_at(ref, i + 1)))"
        ).alias("refb"),
    ).select(
        "source",
        "ov1",
        "ref1",
        F.expr(clipped.format(c="candb", r="refb")).alias("ov2"),
        F.size("refb").cast("long").alias("ref2"),
    )
    g = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ov1").cast("long").alias("ov1"),
        F.sum("ref1").cast("long").alias("ref1"),
        F.sum("ov2").cast("long").alias("ov2"),
        F.sum("ref2").cast("long").alias("ref2"),
    )
    return g.select(
        "source",
        "n_docs",
        "ov1",
        "ref1",
        F.round(F.col("ov1").cast("double") / F.col("ref1"), 6).alias(
            "rouge1_recall"
        ),
        "ov2",
        "ref2",
        F.round(F.col("ov2").cast("double") / F.col("ref2"), 6).alias(
            "rouge2_recall"
        ),
    )


def _lex_score_sql(toks: str) -> str:
    """Severity-weighted hit count over the blocklist — same fragment
    shape on both engines (len/list_filter vs size/filter)."""
    return " + ".join(
        f"{w} * len(list_filter({toks}, x -> x = '{word}'))"
        for word, w in _LEXICON
    )


@query(
    "q_text_lexicon_screen",
    oracle=f"""
    WITH d AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT source, len(toks) AS ntok,
             {_lex_score_sql('toks')} AS score
      FROM d)
    SELECT source, COUNT(*) AS n_docs,
      CAST(SUM(CASE WHEN score * {_LEX_MULT} > ntok THEN 1 ELSE 0 END)
           AS BIGINT) AS flagged_docs,
      CAST(SUM(score) AS BIGINT) AS total_score,
      CAST(SUM(ntok) AS BIGINT) AS total_toks,
      round(CAST(SUM(CASE WHEN score * {_LEX_MULT} > ntok THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS flag_rate,
      round(CAST(SUM(score) AS DOUBLE) / CAST(SUM(ntok) AS BIGINT), 6)
        AS mean_density
    FROM s GROUP BY source
    """,
)
def q_text_lexicon_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Severity-lexicon screen — the toxicity/profanity/PII-keyword gate
    of a corpus filter chain: per doc, a severity-weighted count of
    blocklisted tokens; a doc is flagged when the weighted density
    exceeds 1/{_LEX_MULT}.  Per source: flag rate and micro-averaged
    density, both single divisions of exact BIGINTs.

    The lexicon is deterministic and in-repo (the vocabulary is
    synthetic); a production list drops in without changing the plan:
    per-row HOF scoring, one source-keyed aggregate, no shuffle beyond
    the 20-source rollup."""
    d = t(spark, sf, "documents")
    score_sql = " + ".join(
        f"{w} * size(filter(toks, x -> x = '{word}'))"
        for word, w in _LEXICON
    )
    s = d.select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("ntok"),
        F.expr(
            score_sql.replace("toks", "split(text, ' ')")
        ).cast("long").alias("score"),
    )
    flagged = F.when(
        F.col("score") * _LEX_MULT > F.col("ntok"), F.lit(1)
    ).otherwise(F.lit(0))
    g = s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(flagged).cast("long").alias("flagged_docs"),
        F.sum("score").cast("long").alias("total_score"),
        F.sum("ntok").cast("long").alias("total_toks"),
    )
    return g.select(
        "source",
        "n_docs",
        "flagged_docs",
        "total_score",
        "total_toks",
        F.round(
            F.col("flagged_docs").cast("double") / F.col("n_docs"), 6
        ).alias("flag_rate"),
        F.round(
            F.col("total_score").cast("double") / F.col("total_toks"), 6
        ).alias("mean_density"),
    )


@query(
    "q_ml_cohen_kappa",
    oracle=f"""
    WITH r AS (
      SELECT CASE WHEN n_chars >= {_KAPPA_CHARS} THEN 1 ELSE 0 END AS ra,
             CASE WHEN len(string_split(text, ' ')) >= {_KAPPA_TOKS}
                  THEN 1 ELSE 0 END AS rb
      FROM documents),
    c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ra * rb) AS BIGINT) AS n11,
             CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
             CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
             CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
      FROM r)
    SELECT n, n11, n10, n01, n00,
      round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
      round(CAST((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00) AS DOUBLE)
            / (n * n), 6) AS pe,
      round(CAST(n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))
                 AS DOUBLE)
            / (n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))), 6)
        AS kappa
    FROM c
    """,
)
def q_ml_cohen_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa agreement between two deterministic document
    raters (chars >= {_KAPPA_CHARS} vs tokens >= {_KAPPA_TOKS}) — the
    annotation-QA statistic every labeling pipeline reports (Cohen
    1960).  kappa = (po - pe) / (1 - pe) is a RATIO OF INTEGERS:
    numerator N*(n11+n00) - (a1*b1 + a0*b0), denominator N^2 - (a1*b1
    + a0*b0), so the whole statistic is one exact-int division.  One
    conditional-aggregation scan, one row out."""
    d = t(spark, sf, "documents")
    ra = F.when(F.col("n_chars") >= _KAPPA_CHARS, 1).otherwise(0)
    rb = F.when(
        F.size(F.split("text", " ")) >= _KAPPA_TOKS, 1
    ).otherwise(0)
    r = d.select(ra.alias("ra"), rb.alias("rb"))
    c = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).cast("long").alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).cast("long").alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).cast("long").alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb")))
        .cast("long")
        .alias("n00"),
    )
    n = F.col("n")
    chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round((F.col("n11") + F.col("n00")).cast("double") / n, 6).alias(
            "po"
        ),
        F.round(chance.cast("double") / (n * n), 6).alias("pe"),
        F.round(
            (n * (F.col("n11") + F.col("n00")) - chance).cast("double")
            / (n * n - chance),
            6,
        ).alias("kappa"),
    )


@query(
    "q_ml_mutual_information",
    oracle="""
    WITH o AS (SELECT o_orderpriority AS p, o_orderstatus AS s FROM orders),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
    cells AS (SELECT p, s, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY p, s),
    px AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS cx FROM o GROUP BY p),
    py AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS cy FROM o GROUP BY s),
    terms AS (
      SELECT cells.p, cells.s,
             (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) * n
               / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))) AS t
      FROM cells JOIN px USING (p) JOIN py USING (s) CROSS JOIN tot),
    mi AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
             list_reduce(list_prepend(0.0, list(t ORDER BY p, s)),
                         (a, b) -> a + b) AS mi_nats
      FROM terms),
    hx AS (
      SELECT list_reduce(list_prepend(0.0,
               list(-(CAST(cx AS DOUBLE) / n) * ln(CAST(cx AS DOUBLE) / n)
                    ORDER BY p)), (a, b) -> a + b) AS h_prio
      FROM px CROSS JOIN tot),
    hy AS (
      SELECT list_reduce(list_prepend(0.0,
               list(-(CAST(cy AS DOUBLE) / n) * ln(CAST(cy AS DOUBLE) / n)
                    ORDER BY s)), (a, b) -> a + b) AS h_status
      FROM py CROSS JOIN tot)
    SELECT n, n_cells, round(mi_nats, 6) AS mi_nats,
           round(h_prio, 6) AS h_prio, round(h_status, 6) AS h_status,
           round(mi_nats / sqrt(h_prio * h_status), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot
    """,
)
def q_ml_mutual_information(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information between order priority and status — the
    feature-dependency audit (is this column informative about that
    one?), plus both marginal entropies and the normalized MI
    (nmi = MI / sqrt(Hx*Hy)).  Same exactness recipe as
    q_text_token_entropy: every ln argument is a ratio of exact
    BIGINTs, each bounded term frame (15 cells, 5+3 marginals — bounded
    by the CATEGORY DOMAIN, not the data) folds in sorted order on both
    engines, and 0.0 + x == x makes Spark's seeded fold equal DuckDB's
    seedless one.  One fact scan feeds all three aggregates; at 100 TB
    the shuffles carry only category-sized frames."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("p"),
        F.col("o_orderstatus").alias("s"),
    )
    tot = o.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = o.groupBy("p", "s").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    px = o.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("cx"))
    py = o.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("cy"))
    nd = F.col("n").cast("double")
    terms = (
        cells.join(F.broadcast(px), "p")
        .join(F.broadcast(py), "s")
        .crossJoin(F.broadcast(tot))
        .select(
            "p",
            "s",
            (
                (F.col("c").cast("double") / nd)
                * F.log(
                    F.col("c").cast("double")
                    * nd
                    / (F.col("cx").cast("double") * F.col("cy").cast("double"))
                )
            ).alias("t"),
        )
    )
    from kafkaish_spark.functions.folds import ordered_sum

    mi = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ordered_sum(F.struct("p", "s"), F.col("t")).alias("mi_nats"),
    )
    hx = px.crossJoin(F.broadcast(tot)).agg(
        ordered_sum(
            F.col("p"),
            -(F.col("cx").cast("double") / nd)
            * F.log(F.col("cx").cast("double") / nd),
        ).alias("h_prio")
    )
    hy = py.crossJoin(F.broadcast(tot)).agg(
        ordered_sum(
            F.col("s"),
            -(F.col("cy").cast("double") / nd)
            * F.log(F.col("cy").cast("double") / nd),
        ).alias("h_status")
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .crossJoin(tot)
        .select(
            "n",
            "n_cells",
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_prio", 6).alias("h_prio"),
            F.round("h_status", 6).alias("h_status"),
            F.round(
                F.col("mi_nats")
                / F.sqrt(F.col("h_prio") * F.col("h_status")),
                6,
            ).alias("nmi"),
        )
    )


@query(
    "q_ml_pinball_quantile",
    oracle="""
    WITH o AS (SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
               FROM orders),
    cv AS (
      SELECT 'p50' AS label, CAST(quantile_disc(v, 0.5) AS BIGINT) AS cand
        FROM o
      UNION ALL
      SELECT 'p90', CAST(quantile_disc(v, 0.9) AS BIGINT) FROM o
      UNION ALL
      SELECT 'p99', CAST(quantile_disc(v, 0.99) AS BIGINT) FROM o),
    loss AS (
      SELECT label, cand,
             CAST(SUM(CASE WHEN v > cand THEN 9 * (v - cand)
                           ELSE cand - v END) AS BIGINT) AS pinball_x10
      FROM o CROSS JOIN cv GROUP BY label, cand)
    SELECT label, cand AS cand_cents, pinball_x10,
           CAST(row_number() OVER (ORDER BY pinball_x10, label) AS BIGINT)
             AS rk
    FROM loss
    """,
)
def q_ml_pinball_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Pinball (quantile) loss at tau = 0.9 for three candidate
    predictors of order value — the evaluation side of quantile
    regression (Koenker & Bassett 1978): L_tau(y, q) = tau*(y-q)+ +
    (1-tau)*(q-y)+, scaled x10 so every per-row loss is an exact
    BIGINT in cents (weights 9 and 1).  The p90 member value minimizes
    the loss — rank 1 in the output — which is the property that makes
    pinball the right scoring rule for quantile forecasts.

    Scale shape: candidates come from percentile_disc (one mergeable
    aggregate, no global window), then ONE fact scan against the
    broadcast 3-row candidate frame; the final rank is a 3-row window."""
    o = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v")
    )
    o.createOrReplaceTempView("pinball_orders_v")
    cv = spark.sql(
        """
        SELECT 'p50' AS label,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                    AS BIGINT) AS cand
          FROM pinball_orders_v
        UNION ALL
        SELECT 'p90', CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v)
                           AS BIGINT)
          FROM pinball_orders_v
        UNION ALL
        SELECT 'p99', CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY v)
                           AS BIGINT)
          FROM pinball_orders_v
        """
    )
    loss = (
        o.crossJoin(F.broadcast(cv))
        .groupBy("label", "cand")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > F.col("cand"),
                    9 * (F.col("v") - F.col("cand")),
                ).otherwise(F.col("cand") - F.col("v"))
            )
            .cast("long")
            .alias("pinball_x10")
        )
    )
    w = Window.orderBy("pinball_x10", "label")
    return loss.select(
        "label",
        F.col("cand").alias("cand_cents"),
        "pinball_x10",
        F.row_number().over(w).cast("long").alias("rk"),
    )


@query(
    "q_ml_conformal_interval",
    oracle="""
    WITH o AS (SELECT o_orderpriority AS p, o_orderkey AS k,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
               FROM orders),
    cal AS (SELECT p, v FROM o WHERE k % 2 = 0),
    tst AS (SELECT p, v FROM o WHERE k % 2 = 1),
    cells AS (SELECT p, v, COUNT(*) AS cnt FROM cal GROUP BY p, v),
    cdf AS (SELECT p, v, SUM(cnt) OVER (PARTITION BY p ORDER BY v) AS cum,
                   SUM(cnt) OVER (PARTITION BY p) AS n FROM cells),
    med AS (SELECT p, MIN(CASE WHEN 2 * cum >= n THEN v END)
                   + MIN(CASE WHEN 2 * cum >= n + 1 THEN v END) AS med2
            FROM cdf GROUP BY p),
    res AS (SELECT c.p, abs(2 * c.v - m.med2) AS r2, c.cnt
            FROM cells c JOIN med m ON c.p = m.p),
    rcells AS (SELECT p, r2, SUM(cnt) AS cnt FROM res GROUP BY p, r2),
    rcdf AS (SELECT p, r2,
                    SUM(cnt) OVER (PARTITION BY p ORDER BY r2) AS cum,
                    SUM(cnt) OVER (PARTITION BY p) AS n_cal FROM rcells),
    q AS (SELECT p, CAST(MIN(n_cal) AS BIGINT) AS n_cal,
                 coalesce(MIN(CASE WHEN cum >=
                     CAST(floor(((n_cal + 1) * 9 + 9) / 10.0) AS BIGINT)
                     THEN r2 END), MAX(r2)) AS qhat2
          FROM rcdf GROUP BY p),
    cov AS (SELECT t.p, CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN abs(2 * t.v - m.med2) <= q.qhat2
                                 THEN 1 ELSE 0 END) AS BIGINT) AS covered
            FROM tst t JOIN med m ON t.p = m.p JOIN q ON t.p = q.p
            GROUP BY t.p)
    SELECT q.p AS priority, q.n_cal, cov.n_test,
           CAST(m.med2 AS BIGINT) AS med2,
           CAST(q.qhat2 AS BIGINT) AS qhat2, cov.covered,
           round(CAST(cov.covered AS DOUBLE) / cov.n_test, 6) AS cover_rate
    FROM q JOIN med m ON q.p = m.p JOIN cov ON q.p = cov.p
    """,
)
def q_ml_conformal_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal prediction intervals per order priority (Vovk et
    al.; Lei et al. 2018): fit on the even-orderkey half (predictor =
    exact half-unit median, the composites56 med2 pattern), calibrate
    qhat as the ceil(0.9*(n+1))-th smallest absolute residual (the
    finite-sample-valid quantile, NOT percentile_disc(0.9)), then
    measure empirical coverage on the held-out odd half — which lands
    at ~0.9 by the conformal guarantee.

    Everything stays on the integer grid: residuals are |2v - med2|
    half-units, the calibration rank k = ceil(0.9*(n+1)) is computed as
    floor((9*(n+1)+9)/10.0) (exact for n << 2^49), coverage is one
    final division.  Scale shape: windows partition by the 5-value
    priority domain over DISTINCT-value cells (bounded by the price
    grid, not row count); both fact scans aggregate before any join."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("p"),
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    cal = o.filter(F.col("k") % 2 == 0).select("p", "v")
    tst = o.filter(F.col("k") % 2 == 1).select("p", "v")
    cells = cal.groupBy("p", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("p")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("p")
    cdf = cells.select(
        "p",
        "v",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = cdf.groupBy("p").agg(
        (
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("v")))
            + F.min(F.when(2 * F.col("cum") >= F.col("n") + 1, F.col("v")))
        ).alias("med2")
    )
    res = cells.join(F.broadcast(med), "p").select(
        "p", F.abs(2 * F.col("v") - F.col("med2")).alias("r2"), "cnt"
    )
    rcells = res.groupBy("p", "r2").agg(F.sum("cnt").alias("cnt"))
    wrcum = (
        Window.partitionBy("p")
        .orderBy("r2")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rcdf = rcells.select(
        "p",
        "r2",
        F.sum("cnt").over(wrcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n_cal"),
    )
    k_rank = F.floor(
        ((F.col("n_cal") + 1) * 9 + 9) / F.lit(10.0)
    ).cast("long")
    q = rcdf.groupBy("p").agg(
        F.min("n_cal").cast("long").alias("n_cal"),
        F.coalesce(
            F.min(F.when(F.col("cum") >= k_rank, F.col("r2"))),
            F.max("r2"),
        ).alias("qhat2"),
    )
    cov = (
        tst.join(F.broadcast(med), "p")
        .join(F.broadcast(q.select("p", "qhat2")), "p")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(2 * F.col("v") - F.col("med2"))
                    <= F.col("qhat2"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        q.join(med, "p")
        .join(cov, "p")
        .select(
            F.col("p").alias("priority"),
            "n_cal",
            "n_test",
            F.col("med2").cast("long").alias("med2"),
            F.col("qhat2").cast("long").alias("qhat2"),
            "covered",
            F.round(
                F.col("covered").cast("double") / F.col("n_test"), 6
            ).alias("cover_rate"),
        )
    )


# ---------------------------------------------------------------- Jaro-Winkler
def _jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler similarity, matching DuckDB's builtin bit-for-bit
    (standard Winkler variant: prefix up to 4, p = 0.1, boost only when
    jaro > 0.7; empty strings similar to nothing) — fuzz-pinned against
    jaro_winkler_similarity in tests/test_composites62.py."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    win = max(l1, l2) // 2 - 1
    if win < 0:
        win = 0
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - win), min(l2, i + win + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(l1):
        if m1[i]:
            while not m2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    t //= 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    pre = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        pre += 1
    return jaro + pre * 0.1 * (1.0 - jaro)


def _jw_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def jw(a, b):
        return pd.Series(
            [_jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    return pandas_udf(jw, "double")


@query(
    "q_dedup_jaro_winkler_parts",
    oracle=f"""
    WITH names AS (
      SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
             string_split(p_name, ' ')[-1] AS noun
      FROM part GROUP BY p_name),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b,
             a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
             round(jaro_winkler_similarity(a.name, b.name), 6) AS jw_sim
      FROM names a JOIN names b ON a.noun = b.noun AND a.name < b.name)
    SELECT name_a, name_b, n_parts_a, n_parts_b, jw_sim
    FROM pairs WHERE jw_sim >= {_JW_THRESH}
    """,
)
def q_dedup_jaro_winkler_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Jaro-Winkler fuzzy matching over part names — the classic
    entity-resolution similarity (Winkler 1990, the Census record-
    linkage metric), completing the string-similarity family next to
    levenshtein (FastSS), ngram-jaccard, and containment.  Names are
    blocked on their final token (the noun) so candidate pairs are
    bounded by dictionary-block size — never all-pairs — exactly how a
    100 TB ER pass blocks before scoring.

    Spark has no builtin JW, so scoring is an Arrow-batched pandas UDF
    over the DISTINCT-name pair frame (dictionary-sized: the candidate
    set collapses to unique names BEFORE any pairing, so the UDF sees
    dozens of rows while the corpus can be billions).  _jaro_winkler
    reproduces the oracle's builtin bit-for-bit (fuzz-pinned in
    tests/test_composites62.py), making this the rare UDF query that
    still hash-matches a DuckDB oracle."""
    p = t(spark, sf, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    ).withColumn("noun", F.element_at(F.split("name", " "), -1))
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "noun",
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        "noun",
    )
    jw = _jw_udf()
    pairs = (
        a.join(b, "noun")
        .filter(F.col("name_a") < F.col("name_b"))
        .select(
            "name_a",
            "name_b",
            "n_parts_a",
            "n_parts_b",
            F.round(jw(F.col("name_a"), F.col("name_b")), 6).alias(
                "jw_sim"
            ),
        )
    )
    return pairs.filter(F.col("jw_sim") >= _JW_THRESH)
