"""Round-6 third wave: distributional distance, embedding health, and
corpus diversity — the remaining columns of the drift/QA dashboard
started in composites35.

- Kolmogorov-Smirnov statistic + 1-D Wasserstein (earth-mover)
  distance between two periods of a numeric column over a FIXED
  integer bin grid — the two classical CDF-space drift measures
  complementing PSI's share-space one (KS: max gap, most sensitive
  mid-distribution; W1: area between CDFs, in value units);
- per-dimension embedding health: integer-grid mean/std per dim,
  dead-dimension count, and the max/min spread ratio — the
  encoder-health table checked before an ANN index rebuild
  (a dead or exploding dimension silently poisons cosine metrics);
- self-overlap diversity (a self-BLEU-lite): clipped bigram precision
  between consecutive documents — the corpus-diversity number
  synthetic-data pipelines watch (rising self-overlap = mode
  collapse in the generator).

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes none of these — [NS] north-star
extensions per SURVEY.md §2.4.  House exactness: bin/bigram counts
are exact BIGINTs, CDF terms fold in bin order, every division is
one IEEE op on exact inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ----------------------------------------------- KS + Wasserstein drift
# Fixed equi-width grid in integer cents: [0, 500_000_00) in 1000 bins
# of 500_00 cents — FIXED bins (not reference quantiles) so the two
# sides histogram independently in one pass and the distance is a pure
# post-aggregation fold; the grid is part of the operator contract,
# like every production drift monitor's.
_KSW_REF_Y, _KSW_CUR_Y = 1996, 1997
_KSW_BIN_CENTS = 500_00
_KSW_NBINS = 1000


@query(
    "q_drift_ks_wasserstein",
    oracle=f"""
    WITH binned AS (
      SELECT LEAST(CAST(floor(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         / {_KSW_BIN_CENTS}) AS BIGINT),
                   {_KSW_NBINS - 1}) AS bin,
             count_if(EXTRACT(year FROM o_orderdate) = {_KSW_REF_Y})
               AS n_ref,
             count_if(EXTRACT(year FROM o_orderdate) = {_KSW_CUR_Y})
               AS n_cur
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate)
              IN ({_KSW_REF_Y}, {_KSW_CUR_Y})
      GROUP BY 1),
    tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM binned),
    cdf AS (
      SELECT bin,
             SUM(n_ref) OVER (ORDER BY bin) / (SELECT CAST(tr AS DOUBLE)
                                               FROM tot) AS fa,
             SUM(n_cur) OVER (ORDER BY bin) / (SELECT CAST(tc AS DOUBLE)
                                               FROM tot) AS fb
      FROM binned)
    SELECT CAST((SELECT tr FROM tot) AS BIGINT) AS n_ref,
           CAST((SELECT tc FROM tot) AS BIGINT) AS n_cur,
           round(MAX(abs(fa - fb)), 6) AS ks_stat,
           round(list_reduce(list_prepend(0.0,
             list(abs(fa - fb) * {_KSW_BIN_CENTS} / 100.0 ORDER BY bin)),
             (a, b) -> a + b), 6) AS wasserstein_1d
    FROM cdf
    """,
)
def q_drift_ks_wasserstein(spark: SparkSession, sf: str) -> DataFrame:
    """KS statistic and 1-D Wasserstein distance between the
    {r} and {c} order-price distributions over a fixed
    {n}-bin integer-cent grid: KS = max CDF gap (the classical
    two-sample drift test statistic), W1 = sum of CDF gaps x bin
    width (the earth-mover cost in price units — "how many dollars
    would it take to morph last year's distribution into this
    year's").  PSI (q_drift_psi_orders) reads share-space; these two
    read CDF-space — together the standard drift dashboard row.

    Scale: ONE linear scan histograms both sides simultaneously
    (count_if per side), the CDF prefix runs over the <= {n}-row bin
    frame, and the distances fold that same bounded frame in bin
    order.  Exactness: bin counts exact; each CDF value is one
    division of exact ints; the W1 fold is bin-ordered."""
    o = t(spark, sf, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.year("o_orderdate").alias("y"),
    ).filter(F.col("y").isin(_KSW_REF_Y, _KSW_CUR_Y))
    binned = o.select(
        F.least(
            F.floor(F.col("cents") / _KSW_BIN_CENTS).cast("long"),
            F.lit(_KSW_NBINS - 1).cast("long"),
        ).alias("bin"),
        "y",
    ).groupBy("bin").agg(
        F.count_if(F.col("y") == _KSW_REF_Y).alias("n_ref"),
        F.count_if(F.col("y") == _KSW_CUR_Y).alias("n_cur"),
    )
    packed = binned.agg(
        F.sum("n_ref").alias("tr"),
        F.sum("n_cur").alias("tc"),
        F.array_sort(
            F.collect_list(F.struct("bin", "n_ref", "n_cur"))
        ).alias("bins"),
    )
    # running CDFs over the bin-sorted array: two integer prefix sums
    # realized as one fold carrying (ca, cb, maxgap, w1)
    fold = F.aggregate(
        "bins",
        F.struct(
            F.lit(0).cast("long").alias("ca"),
            F.lit(0).cast("long").alias("cb"),
            F.lit(0.0).alias("maxgap"),
            F.lit(0.0).alias("w1"),
        ),
        lambda acc, b: F.struct(
            (acc["ca"] + b["n_ref"]).alias("ca"),
            (acc["cb"] + b["n_cur"]).alias("cb"),
            F.greatest(
                acc["maxgap"],
                F.abs(
                    (acc["ca"] + b["n_ref"]).cast("double") / F.col("tr")
                    - (acc["cb"] + b["n_cur"]).cast("double") / F.col("tc")
                ),
            ).alias("maxgap"),
            (
                acc["w1"]
                + F.abs(
                    (acc["ca"] + b["n_ref"]).cast("double") / F.col("tr")
                    - (acc["cb"] + b["n_cur"]).cast("double") / F.col("tc")
                )
                * (_KSW_BIN_CENTS / 100.0)
            ).alias("w1"),
        ),
    )
    return packed.select(
        F.col("tr").cast("long").alias("n_ref"),
        F.col("tc").cast("long").alias("n_cur"),
        F.round(fold["maxgap"], 6).alias("ks_stat"),
        F.round(fold["w1"], 6).alias("wasserstein_1d"),
    )


q_drift_ks_wasserstein.__doc__ = q_drift_ks_wasserstein.__doc__.format(
    r=_KSW_REF_Y, c=_KSW_CUR_Y, n=_KSW_NBINS
)


# --------------------------------------------- embedding dimension health
_DIM_GRID = 1_000_000
_DEAD_STD = 0.01  # a dimension whose std is below this is "dead"


@query(
    "q_embed_dim_health",
    oracle=f"""
    WITH q AS (
      SELECT g.i AS dim,
             CAST(round(g.v * {_DIM_GRID}, 0) AS BIGINT) AS qv
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS v,
                           generate_subscripts(embedding, 1) AS i) g),
    moments AS (
      SELECT dim, COUNT(*) AS n, SUM(qv) AS s1, SUM(qv * qv) AS s2
      FROM q GROUP BY dim),
    stats AS (
      SELECT dim,
             s1 / (CAST(n AS DOUBLE) * {_DIM_GRID}) AS mean,
             sqrt((s2 / CAST(n AS DOUBLE) -
                   (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))
                  / ({_DIM_GRID}.0 * {_DIM_GRID}.0)) AS std
      FROM moments)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(count_if(std < {_DEAD_STD}) AS BIGINT) AS n_dead_dims,
           round(MIN(std), 6) AS min_std,
           round(MAX(std), 6) AS max_std,
           round(MAX(std) / greatest(MIN(std), 1e-12), 6)
             AS spread_ratio,
           round(MAX(abs(mean)), 6) AS max_abs_mean
    FROM stats
    """,
)
def q_embed_dim_health(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding health, collapsed to the one-row
    index-admission report: dead-dimension count (std below
    {d} — a dimension carrying no signal, wasting index space and
    diluting cosine), the min/max std spread ratio (anisotropy: a
    large ratio means a few dimensions dominate every distance — the
    pathology embedding-whitening fixes), and the largest absolute
    mean (un-centered dimensions bias inner-product recall).  Run
    before every ANN index rebuild; compare across encoder versions
    to catch silent drift.

    Exactness: per-dim first and second moments are EXACT integer
    sums on the micro-grid (the q_embed_whitening recipe — quantize
    then sum is order-free), each mean/std is a fixed IEEE expression
    of two exact integers, and the final min/max/count aggregates are
    order-independent by nature.  Scale: one posexplode + one
    (dim)-keyed integer-partial shuffle — 64 cells of state — then a
    64-row rollup."""
    e = t(spark, sf, "embeddings")
    q = e.select(F.posexplode("embedding").alias("dim0", "v")).select(
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * _DIM_GRID, 0)
        .cast("long")
        .alias("qv"),
    )
    moments = q.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("s1"),
        F.sum(F.col("qv") * F.col("qv")).alias("s2"),
    )
    mean = F.col("s1") / (F.col("n").cast("double") * _DIM_GRID)
    var_grid = (
        F.col("s2") / F.col("n").cast("double")
        - (F.col("s1") / F.col("n").cast("double"))
        * (F.col("s1") / F.col("n").cast("double"))
    )
    std = F.sqrt(var_grid / (float(_DIM_GRID) * float(_DIM_GRID)))
    stats = moments.select(mean.alias("mean"), std.alias("std"))
    return stats.agg(
        F.count(F.lit(1)).cast("long").alias("n_dims"),
        F.count_if(F.col("std") < _DEAD_STD)
        .cast("long")
        .alias("n_dead_dims"),
        F.round(F.min("std"), 6).alias("min_std"),
        F.round(F.max("std"), 6).alias("max_std"),
        F.round(
            F.max("std") / F.greatest(F.min("std"), F.lit(1e-12)), 6
        ).alias("spread_ratio"),
        F.round(F.max(F.abs("mean")), 6).alias("max_abs_mean"),
    )


q_embed_dim_health.__doc__ = q_embed_dim_health.__doc__.format(d=_DEAD_STD)


# ------------------------------------------------ self-overlap diversity
@query(
    "q_text_self_overlap",
    oracle="""
    WITH grams AS (
      SELECT doc_id, w[x] || ' ' || w[x+1] AS gram, COUNT(*) AS tf
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           (SELECT unnest(range(1, 10000)) AS x)
      WHERE x + 1 <= len(w)
      GROUP BY doc_id, gram),
    pairs AS (
      SELECT a.doc_id AS a,
             SUM(LEAST(a.tf, COALESCE(b.tf, 0))) AS clipped,
             SUM(a.tf) AS total
      FROM grams a
      LEFT JOIN grams b ON b.doc_id = a.doc_id + 1 AND b.gram = a.gram
      WHERE (a.doc_id + 1) IN (SELECT doc_id FROM documents)
      GROUP BY a.doc_id),
    scored AS (
      SELECT lang, CAST(clipped AS DOUBLE) / total AS p
      FROM pairs JOIN documents d ON d.doc_id = pairs.a)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(p * 1e9, 0) AS BIGINT)) AS DOUBLE)
                 / COUNT(*) / 1e9, 6) AS mean_self_overlap,
           round(CAST(count_if(p > 0.5) AS DOUBLE) / COUNT(*), 6)
             AS frac_high_overlap
    FROM scored GROUP BY lang
    """,
)
def q_text_self_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Self-overlap diversity (a self-BLEU-lite): clipped bigram
    precision of each document against its successor, averaged per
    language — the corpus-diversity gauge synthetic-data pipelines
    watch (a rising mean or a growing high-overlap fraction means
    the generator is collapsing onto templates).  Clipped counts are
    BLEU's: each bigram credits at most its frequency in the
    neighbor, so copying one phrase many times doesn't saturate.

    Scale: bigram term frequencies via one explode + (doc, gram)
    count; the comparison joins only CONSECUTIVE pairs (N-1, never
    quadratic) shuffled on gram; per-pair precision is one division
    of exact counts, re-quantized to a 1e-9 grid before the per-lang
    mean so accumulation order cannot perturb it."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - F.lit(1)),
                    lambda i: F.concat_ws(
                        " ", F.element_at("w", i), F.element_at("w", i + 1)
                    ),
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ids = d.select("doc_id")
    has_next = ids.alias("x").join(
        ids.alias("y"), F.col("y.doc_id") == F.col("x.doc_id") + 1
    ).select(F.col("x.doc_id").alias("a"))
    ga = grams.select(F.col("doc_id").alias("a"), "gram", "tf")
    gb = grams.select(
        (F.col("doc_id") - 1).alias("a"),
        F.col("gram").alias("gram_b"),
        F.col("tf").alias("tf_b"),
    )
    pairs = (
        ga.join(has_next, "a", "semi")
        .join(
            gb,
            (gb["a"] == ga["a"]) & (F.col("gram_b") == F.col("gram")),
            "left",
        )
        .groupBy(ga["a"].alias("a"))
        .agg(
            F.sum(
                F.least(F.col("tf"), F.coalesce(F.col("tf_b"), F.lit(0)))
            ).alias("clipped"),
            F.sum("tf").alias("total"),
        )
    )
    scored = pairs.join(
        d.select(F.col("doc_id").alias("a"), "lang"), "a"
    ).select(
        "lang", (F.col("clipped").cast("double") / F.col("total")).alias("p")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("p") * 1e9, 0).cast("long")).cast("double")
            / F.count(F.lit(1))
            / 1e9,
            6,
        ).alias("mean_self_overlap"),
        F.round(
            F.count_if(F.col("p") > 0.5).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("frac_high_overlap"),
    )
