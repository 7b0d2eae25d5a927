"""Round-5 eighth wave: uncertainty at scale — the Poisson bootstrap
(Chamandy, Muralidharan, Najmi & Naidu 2012, "Estimating uncertainty
for massive data streams", Google TR; Kleiner et al.'s BLB is the
same regime) and the Chao1 unseen-species estimator (Chao 1984),
applied to corpus vocabulary coverage.

The Poisson bootstrap is THE way to put error bars on a statistic at
100 TB: classical resampling needs the whole dataset per replicate,
but Poisson(1) weights are independent per row, so ALL R replicates
accumulate in ONE scan as R weighted partial aggregates — no data
explosion, no second pass.  Chao1 turns the frequency-of-frequencies
table (q_text_turing_counts) into an estimate of how many bigram
types the corpus has NOT yet seen — the coverage question a crawl
pipeline asks before deciding to crawl more.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB) computes neither — [NS] north-star extensions per SURVEY.md
§2.4.  House exactness: Poisson weights come from md5-derived 32-bit
uniforms compared against CUMULATIVE-CDF literals (cross-engine
identical); weighted sums are exact integer cents; each replicate
mean is one IEEE division; the percentile pick is an array-sort
index, not an interpolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_R = 40  # bootstrap replicates: order stats 2 and 39 are ~2.5%/97.5%
_SEED = "boot5"

# Poisson(1) inverse CDF thresholds: P(X <= k) = e^-1 * sum_{j<=k} 1/j!
# — the ONE shared copy (functions/stats.py; composites60's explode-
# shaped bootstrap slices the same tuple), so the engines-must-agree
# literals cannot drift between the two plan shapes (review r11).
# u above the last threshold -> weight 7 (P ~ 1e-5; tail truncation)
from kafkaish_spark.functions.stats import POISSON1_CDF as _POIS_CDF


def _boot_sql() -> str:
    """Oracle: R weighted replicate means in one aggregate, percentile
    endpoints by sorted-array index (generated from the same loop as
    the Spark side, so the expressions are structurally identical)."""
    u = (
        f"CAST(('0x' || substring(md5('{_SEED}' || CAST(l_orderkey AS VARCHAR)"
        " || '_' || CAST(l_linenumber AS VARCHAR) || '_' || '{r}'), 1, 8))"
        " AS BIGINT) / 4294967296.0"
    )
    w = (
        "(CASE"
        + "".join(
            f" WHEN {{u}} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
        )
        + " ELSE 7 END)"
    ).format(u=u)
    sums = ",\n        ".join(
        f"CAST(SUM({w.format(r=r)} * cents) AS BIGINT) AS sx{r},\n"
        f"        CAST(SUM({w.format(r=r)}) AS BIGINT) AS sw{r}"
        for r in range(_R)
    )
    means = ", ".join(
        f"CAST(sx{r} AS DOUBLE) / sw{r}" for r in range(_R)
    )
    lo_i, hi_i = _R // 40 + 1, _R - _R // 40  # R=40 -> indexes 2 and 39
    return f"""
    WITH c AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS cents
      FROM lineitem),
    agg AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS s0,
             CAST(COUNT(*) AS BIGINT) AS n0,
        {sums}
      FROM c),
    arr AS (
      SELECT s0, n0, list_sort([{means}]) AS ms FROM agg)
    SELECT round(CAST(s0 AS DOUBLE) / n0, 6) AS point_mean,
           round(ms[{lo_i}], 6) AS boot_lo,
           round(ms[{hi_i}], 6) AS boot_hi,
           CAST({_R} AS BIGINT) AS n_replicates
    FROM arr
    """


@query("q_ml_poisson_bootstrap", oracle=_boot_sql())
def q_ml_poisson_bootstrap(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson-bootstrap 95% CI for mean lineitem quantity: every row
    gets an independent Poisson(1) weight per replicate (md5-seeded
    32-bit uniform against fixed inverse-CDF literals), all {R}
    replicates accumulate as weighted integer sums IN ONE AGGREGATE,
    and the interval is the sorted replicate means' index-picked
    2.5%/97.5% endpoints.

    Scale: this is the one-pass bootstrap built for data too large to
    resample — the scan emits 2*{R}+2 integer partials per partition
    (map-side combined), the final reduce merges {R} replicate sums,
    and nothing else moves.  Weight 7 truncates the Poisson tail at
    P ~ 1e-5 identically on both engines.  Reference: [NS] — no
    analog in kafkaish."""
    li = t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("cents"),
    )

    def weight(r: int):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(_SEED),
                            F.col("l_orderkey").cast("string"),
                            F.lit("_"),
                            F.col("l_linenumber").cast("string"),
                            F.lit("_"),
                            F.lit(str(r)),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        )
        w = F.when(u < _POIS_CDF[0], 0)
        for k, c in enumerate(_POIS_CDF[1:], start=1):
            w = w.when(u < c, k)
        return w.otherwise(7)

    aggs = [
        F.sum("cents").cast("long").alias("s0"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    ]
    for r in range(_R):
        w = weight(r)
        aggs.append(F.sum(w * F.col("cents")).cast("long").alias(f"sx{r}"))
        aggs.append(F.sum(w).cast("long").alias(f"sw{r}"))
    agg = li.agg(*aggs)
    means = F.array_sort(
        F.array(
            *[
                (F.col(f"sx{r}").cast("double") / F.col(f"sw{r}"))
                for r in range(_R)
            ]
        )
    )
    lo_i, hi_i = _R // 40 + 1, _R - _R // 40
    return agg.select(
        F.round(F.col("s0").cast("double") / F.col("n0"), 6).alias(
            "point_mean"
        ),
        F.round(F.element_at(means, lo_i), 6).alias("boot_lo"),
        F.round(F.element_at(means, hi_i), 6).alias("boot_hi"),
        F.lit(_R).cast("long").alias("n_replicates"),
    )


q_ml_poisson_bootstrap.__doc__ = q_ml_poisson_bootstrap.__doc__.format(R=_R)


@query(
    "q_text_chao1_vocab",
    oracle="""
    WITH raw AS (
      SELECT doc_id, word, pos FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents) WHERE word <> ''),
    toks AS (
      SELECT doc_id, word,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM raw),
    big AS (
      SELECT a.word AS w1, b.word AS w2
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.rn = a.rn + 1),
    uni AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS r
      FROM big GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS d_observed,
           CAST(COUNT(*) FILTER (r = 1) AS BIGINT) AS n1,
           CAST(COUNT(*) FILTER (r = 2) AS BIGINT) AS n2,
           round(COUNT(*) +
                 CAST(COUNT(*) FILTER (r = 1) AS DOUBLE)
                 * COUNT(*) FILTER (r = 1)
                 / (2.0 * COUNT(*) FILTER (r = 2)), 6) AS chao1
    FROM uni
    """,
)
def q_text_chao1_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Chao1 estimate of the corpus's TRUE bigram-type inventory:
    D_obs + N1^2 / (2*N2), where N1/N2 are singleton/doubleton type
    counts — Chao (1984)'s lower bound on unseen species, the
    coverage statistic that answers "how much vocabulary would more
    crawling surface?".  Runs on bigram types for the same reason as
    q_text_turing_counts (this corpus's unigram vocabulary is uniform
    — no singletons).

    Scale: one partial-aggregated shuffle to bigram-type counts, then
    a 1-row conditional-count rollup; the estimator itself is three
    integers and two IEEE operations.  Reference: [NS] — no analog in
    kafkaish."""
    from kafkaish_spark.operators.composites32 import _bigrams

    uni = (
        _bigrams(spark, sf)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    agg = uni.agg(
        F.count(F.lit(1)).cast("long").alias("d_observed"),
        F.count(F.when(F.col("r") == 1, 1)).cast("long").alias("n1"),
        F.count(F.when(F.col("r") == 2, 1)).cast("long").alias("n2"),
    )
    chao1 = F.col("d_observed") + F.col("n1").cast("double") * F.col(
        "n1"
    ) / (2.0 * F.col("n2"))
    return agg.select(
        "d_observed", "n1", "n2", F.round(chao1, 6).alias("chao1")
    )
