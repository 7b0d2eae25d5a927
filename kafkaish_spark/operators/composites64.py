"""Round-12 wave 4: vocabulary smoothing, diversity, and randomness
diagnostics.

- Good-Turing frequency-of-frequencies over token trigrams — the
  classic LM smoothing table (adjusted counts r* = (r+1) N_{r+1}/N_r
  and the unseen-mass estimate N_1/N), joining the vocabulary-statistics
  family (Heaps, Zipf, Chao1, Kneser-Ney context counts);
- Simpson / Gini-Simpson diversity per language — the collision-
  probability diversity index (an EXACT rational, unlike entropy), the
  third diversity lens next to token entropy and Chao1 richness;
- the Wald-Wolfowitz runs test on the daily order-count sequence —
  is day-to-day demand above/below the median RANDOM, or does it
  streak? (the sequence-randomness QA a forecasting pipeline runs
  before trusting i.i.d. assumptions);
- Bowley (quartile) skewness per priority — the robust skewness
  companion to moment skew/kurtosis (q_agg_skew_kurtosis), built
  entirely from discrete-quantile member values.

Reference parity note: the reference engine (steveliles/kafkaish,
src/topic.js) has no analytics surface — north-star capability work.

Exactness: counts and member-value quantiles stay exact BIGINTs; each
statistic is one mirrored IEEE composition rounded to 6 (house rules,
SURVEY.md §6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_GT_MAX_R = 10  # report the smoothing region r = 1..10


@query(
    "q_text_good_turing",
    oracle=f"""
    WITH toks AS (SELECT string_split(text, ' ') AS tk FROM documents),
    tris AS (SELECT unnest(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
             FROM toks),
    gc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS r FROM tris GROUP BY g),
    fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM gc GROUP BY r),
    tot AS (SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens FROM fof)
    SELECT f.r, f.n_r, CAST(coalesce(nx.n_r, 0) AS BIGINT) AS n_r_plus1,
           round(CAST((f.r + 1) * coalesce(nx.n_r, 0) AS DOUBLE) / f.n_r, 6)
             AS r_star,
           round(CAST(f.r * f.n_r AS DOUBLE) / t.n_tokens, 6) AS mass_frac
    FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1 CROSS JOIN tot t
    WHERE f.r <= {_GT_MAX_R}
    """,
)
def q_text_good_turing(spark: SparkSession, sf: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies over token trigrams (Good
    1953, the Katz-backoff substrate): N_r = how many distinct
    trigrams occur exactly r times, the adjusted count
    r* = (r+1) N_{{r+1}}/N_r, and each class's share of total mass —
    the r=1 row's mass_frac IS the Good-Turing unseen-probability
    estimate N_1/N.  Trigrams (not unigrams) because smoothing lives
    in the LONG TAIL: the corpus vocabulary is dictionary-sized but
    its trigram space is combinatorial, giving a real N_1 >> 0.

    Scale: trigrams never leave their row until ONE explode feeds the
    (gram -> r) count; the fof frame is ~max-count-sized (dozens), so
    the r+1 self-join is a broadcast over a bounded frame."""
    d = t(spark, sf, "documents")
    # size >= 3 guard (review r12, same as q_text_repetition_score):
    # Spark's sequence(1, n-2) turns DESCENDING for n < 3 and
    # element_at(_, 0) throws, while DuckDB's range(1, n-1) is simply
    # empty — filtering short docs is result-identical to the oracle's
    # empty unnest
    tris = (
        d.select(F.split("text", " ").alias("tk"))
        .filter(F.size("tk") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 2), "
                    "i -> concat(element_at(tk, i), ' ', "
                    "element_at(tk, i + 1), ' ', "
                    "element_at(tk, i + 2)))"
                )
            ).alias("g")
        )
    )
    gc = tris.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("r"))
    fof = gc.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens")
    )
    nx = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        fof.join(F.broadcast(nx), "r", "left")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("r") <= _GT_MAX_R)
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("n_r_next"), F.lit(0))
            .cast("long")
            .alias("n_r_plus1"),
            F.round(
                (
                    (F.col("r") + 1)
                    * F.coalesce(F.col("n_r_next"), F.lit(0))
                ).cast("double")
                / F.col("n_r"),
                6,
            ).alias("r_star"),
            F.round(
                (F.col("r") * F.col("n_r")).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("mass_frac"),
        )
    )


@query(
    "q_text_simpson_diversity",
    oracle="""
    WITH words AS (SELECT lang, unnest(string_split(text, ' ')) AS w
                   FROM documents),
    wc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS f
           FROM words GROUP BY lang, w),
    g AS (SELECT lang, CAST(SUM(f) AS BIGINT) AS n,
                 CAST(SUM(f * (f - 1)) AS BIGINT) AS coll,
                 CAST(COUNT(*) AS BIGINT) AS vocab
          FROM wc GROUP BY lang)
    SELECT lang, n, vocab,
           round(CAST(coll AS DOUBLE) / (n * (n - 1)), 6) AS simpson,
           round(1.0 - CAST(coll AS DOUBLE) / (n * (n - 1)), 6)
             AS gini_simpson
    FROM g
    """,
)
def q_text_simpson_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Simpson's diversity index per language — the probability two
    tokens drawn WITHOUT replacement are the same word,
    sum f(f-1) / (n(n-1)), and its Gini-Simpson complement.  Unlike
    entropy this is an exact RATIONAL of integer counts (the same
    collision mass HHI measures over join keys — q_agg_hhi is this
    index over suppliers), so the only float op is the final division.
    Third diversity lens next to q_text_token_entropy (within-doc) and
    q_text_chao1_vocab (richness).

    Scale: one explode into a (lang, word) count — vocabulary-sized
    shuffle — then a language-sized rollup."""
    d = t(spark, sf, "documents")
    words = d.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    wc = words.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    g = wc.groupBy("lang").agg(
        F.sum("f").cast("long").alias("n"),
        F.sum(F.col("f") * (F.col("f") - 1)).cast("long").alias("coll"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    ratio = F.col("coll").cast("double") / (
        F.col("n") * (F.col("n") - 1)
    )
    return g.select(
        "lang",
        "n",
        "vocab",
        F.round(ratio, 6).alias("simpson"),
        F.round(F.lit(1.0) - ratio, 6).alias("gini_simpson"),
    )


@query(
    "q_events_runs_test",
    oracle="""
    WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM orders GROUP BY 1),
    med AS (
      SELECT MIN(CASE WHEN 2 * cum >= n THEN c END)
           + MIN(CASE WHEN 2 * cum >= n + 1 THEN c END) AS med2
      FROM (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum,
                   SUM(cnt) OVER () AS n
            FROM (SELECT c, COUNT(*) AS cnt FROM d GROUP BY c))),
    s AS (SELECT day,
                 CASE WHEN 2 * c > (SELECT med2 FROM med) THEN 1 ELSE 0
                 END AS above
          FROM d WHERE 2 * c != (SELECT med2 FROM med)),
    runs AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(above) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(above) AS BIGINT) AS n0,
             CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND above != prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS r
      FROM (SELECT above, lag(above) OVER (ORDER BY day) AS prev FROM s))
    SELECT n, n0, n1, r,
      round(1.0 + CAST(2 * n0 * n1 AS DOUBLE) / NULLIF(n, 0), 6) AS mu_r,
      round((r - (1.0 + CAST(2 * n0 * n1 AS DOUBLE) / NULLIF(n, 0)))
            / NULLIF(sqrt(CAST(2 * n0 * n1 AS DOUBLE) * (2 * n0 * n1 - n)
                   / NULLIF(CAST(n AS DOUBLE) * n * (n - 1), 0)), 0), 6)
        AS z
    FROM runs
    """,
)
def q_events_runs_test(spark: SparkSession, sf: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily order-count sequence: days
    are coded above/below the median daily count (exact half-unit
    median; tie days discarded, the standard treatment), runs of equal
    codes are counted via one lag, and the normal approximation
    z = (R - mu_R)/sigma_R with mu_R = 1 + 2 n0 n1 / n asks whether
    demand STREAKS more (z < 0, fewer runs) or alternates more (z > 0)
    than an i.i.d. coin — the randomness audit behind every "is this
    metric autocorrelated" question (the nonparametric companion of
    q_ts_acf_daily_revenue).

    Scale: the sequence frame is CALENDAR-bounded (one row per day —
    ~2.4k rows at any SF), so the unpartitioned lag window and the
    count-value CDF both run over bounded frames; the only corpus-
    sized work is the first date rollup."""
    o = t(spark, sf, "orders")
    d = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    cells = d.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cdf = cells.select(
        "c",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = cdf.agg(
        (
            F.min(F.when(2 * F.col("cum") >= F.col("n"), F.col("c")))
            + F.min(F.when(2 * F.col("cum") >= F.col("n") + 1, F.col("c")))
        ).alias("med2")
    )
    s = (
        d.crossJoin(F.broadcast(med))
        .filter(2 * F.col("c") != F.col("med2"))
        .select(
            "day",
            F.when(2 * F.col("c") > F.col("med2"), 1)
            .otherwise(0)
            .alias("above"),
        )
    )
    lagged = s.select(
        "above", F.lag("above").over(Window.orderBy("day")).alias("prev")
    )
    runs = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("above").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).cast("long").alias("n0"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("above") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("r"),
    )
    # NULL-guarded like the oracle: a one-sided or empty sequence (every
    # day tied at the median — real at tiny SF) has no defined z
    two_n0n1 = (2 * F.col("n0") * F.col("n1")).cast("double")
    mu = 1.0 + two_n0n1 / F.nullif(F.col("n"), F.lit(0))
    sigma = F.nullif(
        F.sqrt(
            two_n0n1
            * (2 * F.col("n0") * F.col("n1") - F.col("n"))
            / F.nullif(
                F.col("n").cast("double") * F.col("n") * (F.col("n") - 1),
                F.lit(0.0),
            )
        ),
        F.lit(0.0),
    )
    return runs.select(
        "n",
        "n0",
        "n1",
        "r",
        F.round(mu, 6).alias("mu_r"),
        F.round((F.col("r") - mu) / sigma, 6).alias("z"),
    )


@query(
    "q_agg_bowley_skew",
    oracle="""
    WITH o AS (SELECT o_orderpriority AS p,
                      CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
               FROM orders),
    q AS (SELECT p,
                 CAST(quantile_disc(v, 0.25) AS BIGINT) AS q1,
                 CAST(quantile_disc(v, 0.5) AS BIGINT) AS q2,
                 CAST(quantile_disc(v, 0.75) AS BIGINT) AS q3
          FROM o GROUP BY p)
    SELECT p AS priority, q1, q2, q3,
           round(CAST(q1 + q3 - 2 * q2 AS DOUBLE) / NULLIF(q3 - q1, 0), 6)
             AS bowley_skew,
           CAST(q3 - q1 AS BIGINT) AS iqr
    FROM q
    """,
)
def q_agg_bowley_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Bowley (quartile) skewness per priority: (Q1 + Q3 - 2*median) /
    (Q3 - Q1), in [-1, 1] — the robust skewness a single tail value
    cannot move, next to the moment-based q_agg_skew_kurtosis, built
    from discrete-quantile MEMBER values (actual charged prices, the
    composites11 percentile_disc pairing both engines share).  Exact
    integer quartiles in cents; one division, NULL-guarded for the
    degenerate zero-IQR group."""
    o = t(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
    )
    o.createOrReplaceTempView("bowley_orders_v")
    q = spark.sql(
        """
        SELECT p,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v)
                    AS BIGINT) AS q1,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v)
                    AS BIGINT) AS q2,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v)
                    AS BIGINT) AS q3
        FROM bowley_orders_v GROUP BY p
        """
    )
    return q.select(
        F.col("p").alias("priority"),
        "q1",
        "q2",
        "q3",
        F.round(
            (F.col("q1") + F.col("q3") - 2 * F.col("q2")).cast("double")
            / F.nullif(F.col("q3") - F.col("q1"), F.lit(0)),
            6,
        ).alias("bowley_skew"),
        (F.col("q3") - F.col("q1")).cast("long").alias("iqr"),
    )
