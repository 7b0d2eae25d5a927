"""Round-6 tenth wave: privacy-preserving frequency estimation and
masked-LM data preparation.

- randomized-response frequency estimation (Warner, JASA 1965; the
  mechanism under RAPPOR, Erlingsson et al., CCS 2014): each user's
  reported event type is flipped to a uniform random type with
  probability f, and the collector DEBIASES the observed histogram
  back to an unbiased frequency estimate — local differential
  privacy's "count without seeing".  The flip coin here is a seeded
  hash bit (the house seeded-Laplace pattern from
  q_privacy_dp_counts), so the whole mechanism is deterministic and
  oracle-checkable while keeping the estimator's exact algebra;
- MLM masking plan (Devlin et al., BERT, 2019: mask 15% of tokens,
  of which 80% -> [MASK], 10% -> random, 10% -> kept): the mask
  assignment as a deterministic per-(doc, position) hash draw, with
  the realized rates audited per language against the nominal ones —
  the data-prep step every masked-LM pipeline runs, stated so the
  plan (not a model) is the artifact.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: hash-bit draws are exact
string comparisons; counts exact; estimator divisions single IEEE
ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# --------------------------------------------- randomized response
# Flip with probability f = 1/4: first md5 hex char in 0..3.  A
# flipped report is replaced by the type selected by the SECOND hex
# character mod |types| over the alphabetically-sorted type list.
_RR_SEED = "rr-v1"
_RR_FLIP_HEX = "0123"  # 4/16 = f = 0.25
_RR_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_privacy_rappor_freq",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             md5('{_RR_SEED}' || CAST(event_id AS VARCHAR)) AS h
      FROM events),
    reported AS (
      SELECT CASE
               WHEN substr(h, 1, 1) IN
                    ({', '.join("'" + c + "'" for c in _RR_FLIP_HEX)})
               THEN ['click', 'error', 'purchase', 'signup', 'view']
                    [1 + CAST(
                       CASE substr(h, 2, 1)
                         WHEN 'a' THEN 10 WHEN 'b' THEN 11
                         WHEN 'c' THEN 12 WHEN 'd' THEN 13
                         WHEN 'e' THEN 14 WHEN 'f' THEN 15
                         ELSE CAST(substr(h, 2, 1) AS INTEGER)
                       END AS INTEGER) % {len(_RR_TYPES)}]
               ELSE event_type
             END AS reported,
             event_type AS true_type
      FROM base),
    obs AS (
      SELECT reported, COUNT(*) AS n_observed
      FROM reported GROUP BY reported),
    truth AS (
      SELECT true_type, COUNT(*) AS n_true
      FROM reported GROUP BY true_type),
    nn AS (SELECT SUM(n_observed) AS n FROM obs)
    SELECT reported AS event_type,
           CAST(n_observed AS BIGINT) AS n_observed,
           CAST(n_true AS BIGINT) AS n_true,
           round((n_observed
                  - (SELECT n FROM nn) * 0.25 / {len(_RR_TYPES)})
                 / (1 - 0.25), 6) AS n_debiased
    FROM obs JOIN truth ON obs.reported = truth.true_type
    """,
)
def q_privacy_rappor_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Randomized-response frequency estimation over event types:
    with flip probability f = 1/4 each report is replaced by a
    uniform type draw (both coins are seeded md5 hex digits — the
    q_privacy_dp_counts determinism pattern), and the collector's
    unbiased estimator n_hat = (observed - N*f/k) / (1-f) recovers
    the per-type counts WITHOUT trusting any individual report.  The
    emitted table carries observed, true (for audit — the oracle has
    it), and debiased counts; the replay test pins |n_hat - n_true|
    within the mechanism's concentration bound.

    Scale: one linear projection (two hex-char comparisons, a
    5-element literal array index) + one rollup per side — privacy
    mechanisms are projections, never shuffked state.  Exactness:
    draws are string comparisons; counts exact; the estimator is one
    fixed IEEE expression per type."""
    ev = t(spark, sf, "events")
    h = F.md5(F.concat(F.lit(_RR_SEED), F.col("event_id").cast("string")))
    types_arr = F.array(*[F.lit(x) for x in _RR_TYPES])
    flip = F.substring(h, 1, 1).isin(*list(_RR_FLIP_HEX))
    rand_idx = (
        F.conv(F.substring(h, 2, 1), 16, 10).cast("int") % len(_RR_TYPES)
    )
    reported = ev.select(
        F.when(flip, F.element_at(types_arr, rand_idx + 1))
        .otherwise(F.col("event_type"))
        .alias("reported"),
        F.col("event_type").alias("true_type"),
    )
    obs = reported.groupBy("reported").agg(
        F.count(F.lit(1)).alias("n_observed")
    )
    truth = reported.groupBy("true_type").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    n = obs.agg(F.sum("n_observed")).first()[0]
    f = len(_RR_FLIP_HEX) / 16.0
    return (
        obs.join(truth, obs["reported"] == truth["true_type"])
        .select(
            F.col("reported").alias("event_type"),
            F.col("n_observed").cast("long").alias("n_observed"),
            F.col("n_true").cast("long").alias("n_true"),
            F.round(
                (
                    F.col("n_observed")
                    - F.lit(float(n)) * f / len(_RR_TYPES)
                )
                / (1 - f),
                6,
            ).alias("n_debiased"),
        )
    )


# --------------------------------------------------- MLM masking plan
_MLM_SEED = "mlm-v1"
# nominal BERT rates over the first two md5 hex chars (256 grid):
# mask if chars < '27' (39/256 ~ 15.2%); within masked, the THIRD hex
# char splits 80/10/10 (0..c -> [MASK] 13/16, d -> random, e,f -> keep)


@query(
    "q_train_mlm_masking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, g.i AS pos
      FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws
            FROM documents) d,
           LATERAL (SELECT generate_subscripts(ws, 1) AS i) g),
    drawn AS (
      SELECT lang,
             substr(md5('{_MLM_SEED}' || CAST(doc_id AS VARCHAR) || ':'
                        || CAST(pos AS VARCHAR)), 1, 3) AS h3
      FROM toks),
    acts AS (
      SELECT lang,
             CASE
               WHEN substr(h3, 1, 2) >= '27' THEN 'unmasked'
               WHEN substr(h3, 3, 1) <= 'c' THEN 'mask_token'
               WHEN substr(h3, 3, 1) = 'd' THEN 'random_token'
               ELSE 'keep_token'
             END AS action
      FROM drawn)
    SELECT lang, action,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER
                 (PARTITION BY lang), 6) AS rate
    FROM acts GROUP BY lang, action
    """,
)
def q_train_mlm_masking(spark: SparkSession, sf: str) -> DataFrame:
    """The BERT masking plan as data: every (doc, position) token
    draws a deterministic seeded hash, ~15% are selected (first two
    hex chars < '27' — 39/256), and selected tokens split
    80/10/10 into [MASK] / random-token / kept-token on the third
    hex char — the exact data-prep assignment a masked-LM trainer
    consumes, emitted as per-language action counts and realized
    rates (audited against the nominal rates in the replay test:
    hash draws make the plan reproducible across reshuffles and
    re-runs, which positional RNG masking is not).

    Scale: one explode + one (lang, action) rollup; the rate window
    runs over the <= 4-row action frame per lang.  Exactness: the
    draw is a string comparison; counts exact; one division per
    row."""
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos0", "word"),
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"))
    h3 = F.substring(
        F.md5(
            F.concat(
                F.lit(_MLM_SEED),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("pos").cast("string"),
            )
        ),
        1,
        3,
    )
    acts = toks.select(
        "lang",
        F.when(F.substring(h3, 1, 2) >= "27", "unmasked")
        .when(F.substring(h3, 3, 1) <= "c", "mask_token")
        .when(F.substring(h3, 3, 1) == "d", "random_token")
        .otherwise("keep_token")
        .alias("action"),
    )
    counts = acts.groupBy("lang", "action").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    # per-lang totals via rollup + broadcast join (a constant-key
    # window would trip the corpus-scale window gate needlessly)
    totals = counts.groupBy("lang").agg(F.sum("n_tokens").alias("nt"))
    return counts.join(F.broadcast(totals), "lang").select(
        "lang",
        "action",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.col("nt"), 6).alias(
            "rate"
        ),
    )
