"""Round-6 sixth wave: sketch calibration and leakage-free feature
encoding — two more "audit the pipeline's own tools" operators.

- Count-Min-Sketch calibration (Cormode & Muthukrishnan, J. Alg.
  2005): the sketch's point estimates against exact counts for the
  exact top terms — CMS only ever OVERcounts, and the measured
  overestimate distribution against the eps*N bound is what justifies
  a (depth, width) choice before the sketch replaces exact counting
  at 100 TB.  The calibration sketch uses md5-prefix bucket keys so
  both engines build the identical sketch (the production
  q_sketch_count_min_terms uses xxhash64 and stays rows-only);
- out-of-fold target encoding (the standard leakage-free categorical
  encoder: each fold's category mean is computed from the OTHER
  folds only, so a row never sees its own target) — the feature-
  engineering op whose naive form is the classic target-leakage bug.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes neither — [NS] north-star extensions
per SURVEY.md §2.4.  House exactness: bucket/fold sums are exact
BIGINTs; every emitted float is one IEEE division of exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------- CMS calibration
_CMS_DEPTH = 4  # hash rows, seeds 0..3
_CMS_TOPN = 30  # calibrate on the exact top-N terms


@query(
    "q_sketch_cms_calibration",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    exact AS (
      SELECT word, COUNT(*) AS cf FROM words GROUP BY word),
    tot AS (SELECT SUM(cf) AS n, COUNT(*) AS n_terms FROM exact),
    cells AS (
      SELECT r.s AS row_id,
             substr(md5(CAST(r.s AS VARCHAR) || ':' || word), 1, 2)
               AS bucket,
             SUM(cf) AS n
      FROM exact, (SELECT unnest(range({_CMS_DEPTH})) AS s) r
      GROUP BY 1, 2),
    top AS (
      SELECT word, cf FROM exact
      ORDER BY cf DESC, word LIMIT {_CMS_TOPN}),
    est AS (
      SELECT top.word, top.cf,
             MIN(cells.n) AS cms_est
      FROM top, (SELECT unnest(range({_CMS_DEPTH})) AS s) r
      JOIN cells
        ON cells.row_id = r.s
       AND cells.bucket = substr(
             md5(CAST(r.s AS VARCHAR) || ':' || top.word), 1, 2)
      GROUP BY top.word, top.cf)
    SELECT word,
           CAST(cf AS BIGINT) AS exact_cf,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - cf AS BIGINT) AS overestimate,
           round(CAST(cms_est - cf AS DOUBLE)
                 / (SELECT n FROM tot), 6) AS over_vs_n
    FROM est
    """,
)
def q_sketch_cms_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min calibration: a depth-{d} x width-256 sketch (bucket =
    2-hex-char md5 prefix per seeded row — identical construction in
    both engines) queried for the exact top-{k} terms, reporting each
    term's exact count, sketch estimate, raw overestimate (CMS never
    underestimates — `overestimate >= 0` is a structural invariant
    the replay test pins), and the overestimate as a fraction of
    total token mass N (the eps*N yardstick: eps ~ e/256 here).
    This is the measurement that justifies a width before the sketch
    replaces exact counting — the MinHash-calibration idea applied
    to the frequency sketch.

    Scale: the sketch is depth x 256 integer cells built with
    map-side partial sums (constant shuffle regardless of vocabulary
    — the whole point of CMS); the calibration probe joins only the
    top-{k} terms against it.  Exactness: pure integer cells and
    counts; one division per term."""
    d = t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("cf"))
    n_total = exact.agg(F.sum("cf")).first()[0]
    seeds = spark.range(_CMS_DEPTH).select(F.col("id").alias("row_id"))
    cells = (
        exact.crossJoin(F.broadcast(seeds))
        .select(
            "row_id",
            F.substring(
                F.md5(
                    F.concat(
                        F.col("row_id").cast("string"),
                        F.lit(":"),
                        F.col("word"),
                    )
                ),
                1,
                2,
            ).alias("bucket"),
            "cf",
        )
        .groupBy("row_id", "bucket")
        .agg(F.sum("cf").alias("n"))
    )
    top = exact.orderBy(F.col("cf").desc(), F.col("word")).limit(_CMS_TOPN)
    probes = top.crossJoin(F.broadcast(seeds)).select(
        "word",
        "cf",
        "row_id",
        F.substring(
            F.md5(
                F.concat(
                    F.col("row_id").cast("string"), F.lit(":"), F.col("word")
                )
            ),
            1,
            2,
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["row_id", "bucket"])
        .groupBy("word", "cf")
        .agg(F.min("n").alias("cms_est"))
    )
    return est.select(
        "word",
        F.col("cf").cast("long").alias("exact_cf"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("cf")).cast("long").alias("overestimate"),
        F.round(
            (F.col("cms_est") - F.col("cf")).cast("double")
            / F.lit(int(n_total)),
            6,
        ).alias("over_vs_n"),
    )


q_sketch_cms_calibration.__doc__ = q_sketch_cms_calibration.__doc__.format(
    d=_CMS_DEPTH, k=_CMS_TOPN
)


# ----------------------------------------- out-of-fold target encoding
_TE_FOLDS = 5


@query(
    "q_feat_target_encode_oof",
    oracle=f"""
    WITH base AS (
      SELECT o_orderpriority AS cat,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS y_cents,
             CAST(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)
                  AS VARCHAR) AS hx,
             o_orderkey
      FROM orders),
    folded AS (
      SELECT cat, y_cents,
             (ROW_NUMBER() OVER (ORDER BY hx, o_orderkey) - 1)
               % {_TE_FOLDS} AS fold
      FROM base),
    per AS (
      SELECT cat, fold, COUNT(*) AS n, SUM(y_cents) AS s
      FROM folded GROUP BY cat, fold),
    tot AS (
      SELECT cat, SUM(n) AS nt, SUM(s) AS st FROM per GROUP BY cat)
    SELECT per.cat, CAST(fold AS BIGINT) AS fold,
           CAST(n AS BIGINT) AS n_rows,
           round(CAST(st - s AS DOUBLE) / (nt - n) / 100.0, 6)
             AS oof_mean_price
    FROM per JOIN tot ON per.cat = tot.cat
    """,
)
def q_feat_target_encode_oof(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-fold target encoding of order priority against order
    value: rows are dealt to {k} folds by id hash, and each
    (category, fold) cell's encoding is the category's mean target
    computed from the OTHER folds only — the leakage-free form of
    the most leakage-prone feature in tabular ML (the naive
    all-data category mean lets every row see its own label).  The
    emitted table is exactly what a trainer broadcasts and joins.

    Scale: one (cat, fold) integer-sum shuffle (categories x {k}
    cells), a category rollup, and leave-one-fold-out arithmetic on
    the cell frame — the corpus is scanned once; the global fold
    deal is the TWO-PHASE rank (SCALE.md §16: bucket on the hash
    prefix, rank within bucket, broadcast prefix offsets), never a
    single total-order sort.  The oracle states the naive global
    ROW_NUMBER, so the decomposition is proven exact on every run.
    Exactness: sums exact; one IEEE division per cell."""
    from pyspark.sql import Window

    o = t(spark, sf, "orders")
    keyed = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y_cents"),
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4).alias(
            "hx"
        ),
        F.col("o_orderkey"),
    ).withColumn("bucket", F.substring("hx", 1, 2))
    hist = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    w_prefix = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = hist.select(
        "bucket",
        F.coalesce(F.sum("n").over(w_prefix), F.lit(0)).alias("offset0"),
    )
    w_bucket = Window.partitionBy("bucket").orderBy("hx", "o_orderkey")
    folded = (
        keyed.withColumn("r", F.row_number().over(w_bucket))
        .join(F.broadcast(prefix), "bucket")
        .select(
            "cat",
            "y_cents",
            ((F.col("offset0") + F.col("r") - 1) % _TE_FOLDS).alias("fold"),
        )
    )
    per = folded.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y_cents").alias("s")
    )
    tot = per.groupBy("cat").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    return per.join(tot, "cat").select(
        "cat",
        F.col("fold").cast("long").alias("fold"),
        F.col("n").cast("long").alias("n_rows"),
        F.round(
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n"))
            / 100.0,
            6,
        ).alias("oof_mean_price"),
    )


q_feat_target_encode_oof.__doc__ = q_feat_target_encode_oof.__doc__.format(
    k=_TE_FOLDS
)
