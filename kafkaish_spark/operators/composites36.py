"""Round-6 second wave: community labels, split-hygiene, and
sketch-quality calibration — the "do my pipeline's own tools work"
audits a training-data platform runs on itself.

- synchronous label propagation (Raghavan et al., Phys. Rev. E 2007),
  two rounds, DETERMINISTIC tie-break — community detection expressed
  as pure joins + integer mode aggregation, oracle-checkable because
  nothing is float;
- k-fold leakage audit: exact-duplicate texts straddling folds of the
  stratified k-fold split (the eval-hygiene check that makes
  cross-validation honest — a dup shared by train and valid folds
  leaks the answer);
- MinHash calibration: estimated vs exact Jaccard over a bounded
  consecutive-pair frame, binned error report — the measurement that
  tells you whether 32 permutations are enough BEFORE you trust the
  LSH dedup's verdicts at 100 TB.

Reference parity: the reference (kafkaish, ~350 LoC pub/sub over
MongoDB, src/topic.js) computes none of these — [NS] north-star
extensions per SURVEY.md §2.4.  House exactness: label propagation
and the leakage audit are pure integer/string ops; the calibration's
only floats are single IEEE divisions of exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# ------------------------------------------------------ label propagation
_LP_ROUNDS = 2

# One synchronous round as a DuckDB CTE: each node adopts the most
# frequent label among its neighbors, ties broken by the SMALLER label
# string — (count DESC, label ASC) is a total order, so the round is
# deterministic on both engines with no float anywhere.
def _lp_iter_cte(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT node, label FROM (
        SELECT e.dst AS node, p.label,
               ROW_NUMBER() OVER (
                 PARTITION BY e.dst
                 ORDER BY COUNT(*) DESC, p.label) AS rk
        FROM e JOIN {prev} p ON e.src = p.node
        GROUP BY e.dst, p.label)
      WHERE rk = 1)"""


@query(
    "q_graph_label_prop",
    oracle=f"""
    WITH cs AS (
      SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    e AS (
      SELECT 'c' || ck AS src, 's' || sk AS dst FROM cs
      UNION ALL
      SELECT 's' || sk AS src, 'c' || ck AS dst FROM cs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
    {_lp_iter_cte('l0', 'l1')},
    {_lp_iter_cte('l1', 'l2')}
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(count_if(node LIKE 'c%') AS BIGINT) AS n_customers,
           CAST(count_if(node LIKE 's%') AS BIGINT) AS n_suppliers
    FROM l2 GROUP BY label
    """,
)
def q_graph_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    """Two synchronous rounds of label propagation over the
    customer<->supplier trading graph, reported as community sizes.
    Every node starts as its own label; each round it adopts the most
    frequent neighbor label with the (count DESC, label ASC)
    tie-break — the deterministic variant of Raghavan's LPA, which
    makes an algorithm usually dismissed as unstable fully
    oracle-checkable (contrast q_dedup_cc_clusters' min-label
    CONNECTIVITY: LPA finds dense cores, not mere reachability).

    Scale: each round is one edge-list join (shuffle on src) + one
    integer mode aggregation per dst — O(E) per round, Pregel's cost,
    no driver state; the mode itself is a (dst, label) count and a
    per-dst top-1, which Spark plans with a WindowGroupLimit-style
    rank over grouped counts, never raw edges.  Rounds are fixed so
    the plan is static; nothing is float, so no fold discipline is
    even needed."""
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    cs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct()
    )
    fwd = cs.select(
        F.concat(F.lit("c"), F.col("ck")).alias("src"),
        F.concat(F.lit("s"), F.col("sk")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LP_ROUNDS):
        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("dst").orderBy(
            F.col("n").desc(), F.col("label")
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("dst").alias("node"), "label")
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.count_if(F.col("node").startswith("c"))
        .cast("long")
        .alias("n_customers"),
        F.count_if(F.col("node").startswith("s"))
        .cast("long")
        .alias("n_suppliers"),
    )


# ------------------------------------------------------- fold leakage
_KFOLDS = 5  # must match composites35.q_split_kfold_stratified


@query(
    "q_split_fold_leakage",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, md5(text) AS digest,
             (ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
             % {_KFOLDS} AS fold
      FROM documents),
    per_digest AS (
      SELECT lang, digest,
             COUNT(*) AS n_docs,
             COUNT(DISTINCT fold) AS n_folds
      FROM ranked GROUP BY lang, digest)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_digests,
           CAST(count_if(n_docs > 1) AS BIGINT) AS n_dup_digests,
           CAST(count_if(n_folds > 1) AS BIGINT) AS n_leaky_digests,
           CAST(COALESCE(SUM(CASE WHEN n_folds > 1 THEN n_docs END), 0)
                AS BIGINT) AS n_leaky_docs
    FROM per_digest GROUP BY lang
    """,
)
def q_split_fold_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-fold duplicate leakage audit of the stratified k-fold
    split: a text whose exact duplicates land in MORE THAN ONE fold
    leaks train answers into validation — the hygiene check run
    before any CV number is believed (and the reason production
    splitters key on content, not row, identity).  Reports, per
    stratum: distinct texts, duplicated texts, texts straddling
    folds, and documents involved in a straddle.

    The fold assignment replays q_split_kfold_stratified's hash
    round-robin EXACTLY (same md5 order, same modulus), so this query
    audits that splitter's real behavior: id-hash round-robin ignores
    content, hence any multi-copy text is expected to leak — the
    audit MEASURES it instead of assuming.  Scale: the rank is the
    same two-phase bucket form; the audit adds one digest-keyed count
    shuffle and a 5-group rollup — both linear."""
    d = t(spark, sf, "documents")
    keyed = d.select(
        "lang",
        F.md5("text").alias("digest"),
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
        "doc_id",
    ).withColumn(
        "bucket", F.conv(F.substring("skey", 1, 2), 16, 10).cast("long")
    )
    hist = keyed.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("n"))
    w_prefix = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = hist.select(
        "lang",
        "bucket",
        F.coalesce(F.sum("n").over(w_prefix), F.lit(0)).alias("offset0"),
    )
    w_bucket = Window.partitionBy("lang", "bucket").orderBy("skey", "doc_id")
    ranked = (
        keyed.withColumn("r", F.row_number().over(w_bucket))
        .join(F.broadcast(prefix), ["lang", "bucket"])
        .select(
            "lang",
            "digest",
            ((F.col("offset0") + F.col("r") - 1) % _KFOLDS).alias("fold"),
        )
    )
    per_digest = ranked.groupBy("lang", "digest").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fold").alias("n_folds"),
    )
    return per_digest.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_digests"),
        F.count_if(F.col("n_docs") > 1).cast("long").alias("n_dup_digests"),
        F.count_if(F.col("n_folds") > 1)
        .cast("long")
        .alias("n_leaky_digests"),
        F.coalesce(
            F.sum(F.when(F.col("n_folds") > 1, F.col("n_docs"))), F.lit(0)
        )
        .cast("long")
        .alias("n_leaky_docs"),
    )


# ------------------------------------------------- minhash calibration
_CAL_PERMS = 32
_CAL_SHINGLE = 3


@query(
    "q_dedup_minhash_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             w[x] || ' ' || w[x+1] || ' ' || w[x+2] AS shingle
      FROM toks, (SELECT unnest(range(1, 10000)) AS x)
      WHERE x + {_CAL_SHINGLE} - 1 <= len(w)),
    mh AS (
      SELECT doc_id, p,
             MIN(md5(CAST(p AS VARCHAR) || ':' || shingle)) AS sig
      FROM sh, (SELECT unnest(range({_CAL_PERMS})) AS p)
      GROUP BY doc_id, p),
    pairs AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE (doc_id + 1) IN (SELECT doc_id FROM documents)),
    exact AS (
      SELECT pairs.a, pairs.b,
             count_if(sb.shingle IS NOT NULL) AS inter,
             COUNT(*) AS only_a
      FROM pairs
      JOIN sh sa ON sa.doc_id = pairs.a
      LEFT JOIN sh sb ON sb.doc_id = pairs.b AND sb.shingle = sa.shingle
      GROUP BY pairs.a, pairs.b),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    ej AS (
      SELECT exact.a, exact.b,
             CAST(inter AS DOUBLE)
             / (sa.n + sb.n - inter) AS jac
      FROM exact
      JOIN sizes sa ON sa.doc_id = exact.a
      JOIN sizes sb ON sb.doc_id = exact.b),
    est AS (
      SELECT ma.doc_id AS a, mb.doc_id AS b,
             CAST(count_if(ma.sig = mb.sig) AS DOUBLE) / {_CAL_PERMS}
               AS est
      FROM mh ma JOIN mh mb
        ON mb.doc_id = ma.doc_id + 1 AND ma.p = mb.p
      GROUP BY ma.doc_id, mb.doc_id)
    SELECT CAST(floor(jac * 5) AS BIGINT) AS jac_bin,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(SUM(CAST(round(abs(est - jac) * 1e9, 0) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 1e9, 6) AS mae,
           round(CAST(SUM(CAST(round((est - jac) * 1e9, 0) AS BIGINT))
                      AS DOUBLE) / COUNT(*) / 1e9, 6) AS bias
    FROM ej JOIN est ON ej.a = est.a AND ej.b = est.b
    GROUP BY 1
    """,
)
def q_dedup_minhash_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash quality calibration: over the bounded consecutive-pair
    frame (doc i vs doc i+1 — N-1 pairs, never quadratic), the
    {p}-permutation MinHash Jaccard ESTIMATE versus the exact 3-gram
    shingle Jaccard, reported as mean-absolute-error and signed bias
    per Jaccard quintile bin.  This is the measurement that justifies
    (or indicts) the permutation count before the LSH dedup's
    keep/drop verdicts are trusted at 100 TB: E[MAE] ~ sqrt(J(1-J)/p),
    so a bin whose MAE is far off that curve means broken hashing.

    Exactness: shingle sets, signature matches, and intersections are
    exact (md5 min-hashing is pure string order, identical in both
    engines); est and jac are single divisions of exact counts, and
    their differences are re-quantized to a 1e-9 integer grid before
    the per-bin sum, so accumulation order cannot perturb the mean.
    Scale: the permutation expansion (docs x {p}) is the standard
    MinHash cost — linear, shuffle on (doc, perm) — and the exact-
    Jaccard join runs only on the N-1 candidate pairs, not all
    pairs."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    sh = (
        toks.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("w") - F.lit(_CAL_SHINGLE - 1)
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("w", i),
                        F.element_at("w", i + 1),
                        F.element_at("w", i + 2),
                    ),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    perms = spark.range(_CAL_PERMS).select(F.col("id").alias("p"))
    mh = (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "p")
        .agg(
            F.min(
                F.md5(
                    F.concat(
                        F.col("p").cast("string"), F.lit(":"), F.col("shingle")
                    )
                )
            ).alias("sig")
        )
    )
    ids = d.select("doc_id")
    pairs = ids.alias("x").join(
        ids.alias("y"),
        F.col("y.doc_id") == F.col("x.doc_id") + 1,
    ).select(
        F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("doc_id").alias("a"), "shingle")
    sb = sh.select(
        F.col("doc_id").alias("pb"), F.col("shingle").alias("sh_b")
    )
    inter = (
        pairs.join(sa, "a")
        .join(
            sb,
            (F.col("pb") == F.col("b"))
            & (F.col("sh_b") == F.col("shingle")),
            "left",
        )
        .groupBy("a", "b")
        .agg(F.count_if(F.col("sh_b").isNotNull()).alias("inter"))
    )
    ej = (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).alias("jac"),
        )
    )
    ma = mh.select(F.col("doc_id").alias("a"), "p", F.col("sig").alias("siga"))
    mb = mh.select(F.col("doc_id").alias("b"), "p", F.col("sig").alias("sigb"))
    est = (
        ma.join(mb, (F.col("b") == F.col("a") + 1) & (ma["p"] == mb["p"]))
        .groupBy("a", "b")
        .agg(
            (
                F.count_if(F.col("siga") == F.col("sigb")).cast("double")
                / _CAL_PERMS
            ).alias("est")
        )
    )
    joined = ej.join(est, ["a", "b"]).select(
        F.floor(F.col("jac") * 5).cast("long").alias("jac_bin"),
        F.round(F.abs(F.col("est") - F.col("jac")) * 1e9, 0)
        .cast("long")
        .alias("uabs"),
        F.round((F.col("est") - F.col("jac")) * 1e9, 0)
        .cast("long")
        .alias("usgn"),
    )
    return joined.groupBy("jac_bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum("uabs").cast("double") / F.count(F.lit(1)) / 1e9, 6
        ).alias("mae"),
        F.round(
            F.sum("usgn").cast("double") / F.count(F.lit(1)) / 1e9, 6
        ).alias("bias"),
    )


q_dedup_minhash_calibration.__doc__ = (
    q_dedup_minhash_calibration.__doc__.format(p=_CAL_PERMS)
)
