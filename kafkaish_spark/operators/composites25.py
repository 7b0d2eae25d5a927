"""Retrieval-quality and graph-structure kernels: nDCG/MRR/recall@k
over the embedding corpus, probability calibration bins for the logreg
scores, and degree-oriented triangle counting.

The retrieval-eval family closes the loop the ANN operators opened:
q_sim_topk / the LSH+IVF paths RETRIEVE, these kernels SCORE the
retrieval against labels — the eval harness every embedding pipeline
runs before swapping an index.  Float discipline follows the repo's
ML-kernel recipe: rank weights are pre-quantized integer LITERALS
(identical in both engines), sums happen in exact int64, and each
final metric is ONE IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.vectors import cosine_sim
from kafkaish_spark.operators.composites22 import (
    _LOGREG_STEP1_SQL,
    _LR_DIMS,
    _logreg_parts,
)
from kafkaish_spark.operators.llm import _DOT_SQL
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_K = 10  # top-k cutoff for the retrieval metrics
_N_QUERIES = 20  # vec_id < 20 are the query set

# 1e6-quantized DCG rank weights: round(1/log2(rank+1) * 1e6) for
# rank 1..10, baked as literals so BOTH engines sum exact integers and
# never evaluate log2 at query time (log2 is not correctly rounded and
# differs libm vs JVM in the last ulp).
_DCG_W = (1000000, 630930, 500000, 430677, 386853,
          356207, 333333, 315465, 301030, 289065)
_DCG_CUM = tuple(sum(_DCG_W[:i]) for i in range(1, _K + 1))

_W_CASE_SQL = "CASE rn " + " ".join(
    f"WHEN {r + 1} THEN {w}" for r, w in enumerate(_DCG_W)
) + " END"
_IDCG_CASE_SQL = "CASE LEAST(n_same, 10) " + " ".join(
    f"WHEN {m + 1} THEN {c}" for m, c in enumerate(_DCG_CUM)
) + " ELSE 0 END"


@query(
    "q_retrieval_eval_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS qlabel,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS qn
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
    pairs AS (
      SELECT query_id, qlabel, e.vec_id AS neighbor_id,
             CAST(e.label = qlabel AS BIGINT) AS rel,
             round({_DOT_SQL.format(a='qe', b='e.embedding')}
                   / (qn * sqrt({_DOT_SQL.format(a='e.embedding',
                                                 b='e.embedding')})), 6)
               AS cos_sim
      FROM q, embeddings e WHERE e.vec_id <> query_id),
    ranked AS (
      SELECT query_id, rel,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn,
             CAST(SUM(rel) OVER (PARTITION BY query_id) AS BIGINT) AS n_same
      FROM pairs),
    top AS (
      SELECT query_id, ANY_VALUE(n_same) AS n_same,
             CAST(SUM(rel) AS BIGINT) AS hits_at10,
             CAST(SUM(rel * {_W_CASE_SQL}) AS BIGINT) AS dcg_micro,
             CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT)
               AS first_hit_rank
      FROM ranked WHERE rn <= {_K} GROUP BY query_id)
    SELECT query_id, n_same, hits_at10,
           round(CAST(hits_at10 AS DOUBLE) / nullif(n_same, 0), 6)
             AS recall_at10,
           round(COALESCE(1.0 / first_hit_rank, 0.0), 6) AS mrr,
           round(CAST(dcg_micro AS DOUBLE) / nullif({_IDCG_CASE_SQL}, 0), 6)
             AS ndcg_at10
    FROM top
    """,
)
def q_retrieval_eval_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieval eval over the labeled embedding corpus: for each of
    the first {_N_QUERIES} vectors as queries, rank all other vectors
    by rounded cosine (id tiebreak — the exact q_sim_topk ordering) and
    score the top-10 against label agreement: recall@10 (hits over ALL
    same-label candidates), MRR (1/first-hit rank) and nDCG@10 with
    the pre-quantized integer weight ladder.

    Plan shape: the query set broadcasts, candidates stream — the same
    O(|Q| x N) scan as q_sim_topk, so eval costs what one retrieval
    sweep costs, at any corpus size.  DCG/IDCG accumulate as exact
    int64 micro-weights; each output metric is one IEEE division of
    exactly-agreed operands, so the driver hash-matches."""
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
                F.col("label").alias("nlabel"),
            )
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.col("nlabel") == F.col("qlabel")).cast("long").alias("rel"),
            F.round(cosine_sim(F.col("qe"), F.col("ne")), 6).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    w_all = Window.partitionBy("query_id")
    ranked = pairs.select(
        "query_id",
        "rel",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("rel").over(w_all).cast("long").alias("n_same"),
    )
    wt = F.element_at(
        F.array(*[F.lit(w) for w in _DCG_W]), F.col("rn").cast("int")
    )
    # greatest(1, ...) keeps element_at's index valid when n_same = 0;
    # the final projection nulls ndcg for that case (mirrors the
    # oracle's nullif on the zero-IDCG branch)
    idcg = F.element_at(
        F.array(*[F.lit(c) for c in _DCG_CUM]),
        F.greatest(F.least(F.col("n_same"), F.lit(_K)), F.lit(1)).cast("int"),
    )
    top = (
        ranked.filter(F.col("rn") <= _K)
        .groupBy("query_id")
        .agg(
            F.any_value("n_same").alias("n_same"),
            F.sum("rel").cast("long").alias("hits_at10"),
            F.sum(F.col("rel") * wt).cast("long").alias("dcg_micro"),
            F.min(F.when(F.col("rel") == 1, F.col("rn")))
            .cast("long")
            .alias("first_hit_rank"),
        )
    )
    return top.select(
        "query_id",
        "n_same",
        "hits_at10",
        # nullif twin of the oracle: a query whose label is unique in
        # the corpus (n_same = 0) must yield NULL on both engines, not
        # Spark-NULL vs DuckDB IEEE 0/0 = nan (round-3 ADVICE item 2)
        F.when(F.col("n_same") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(F.col("hits_at10").cast("double") / F.col("n_same"), 6)
        )
        .alias("recall_at10"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_hit_rank"), F.lit(0.0)
            ),
            6,
        ).alias("mrr"),
        F.when(
            F.col("n_same") == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(F.col("dcg_micro").cast("double") / idcg, 6)
        )
        .alias("ndcg_at10"),
    )


_CAL_BINS = 10


@query(
    "q_ml_calibration_bins",
    oracle=f"""
    WITH {_LOGREG_STEP1_SQL.format(d=_LR_DIMS + 1, dims=_LR_DIMS)},
    binned AS (
      SELECT LEAST(CAST(floor(s * {_CAL_BINS}) AS BIGINT), {_CAL_BINS - 1})
               AS bin,
             y, CAST(round(s * 1000000) AS BIGINT) AS s_micro
      FROM scored)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           round(CAST(SUM(s_micro) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
             AS mean_pred
    FROM binned GROUP BY bin
    """,
)
def q_ml_calibration_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram for the step-1 logreg scores: 10
    equal-width probability bins, each reporting predicted-vs-actual
    positive rate — the calibration check that decides whether a
    model's scores can gate data (quality filtering at a threshold)
    or must be re-scaled (Platt/isotonic) first.

    Shares the ONE logistic subtree (_logreg_parts) with
    gd2/auc/confusion, so the sigmoid and feature slice cannot
    drift.  mean_pred accumulates 1e6-quantized scores as exact
    int64 (partition-order-proof); frac_pos and mean_pred are each
    one IEEE division.  One partial-agg shuffle of 10 bins."""
    scored = _logreg_parts(spark, sf)["scored"]
    b = F.least(
        F.floor(F.col("s") * _CAL_BINS).cast("long"),
        F.lit(_CAL_BINS - 1),
    )
    return (
        scored.select(
            b.alias("bin"),
            "y",
            F.round(F.col("s") * 1e6).cast("long").alias("s_micro"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_pos"),
            F.round(
                F.sum("s_micro").cast("double")
                / (F.lit(1e6) * F.count(F.lit(1))),
                6,
            ).alias("mean_pred"),
        )
    )


@query(
    "q_graph_triangle_count",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                FROM lineitem),
    e AS (SELECT DISTINCT s1.pk AS a, s2.pk AS b
          FROM li s1 JOIN li s2 ON s1.ok = s2.ok AND s1.pk < s2.pk),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
              SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node),
    tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM e x JOIN e y ON y.a = x.b
                     JOIN e z ON z.a = x.a AND z.b = y.b),
    wd AS (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) AS w FROM deg)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT t FROM tri) AS n_triangles,
           round(3.0 * (SELECT t FROM tri) / (SELECT w FROM wd), 6)
             AS global_clustering
    """,
)
def q_graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle count + global clustering coefficient over the part
    co-purchase graph (parts sharing an order), using the
    DEGREE-ORIENTED wedge algorithm: orient every undirected edge from
    its lower-(degree, id) endpoint to its higher one, enumerate wedges
    only at each edge's SOURCE, and close them against the canonical
    edge set.  Orientation bounds per-node out-degree by O(sqrt(|E|)),
    so the wedge join is near-linear even with power-law hubs — the
    difference between feasible and quadratic at a 100 TB edge list
    (the naive oracle join explodes on exactly the hub wedges the
    orientation avoids).  Every triangle has exactly one source whose
    two out-edges reach the other two vertices, so the oriented count
    equals the naive a<b<c count — which is what the oracle states.
    Clustering = 3*triangles / wedges, both exact int64, one IEEE
    division."""
    li = t(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    l2 = li.select(F.col("ok"), F.col("pk").alias("pk2"))
    e = (
        li.join(l2, "ok")
        .filter(F.col("pk") < F.col("pk2"))
        .select(F.col("pk").alias("a"), F.col("pk2").alias("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
    )
    o2 = oriented.select(F.col("src"), F.col("dst").alias("dst2"))
    wedges = (
        oriented.join(o2, "src")
        .filter(F.col("dst") < F.col("dst2"))
        .select(
            F.col("dst").alias("a"), F.col("dst2").alias("b")
        )  # canonical (a<b) closing edge to look up
    )
    tri = wedges.join(e, ["a", "b"]).agg(
        F.count(F.lit(1)).cast("long").alias("t")
    )
    wsum = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long"))
        .cast("long")
        .alias("w")
    )
    counts = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
    return (
        counts.crossJoin(tri)
        .crossJoin(wsum)
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.round(F.lit(3.0) * F.col("t") / F.col("w"), 6).alias(
                "global_clustering"
            ),
        )
    )


_MRL_DIMS = 16  # truncation length for the matryoshka comparison


@query(
    "q_retrieval_matryoshka_overlap",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe,
             array_slice(embedding, 1, {_MRL_DIMS}) AS qe16,
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS qn,
             sqrt({_DOT_SQL.format(
                 a=f'array_slice(embedding, 1, {_MRL_DIMS})',
                 b=f'array_slice(embedding, 1, {_MRL_DIMS})')}) AS qn16
      FROM embeddings WHERE vec_id < {_N_QUERIES}),
    pairs AS (
      SELECT query_id, e.vec_id AS neighbor_id,
             round({_DOT_SQL.format(a='qe', b='e.embedding')}
                   / (qn * sqrt({_DOT_SQL.format(
                       a='e.embedding', b='e.embedding')})), 6) AS cf,
             round({_DOT_SQL.format(
                 a='qe16', b=f'array_slice(e.embedding, 1, {_MRL_DIMS})')}
                   / (qn16 * sqrt({_DOT_SQL.format(
                       a=f'array_slice(e.embedding, 1, {_MRL_DIMS})',
                       b=f'array_slice(e.embedding, 1, {_MRL_DIMS})')})), 6)
               AS ct
      FROM q, embeddings e WHERE e.vec_id <> query_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cf DESC, neighbor_id) AS rf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ct DESC, neighbor_id) AS rt
      FROM pairs)
    SELECT query_id,
           CAST(SUM(CASE WHEN rf <= {_K} AND rt <= {_K} THEN 1 ELSE 0 END)
                AS BIGINT) AS overlap_at10,
           round(CAST(SUM(CASE WHEN rf <= {_K} AND rt <= {_K}
                               THEN 1 ELSE 0 END) AS DOUBLE) / {_K}, 6)
             AS overlap_frac
    FROM ranked GROUP BY query_id
    """,
)
def q_retrieval_matryoshka_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-truncation eval: how much of the FULL-precision
    top-10 survives when vectors are truncated to their first
    {_MRL_DIMS} dims — the decision metric for serving MRL embeddings
    at a fraction of the index size/bandwidth (a high overlap says the
    short prefix is retrieval-sufficient; a collapse says this
    embedding wasn't matryoshka-trained).  Same broadcast-queries /
    streamed-candidates plan as the other eval kernels, with BOTH
    rankings computed in one pass over the pair stream (two windows on
    the same shuffle key, so the second ranking is free of extra data
    motion).  Overlap is an integer; the fraction is one division."""
    e = t(spark, sf, "embeddings")
    tr = lambda c: F.slice(c, 1, _MRL_DIMS)  # noqa: E731
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        tr(F.col("embedding")).alias("qe16"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
            )
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qe"), F.col("ne")), 6).alias("cf"),
            F.round(
                cosine_sim(F.col("qe16"), tr(F.col("ne"))), 6
            ).alias("ct"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cf").desc(), F.col("neighbor_id")
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.col("ct").desc(), F.col("neighbor_id")
    )
    both = (
        (F.col("rf") <= _K) & (F.col("rt") <= _K)
    ).cast("long")
    return (
        pairs.select(
            "query_id",
            F.row_number().over(wf).alias("rf"),
            F.row_number().over(wt).alias("rt"),
        )
        .groupBy("query_id")
        .agg(
            F.sum(both).alias("overlap_at10"),
            F.round(F.sum(both).cast("double") / _K, 6).alias(
                "overlap_frac"
            ),
        )
    )
