"""Round-2 additions, batch 10: full Lloyd k-means iterations under
the oracle.
[NS] north-star extension — the reference
(/root/reference/src/topic.js) has no processing layer; this closes
the E/M loop the existing kernels left to a driver loop
(q_embed_kmeans_assign = one E-step, q_embed_centroids = one M-step)
into a complete, bit-reproducible 2-round Lloyd iteration checked
end-to-end against an unrolled-CTE DuckDB oracle — the same
iterative-algorithm contract PageRank established.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_K = 8
_DIM = 64
_GRID = 1_000_000  # micro-grid for exact M-step sums

_SQL_DIST = (
    "round(list_reduce(list_transform(list_zip({a}, {b}),"
    " s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y), 6)"
)


def _dist(a, b):
    """Squared L2 as a left-to-right fold (bit-equal to the oracle's
    list_reduce), rounded before any argmin/tiebreak."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


@query(
    "q_embed_kmeans_lloyd2",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {_K}),
    d1 AS (
      SELECT e.vec_id, c.cid,
             {_SQL_DIST.format(a='e.v', b='c.cv')} AS dist
      FROM e CROSS JOIN c0 c),
    a1 AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1),
    dims AS (
      SELECT a1.cluster, t.i,
             CAST(round(e.v[CAST(t.i AS INTEGER)] * {_GRID}) AS BIGINT) AS q
      FROM a1 JOIN e USING (vec_id), range(1, {_DIM + 1}) t(i)),
    m1 AS (
      SELECT cluster, i, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n
      FROM dims GROUP BY 1, 2),
    c1 AS (
      SELECT cluster AS cid,
             list(CAST(s AS DOUBLE) / ({_GRID}.0 * n) ORDER BY i) AS cv
      FROM m1 GROUP BY 1),
    d2 AS (
      SELECT e.vec_id, c.cid,
             {_SQL_DIST.format(a='e.v', b='c.cv')} AS dist
      FROM e CROSS JOIN c1 c),
    a2 AS (
      SELECT vec_id, cid AS cluster, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1),
    mv AS (
      SELECT c0.cid AS cluster,
             {_SQL_DIST.format(a='c0.cv', b='c1.cv')} AS movement
      FROM c0 JOIN c1 ON c0.cid = c1.cid)
    SELECT a2.cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CAST(round(dist * {_GRID}) AS BIGINT)) AS BIGINT)
             AS inertia_micro,
           (SELECT movement FROM mv WHERE mv.cluster = a2.cluster)
             AS movement
    FROM a2 GROUP BY a2.cluster
    """,
)
def q_embed_kmeans_lloyd2(spark: SparkSession, sf: str) -> DataFrame:
    """TWO full Lloyd k-means rounds, hash-checked: E-step (nearest of
    k=8 deterministic seeds), M-step (centroid = per-dimension mean),
    then a second E-step, reporting per-cluster size, inertia, and how
    far each centroid moved.

    Bit-reproducibility across engines AND partitionings — the crux of
    distributed iterative ML — comes from three rules: (1) distances
    are left-to-right folds over the dimension order (zip_with +
    aggregate == list_zip + list_reduce), rounded before the argmin
    tiebreak; (2) the M-step sums per-dimension values on an exact
    integer micro-grid (quantize-then-sum is order-independent where a
    float sum is not), and the new centroid coordinate is one IEEE
    division of exact integers; (3) inertia re-quantizes the rounded
    distances before summing.  This extends the PageRank ordered-fold
    contract from scalar to VECTOR state.

    Scale: per round, assignment is a broadcast of k centroids against
    a partitioned scan (shuffle-free; per-vector argmin via group-
    limit), and the M-step is one shuffle of (cluster, dim) partial
    sums — Lloyd's canonical Pregel-free formulation.  More rounds =
    the same two stages repeated; k scales to thousands before the
    broadcast matters."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    c0 = e.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
        d = vecs.crossJoin(F.broadcast(cents)).select(
            "vec_id", "v", "cid", _dist(F.col("v"), F.col("cv")).alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        return (
            d.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", F.col("cid").alias("cluster"), "dist")
        )

    a1 = assign(e, c0)
    dims = a1.select(
        "cluster", F.posexplode("v").alias("i", "val")
    ).select(
        "cluster",
        "i",
        F.round(F.col("val") * _GRID).cast("long").alias("q"),
    )
    m1 = dims.groupBy("cluster", "i").agg(
        F.sum("q").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    c1 = m1.groupBy("cluster").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "i",
                        (
                            F.col("s").cast("double")
                            / (F.lit(float(_GRID)) * F.col("n"))
                        ).alias("d"),
                    )
                )
            ),
            lambda s: s["d"],
        ).alias("cv")
    ).select(F.col("cluster").alias("cid"), "cv")

    a2 = assign(e, c1)
    mv = c0.alias("z").join(
        c1.alias("o"), F.col("z.cid") == F.col("o.cid")
    ).select(
        F.col("z.cid").alias("cluster"),
        _dist(F.col("z.cv"), F.col("o.cv")).alias("movement"),
    )
    return (
        a2.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.round(F.col("dist") * _GRID).cast("long"))
            .cast("long")
            .alias("inertia_micro"),
        )
        .join(F.broadcast(mv), "cluster")
        .select("cluster", "n_members", "inertia_micro", "movement")
    )
