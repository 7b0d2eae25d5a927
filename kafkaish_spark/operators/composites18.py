"""Round-2 additions, batch 6: Spark 4 SQL-surface coverage (pipe
syntax, SQL-language UDFs) and whitened-embedding outlier mining.
[NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer; these round
out the SQL API surface a user migrating a warehouse workload onto
the engine would reach for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


@query(
    "q_sql_pipe_summary",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_sql_pipe_summary(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's ``|>`` operators): the same logical
    plan as the classic SELECT, stated as a top-to-bottom dataflow —
    the migration surface for users coming from pipe-first SQL
    dialects.  Catalyst compiles both spellings to the identical plan
    (scan with pushed filter -> partial HashAggregate -> Exchange ->
    final), so there is no performance dialect tax; the money sum is
    cents-exact via the repo's integer-grid rule."""
    t(spark, sf, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS cents
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, CAST(n_orders AS BIGINT) AS n_orders,
                  cents
        """
    )


@query(
    "q_sql_udf_price_band",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'jumbo'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'small' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    GROUP BY 1
    """,
)
def q_sql_udf_price_band(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-language scalar UDF (CREATE TEMPORARY FUNCTION ... RETURN
    expr): the user-extension surface that stays ENTIRELY inside
    Catalyst — the function body is inlined into the plan as an
    expression, so unlike a Python UDF there is no serialization
    boundary, codegen spans it, and predicate pushdown still sees
    through it.  This is the recommended first stop for custom logic
    before any Python UDF (U1-U4 cover those)."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p >= 200000 THEN 'jumbo'
                    WHEN p >= 50000 THEN 'mid'
                    ELSE 'small' END
        """
    )
    t(spark, sf, "orders").createOrReplaceTempView("orders_udf_v")
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_key
        FROM orders_udf_v
        GROUP BY 1
        """
    )


_N_OUTLIERS = 20


@query(
    "q_embed_outliers_maha",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, i AS pos, embedding[i+1] AS v
      FROM embeddings, unnest(range(len(embedding))) AS u(i)),
    q AS (
      SELECT vec_id, pos,
             CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS qv
      FROM ex),
    st AS (
      SELECT pos, COUNT(*) AS n, SUM(qv) AS s, SUM(qv * qv) AS ss
      FROM q GROUP BY pos),
    w AS (
      SELECT vec_id, pos,
             round((CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
                   / nullif(sqrt(CAST(ss AS DOUBLE) / n
                                 - (CAST(s AS DOUBLE) / n)
                                   * (CAST(s AS DOUBLE) / n)), 0),
                   6) AS wv
      FROM q JOIN st USING (pos)),
    d AS (
      SELECT vec_id,
             round(sqrt(list_reduce(
                 list_prepend(CAST(0.0 AS DOUBLE),
                              list(wv * wv ORDER BY pos)),
                 (a, b) -> a + b)), 6) AS maha
      FROM w GROUP BY vec_id)
    SELECT vec_id, maha
    FROM d
    ORDER BY maha DESC, vec_id
    LIMIT {_N_OUTLIERS}
    """,
)
def q_embed_outliers_maha(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding outliers by diagonal-covariance Mahalanobis distance
    — the norm of the whitened vector (same per-dimension z-scores as
    q_embed_whitening): vectors far from the corpus distribution in
    ANY direction surface first, the standard embedding-space junk
    detector before clustering or retrieval indexing.

    Determinism chain: z-scores come from exact integer-grid moments;
    the squared-norm folds position-ordered rounded terms from a 0.0
    seed (the q_graph_pagerank fold contract), so sqrt sees the same
    IEEE double in both engines; the top-N cut (_N_OUTLIERS) tiebreaks
    on vec_id.  Plan: the whitening subtree (64-row broadcast moment
    table) -> per-vector fold -> TakeOrderedAndProject — the top-k
    never global-sorts."""
    from kafkaish_spark.operators.composites14 import whitened_dims

    sq = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "wv"))),
            lambda s: s["wv"] * s["wv"],
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return (
        whitened_dims(spark, sf)
        .groupBy("vec_id")
        .agg(F.round(F.sqrt(sq), 6).alias("maha"))
        .orderBy(F.desc("maha"), "vec_id")
        .limit(_N_OUTLIERS)
    )
