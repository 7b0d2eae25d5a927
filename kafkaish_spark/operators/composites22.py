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

from kafkaish_spark.functions.folds import ordered_sum
from kafkaish_spark.plans.registry import query
from kafkaish_spark.session import session_token
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


_VEC_CACHE: tuple | None = None  # (session_id, sf_dir, frame) — leak guard


def _cached_vecs(spark: SparkSession, sf: str) -> DataFrame:
    """The (vec_id, v: array<double>) working set, persisted across the
    multiple passes an iterative kernel makes (two E-steps + an M-step
    here — MLlib caches its feature set across Lloyd rounds for the
    same reason).  Session+sf keyed, evict-before-replace, at most one
    copy pinned (the llm shingle-cache contract)."""
    global _VEC_CACHE
    key = (session_token(spark), sf)
    if _VEC_CACHE is not None and _VEC_CACHE[:2] == key:
        return _VEC_CACHE[2]
    if _VEC_CACHE is not None:
        try:
            _VEC_CACHE[2].unpersist(blocking=False)
        except Exception:
            pass  # evicted frame's session may already be stopped
    frame = (
        t(spark, sf, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    _VEC_CACHE = (*key, frame)
    return frame


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
    bench=True,
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

    Scale: per round, the k x d centroid state is COLLECTED (bounded:
    k*d doubles — the "broadcast k x d state" of the iterative-vector
    recipe) and inlined into a per-row argmin projection, so the
    E-step is completely shuffle-free: no N x k expansion ever crosses
    the wire (the earlier window formulation shuffled N x k rows on
    vec_id per round — fine at k=8 locally, quadratic waste at 10^9
    vectors).  The M-step is one shuffle of (cluster, dim) integer
    partial sums — Lloyd's canonical Pregel-free formulation.  More
    rounds = the same two stages repeated; k scales to thousands
    before the literal state matters."""
    e = _cached_vecs(spark, sf)
    c0 = e.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    def assign(vecs: DataFrame, cent_rows: list) -> DataFrame:
        # argmin over an inlined (dist, cid) struct array: struct
        # comparison is lexicographic, so array_min reproduces the
        # (rounded dist, cid) tie-break of the window formulation and
        # of the oracle's row_number ordering, row-locally.
        #
        # The k x (d+1) literal tree is built as ONE SQL string parsed
        # in the JVM rather than k*d F.lit() py4j calls: profiling
        # (optimization r12, guide §1) showed ~0.6 s per assign() of
        # pure driver-side expression construction at k=8, d=64 —
        # twice per query.  repr(float) round-trips doubles exactly
        # and the 'D' suffix pins the literal to DoubleType, so the
        # parsed tree is value-identical to the F.lit construction.
        def lit_d(x: float) -> str:
            return f"{x!r}D"

        structs = ", ".join(
            "named_struct('dist', round(aggregate(zip_with(v, array("
            + ", ".join(lit_d(float(x)) for x in r["cv"])
            + "), (x, y) -> (x - y) * (x - y)), cast(0.0 as double),"
            " (acc, x) -> acc + x), 6), 'cid', "
            + f"{int(r['cid'])}L)"
            for r in sorted(cent_rows, key=lambda r: r["cid"])
        )
        best = F.array_min(F.expr(f"array({structs})"))
        return vecs.select(
            "vec_id",
            "v",
            best["cid"].alias("cluster"),
            best["dist"].alias("dist"),
        )

    c0_rows_list = c0.collect()
    a1 = assign(e, c0_rows_list)
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

    c0_rows = {int(r["cid"]): list(r["cv"]) for r in c0_rows_list}
    c1_rows = c1.collect()
    a2 = assign(e, c1_rows)
    # movement from the already-collected states (re-materializing c1
    # here would recompute the whole M-step subtree in the final DAG);
    # createDataFrame re-embeds the exact same doubles, and _dist is
    # the same Spark fold the join formulation evaluated.
    mv = spark.createDataFrame(
        [
            (int(r["cid"]), c0_rows[int(r["cid"])], list(r["cv"]))
            for r in c1_rows
        ],
        "cluster long, zv array<double>, ov array<double>",
    ).select("cluster", _dist(F.col("zv"), F.col("ov")).alias("movement"))
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


# --------------------------------------------------- PCA power iteration
_FOLD_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {lst}), (a, b) -> a + b)"
)


@query(
    "q_embed_pca_power",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, t.i,
             CAST(round(CAST(embedding AS DOUBLE[])[CAST(t.i AS INTEGER)]
                        * {_GRID}) AS BIGINT) AS q
      FROM embeddings, range(1, {_DIM + 1}) t(i)),
    A AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS a
      FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2),
    u1 AS (
      SELECT i, CAST(SUM(a) AS DOUBLE) AS u FROM A GROUP BY i),
    n1 AS (
      SELECT sqrt({_FOLD_SQL.format(lst="list(u * u ORDER BY i)")}) AS n
      FROM u1),
    v1 AS (
      SELECT i AS j, u / (SELECT n FROM n1) AS w FROM u1),
    u2 AS (
      SELECT A.i,
             {_FOLD_SQL.format(lst="list(CAST(A.a AS DOUBLE) * v1.w ORDER BY A.j)")}
               AS u
      FROM A JOIN v1 ON A.j = v1.j GROUP BY A.i),
    n2 AS (
      SELECT sqrt({_FOLD_SQL.format(lst="list(u * u ORDER BY i)")}) AS n
      FROM u2),
    lam AS (
      SELECT {_FOLD_SQL.format(lst="list(u2.u * v1.w ORDER BY u2.i)")} AS l
      FROM u2 JOIN v1 ON u2.i = v1.j)
    SELECT u2.i AS dim,
           round(u2.u / (SELECT n FROM n2), 6) AS loading,
           round((SELECT l FROM lam) / 1000000000000.0, 6) AS eigenvalue
    FROM u2
    """,
)
def q_embed_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    """Top principal component of the embedding Gram matrix by TWO
    power-iteration steps, hash-checked: the 64x64 second-moment
    matrix A[i][j] = sum_v q_i*q_j is built EXACTLY (micro-grid
    integer products, int64-safe to ~100k vectors at 64 dims), the
    first matvec is exact integer row sums (start vector = all-ones),
    and the second is an ordered fold over the dimension index — so
    every intermediate double is the same IEEE value in both engines,
    including the Rayleigh-quotient eigenvalue.

    This is the vector-iteration counterpart to q_embed_kmeans_lloyd2
    and q_graph_pagerank: the reusable recipe is (1) exact integer
    moment matrix, one shuffle, mergeable partials; (2) per-round
    matvec = join + ordered fold, broadcast-sized state (the 64-vector
    rides to every executor); more rounds repeat stage 2.  The top PC
    is the embedding-pipeline workhorse: de-biasing (remove dominant
    direction), drift monitoring (PC rotation between snapshots), and
    ABTT-style postprocessing all start here.

    Scale: the Gram build dominates — O(vectors x dim^2) products with
    map-side partial sums collapsing to 4096 cells per task; at 100 TB
    the same plan holds because the shuffle carries only the 64x64
    partials, never vectors."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.select("vec_id", F.posexplode("v").alias("i", "val")).select(
        "vec_id", "i", F.round(F.col("val") * _GRID).cast("long").alias("q")
    )
    A = (
        q.alias("a")
        .join(q.alias("b"), "vec_id")
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            (F.col("a.q") * F.col("b.q")).alias("p"),
        )
        .groupBy("i", "j")
        .agg(F.sum("p").cast("long").alias("a"))
    )


    u1 = A.groupBy("i").agg(F.sum("a").cast("long").cast("double").alias("u"))
    n1 = u1.agg(
        F.sqrt(ordered_sum(F.col("i"), F.col("u") * F.col("u"))).alias("n")
    )
    v1 = u1.crossJoin(F.broadcast(n1)).select(
        F.col("i").alias("jj"), (F.col("u") / F.col("n")).alias("w")
    )
    u2 = (
        A.join(F.broadcast(v1), A.j == F.col("jj"))
        .groupBy("i")
        .agg(
            ordered_sum(
                F.col("j"), F.col("a").cast("double") * F.col("w")
            ).alias("u")
        )
    )
    n2 = u2.agg(
        F.sqrt(ordered_sum(F.col("i"), F.col("u") * F.col("u"))).alias("n")
    )
    lam = (
        u2.join(F.broadcast(v1), u2.i == F.col("jj"))
        .agg(ordered_sum(F.col("i"), F.col("u") * F.col("w")).alias("l"))
    )
    return (
        u2.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(lam))
        .select(
            (F.col("i") + 1).cast("long").alias("dim"),  # 1-based like the oracle
            F.round(F.col("u") / F.col("n"), 6).alias("loading"),
            F.round(F.col("l") / F.lit(1e12), 6).alias("eigenvalue"),
        )
    )


# ------------------------------------------------------- DAU/MAU ratio
@query(
    "q_events_dau_mau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
    mu AS (
      SELECT DISTINCT CAST(date_trunc('month', ts) AS DATE) AS m, user_id
      FROM events),
    mau AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS mau FROM mu GROUP BY m)
    SELECT dau.d, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN mau ON CAST(date_trunc('month', dau.d) AS DATE) = mau.m
    """,
)
def q_events_dau_mau(spark: SparkSession, sf: str) -> DataFrame:
    """DAU/MAU stickiness per day — the product-health ratio next to
    the rolling WAU (q_events_rolling_wau): daily distinct actives
    over their calendar month's distinct actives.  Both distinct sets
    collapse map-side to (period, user) pairs before any counting, so
    the shuffles are bounded by actives, not events; the month table
    is a handful of rows broadcast back onto the daily series.
    Dates come from the NTZ wall-clock ts, so the metric is identical
    in every driver timezone (the repo's tz-proofing contract)."""
    ev = t(spark, sf, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    dau = du.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    mu = ev.select(
        F.trunc("ts", "month").alias("m"), "user_id"
    ).distinct()
    mau = mu.groupBy("m").agg(F.count(F.lit(1)).alias("mau"))
    return (
        dau.join(F.broadcast(mau), F.trunc("d", "month") == F.col("m"))
        .select(
            "d",
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


# ------------------------------------------- logistic regression (2 GD)
_LR_DIMS = 8  # features = first 8 embedding dims
# fast sigmoid 0.5 + x/(2(1+|x|)): same elementary IEEE ops in both
# engines (exp() is NOT correctly rounded and differs libm vs JVM)
_SIG_SQL = "(0.5 + {x} / (2.0 * (1.0 + abs({x}))))"

# ONE definition of the step-1 logistic CTE chain, interpolated into
# every consuming oracle (gd2 / auc / auc_binned) so the feature
# slice, grid constant and sigmoid can never drift between them —
# the SQL-side twin of _logreg_parts.  The WHERE guard mirrors the
# Spark side's explicit filter: rows with NULL or short embeddings
# are excluded identically in both engines (posexplode would silently
# drop them on the Spark side only).
_LOGREG_STEP1_SQL = """x AS (
      SELECT vec_id, t.j,
             CAST(embedding AS DOUBLE[])[CAST(t.j AS INTEGER)] AS xv,
             label % 2 AS y
      FROM embeddings, range(1, {d}) t(j)
      WHERE embedding IS NOT NULL AND len(embedding) >= {dims}),
    n AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM x),
    g1 AS (
      SELECT j, CAST(SUM(CAST(round((0.5 - y) * xv * 1000000) AS BIGINT))
                     AS BIGINT) AS g
      FROM x GROUP BY j),
    w1 AS (
      SELECT j, -CAST(g AS DOUBLE) / (1000000.0 * (SELECT n FROM n)) AS w
      FROM g1),
    dots AS (
      SELECT x.vec_id, ANY_VALUE(x.y) AS y,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(w1.w * x.xv ORDER BY x.j)),
                         (a, b) -> a + b) AS dot
      FROM x JOIN w1 ON x.j = w1.j GROUP BY x.vec_id),
    scored AS (
      SELECT vec_id, y, (0.5 + dot / (2.0 * (1.0 + abs(dot)))) AS s
      FROM dots)"""


_LR_CACHE: tuple | None = None  # (session_id, sf_dir, parts) — leak guard


def _logreg_parts(spark: SparkSession, sf: str) -> dict:
    """Shared step-1 logistic subtree: features x, row count n, first
    weight vector w1, and fast-sigmoid scores per row — ONE definition
    consumed by q_ml_logreg_gd2 (training), q_ml_auc / q_ml_auc_binned
    (ranking metrics), q_ml_eval_confusion and q_ml_calibration_bins,
    so the feature slice / sigmoid / grid rules can never drift apart.

    The exploded feature frame ``x`` is the expensive common
    subexpression (posexplode of every embedding x 8 dims); since the
    r13 row-local ``scored`` rewrite its remaining consumer is the
    gd2 training query (w1 derivation + the g2 join), and it stays
    behind the repo's session+sf-keyed single-slot cache (the
    shingle-cache contract: evict-before-replace, at most one copy
    pinned).  The scoring consumers (auc, auc_binned, calibration)
    read ``scored``, which no longer touches ``x`` at all."""
    global _LR_CACHE
    key = (session_token(spark), sf)
    if _LR_CACHE is not None and _LR_CACHE[:2] == key:
        return _LR_CACHE[2]
    if _LR_CACHE is not None:
        try:
            _LR_CACHE[2]["x"].unpersist(blocking=False)
        except Exception:
            pass  # evicted frame's session may already be stopped
    parts = _build_logreg_parts(spark, sf)
    _LR_CACHE = (*key, parts)
    return parts


def _build_logreg_parts(spark: SparkSession, sf: str) -> dict:
    e = t(spark, sf, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") >= _LR_DIMS)
    )  # mirror of the oracle fragment's WHERE: a NULL/short embedding
    # must drop the whole ROW in both engines (posexplode alone would
    # silently drop it on this side only)
    x = (
        e.select(
            "vec_id",
            (F.col("label") % 2).alias("y"),
            F.posexplode(
                F.slice(F.col("embedding").cast("array<double>"), 1, _LR_DIMS)
            ).alias("j0", "xv"),
        )
        .select("vec_id", "y", (F.col("j0") + 1).alias("j"), "xv")
        .cache()  # five consumers + three references within one query
    )
    n = x.agg(F.countDistinct("vec_id").cast("long").alias("n"))
    g1 = x.groupBy("j").agg(
        F.sum(
            F.round((F.lit(0.5) - F.col("y")) * F.col("xv") * 1e6).cast("long")
        )
        .cast("long")
        .alias("g")
    )
    w1 = g1.crossJoin(F.broadcast(n)).select(
        "j",
        (-F.col("g").cast("double") / (F.lit(1e6) * F.col("n"))).alias("w"),
    )


    # scored is ROW-LOCAL (optimization r13, guide §2.4): the step-1
    # weight vector is a BOUNDED statistic (8 doubles — the kmeans
    # "broadcast k x d state" class), so it is collected once per
    # (session, sf) (this dict is already memoized) and inlined, and
    # each row's dot product becomes a left-to-right fold over its own
    # 8-dim slice.  The previous shape sent the exploded x frame
    # (rows x 8) through a vec_id exchange and an ObjectHashAggregate
    # just to reassemble per-row state that never needed to leave its
    # row.  Value-identical: the fold multiplies w_j * x_j in ascending
    # j order from a 0.0 seed — the exact sequence ordered_sum
    # evaluated — and F.lit round-trips the collected doubles exactly.
    # Three scored consumers (auc, auc_binned, calibration) now scan
    # parquet + project, zero exchanges; gd2 still uses x/n/w1.
    w_vals = [
        float(r["w"]) for r in w1.orderBy("j").collect()
    ]  # j = 1..8, ascending
    w_arr = F.array(*[F.lit(w) for w in w_vals])
    feats = e.select(
        "vec_id",
        (F.col("label") % 2).alias("y"),
        F.slice(F.col("embedding").cast("array<double>"), 1, _LR_DIMS).alias(
            "xs"
        ),
    )
    dot = F.aggregate(
        F.zip_with(w_arr, F.col("xs"), lambda w, xv: w * xv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # dots/scored stay TWO projections: sig references dot twice, and
    # CollapseProject must not inline the (non-cheap, interpreted) fold
    # into both references
    dots = feats.select("vec_id", "y", dot.alias("dot"))
    sig = F.lit(0.5) + F.col("dot") / (
        F.lit(2.0) * (F.lit(1.0) + F.abs(F.col("dot")))
    )
    scored = dots.select("vec_id", "y", sig.alias("s"))
    return {"x": x, "n": n, "w1": w1, "scored": scored}


@query(
    "q_ml_logreg_gd2",
    oracle=f"""
    WITH {_LOGREG_STEP1_SQL.format(d=_LR_DIMS + 1, dims=_LR_DIMS)},
    acc AS (
      SELECT CAST(SUM(CASE WHEN (s >= 0.5) = (y = 1) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM scored),
    g2 AS (
      SELECT x.j,
             CAST(SUM(CAST(round((sc.s - x.y) * x.xv * 1000000) AS BIGINT))
                  AS BIGINT) AS g
      FROM x JOIN scored sc ON x.vec_id = sc.vec_id GROUP BY x.j),
    w2 AS (
      SELECT g2.j,
             w1.w - CAST(g2.g AS DOUBLE) / (1000000.0 * (SELECT n FROM n))
               AS w
      FROM g2 JOIN w1 ON g2.j = w1.j)
    SELECT w2.j AS dim, round(w1.w, 6) AS w1, round(w2.w, 6) AS w2,
           (SELECT n_correct FROM acc) AS n_correct,
           (SELECT n FROM n) AS n_rows
    FROM w2 JOIN w1 ON w2.j = w1.j
    """,
)
def q_ml_logreg_gd2(spark: SparkSession, sf: str) -> DataFrame:
    """TWO full-batch gradient-descent steps of logistic regression
    (label %2 on the first 8 embedding dims), hash-checked — the
    supervised member of the iterative family (k-means = clustering,
    PCA = decomposition, PageRank = graph).

    Two determinism moves beyond the Lloyd/PCA recipe: (1) the
    sigmoid is the RATIONAL fast-sigmoid 0.5 + x/(2(1+|x|)) — division
    and abs are correctly rounded IEEE ops, whereas exp() differs in
    the last ulp between libm and the JVM, which would de-sync the
    engines at step 2; (2) each row's per-dimension gradient
    contribution is quantized to the micro grid BEFORE the sum, so the
    gradient vector is an exact int64 sum in any partition order, and
    each weight update is one division of exact integers.  Training
    accuracy (step-1 predictions) rides along as an exact count.

    Scale: per step, one broadcast of the 8-weight vector, one
    O(rows x dims) scan, and a shuffle of 8 int64 partials — the
    canonical data-parallel full-batch GD schedule; minibatching or
    more steps repeat the same two stages.  This is the template for
    any GLM trained inside the warehouse instead of exporting data."""
    parts = _logreg_parts(spark, sf)
    x, n, w1, scored = parts["x"], parts["n"], parts["w1"], parts["scored"]
    acc = scored.agg(
        F.sum(
            F.when((F.col("s") >= 0.5) == (F.col("y") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_correct")
    )
    g2 = (
        x.join(scored.select("vec_id", "s"), "vec_id")
        .groupBy("j")
        .agg(
            F.sum(
                F.round((F.col("s") - F.col("y")) * F.col("xv") * 1e6).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("g")
        )
    )
    w2 = (
        g2.join(w1.select(F.col("j"), F.col("w").alias("w1v")), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "j",
            "w1v",
            (
                F.col("w1v")
                - F.col("g").cast("double") / (F.lit(1e6) * F.col("n"))
            ).alias("w2v"),
        )
    )
    return (
        w2.crossJoin(F.broadcast(acc))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("j").alias("dim"),
            F.round("w1v", 6).alias("w1"),
            F.round("w2v", 6).alias("w2"),
            "n_correct",
            F.col("n").alias("n_rows"),
        )
    )


# --------------------------------------------------- decision stump
_STUMP_CUTS = [5_000_000 * k for k in range(1, 10)]  # cents: 50k..450k

_STUMP_SCORED_SQL = """rows_ AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
             CAST(o_orderstatus = 'F' AS BIGINT) AS y
      FROM orders),
    cuts AS (SELECT unnest(ARRAY[{cuts}]) AS cut),
    stats AS (
      SELECT cut,
             CAST(SUM(CASE WHEN c <= cut THEN y ELSE 0 END) AS BIGINT)
               AS left_pos,
             CAST(SUM(CASE WHEN c <= cut THEN 1 - y ELSE 0 END) AS BIGINT)
               AS left_neg,
             CAST(SUM(CASE WHEN c > cut THEN y ELSE 0 END) AS BIGINT)
               AS right_pos,
             CAST(SUM(CASE WHEN c > cut THEN 1 - y ELSE 0 END) AS BIGINT)
               AS right_neg
      FROM rows_ CROSS JOIN cuts GROUP BY cut),
    scored AS (
      SELECT cut, left_pos, left_neg, right_pos, right_neg,
             LEAST(left_neg + right_pos, left_pos + right_neg) AS err,
             CASE WHEN left_neg + right_pos <= left_pos + right_neg
                  THEN 'left_is_pos' ELSE 'right_is_pos' END AS rule
      FROM stats)"""


@query(
    "q_ml_stump",
    oracle=f"""
    WITH {_STUMP_SCORED_SQL.format(cuts=", ".join(str(c) for c in _STUMP_CUTS))}
    SELECT cut, left_pos, left_neg, right_pos, right_neg, err, rule,
           CAST(err = (SELECT MIN(err) FROM scored) AND
                cut = (SELECT MIN(cut) FROM scored s2
                       WHERE s2.err = (SELECT MIN(err) FROM scored))
                AS BIGINT) AS is_best
    FROM scored
    """,
)
def q_ml_stump(spark: SparkSession, sf: str) -> DataFrame:
    """Decision stump (depth-1 tree / one boosting round) trained by
    EXACT integer error minimization: label = order status 'F',
    feature = total price in cents, candidate splits = a fixed
    threshold grid; for each cut both orientation rules are scored by
    misclassification count and the (min-error, min-cut) stump is
    flagged — every number in the training procedure is an int64
    count, so the fitted model is bit-identical on any engine and any
    partitioning, with zero of the float ceremony the GD kernel needs.

    This completes the in-warehouse supervised pair: q_ml_logreg_gd2
    is the linear/gradient template, this is the tree/boosting one —
    AdaBoost rounds repeat the same scan with integer sample weights
    doubling on errors (weights stay exact ints), gradient boosting
    swaps the count for a micro-grid residual sum.

    Scale: ONE fact scan computes all 9x4 cell counts (the cut grid is
    a broadcast literal; conditional sums partial-aggregate map-side),
    so candidate evaluation is O(rows), not O(rows x cuts) passes —
    the same trick a histogram-based GBDT (LightGBM) uses."""
    o = t(spark, sf, "orders")
    rows_ = o.select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("c"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    cuts = spark.createDataFrame(
        [(c,) for c in _STUMP_CUTS], "cut long"
    )
    stats = (
        rows_.crossJoin(F.broadcast(cuts))
        .groupBy("cut")
        .agg(
            F.sum(F.when(F.col("c") <= F.col("cut"), F.col("y")).otherwise(0))
            .cast("long")
            .alias("left_pos"),
            F.sum(
                F.when(F.col("c") <= F.col("cut"), 1 - F.col("y")).otherwise(0)
            )
            .cast("long")
            .alias("left_neg"),
            F.sum(F.when(F.col("c") > F.col("cut"), F.col("y")).otherwise(0))
            .cast("long")
            .alias("right_pos"),
            F.sum(
                F.when(F.col("c") > F.col("cut"), 1 - F.col("y")).otherwise(0)
            )
            .cast("long")
            .alias("right_neg"),
        )
    )
    scored = stats.select(
        "*",
        F.least(
            F.col("left_neg") + F.col("right_pos"),
            F.col("left_pos") + F.col("right_neg"),
        ).alias("err"),
        F.when(
            F.col("left_neg") + F.col("right_pos")
            <= F.col("left_pos") + F.col("right_neg"),
            F.lit("left_is_pos"),
        )
        .otherwise(F.lit("right_is_pos"))
        .alias("rule"),
    )
    best = scored.agg(F.min("err").alias("best_err"))
    best_cut = (
        scored.crossJoin(F.broadcast(best))
        .filter(F.col("err") == F.col("best_err"))
        .agg(F.min("cut").alias("best_cut"))
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(best_cut))
        .select(
            "cut",
            "left_pos",
            "left_neg",
            "right_pos",
            "right_neg",
            "err",
            "rule",
            (
                (F.col("err") == F.col("best_err"))
                & (F.col("cut") == F.col("best_cut"))
            )
            .cast("long")
            .alias("is_best"),
        )
    )


# ------------------------------------------------------------ exact AUC
@query(
    "q_ml_auc",
    oracle=f"""
    WITH {_LOGREG_STEP1_SQL.format(d=_LR_DIMS + 1, dims=_LR_DIMS)},
    ranked AS (
      SELECT y, s,
             rank() OVER (ORDER BY s) AS rk,
             COUNT(*) OVER (PARTITION BY s) AS ties
      FROM scored),
    agg AS (
      SELECT CAST(SUM(y) AS BIGINT) AS npos,
             CAST(SUM(1 - y) AS BIGINT) AS nneg,
             SUM(CASE WHEN y = 1
                      THEN rk + (ties - 1) / 2.0 ELSE 0 END) AS rank_sum
      FROM ranked)
    SELECT npos, nneg,
           round((rank_sum - npos * (npos + 1) / 2.0)
                 / (CAST(npos AS DOUBLE) * nneg), 6) AS auc
    FROM agg
    """,
)
def q_ml_auc(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT ROC-AUC of the step-1 logistic scores via the
    Mann-Whitney U statistic with tie-averaged ranks — the
    threshold-free ranking metric, hash-checked because every quantity
    stays on an exact grid: ranks and tie counts are integers, the
    tie-averaged rank is a half-integer (exact dyadic double), and
    the rank sum is a sum of dyadic rationals below 2^53 — every IEEE
    addition is exact, so the sum is order-independent without any
    sorted fold, and AUC is a final division of exact quantities.

    Scale note (stated honestly in-plan): exact AUC needs a global
    rank — one total sort of the SCORES (one double per example, not
    the features).  At extreme scale swap in the binned approximation
    (histogram of scores per class, trapezoid over bins — the
    q_audit_chi2_drift machinery); this exact twin is the oracle for
    that approximation.  Shares the step-1 subtree with
    q_ml_logreg_gd2 via _logreg_parts."""
    scored = _logreg_parts(spark, sf)["scored"]
    wrk = Window.orderBy("s")
    wties = Window.partitionBy("s")
    ranked = scored.select(
        "y",
        F.rank().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wties).alias("ties"),
    )
    agg = ranked.agg(
        F.sum("y").cast("long").alias("npos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("nneg"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("rk") + (F.col("ties") - 1) / F.lit(2.0),
            ).otherwise(F.lit(0.0))
        ).alias("rank_sum"),
    )
    return agg.select(
        "npos",
        "nneg",
        F.round(
            (F.col("rank_sum") - F.col("npos") * (F.col("npos") + 1) / F.lit(2.0))
            / (F.col("npos").cast("double") * F.col("nneg")),
            6,
        ).alias("auc"),
    )


# ----------------------------------------------- stump evaluation suite
@query(
    "q_ml_eval_confusion",
    oracle=f"""
    WITH {_STUMP_SCORED_SQL.format(cuts=", ".join(str(c) for c in _STUMP_CUTS))},
    best AS (
      SELECT * FROM scored
      WHERE err = (SELECT MIN(err) FROM scored)
      ORDER BY cut LIMIT 1),
    conf AS (
      SELECT cut, rule,
             CASE WHEN rule = 'left_is_pos' THEN left_pos ELSE right_pos END
               AS tp,
             CASE WHEN rule = 'left_is_pos' THEN left_neg ELSE right_neg END
               AS fp,
             CASE WHEN rule = 'left_is_pos' THEN right_pos ELSE left_pos END
               AS fn,
             CASE WHEN rule = 'left_is_pos' THEN right_neg ELSE left_neg END
               AS tn
      FROM best)
    SELECT cut, rule, tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_,
           round(2.0 * (CAST(tp AS DOUBLE) / (tp + fp))
                     * (CAST(tp AS DOUBLE) / (tp + fn))
                 / (CAST(tp AS DOUBLE) / (tp + fp)
                    + CAST(tp AS DOUBLE) / (tp + fn)), 6) AS f1
    FROM conf
    """,
)
def q_ml_eval_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Evaluation suite for the fitted stump (q_ml_stump's best rule):
    confusion matrix as exact integer counts, plus precision / recall
    / F1 as single divisions of those counts — train and evaluate
    without the data leaving the warehouse, every cell reproducible.
    The confusion cells fall straight out of the stump's own 4-count
    table (no second scan over the fact: scoring a depth-1 rule IS
    the count table)."""
    best = (
        q_ml_stump(spark, sf)
        .filter(F.col("is_best") == 1)
        .select("cut", "rule", "left_pos", "left_neg", "right_pos", "right_neg")
    )
    left_is = F.col("rule") == "left_is_pos"
    conf = best.select(
        "cut",
        "rule",
        F.when(left_is, F.col("left_pos")).otherwise(F.col("right_pos")).alias("tp"),
        F.when(left_is, F.col("left_neg")).otherwise(F.col("right_neg")).alias("fp"),
        F.when(left_is, F.col("right_pos")).otherwise(F.col("left_pos")).alias("fn"),
        F.when(left_is, F.col("right_neg")).otherwise(F.col("left_neg")).alias("tn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
    return conf.select(
        "cut",
        "rule",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision_"),
        F.round(rec, 6).alias("recall_"),
        F.round(F.lit(2.0) * prec * rec / (prec + rec), 6).alias("f1"),
    )


# ------------------------------------------------- binned AUC (scale path)
_AUC_BINS = 100


@query(
    "q_ml_auc_binned",
    oracle=f"""
    WITH {_LOGREG_STEP1_SQL.format(d=_LR_DIMS + 1, dims=_LR_DIMS)},
    binned AS (
      SELECT LEAST(CAST(floor(s * {_AUC_BINS}) AS BIGINT), {_AUC_BINS - 1})
               AS b,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(SUM(1 - y) AS BIGINT) AS neg
      FROM scored GROUP BY 1),
    walked AS (
      SELECT b, pos, neg,
             CAST(COALESCE(SUM(neg) OVER (ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_neg_below
      FROM binned),
    agg AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS npos,
             CAST(SUM(neg) AS BIGINT) AS nneg,
             CAST(SUM(2 * pos * cum_neg_below + pos * neg) AS BIGINT)
               AS twice_u
      FROM walked)
    SELECT npos, nneg,
           round(CAST(twice_u AS DOUBLE)
                 / (2.0 * CAST(npos AS DOUBLE) * nneg), 6) AS auc_binned
    FROM agg
    """,
    bench=True,
)
def q_ml_auc_binned(spark: SparkSession, sf: str) -> DataFrame:
    """Binned ROC-AUC — the SCALE path for q_ml_auc's exact twin: the
    scores histogram into 100 fixed bins per class (one
    conditional-aggregate scan, no global rank/sort of examples), and
    AUC is the trapezoid over the bin walk:
    2*U = sum_b (2*pos_b*cum_neg_below + pos_b*neg_b) — entirely
    int64 arithmetic (within-bin ties contribute half, kept exact by
    carrying 2U), with ONE final division.  The cumulative window runs
    over <= 100 bin rows, not the data.

    The exact twin is the oracle for this approximation in spirit;
    here BOTH are independently hash-checked, and the pytest bounds
    |exact - binned| at 2.5x the measured binning error (step-1
    scores concentrate near 0.5, so fixed [0,1] bins are coarse
    there; a production evaluator would bin on score quantiles).  At 100 TB this is
    the evaluator that runs on every model refresh: one scan, KBs of
    shuffle, deterministic output."""
    scored = _logreg_parts(spark, sf)["scored"]
    binned = (
        scored.select(
            F.least(
                F.floor(F.col("s") * _AUC_BINS).cast("long"),
                F.lit(_AUC_BINS - 1),
            ).alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            F.sum(F.lit(1) - F.col("y")).cast("long").alias("neg"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    walked = binned.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).cast("long").alias(
            "cum_neg_below"
        ),
    )
    agg = walked.agg(
        F.sum("pos").cast("long").alias("npos"),
        F.sum("neg").cast("long").alias("nneg"),
        F.sum(
            2 * F.col("pos") * F.col("cum_neg_below")
            + F.col("pos") * F.col("neg")
        )
        .cast("long")
        .alias("twice_u"),
    )
    return agg.select(
        "npos",
        "nneg",
        F.round(
            F.col("twice_u").cast("double")
            / (F.lit(2.0) * F.col("npos").cast("double") * F.col("nneg")),
            6,
        ).alias("auc_binned"),
    )
