"""Round-2 additions, batch 9: temperature-scaled corpus mixture,
SpaceSaving heavy hitters, and experimentation kernels (CUPED,
difference-in-differences).
[NS] north-star extensions — the reference
(/root/reference/src/topic.js) has no processing layer; these cover
the pretraining sampling knob (XLM-R style p^T re-weighting on top of
q_corpus_mixture_weights), bounded-memory top-k frequency, and the
A/B-metric adjustments an experimentation platform computes over the
same warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.session import session_token
from kafkaish_spark.sources.tables import load_table as t


@query(
    "q_sample_temperature",
    oracle="""
    WITH s AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    w AS (
      SELECT *, CAST(floor(sqrt(n_tokens) * 1000) AS BIGINT) AS w_milli
      FROM s),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
                   CAST(SUM(w_milli) AS BIGINT) AS z FROM w)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot), 6) AS share,
           round(CAST(w_milli AS DOUBLE) / (SELECT z FROM tot), 6)
             AS temp_share,
           round((CAST(w_milli AS DOUBLE) / (SELECT z FROM tot))
                 / (CAST(n_tokens AS DOUBLE) / (SELECT t FROM tot)), 6)
             AS repeat_factor
    FROM w
    """,
)
def q_sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled domain mixture (T = 0.5): sampling weight
    proportional to share^T flattens the domain distribution — high-
    resource domains are down-weighted, low-resource ones up-weighted,
    the standard knob (mBERT/XLM-R exponential smoothing) between
    'natural mixture' and 'uniform' (q_corpus_mixture_weights is the
    uniform-target end).

    Determinism: T = 0.5 makes the power a SQRT, which IEEE 754
    guarantees correctly rounded (unlike pow, which differs between
    libm and the JVM) — and the weight is snapped to an integer
    milli-grid (floor(sqrt(n)*1000)) before the normalizing sum, so Z
    is an exact BIGINT and every reported double is a single division
    of exact integers.  Both engines agree bit-for-bit before
    round(6).

    Scale: one partial-aggregated shuffle on source (~20 groups); the
    totals row is a broadcast.  The repeat factors feed the same
    md5-bucket resampler as q_sample_stratified — the actual
    up/down-sampling never shuffles the corpus."""
    d = t(spark, sf, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    w = s.withColumn(
        "w_milli", F.floor(F.sqrt("n_tokens") * 1000).cast("long")
    )
    tot = w.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.sum("w_milli").cast("long").alias("z"),
    )
    share = F.col("n_tokens").cast("double") / F.col("t")
    tshare = F.col("w_milli").cast("double") / F.col("z")
    return w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(tshare, 6).alias("temp_share"),
        F.round(tshare / share, 6).alias("repeat_factor"),
    )


# --------------------------------------------- SpaceSaving heavy hitters
SS_CAP = 64  # counters per partition summary
SS_TOPK = 20

_SS_CACHE: tuple | None = None  # (session_id, sf_dir, frame) — leak guard


def _cached_ss_summaries(spark, sf: str, build):
    """Cache the per-partition SpaceSaving summaries (n_partitions x
    SS_CAP rows): the merge below references the frame three times
    (parts, terms, join), and without a cache each reference would
    re-scan and re-sketch the full corpus — and rely on partition ids
    being identical across the three independent evaluations.  Keyed
    by (SparkSession, sf_dir) — a cached frame is bound to the session
    that built it, so a stop/recreate cycle must rebuild rather than
    return (or unpersist) a frame on a dead session — with
    evict-before-replace (the llm shingle-cache pattern)."""
    global _SS_CACHE
    key = (session_token(spark), sf)
    if _SS_CACHE is not None and _SS_CACHE[:2] == key:
        return _SS_CACHE[2]
    if _SS_CACHE is not None:
        try:
            _SS_CACHE[2].unpersist(blocking=False)
        except Exception:
            pass  # evicted frame's session may already be stopped
    frame = build().cache()
    _SS_CACHE = (*key, frame)
    return frame


def spacesaving_update(
    counters: dict[str, list[int]], term: str, c: int, cap: int
) -> None:
    """One weighted SpaceSaving update: increment if tracked, insert if
    room, else evict the (count, term)-smallest counter and inherit its
    count as the newcomer's overestimate bound.  Invariant (property-
    tested in tests/test_composites21.py): for every tracked term,
    est >= true count >= est - err."""
    if term in counters:
        counters[term][0] += c
    elif len(counters) < cap:
        counters[term] = [c, 0]
    else:
        vterm = min(counters, key=lambda k: (counters[k][0], k))
        vest = counters.pop(vterm)[0]
        counters[term] = [vest + c, vest]


@query("q_sketch_spacesaving_topk", oracle=None)
def q_sketch_spacesaving_topk(spark: SparkSession, sf: str) -> DataFrame:
    """SpaceSaving heavy hitters (Metwally et al.): each partition
    maintains <= SS_CAP (term, est, err) counters — a new term evicts
    the smallest counter and inherits its count as its error bound —
    then the bounded summaries merge with the Metwally compensation
    rule (a partition where a term is untracked contributes its
    smallest-counter value to both est and err, since the term may
    have been evicted there) and the top-k by estimated count is
    reported with its overcount bound (true count is always in
    [est - err, est], which holds across ANY partitioning).

    This is the O(1)-memory complement to the Count-Min sketch
    (q_sketch_count_min_terms): CMS answers point queries, SpaceSaving
    answers 'what ARE the top terms' without a full term group-by.
    Scale: the shuffle moves #partitions x SS_CAP summary rows — KBs —
    instead of one row per distinct term (billions at 100 TB); the
    per-partition pass is a single sequential scan.  Rows-only by
    design (eviction order is partition-layout-dependent);
    tests/test_composites21.py checks the sketch bounds and top-term
    recall against exact counts."""
    import pandas as pd

    d = t(spark, sf, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.length("term") > 0
    )

    def summarize(batches):
        # Partition id as the summary key: deterministic even if the
        # frame is re-evaluated (the cache above makes that rare, but a
        # cache eviction must not turn the merge join into a self-miss
        # — a random id would silently zero the merge).
        from pyspark import TaskContext

        pid = str(TaskContext.get().partitionId())
        counters: dict[str, list[int]] = {}  # term -> [est, err]
        at_cap = False
        for pdf in batches:
            # batch-weighted update, alphabetical for determinism
            vc = pdf["term"].value_counts().sort_index()
            for term, c in vc.items():
                spacesaving_update(counters, term, int(c), SS_CAP)
            at_cap = at_cap or len(counters) >= SS_CAP
        # compensation m: a term ABSENT from this partition's summary
        # may still have occurred here up to the smallest counter (it
        # was evicted, its count inherited) — m bounds that loss.  A
        # partition that never hit the cap evicted nothing: m = 0.
        m = min((v[0] for v in counters.values()), default=0) if at_cap else 0
        yield pd.DataFrame(
            {
                "pid": pid,
                "term": list(counters),
                "est": [v[0] for v in counters.values()],
                "err": [v[1] for v in counters.values()],
                "m": m,
            }
        )

    summaries = _cached_ss_summaries(
        spark,
        sf,
        lambda: words.mapInPandas(
            summarize, "pid string, term string, est long, err long, m long"
        ),
    )
    # SpaceSaving MERGE (Metwally et al. §merging): for each (term,
    # partition) pair where the term is untracked, the partition
    # contributes its compensation m to BOTH est and err — without it,
    # a term evicted in one partition would under-count and break the
    # est >= true upper bound the tests pin.
    parts = summaries.select("pid", "m").distinct()
    terms = summaries.select("term").distinct()
    grid = terms.crossJoin(F.broadcast(parts))
    merged = (
        grid.join(
            summaries.select("pid", "term", "est", "err"),
            ["pid", "term"],
            "left",
        )
        .select(
            "term",
            F.coalesce("est", "m").alias("e2"),
            F.coalesce("err", "m").alias("r2"),
        )
        .groupBy("term")
        .agg(F.sum("e2").alias("est"), F.sum("r2").alias("err"))
    )
    w = Window.partitionBy().orderBy(F.col("est").desc(), F.col("term"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SS_TOPK)
        .select("rk", "term", "est", "err")
    )


# ----------------------------------------------------- CUPED A/B kernel
@query(
    "q_ab_cuped",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             o_custkey % 2 AS arm,
             CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                           THEN CAST(floor(o_totalprice) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                           THEN CAST(floor(o_totalprice) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM orders
      WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)
      GROUP BY o_custkey),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM per_cust),
    theta AS (
      SELECT n, sx,
             (CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
                * (CAST(sy AS DOUBLE) / n))
             / (CAST(sxx AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n)
                * (CAST(sx AS DOUBLE) / n)) AS th
      FROM g)
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(y) AS BIGINT) AS y_total,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS mean_y,
           round(CAST(SUM(y) AS DOUBLE) / COUNT(*)
                 - (SELECT th FROM theta)
                   * (CAST(SUM(x) AS DOUBLE) / COUNT(*)
                      - CAST((SELECT sx FROM theta) AS DOUBLE)
                        / (SELECT n FROM theta)), 6) AS cuped_mean_y
    FROM per_cust
    GROUP BY arm
    """,
)
def q_ab_cuped(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction for A/B metrics (Deng et al., WSDM'13):
    the post-period metric y is adjusted by theta * (x - mean(x)) where
    x is the PRE-period covariate and theta = cov(x,y)/var(x) — the
    regression that removes between-user variance the experiment did
    not cause.  Arms are a deterministic key split; here the covariate
    is 1996 spend, the metric 1997 spend.

    Determinism: x and y are exact integer dollars, all five moments
    (n, sx, sy, sxx, sxy) are exact BIGINT sums (x ~ 5e5 keeps sxx
    within int64 headroom past sf100), and theta plus the per-arm
    adjustment are a short FIXED sequence of IEEE divisions of those
    integers — both engines agree bit-for-bit before round(6).

    Scale: one shuffle groups orders per customer, a 5-number global
    moment row broadcasts back, and the per-arm rollup is 2 groups —
    the fact table is read once.  This is the experimentation-platform
    kernel (adjusted means per arm) computed without any per-user
    float fold, so it is partitioning-independent at any scale."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    dollars = F.floor("o_totalprice").cast("long")
    per_cust = (
        o.filter(yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1996, dollars).otherwise(F.lit(0)))
            .cast("long")
            .alias("x"),
            F.sum(F.when(yr == 1997, dollars).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
        )
        .withColumn("arm", (F.col("o_custkey") % 2).cast("long"))
    )
    g = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    ).withColumn(
        "th",
        (
            F.col("sxy").cast("double") / F.col("n")
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sy").cast("double") / F.col("n"))
        )
        / (
            F.col("sxx").cast("double") / F.col("n")
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sx").cast("double") / F.col("n"))
        ),
    )
    arms = per_cust.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("y").cast("long").alias("y_total"),
        F.sum("x").cast("long").alias("x_total"),
    )
    return arms.crossJoin(F.broadcast(g)).select(
        "arm",
        "n_users",
        "y_total",
        F.round(F.col("y_total").cast("double") / F.col("n_users"), 6).alias(
            "mean_y"
        ),
        F.round(
            F.col("y_total").cast("double") / F.col("n_users")
            - F.col("th")
            * (
                F.col("x_total").cast("double") / F.col("n_users")
                - F.col("sx").cast("double") / F.col("n")
            ),
            6,
        ).alias("cuped_mean_y"),
    )


# ---------------------------------------------- difference-in-differences
@query(
    "q_ab_diff_in_diff",
    oracle="""
    WITH base AS (
      SELECT o_custkey % 2 AS arm,
             EXTRACT(year FROM o_orderdate) AS yr,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997))
    SELECT arm,
           CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT)
             AS pre_n,
           CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT)
             AS post_n,
           CAST(SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS BIGINT)
             AS pre_cents,
           CAST(SUM(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS BIGINT)
             AS post_cents,
           round(CAST(SUM(CASE WHEN yr = 1997 THEN cents ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END)
                 - CAST(SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS DOUBLE)
                   / SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END), 6)
             AS delta_mean_cents
    FROM base GROUP BY arm
    """,
)
def q_ab_diff_in_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences design table: per arm (deterministic
    key split), pre-period (1996) and post-period (1997) order counts,
    exact cents totals, and the within-arm mean change; the DiD
    estimate is the difference of the two ``delta_mean_cents`` rows.
    The design-based companion to q_ab_cuped's covariate adjustment.

    Determinism: both periods are conditional exact-integer sums inside
    ONE aggregate pass (no self-join of the fact), and each mean is a
    single IEEE division of exact integers.  Scale: one map-side
    partial-aggregated shuffle to 2 groups — the 2x2 experiment table
    over a 100 TB fact costs one scan."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    base = o.filter(yr.isin(1996, 1997)).select(
        (F.col("o_custkey") % 2).alias("arm"),
        yr.alias("yr"),
        cents.alias("cents"),
    )
    pre_n = F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0)).cast("long")
    post_n = F.sum(F.when(F.col("yr") == 1997, 1).otherwise(0)).cast("long")
    pre_c = F.sum(
        F.when(F.col("yr") == 1996, F.col("cents")).otherwise(F.lit(0))
    ).cast("long")
    post_c = F.sum(
        F.when(F.col("yr") == 1997, F.col("cents")).otherwise(F.lit(0))
    ).cast("long")
    return base.groupBy("arm").agg(
        pre_n.alias("pre_n"),
        post_n.alias("post_n"),
        pre_c.alias("pre_cents"),
        post_c.alias("post_cents"),
        F.round(
            post_c.cast("double") / post_n - pre_c.cast("double") / pre_n, 6
        ).alias("delta_mean_cents"),
    )


# ------------------------------------------------------- salted join
@query(
    "q_join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Manually salted equi-join — the join-side twin of
    q_agg_salted_skew: the fact side gets salt = pmod(xxhash64(row), 8)
    and the (conceptually hot-keyed) build side is REPLICATED across
    all 8 salt values, so a single hot join key spreads over 8 reducers
    instead of one.  The salt is dropped before the rollup, so the
    result is bit-identical to the plain join (the oracle).

    When to reach for this at 100 TB: AQE's skew-join split handles
    most cases for sort-merge joins, but it cannot split a hot key
    WITHIN one reducer task for aggregating joins that follow, and it
    does nothing for stream-stream or bucketed joins where AQE is
    disabled — manual salting is the portable fallback.  Cost model in
    the trade: build side bytes x 8 replication vs eliminating the
    straggler; keep the salted copy pruned to join keys + payload
    columns actually needed (here 2 columns).  The equivalence pytest
    for the library form lives in tests/test_operators.py
    (functions.skew.salted_join)."""
    SALTS = 8
    o = t(spark, sf, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SALTS))
    )
    c = (
        t(spark, sf, "customer")
        .select("c_custkey", "c_mktsegment")
        .crossJoin(
            F.broadcast(
                spark.range(SALTS).select(F.col("id").cast("long").alias("salt"))
            )
        )
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "cents"
            ),
        )
    )


# ------------------------------------------------- distribution drift
@query(
    "q_audit_chi2_drift",
    oracle="""
    WITH banded AS (
      SELECT LEAST(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS band,
             EXTRACT(year FROM o_orderdate) AS yr
      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1996, 1997)),
    per_band AS (
      SELECT band,
             CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
             CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS q_n
      FROM banded GROUP BY band),
    tot AS (SELECT CAST(SUM(p_n) AS BIGINT) AS tp,
                   CAST(SUM(q_n) AS BIGINT) AS tq FROM per_band),
    micro AS (
      SELECT band, p_n, q_n,
             CAST(floor(1e6 * p_n / (SELECT tp FROM tot)) AS BIGINT)
               AS p_micro,
             CAST(floor(1e6 * q_n / (SELECT tq FROM tot)) AS BIGINT)
               AS q_micro
      FROM per_band),
    contribs AS (
      SELECT band, p_n, q_n, p_micro, q_micro,
             CAST((p_micro - q_micro) * (p_micro - q_micro) AS DOUBLE)
               / (q_micro + 1) AS contrib
      FROM micro),
    chi AS (
      SELECT round(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(contrib ORDER BY band)),
               (a, b) -> a + b), 6) AS chi2
      FROM contribs)
    SELECT band, p_n, q_n, p_micro, q_micro,
           round(contrib, 6) AS contrib,
           (SELECT chi2 FROM chi) AS chi2
    FROM contribs
    """,
)
def q_audit_chi2_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-drift audit between two loads (the PSI/chi-square
    monitor an ML-serving pipeline runs on every feature): order totals
    are bucketed into 10 fixed-width bands, the 1996 (reference) and
    1997 (current) shares are snapped to the exact micro-unit grid,
    and each band contributes (p-q)^2/(q+1) to a chi-square-style
    drift statistic (the +1 is Laplace smoothing so an empty current
    band cannot divide by zero).

    Determinism: shares are floors of divisions of exact integers, the
    contribution is one IEEE division of exact integers, and the
    10-term total is an ORDERED fold (array_sort + aggregate vs
    DuckDB's list ORDER BY + 0.0-prepended list_reduce — the PageRank
    pattern) so the sum is partition-order-independent.  Scale: one
    conditional-aggregate pass collapses the fact to 10 bands
    map-side; everything after is constant-size."""
    o = t(spark, sf, "orders")
    yr = F.year("o_orderdate")
    band = F.least(
        F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(9)
    )
    per_band = (
        o.filter(yr.isin(1996, 1997))
        .select(band.alias("band"), yr.alias("yr"))
        .groupBy("band")
        .agg(
            F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0))
            .cast("long")
            .alias("p_n"),
            F.sum(F.when(F.col("yr") == 1997, 1).otherwise(0))
            .cast("long")
            .alias("q_n"),
        )
    )
    tot = per_band.agg(
        F.sum("p_n").cast("long").alias("tp"),
        F.sum("q_n").cast("long").alias("tq"),
    )
    micro = per_band.crossJoin(F.broadcast(tot)).select(
        "band",
        "p_n",
        "q_n",
        F.floor(F.lit(1e6) * F.col("p_n") / F.col("tp"))
        .cast("long")
        .alias("p_micro"),
        F.floor(F.lit(1e6) * F.col("q_n") / F.col("tq"))
        .cast("long")
        .alias("q_micro"),
    )
    contribs = micro.withColumn(
        "contrib",
        (
            (F.col("p_micro") - F.col("q_micro"))
            * (F.col("p_micro") - F.col("q_micro"))
        ).cast("double")
        / (F.col("q_micro") + 1),
    )
    chi = contribs.agg(
        F.round(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(band, contrib))),"
                " s -> s.contrib), 0D, (a, x) -> a + x)"
            ),
            6,
        ).alias("chi2")
    )
    return contribs.crossJoin(F.broadcast(chi)).select(
        "band",
        "p_n",
        "q_n",
        "p_micro",
        "q_micro",
        F.round("contrib", 6).alias("contrib"),
        "chi2",
    )
