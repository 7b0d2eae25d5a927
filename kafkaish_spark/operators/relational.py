"""Relational operator inventory (SURVEY.md §2.2, R3-R30).

Each query pairs an idiomatic-DataFrame Spark builder with ANSI SQL the
DuckDB oracle runs on the same parquet.  Conventions that make the
driver's order-insensitive value-hash match:

- every computed column aliased identically on both sides;
- double aggregates via the exact-decimal pattern (functions.exact);
- top-k always ordered with a unique-key tiebreak;
- integer-ish outputs cast to BIGINT on both sides (Spark LONG == DuckDB
  BIGINT; DuckDB's HUGEINT sums and INT date-diffs are normalized).

Scale notes are inline per operator: what Catalyst pushes down, what
shuffles, and which joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from kafkaish_spark.functions.timeutil import epoch_ms
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ---------------------------------------------------------------- R3
@query(
    "q_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity AS qty,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
)
def q_project_compute(spark: SparkSession, sf: str) -> DataFrame:
    """Projection, rename, computed column.  Per-row IEEE arithmetic is
    order-independent, so no rounding needed.  ReadSchema should show
    only the 4 source columns (column pruning)."""
    return t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# ---------------------------------------------------------------- R4
@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND (o_totalprice > 50000 OR o_orderpriority LIKE '1-%')
      AND o_custkey IS NOT NULL
    """,
)
def q_filter_pred(spark: SparkSession, sf: str) -> DataFrame:
    """AND/OR/IN/BETWEEN/LIKE/IS NULL predicates — all push down to the
    parquet scan (PushedFilters in explain)."""
    o = t(spark, sf, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderdate").between("1996-01-01", "1999-12-31")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ((F.col("o_totalprice") > 50000) | F.col("o_orderpriority").like("1-%"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


# ---------------------------------------------------------------- R5
@query(
    "q_join_orders_customer",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    bench=True,
)
def q_join_orders_customer(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join.  customer is small relative to orders at every
    SF — Spark/AQE picks broadcast-hash under the configured threshold;
    at 100 TB the dimension side still broadcasts while the fact side
    never shuffles."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------- R6
@query(
    "q_join_broadcast_nation_region",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_join_broadcast_nation_region(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit broadcast hint for the tiny dimension (region: 5 rows
    at every SF) — zero shuffle."""
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


# ---------------------------------------------------------------- R7
@query(
    "q_join_left_customer_orders",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS order_cnt,
           {dsum_sql('COALESCE(o_totalprice, 0)')} AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_customer_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + aggregate; COUNT(col) skips nulls from
    unmatched customers on both engines."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), "total_spent"),
        )
    )


# ---------------------------------------------------------------- R8
@query(
    "q_join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def q_join_semi_customers_with_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join — no duplication of the left side, right side only
    probed.  The o_totalprice filter is pushed below the join."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti_customers_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    """,
)
def q_join_anti_customers_no_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join: customers with no large (>350k) order — the
    threshold keeps the result non-empty at every SF."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------- R9
@query(
    "q_join_range_price_band",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           {dsum_sql('l_extendedprice')} AS band_revenue
    FROM part JOIN lineitem
      ON l_partkey = p_partkey
     AND l_quantity BETWEEN p_size - 5 AND p_size + 5
    GROUP BY p_brand
    """,
)
def q_join_range_price_band(spark: SparkSession, sf: str) -> DataFrame:
    """Equi key + range (theta) residual condition: Spark evaluates the
    band as a post-join filter on the hash join — no cartesian blowup."""
    p = t(spark, sf, "part")
    l = t(spark, sf, "lineitem")
    cond = (
        (l.l_partkey == p.p_partkey)
        & (l.l_quantity >= p.p_size - 5)
        & (l.l_quantity <= p.p_size + 5)
    )
    return (
        p.join(l, cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_extendedprice", "band_revenue"))
    )


# ---------------------------------------------------------------- R10
@query(
    "q_join_asof_event_order",
    oracle="""
    WITH pv AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             p.ts AS p_ts, v.event_id AS view_id, v.ts AS v_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM events p
      LEFT JOIN events v
        ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
      WHERE p.event_type = 'purchase')
    SELECT purchase_id, user_id, view_id,
           CAST(epoch_ms(p_ts) - epoch_ms(v_ts) AS BIGINT) AS gap_ms
    FROM pv WHERE rn = 1
    """,
    bench=True,
)
def q_join_asof_event_order(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase, the latest prior 'view' by the
    same user.  Spark-first implementation is the union+last-window
    pattern — one shuffle on user_id, NO pairwise join blowup (the
    oracle's O(purchases x views) join is fine for DuckDB at sf0.01 but
    would not survive 100 TB; this does)."""
    ev = t(spark, sf, "events")
    both = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("v_id"),
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        both.withColumn("view_id", F.last("v_id", ignorenulls=True).over(w))
        .withColumn("view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "view_id",
            (epoch_ms("ts") - epoch_ms("view_ts")).cast("long").alias("gap_ms"),
        )
    )
    return out


# ---------------------------------------------------------------- R11
@query(
    "q_star_revenue_by_region",
    oracle=f"""
    SELECT r_name,
           COUNT(*) AS n_lines,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    bench=True,
)
def q_star_revenue_by_region(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-way star join: fact table joined through three dimension
    hops.  The nation/region hops route through the JOIN-STRATEGY
    ADVISOR (functions/advisor.py, r9): it MEASURES each dim's exact
    projected bytes and picks broadcast — the same plan the r8 version
    hard-coded, now derived from the audit statistics instead of
    asserted (the measured decision stays correct when a dim grows).
    customer broadcasts via AQE at small SF and stays a shuffle join
    at 100 TB — exactly what we want Catalyst to decide at runtime.
    Advice is MEASURED ONCE per (sf, edge) and cached (plain scalars),
    so repeated plan builds — bench reps, plan-diff, the contract
    sweep — stay lazy instead of re-running measurement jobs and
    folding them into this query's timings (review r9)."""
    from kafkaish_spark.functions.advisor import (
        advise_join_cached,
        advised_join,
    )

    l = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey"
    )
    r = t(spark, sf, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    base = l.join(o, l.l_orderkey == o.o_orderkey).join(
        c, o.o_custkey == c.c_custkey
    )
    adv_n = advise_join_cached(
        base, n, "c_nationkey", cache_key=(sf, "star.nation")
    )
    joined_n = advised_join(base, n, "c_nationkey", advice=adv_n)
    adv_r = advise_join_cached(
        joined_n, r, "n_regionkey", cache_key=(sf, "star.region")
    )
    return (
        advised_join(joined_n, r, "n_regionkey", advice=adv_r)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# ---------------------------------------------------------------- R12
@query(
    "q_agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q_agg_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical hash-aggregate with partial
    (map-side) aggregation — the shuffle moves only num_groups rows per
    partition, not the fact table.  spread() widens the decimal-heavy
    partial agg when the scan exposes fewer row groups than cores (the
    testdata case); it is a no-op on a properly chunked table.  The
    spread keys on l_orderkey (dense, ~1.5M distinct per SF): a hash
    exchange skips the local sort every keyless repartition pays
    (guide §2.5), worth ~0.4 s of the query at sf0.1."""
    from kafkaish_spark.functions.parallelism import spread

    l = spread(
        t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01"),
        key="l_orderkey",
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------- R13
@query(
    "q_agg_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS uniq_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def q_agg_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Exact count-distinct: Spark expands to a two-phase aggregate
    (distinct on (event_type, user_id) then count) — scales as long as
    the distinct pairs fit the shuffle, which they do for bounded user
    populations."""
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("uniq_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------- R14 (rows-only)
@query("q_agg_approx_distinct_users", oracle=None)
def q_agg_approx_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path for
    unbounded cardinalities (constant memory per group).  Sketch value
    is engine-specific, so rows-only check."""
    return (
        t(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


# ---------------------------------------------------------------- R15
@query(
    "q_agg_rollup_region_nation",
    oracle=f"""
    SELECT r_name, n_name,
           GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
           COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_agg_rollup_region_nation(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING flags to disambiguate data
    NULLs from subtotal rows."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("int").alias("g_region"),
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "acctbal_sum"),
    )


# ---------------------------------------------------------------- R16
@query(
    "q_agg_having_big_orders",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS spent
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 12
    """,
)
def q_agg_having_big_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spent"))
        .filter(F.col("n_orders") > 12)
    )


# ---------------------------------------------------------------- R17
@query(
    "q_window_rank_orders_per_cust",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    bench=True,
)
def q_window_rank_orders_per_cust(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking window functions; unique o_orderkey tiebreak makes every
    rank deterministic.  One shuffle on o_custkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------- R18
@query(
    "q_window_lag_event_gap",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           CAST(epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS BIGINT) AS gap_ms,
           first_value(event_type) OVER w AS first_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_lag_event_gap(spark: SparkSession, sf: str) -> DataFrame:
    """lag/lead/first analytic functions: per-user inter-event gap in
    milliseconds (BIGINT on both engines)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (epoch_ms("ts") - epoch_ms(F.lag("ts").over(w)))
        .cast("long")
        .alias("gap_ms"),
        F.first("event_type").over(wf).alias("first_type"),
    )


# ---------------------------------------------------------------- R19
@query(
    "q_window_running_total",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sliding5_value
    FROM events
    """,
)
def q_window_running_total(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-spec aggregates: running and 5-row sliding sums, exact via
    decimal accumulation (cross-engine reproducible)."""
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slide = base.rowsBetween(-4, Window.currentRow)
    dec = F.col("value").cast("decimal(18,6)")
    return t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.sum(dec).over(run).cast("double").alias("running_value"),
        F.sum(dec).over(slide).cast("double").alias("sliding5_value"),
    )


# ---------------------------------------------------------------- R20
@query(
    "q_sort_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey
    """,
)
def q_sort_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + per-partition
    sort in Spark)."""
    return (
        t(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
    )


# ---------------------------------------------------------------- R21
@query(
    "q_topk_revenue_parts",
    oracle=f"""
    SELECT p_partkey, p_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM part JOIN lineitem ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    ORDER BY revenue DESC, p_partkey
    LIMIT 10
    """,
)
def q_topk_revenue_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-k: Catalyst rewrites orderBy+limit to
    TakeOrderedAndProject (per-partition top-k then merge on driver —
    never a full global sort).  Exact-decimal revenue + p_partkey
    tiebreak keeps the cut deterministic."""
    p = t(spark, sf, "part")
    l = t(spark, sf, "lineitem")
    return (
        p.join(l, l.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("p_partkey"))
        .limit(10)
    )


# ---------------------------------------------------------------- R22
@query(
    "q_topk_per_group_customer_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    bench=True,
)
def q_topk_per_group_customer_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group via ranking window + filter (Spark pushes the
    rn<=3 filter into the window sort as a group-limit optimization)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------- R23
@query(
    "q_set_union_segments",
    oracle="""
    SELECT c_custkey, c_name, 'building' AS seg
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, 'machinery' AS seg
    FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def q_set_union_segments(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL via unionByName — no shuffle, just concatenated scans."""
    c = t(spark, sf, "customer")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", F.lit("building").alias("seg")
    )
    m = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        "c_custkey", "c_name", F.lit("machinery").alias("seg")
    )
    return b.unionByName(m)


# ---------------------------------------------------------------- R24
@query(
    "q_set_except_customers",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def q_set_except_customers(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT set difference (customers active in 1995 but not 1996)."""
    o = t(spark, sf, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return y95.distinct().exceptAll(y96.distinct())


@query(
    "q_set_intersect_customers",
    oracle="""
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def q_set_intersect_customers(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    ).select("o_custkey")
    y96 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_custkey")
    return y95.intersect(y96)


# ---------------------------------------------------------------- R25
@query(
    "q_scalar_string_part_names",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 5) AS name_pre,
           p_brand || ':' || p_type AS brand_type,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS name_us,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           CAST(len(string_split(p_type, ' ')) AS BIGINT) AS type_words,
           trim(p_name) AS name_trim
    FROM part
    """,
)
def q_scalar_string_part_names(spark: SparkSession, sf: str) -> DataFrame:
    """String function surface: lower/upper/substr/concat/length/
    replace/regexp_extract/split/trim."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace("p_name", " ", "_").alias("name_us"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).cast("long").alias("brand_num"),
        F.size(F.split("p_type", " ")).cast("long").alias("type_words"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


# ---------------------------------------------------------------- R26
@query(
    "q_scalar_date_order_months",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_95,
           CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                * 86400000 AS BIGINT) AS order_epoch_ms
    FROM orders
    """,
)
def q_scalar_date_order_months(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time function surface: year/month/quarter/date_trunc/
    datediff/epoch — all BIGINT-normalized for cross-engine hashing."""
    o = t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        # o_orderdate is TIMESTAMP_NTZ (midnight-only); date-based epoch
        # math stays timezone-free on any driver session tz
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            * 86400000
        ).alias("order_epoch_ms"),
    )


# ---------------------------------------------------------------- R27
@query(
    "q_scalar_math_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS qty_floor7,
           pow(l_quantity, 2) AS qty_sq,
           round(ln(l_extendedprice), 6) AS price_ln,
           CASE WHEN l_discount > 0.07 THEN 'high'
                WHEN l_discount > 0.03 THEN 'mid'
                ELSE 'low' END AS disc_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS rf
    FROM lineitem
    """,
)
def q_scalar_math_case(spark: SparkSession, sf: str) -> DataFrame:
    """Math + conditional surface: round/abs/ceil/floor/pow/ln +
    CASE WHEN + coalesce/nullif.  ln rounded to 6dp (libm last-ulp
    differences are ~1e-16)."""
    l = t(spark, sf, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / 7.0).cast("long").alias("qty_floor7"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.when(F.col("l_discount") > 0.07, "high")
        .when(F.col("l_discount") > 0.03, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "rf"
        ),
    )


# ---------------------------------------------------------------- R28
@query(
    "q_array_explode_embedding",
    oracle="""
    SELECT vec_id, unnest(embedding) AS val
    FROM embeddings WHERE vec_id < 5
    """,
)
def q_array_explode_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """explode over array<float> — values pass through untouched, so
    float bits match exactly."""
    e = t(spark, sf, "embeddings").filter(F.col("vec_id") < 5)
    return e.select("vec_id", F.explode("embedding").alias("val"))


@query(
    "q_array_stats",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           embedding[1] AS first_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_array_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Array function surface: size / element_at / filter-lambda."""
    e = t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


# ---------------------------------------------------------------- R29
@query(
    "q_json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(MAX(CAST(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT)
             AS k_max,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON payload extraction (the kafkaish dynamic message payload,
    ref src/topic.js:26-29): Spark uses a real JSON path; the oracle
    extracts the same integer lexically."""
    ev = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("k_sum"),
        F.max(k).cast("long").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- R30
@query(
    "q_subquery_above_avg_price",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    """,
)
def q_subquery_above_avg_price(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery via the SQL surface (spark.sql on a temp view) —
    Catalyst decorrelates into a broadcast of the 1-row aggregate."""
    t(spark, sf, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part_v
        WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part_v)
        """
    )


# ---------------------------------------------------------------- R15b (cube)
@query(
    "q_agg_cube_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE with grouping_id: all 4 grouping sets in ONE pass — Spark
    expands the cube map-side and partially aggregates before the
    shuffle, so the shuffle carries num_groups x 4 rows, not the fact
    table.  Bit order of grouping_id matches DuckDB's GROUPING(a, b)."""
    o = t(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


# ---------------------------------------------------------------- R17b (ntile)
@query(
    "q_window_ntile_customer_value",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS BIGINT)
             AS value_quartile
    FROM customer
    """,
)
def q_window_ntile_customer_value(spark: SparkSession, sf: str) -> DataFrame:
    """ntile quartiles per market segment, unique-key tiebreak so the
    bucket assignment is deterministic across engines.  One shuffle on
    the partition key; each segment sorts locally."""
    c = t(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("value_quartile"),
    )


# ---------------------------------------------------------------- R12b (percentiles)
@query(
    "q_agg_percentiles_quantity",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_quantity, 0.99) AS p99_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_percentiles_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation).  Exact
    percentile gathers per-group values — fine for bounded group
    cardinality; the sketch path for unbounded keys is
    q_agg_approx_distinct_users's approx family."""
    l = t(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("p50_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.percentile("l_quantity", 0.99).alias("p99_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------- R12c (pivot)
@query(
    "q_pivot_orders_priority",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_pivot_orders_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (long->wide) with an EXPLICIT value list — no extra
    distinct-values job, deterministic output schema, single shuffle.
    The oracle is the equivalent conditional aggregation."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    names = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    wide = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", list(names))
        .agg(F.count(F.lit(1)))
    )
    # pivot yields NULL for an absent (segment, priority) cell; the
    # oracle's COUNT(*) FILTER yields 0 — coalesce to match
    return wide.select(
        "c_mktsegment",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a) for v, a in names.items()],
    )


# ---------------------------------------------------------------- R30b (EXISTS)
@query(
    "q_subquery_exists_bulk_supplier",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
    """,
)
def q_subquery_exists_bulk_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface — Catalyst decorrelates
    to a left-semi join keyed on suppkey; the quantity predicate pushes
    to the lineitem scan before the join."""
    t(spark, sf, "supplier").createOrReplaceTempView("supplier_v")
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey
        FROM supplier_v s
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
        """
    )


# ---------------------------------------------------------------- R18b (first/last)
@query(
    "q_window_first_last_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderdate) OVER w AS first_order,
           last_value(o_orderdate)  OVER w AS last_order,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last_order(spark: SparkSession, sf: str) -> DataFrame:
    """first/last analytic functions over an unbounded frame with a
    deterministic (date, key) order — per-customer first and most
    recent order.  One shuffle on the high-cardinality customer key."""
    o = t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderdate").over(w).alias("first_order"),
            F.last("o_orderdate").over(w).alias("last_order"),
            F.first("o_orderkey").over(w).cast("long").alias("first_orderkey"),
        )
        .distinct()
    )


# ---------------------------------------------------------------- R14b (sketch percentiles)
@query("q_agg_approx_percentiles", oracle=None)
def q_agg_approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile (KLL-style mergeable sketch) — the unbounded-
    cardinality twin of q_agg_percentiles_quantity: map-side sketches
    merge associatively, so the shuffle carries one sketch per group
    per partition no matter how many rows.  Nondeterministic vs the
    oracle's exact interpolation => rows-only; pytest bounds the error
    against the exact form."""
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.99, 10000).alias("p99_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------- R29b (map functions)
@query(
    "q_map_props_entries",
    oracle="""
    SELECT 'k' AS map_key,
           COUNT(*) AS n,
           CAST(SUM(CAST(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT)
             AS value_sum,
           CAST(MIN(CAST(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT)
             AS value_min
    FROM events WHERE props IS NOT NULL
    """,
)
def q_map_props_entries(spark: SparkSession, sf: str) -> DataFrame:
    """MapType surface: parse the JSON payload to map<string,long>,
    explode entries, aggregate per key — the schema-on-read path for
    messages whose keys are NOT known ahead of time (the reference's
    arbitrary BSON payload).  The oracle exploits that this corpus has
    the single key 'k'."""
    ev = t(spark, sf, "events").filter(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,long>")
    entries = ev.select(F.explode(m).alias("map_key", "val"))
    return entries.groupBy("map_key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").cast("long").alias("value_sum"),
        F.min("val").cast("long").alias("value_min"),
    )


# ---------------------------------------------------------------- R5b (cross join)
@query(
    "q_join_cross_region_nation",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross_region_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit cartesian product (the grid-generation shape: every
    region paired with every nation).  Spark plans
    BroadcastNestedLoopJoin — fine ONLY because one side is tiny and
    broadcast; a cross join of two fact tables would be 10^22 rows at
    100 TB, so the engine reserves this operator for dimension grids."""
    r = t(spark, sf, "region").select("r_name")
    n = t(spark, sf, "nation").select("n_name")
    return r.crossJoin(n)


# ---------------------------------------------------------------- R30b (NOT IN)
@query(
    "q_subquery_not_in_1995",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate < TIMESTAMP '1996-01-01')
    """,
)
def q_subquery_not_in_1995(spark: SparkSession, sf: str) -> DataFrame:
    """NOT IN subquery through the SQL surface — the null-aware anti
    join.  Catalyst plans NullAwareAntiJoin (broadcast), which is the
    only correct translation under SQL three-valued logic: one NULL in
    the subquery result empties the whole output, so the planner must
    check the null set besides the anti-match.  Distinct from
    q_join_anti_customers_no_orders, which is a plain (null-blind)
    left_anti."""
    t(spark, sf, "customer").createOrReplaceTempView("customer_v")
    t(spark, sf, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer_v
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders_v
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate < TIMESTAMP '1996-01-01')
        """
    )


# ---------------------------------------------------------------- R17c (distribution ranks)
@query(
    "q_window_percent_rank_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_percent_rank_orders(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank + cume_dist per priority class — the distribution
    ranks used for percentile-threshold filtering (e.g. keep the top 1%
    by quality score).  Unique o_orderkey tiebreak removes ties, so both
    are (int-1)/(n-1)-style single IEEE divisions, rounded(9) for hash
    safety.  One shuffle on the partition key."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


# ---------------------------------------------------------------- R15c (grouping sets)
@query(
    "q_agg_grouping_sets_geo",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
           COUNT(*) AS n_customers,
           {dsum_sql('c_acctbal')} AS acctbal_sum
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
    """,
)
def q_agg_grouping_sets_geo(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the irregular case rollup/cube can't
    express — here rollup-shaped minus the nation-only set) through the
    SQL surface.  Spark expands the sets map-side with partial
    aggregation; the two dimension joins broadcast (nation=25,
    region=5 rows at every SF)."""
    t(spark, sf, "customer").createOrReplaceTempView("gs_customer_v")
    t(spark, sf, "nation").createOrReplaceTempView("gs_nation_v")
    t(spark, sf, "region").createOrReplaceTempView("gs_region_v")
    return spark.sql(
        f"""
        SELECT r_name, n_name,
               CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18, 6))) AS DOUBLE)
                 AS acctbal_sum
        FROM gs_customer_v
        JOIN gs_nation_v ON c_nationkey = n_nationkey
        JOIN gs_region_v ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        """
    )


# ---------------------------------------------------------------- R3b (unpivot)
@query(
    "q_unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q_unpivot_lineitem_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot / melt (wide -> long, the inverse of q_pivot): four
    metric columns become (metric, val) rows.  Spark's Expand node
    emits all four rows per input row in ONE scan — against the
    UNION-ALL oracle's four scans, same rows, quarter the reads (at
    100 TB the difference is three extra passes over the fact table).
    Values pass through untouched, so floats match exactly."""
    li = t(spark, sf, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )


# ---------------------------------------------------------------- R25b (pseudonymize)
@query(
    "q_events_pseudonymize",
    oracle="""
    SELECT event_id, event_type,
           md5(CAST(user_id AS VARCHAR)) AS user_pseudo
    FROM events
    """,
)
def q_events_pseudonymize(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic column-level pseudonymization: user ids replaced
    by their md5 token (the PII-safe transform run before events leave
    the trust boundary).  Deterministic hashing keeps every
    distinct-count / group-by / join downstream intact — same token for
    the same user everywhere — with zero shuffle: a pure map, pushed
    through whole-stage codegen."""
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.md5(F.col("user_id").cast("string")).alias("user_pseudo"),
    )


# ---------------------------------------------------------------- R12c (dispersion)
@query(
    "q_agg_stats_dispersion",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * 100.0) AS mean_price,
           (CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)
                       * CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE)
              - CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                * CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                / COUNT(*))
             / (COUNT(*) - 1) / 10000.0 AS var_samp
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_stats_dispersion(spark: SparkSession, sf: str) -> DataFrame:
    """Sample variance / mean per group WITHOUT the builtin stddev:
    floating-point VAR_SAMP is accumulation-order-dependent (different
    partitionings give different last ulps, so Spark vs DuckDB — or the
    same cluster twice — hash-mismatch).  Formulated instead from
    SCALE-0 integer moments (money as cents): SUM(c) and SUM(c*c) are
    exact integers, and an integer-to-double cast is correctly rounded
    in BOTH engines — unlike casting a wide DECIMAL sum to double,
    which DuckDB computes as float(int128)/float(10^scale), two
    roundings that differ from Spark's correctly-rounded BigDecimal
    path in the last ulps (measured).  The remaining arithmetic is a
    fixed IEEE sequence; shuffle shape is the same mergeable
    partial-sum aggregate as any sum."""
    o = t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(20,0)")
    s1 = F.sum(cents).cast("double")
    s2 = F.sum(cents * cents).cast("double")
    n = F.count(F.lit(1))
    return o.groupBy("o_orderpriority").agg(
        n.alias("n"),
        (s1 / (n * F.lit(100.0))).alias("mean_price"),
        ((s2 - s1 * s1 / n) / (n - 1) / F.lit(10000.0)).alias("var_samp"),
    )


# ---------------------------------------------------------------- R12d (correlation)
@query(
    "q_agg_corr_quantity_price",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS HUGEINT) AS x,
             CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
      FROM lineitem)
    SELECT l_returnflag,
           COUNT(*) AS n,
           round(
             (CAST(SUM(x * y) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE) / COUNT(*))
             / sqrt(
                 (CAST(SUM(x * x) AS DOUBLE)
                  - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(y * y) AS DOUBLE)
                    - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)
                      / COUNT(*))),
             6) AS corr_qty_price
    FROM c GROUP BY l_returnflag
    """,
)
def q_agg_corr_quantity_price(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation per group from exact-decimal moment sums
    (sum x, sum y, sum xy, sum x2, sum y2 — all exact integers on the
    decimal grid), combined in a fixed sequence of IEEE ops.  The
    builtin corr() has the same order-dependence problem as stddev;
    this shape is also how a 1000-executor job SHOULD compute
    correlation: five mergeable partial sums, one shuffle, no second
    pass."""
    li = t(spark, sf, "lineitem")
    # scale-0 integer (cents) moments: correlation is scale-invariant,
    # and integer->double casts are correctly rounded in both engines
    # (wide-decimal->double is NOT; see q_agg_stats_dispersion)
    x = F.round(F.col("l_quantity") * 100).cast("decimal(20,0)")
    y = F.round(F.col("l_extendedprice") * 100).cast("decimal(20,0)")
    n = F.count(F.lit(1))
    sx = F.sum(x).cast("double")
    sy = F.sum(y).cast("double")
    sxy = F.sum(x * y).cast("double")
    sxx = F.sum(x * x).cast("double")
    syy = F.sum(y * y).cast("double")
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------- R10b (forward as-of)
@query(
    "q_join_asof_forward",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    ranked AS (
      SELECT v.event_id AS view_id,
             CAST(epoch_ms(p.ts) AS BIGINT) AS next_ts_ms,
             p.event_id AS next_purchase_id,
             row_number() OVER (PARTITION BY v.event_id
                                ORDER BY p.ts, p.event_id) AS rn
      FROM v JOIN p ON v.user_id = p.user_id AND p.ts > v.ts)
    SELECT view_id, next_ts_ms, next_purchase_id FROM ranked WHERE rn = 1
    """,
)
def q_join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join: for each 'view', the NEXT 'purchase' by the
    same user (the complement of q_join_asof_event_order's backward
    direction), computed the scale-safe way: union both event kinds
    into one per-user timeline and take min(struct(ts, id)) over the
    strictly-following frame — ONE shuffle on user_id and linear state
    per user, where the naive views-x-purchases pairwise join is
    quadratic in a hot user's history (the same reason the backward
    as-of rejects it).  Purchases sort BEFORE views at equal ts, so a
    same-timestamp purchase is excluded — exactly the oracle's strict
    ``p.ts > v.ts``.  The winner travels as a struct, so there is no
    lossy composite-key encoding and no id-range assumption."""
    ev = t(spark, sf, "events")
    both = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        # purchases first at equal ts => excluded from the view's
        # strictly-following frame (strict > semantics)
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
        F.when(
            F.col("event_type") == "purchase",
            F.struct(
                epoch_ms(F.col("ts")).cast("long").alias("next_ts_ms"),
                F.col("event_id").alias("next_purchase_id"),
            ),
        ).alias("pkey"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt = both.withColumn("nxt", F.min("pkey").over(w))
    return (
        nxt.filter((F.col("kind") == 1) & F.col("nxt").isNotNull())
        .select(
            F.col("event_id").alias("view_id"),
            F.col("nxt.next_ts_ms").alias("next_ts_ms"),
            F.col("nxt.next_purchase_id").alias("next_purchase_id"),
        )
    )


# ---------------------------------------------------------------- R12e (bitwise aggs)
@query(
    "q_agg_bitwise_events",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS uid_and,
           CAST(bit_or(user_id) AS BIGINT) AS uid_or,
           CAST(bit_xor(user_id) AS BIGINT) AS uid_xor
    FROM events GROUP BY event_type
    """,
)
def q_agg_bitwise_events(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR over a key set) — the compact
    set-signature trick (e.g. xor-fold for membership diffing).  All
    three are associative+commutative integer ops: order-independent by
    construction, partial-aggregated map-side like any sum."""
    ev = t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").cast("long").alias("uid_and"),
        F.bit_or("user_id").cast("long").alias("uid_or"),
        F.bit_xor("user_id").cast("long").alias("uid_xor"),
    )


# ---------------------------------------------------------------- R12f (boolean aggs)
@query(
    "q_agg_boolean_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'F') AS any_finished,
           bool_and(o_totalprice > 1000) AS all_over_1k
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_boolean_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean aggregate surface: count_if / bool_or (ANY) / bool_and
    (EVERY) — the predicates-over-groups shorthand.  Booleans and
    conditional counts are exact on both engines; same mergeable
    aggregate shape as always."""
    o = t(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).cast("long").alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
    )


# ---------------------------------------------------------------- R5c (co-occurrence)
@query(
    "q_basket_part_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_basket_part_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs appearing in the
    same order (pairwise frequent-itemset support counts).  The
    self-join explodes quadratically PER BASKET, not per table — order
    baskets are small (~4 lines), so the join output stays ~k^2/2 x
    orders and shuffles only on l_orderkey.  Global top-20 with a full
    unique tiebreak goes through TakeOrderedAndProject (per-partition
    top-k, merge on driver — no global sort).  At 100 TB you'd add a
    support-threshold semi-join (drop parts appearing once) before the
    self-join; the shape is unchanged."""
    # distinct first: an order with the same part on two lines must
    # count ONCE per pair, or the support counts inflate
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------- R30c (CTE surface)
@query(
    "q_cte_supplier_above_nation_avg",
    oracle="""
    WITH nat_avg AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS nat_mean
      FROM supplier GROUP BY s_nationkey)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           s.s_acctbal - a.nat_mean AS above_by
    FROM supplier s
    JOIN nat_avg a ON s.s_nationkey = a.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal > a.nat_mean
    """,
)
def q_cte_supplier_above_nation_avg(spark: SparkSession, sf: str) -> DataFrame:
    """CTE surface through spark.sql: suppliers beating their own
    nation's mean balance — the grouped-average-then-rejoin shape
    (decorrelated by hand into a CTE, which is also how Catalyst would
    plan the correlated form).  The per-nation aggregate is 25 rows —
    broadcast back onto supplier; one shuffle for the aggregate, none
    for the probe."""
    t(spark, sf, "supplier").createOrReplaceTempView("cte_supplier_v")
    t(spark, sf, "nation").createOrReplaceTempView("cte_nation_v")
    return spark.sql(
        """
        WITH nat_avg AS (
          SELECT s_nationkey,
                 CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS nat_mean
          FROM cte_supplier_v GROUP BY s_nationkey)
        SELECT s.s_suppkey, s.s_name, n.n_name,
               s.s_acctbal - a.nat_mean AS above_by
        FROM cte_supplier_v s
        JOIN nat_avg a ON s.s_nationkey = a.s_nationkey
        JOIN cte_nation_v n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal > a.nat_mean
        """
    )


# ---------------------------------------------------------------- R12g (string agg)
@query(
    "q_agg_string_listagg",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_agg_string_listagg(spark: SparkSession, sf: str) -> DataFrame:
    """LISTAGG / string_agg: nations per region as one ordered CSV
    string.  collect_list order is nondeterministic under distribution,
    so the list is array_sort()ed before joining — the ONLY way a
    string aggregate is reproducible on a cluster (same rule as top-k
    tiebreaks).  Tiny data here; the shape (collect + sort per small
    group) is how you'd do it at any scale where the group fits."""
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations_csv")
        )
    )


# ---------------------------------------------------------------- R25c (regex all)
@query(
    "q_regex_extract_all_part_nums",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ' ')
             AS words_s,
           CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words
    FROM part
    """,
)
def q_regex_extract_all_part_nums(spark: SparkSession, sf: str) -> DataFrame:
    """regexp_extract_all surface: ALL matches per row (the one-to-many
    regex shape; single-match regexp_extract is covered by
    q_scalar_string_part_names).  The driver-facing projection is
    SCALAR on purpose: the matches array is joined to one string
    (``array_join``) because the driver's canonicalizer pandas-sorts
    the result frame and list-typed cells are unhashable there — the
    array itself is still built and length-checked, so the operator
    surface is unchanged.  Char-class regex means both engines' regex
    dialects agree.  Pure map — codegen, no shuffle."""
    p = t(spark, sf, "part")
    # idx=0 = whole match: Spark defaults to capture group 1, DuckDB to 0
    words = F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0)
    return p.select(
        "p_partkey",
        F.array_join(words, " ").alias("words_s"),
        F.size(words).cast("long").alias("n_words"),
    )


# ---------------------------------------------------------------- R19b (RANGE frame)
@query(
    "q_window_trailing_30d_spend",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)
             AS day_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate)
                           AS BIGINT)
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d
    FROM orders
    """,
)
def q_window_trailing_30d_spend(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): each order's
    customer spend over the trailing 30 distinct days (bounds 29
    PRECEDING..CURRENT: day d-29 through d inclusive) — same-day orders
    all see the full same-day total (the semantic difference from ROWS
    frames, and why trailing-period metrics must use RANGE).  The order key is
    an integer day number, so the frame bound is exact; the sum is the
    exact-decimal pattern.  One shuffle on o_custkey, per-customer
    range scan within the partition."""
    o = t(spark, sf, "orders")
    day_no = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_no.cast("long"))
        .rangeBetween(-29, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        day_no.cast("long").alias("day_no"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


# ---------------------------------------------------------------- R7b (TPC-H Q13 shape)
@query(
    "q_tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS n_custs
    FROM (SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): a LEFT
    OUTER join whose extra predicate lives IN the join condition (so
    non-matching customers still appear with count 0 — pushing it to a
    WHERE would silently drop them), then two stacked aggregations.
    COUNT(o_orderkey) counts matches only (NULLs from the outer side
    don't count) — the standard outer-join-count idiom.  One shuffle
    on custkey for join+first agg (same key, Catalyst reuses the
    partitioning); the second agg groups the tiny distribution.  The
    reference's log API has no outer joins at all (SURVEY §2.2 R7);
    this is the canonical analytical composite of them."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_custs"))


# ---------------------------------------------------------------- R30b (TPC-H Q22 shape)
@query(
    "q_tpch_q22_idle_rich_customers",
    oracle=f"""
    WITH stats AS (
      SELECT SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS total_cents,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           {dsum_sql('c_acctbal')} AS totacctbal
    FROM customer, stats
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > total_cents
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q_tpch_q22_idle_rich_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and NO
    urgent orders, grouped by nation.  Three classic pieces composed: a scalar
    aggregate subquery (the global average), a NOT EXISTS decorrelated
    to a left-anti join, and a final group-by.  The threshold compare
    is done in exact integer cents cross-multiplied by the count
    (bal*n > total) — comparing against a floating AVG would put
    borderline rows on different sides per engine.  The 1-row stats
    frame is a broadcast cross join (no driver collect); the anti join
    shuffles on custkey.  At 100 TB the anti join's orders side only
    needs DISTINCT o_custkey — Catalyst pushes the semi-dedup into the
    shuffle via partial aggregation."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    stats = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents).alias("total_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    rich = (
        c.crossJoin(F.broadcast(stats))
        .filter(cents * F.col("n") > F.col("total_cents"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal", "totacctbal"),
    )


# ---------------------------------------------------------------- R12b (arg-max surface)
@query(
    "q_agg_argmax_supplier",
    oracle="""
    SELECT s_nationkey,
           max_by(s_name, CAST(round(s_acctbal * 100) AS BIGINT) * 1000000
                          + s_suppkey) AS richest_supplier,
           min_by(s_name, CAST(round(s_acctbal * 100) AS BIGINT) * 1000000
                          + s_suppkey) AS poorest_supplier,
           CAST(max(round(s_acctbal * 100)) AS BIGINT) AS max_cents
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def q_agg_argmax_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """max_by/min_by (arg-max) surface: per nation, the supplier name
    holding the extreme balance — the one-pass alternative to the
    window row_number + filter top-1 pattern (no sort, no second
    shuffle; just a mergeable (key, arg) accumulator).  Raw max_by
    ties are engine-nondeterministic, so the ordering key is exact
    integer cents * 1e6 + suppkey — unique, so both engines agree.
    Same trick at scale: argmax keys must be totally ordered or
    results are run-to-run unstable."""
    s = t(spark, sf, "supplier")
    key = F.round(F.col("s_acctbal") * 100, 0).cast("long") * 1000000 + F.col(
        "s_suppkey"
    )
    return s.groupBy("s_nationkey").agg(
        F.max_by("s_name", key).alias("richest_supplier"),
        F.min_by("s_name", key).alias("poorest_supplier"),
        F.max(F.round(F.col("s_acctbal") * 100, 0)).cast("long").alias("max_cents"),
    )


# ---------------------------------------------------------------- R17b (SCD2 intervals)
@query(
    "q_scd2_priority_intervals",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderpriority,
           CAST(o_orderdate AS DATE) AS valid_from,
           CAST(lead(o_orderdate) OVER w AS DATE) AS valid_to,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(lead(o_orderdate) OVER w AS DATE)) AS BIGINT)
             AS days_valid,
           lead(o_orderdate) OVER w IS NULL AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_priority_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension type 2) interval build: turn a
    change log (each customer's orders as priority 'observations') into
    validity intervals [valid_from, valid_to) via lead() — the standard
    warehouse pattern for as-of dimension lookups.  The window orders
    by (date, orderkey) so same-day rows have a total order and both
    engines agree.  One shuffle on o_custkey; the three lead-derived
    columns share a single window spec so Spark computes ONE Window
    node.  At 100 TB this is the cheap half of SCD2 — the expensive
    half (merging into an existing dimension) is the same window over
    the union of old+new."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("valid_from"),
        nxt.cast("date").alias("valid_to"),
        F.datediff(nxt.cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_valid"),
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------- R25b (PII masking)
@query(
    "q_pii_mask_customers",
    oracle="""
    SELECT c_custkey,
           lpad(right(c_name, 3), CAST(length(c_name) AS INTEGER), '*')
             AS name_masked,
           md5(c_name) AS name_token,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS acct_band
    FROM customer
    """,
)
def q_pii_mask_customers(spark: SparkSession, sf: str) -> DataFrame:
    """PII-safe view: mask all but the last 3 chars of the identifying
    column (lpad-with-'*' to the original length — the redaction
    pattern), keep a deterministic md5 token so joins/distincts still
    work downstream (same recipe as q_events_pseudonymize), and band
    the numeric attribute so analytics survive without raw balances.
    Pure per-row projection: no shuffle, fully pushed into one codegen
    stage; at 100 TB this runs at scan speed as the standard
    'export-safe' projection before data leaves the trust boundary."""
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.expr("lpad(right(c_name, 3), CAST(length(c_name) AS INT), '*')").alias(
            "name_masked"
        ),
        F.md5("c_name").alias("name_token"),
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("acct_band"),
    )


# ---------------------------------------------------------------- R18b (nth_value)
@query(
    "q_window_nth_value_orders",
    oracle="""
    SELECT o_custkey,
           CAST(nth_value(o_orderdate, 1) OVER w AS DATE) AS first_order,
           CAST(nth_value(o_orderdate, 2) OVER w AS DATE) AS second_order,
           CAST(nth_value(o_orderdate, 3) OVER w AS DATE) AS third_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) = 1
    """,
)
def q_window_nth_value_orders(spark: SparkSession, sf: str) -> DataFrame:
    """nth_value window surface: each customer's 1st/2nd/3rd order
    dates in one pass (NULL where the customer has fewer orders) —
    the onboarding-funnel shape (signup -> second purchase latency).
    The frame must be UNBOUNDED..UNBOUNDED: with the default frame
    ending at CURRENT ROW, nth_value(.., 3) is NULL until the 3rd row
    even when it exists.  All four window functions share one spec =
    one sort within the o_custkey shuffle; the rn=1 filter collapses
    to one row per customer."""
    o = t(spark, sf, "orders")
    ordering = [F.col("o_orderdate"), F.col("o_orderkey")]
    full = (
        Window.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("o_custkey").orderBy(*ordering)
    return (
        o.select(
            "o_custkey",
            F.nth_value("o_orderdate", 1).over(full).cast("date").alias("first_order"),
            F.nth_value("o_orderdate", 2).over(full).cast("date").alias("second_order"),
            F.nth_value("o_orderdate", 3).over(full).cast("date").alias("third_order"),
            F.row_number().over(seq).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------- R12c (k-anonymity audit)
@query(
    "q_privacy_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS acct_band,
           COUNT(*) AS group_size,
           COUNT(*) < 5 AS below_k
    FROM customer
    GROUP BY 1, 2, 3
    """,
)
def q_privacy_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, segment, balance band): any equivalence class smaller
    than k means those rows are re-identifiable and must be
    generalized or suppressed before release — the standard privacy
    gate run right after q_pii_mask_customers' redaction.  One
    partial-aggregated shuffle on the QI tuple; at 100 TB the audit
    is the same single groupBy, and the follow-up suppression is a
    broadcast semi-join of the below-k classes back onto the data."""
    c = t(spark, sf, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
    )
    return c.groupBy("c_nationkey", "c_mktsegment", band.alias("acct_band")).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < 5).alias("below_k"),
    )


# ---------------------------------------------------------------- R7c (full outer)
@query(
    "q_join_full_outer_rich",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_rich_customers, 0) AS n_rich_customers,
           COALESCE(s.n_rich_suppliers, 0) AS n_rich_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_rich_customers
          FROM customer WHERE c_acctbal > 9900 GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_rich_suppliers
          FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def q_join_full_outer_rich(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join (the R7 variant the inventory still owed):
    per-nation counts of high-balance customers vs suppliers, where
    either side can be missing — COALESCE merges the two key columns
    and zero-fills the absent counts, the canonical reconciliation /
    side-by-side-report shape.  Both inputs pre-aggregate BEFORE the
    join (25 rows each), so the outer join is trivially cheap — at
    100 TB pre-aggregation-then-outer-join beats outer-join-then-
    aggregate by the full shuffle width; full outer also disables
    broadcast (both sides must shuffle) which is why the reduction
    must happen first."""
    c = (
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    s = (
        t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    joined = c.join(s, "nk", "full_outer")
    return joined.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_rich_customers", F.lit(0)).alias("n_rich_customers"),
        F.coalesce("n_rich_suppliers", F.lit(0)).alias("n_rich_suppliers"),
    )


# ---------------------------------------------------------------- R19b (share of total)
@query(
    "q_agg_share_of_total",
    oracle="""
    WITH per_nation AS (
      SELECT c_nationkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey)
    SELECT c_nationkey,
           CAST(cents AS BIGINT) AS revenue_cents,
           round(CAST(cents AS DOUBLE)
                 / CAST(SUM(cents) OVER () AS DOUBLE), 6) AS share
    FROM per_nation
    """,
)
def q_agg_share_of_total(spark: SparkSession, sf: str) -> DataFrame:
    """Ratio-to-report (share of total): each nation's slice of global
    order revenue.  The oracle uses the empty-frame window SUM() OVER
    (); the Spark plan deliberately does NOT — an unpartitioned window
    funnels every row through ONE task, the classic scale trap — and
    instead cross-joins the 25-row aggregate with its own 1-row total
    (broadcast, no single-task choke point).  Moments stay in integer
    cents (BIGINT) so both engines' grand totals are bit-identical
    before ONE int->double cast each — per the wide-decimal-cast
    divergence rule; at 100 TB the cents sum needs DECIMAL(38,0), and
    the int128->double cast needs the same care."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("cents"))
    )
    total = per_nation.agg(F.sum("cents").alias("total_cents"))
    return per_nation.crossJoin(F.broadcast(total)).select(
        "c_nationkey",
        F.col("cents").cast("long").alias("revenue_cents"),
        F.round(
            F.col("cents").cast("double") / F.col("total_cents").cast("double"), 6
        ).alias("share"),
    )


# ---------------------------------------------------------------- R30c (TPC-H Q17 shape)
@query(
    "q_tpch_q17_small_quantity",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(round(l_quantity) AS BIGINT)) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT p_brand,
           COUNT(*) AS n_small_lines,
           {dsum_sql('l_extendedprice')} AS small_revenue
    FROM lineitem
    JOIN per_part USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE CAST(round(l_quantity) AS BIGINT) * 5 * cnt < sum_qty
    GROUP BY p_brand
    """,
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    quantity is below 20% of their part's average quantity — the
    correlated-aggregate-subquery pattern, decorrelated into a
    group-by + self-join on the correlation key.  The 0.2*avg
    threshold is compared as qty*5*cnt < sum (exact integer cross-
    multiplication; quantities are integer-valued) so no float
    division decides membership.  Both heavy frames shuffle once on
    l_partkey — Catalyst lines the self-join up with the aggregation's
    partitioning — then the part dimension broadcasts for the brand
    rollup.  At 100 TB the per-part aggregate is ~|parts| rows (small
    vs lineitem), exactly why decorrelation wins over re-scanning per
    row."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(qty * 5 * F.col("cnt") < F.col("sum_qty"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            dsum("l_extendedprice", "small_revenue"),
        )
    )


# ---------------------------------------------------------------- R28b (HOF predicates)
@query(
    "q_array_predicates_embeddings",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]),
                                x -> x > 0.1)) AS BIGINT) AS n_large,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0.3)) > 0
             AS any_very_large,
           len(list_filter(CAST(embedding AS DOUBLE[]),
                           x -> NOT (x BETWEEN -1.0 AND 1.0))) = 0
             AS all_bounded
    FROM embeddings
    """,
)
def q_array_predicates_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array predicate surface — filter / exists / forall
    over the embedding vector without exploding it: dimension counts
    above a threshold, any-outlier and all-in-range flags (the vector
    sanity screen run before indexing).  Spark evaluates the lambdas
    JVM-side inside codegen (no Python); per-row array work, no
    shuffle at all.  The oracle expresses exists/forall through
    list_filter lengths, which is semantics-identical on non-null
    elements; comparisons happen on exactly-cast doubles so the flags
    agree bit-for-bit."""
    e = t(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0.1)).cast("long").alias("n_large"),
        F.exists(v, lambda x: x > 0.3).alias("any_very_large"),
        F.forall(v, lambda x: (x >= -1.0) & (x <= 1.0)).alias("all_bounded"),
    )


# ---------------------------------------------------------------- R13b (rolling WAU)
@query(
    "q_events_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM du),
    expanded AS (
      SELECT CAST(wd AS DATE) AS window_day, user_id
      FROM du, LATERAL unnest(generate_series(CAST(d AS TIMESTAMP),
                                              CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                              INTERVAL 1 DAY)) AS u(wd)),
    wau AS (
      SELECT window_day, COUNT(DISTINCT user_id) AS wau_7d
      FROM expanded, bounds
      WHERE window_day BETWEEN lo AND hi
      GROUP BY window_day),
    dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d)
    SELECT window_day, wau_7d, COALESCE(dau, 0) AS dau
    FROM wau LEFT JOIN dau ON dau.d = wau.window_day
    """,
)
def q_events_rolling_wau(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU) next to the point DAU
    — THE retention dashboard metric, and the canonical 'sliding
    COUNT DISTINCT' that window frames cannot express (distinct does
    not merge across frame slides).  The scalable formulation:
    collapse events to distinct (day, user) pairs FIRST (bounded by
    users x days, orders of magnitude below raw events), then explode
    each pair into the <=7 window-days it contributes to and count
    distinct per window day.  Work is O(active-pairs x 7), shuffled
    on the day key; no per-user state, no full sort.  At 100 TB the
    pre-distinct is the whole trick — exploding raw events would 7x
    the event stream instead of the tiny pair set."""
    ev = t(spark, sf, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    bounds = du.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    expanded = du.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias(
            "window_day"
        ),
        "user_id",
    )
    wau = (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_day").between(F.col("lo"), F.col("hi")))
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    dau = du.groupBy(F.col("d")).agg(F.count(F.lit(1)).alias("dau"))
    return wau.join(dau, wau.window_day == dau.d, "left").select(
        "window_day", "wau_7d", F.coalesce("dau", F.lit(0)).alias("dau")
    )


# ---------------------------------------------------------------- R16b (p95 outliers)
@query(
    "q_outliers_above_p95",
    oracle="""
    WITH th AS (
      SELECT c_nationkey, quantile_cont(o_totalprice, 0.95) AS p95
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey)
    SELECT o_orderkey, c_nationkey, o_totalprice, p95
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN th USING (c_nationkey)
    WHERE o_totalprice > p95
    """,
)
def q_outliers_above_p95(spark: SparkSession, sf: str) -> DataFrame:
    """Group-relative outlier tagging: orders above their nation's
    95th-percentile total — the two-pass percentile-threshold pattern
    (aggregate per group, broadcast the tiny threshold table back
    onto the fact).  Spark's exact `percentile` equals DuckDB's
    quantile_cont bit-for-bit (proven by q_agg_percentiles_quantity),
    so even the raw interpolated threshold column matches.  One
    shuffle on custkey for the join, one on nationkey for the
    percentile (which needs the group's sorted values — the one agg
    that can't partial-merge; at 100 TB swap in approx_percentile's
    mergeable sketch and keep the identical plan shape)."""
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    oc = o.join(c, o.o_custkey == c.c_custkey)
    th = oc.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.percentile("o_totalprice", 0.95).alias("p95")
    )
    return (
        oc.join(F.broadcast(th), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("o_totalprice") > F.col("p95"))
        .select("o_orderkey", "c_nationkey", "o_totalprice", "p95")
    )


# ---------------------------------------------------------------- R10c (nearest as-of)
@query(
    "q_join_asof_nearest",
    oracle="""
    WITH v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
    p AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'),
    ranked AS (
      SELECT p.event_id AS purchase_id, p.user_id,
             v.event_id AS view_id,
             CAST(epoch_ms(p.ts) - epoch_ms(v.ts) AS BIGINT) AS gap_ms,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_ms(p.ts) - epoch_ms(v.ts)),
                        CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
                        CASE WHEN v.ts <= p.ts THEN -v.event_id
                             ELSE v.event_id END) AS rn
      FROM p JOIN v ON p.user_id = v.user_id)
    SELECT purchase_id, user_id, view_id, gap_ms FROM ranked WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """NEAREST as-of join — the sensor-alignment semantics (closest
    reading in EITHER direction), completing the as-of family next to
    backward (q_join_asof_event_order) and forward
    (q_join_asof_forward).  Ties prefer the backward candidate (the
    value that was already known at event time — the causal choice),
    then the backward-latest / forward-earliest view id.

    Scale shape: the naive plan is the pairwise join the oracle states
    (quadratic in a hot user's history).  This side computes BOTH
    directional candidates in ONE union-timeline pass — two window
    frames over the same (user_id, ts, kind, id) sort, so Spark plans
    one shuffle + one sort and reuses them for both windows — then a
    row-local argmin picks the winner.  Linear state per user at any
    scale."""
    ev = t(spark, sf, "events")
    # views sort BEFORE purchases at equal ts (kind 0 < 1): same-ts
    # views land in the backward frame (<=) and out of the forward one
    both = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
        F.when(
            F.col("event_type") == "view",
            F.struct(
                epoch_ms(F.col("ts")).cast("long").alias("v_ts_ms"),
                F.col("event_id").alias("view_id"),
            ),
        ).alias("vkey"),
    )
    order = [F.col("ts"), F.col("kind"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    cand = (
        both.withColumn("back", F.max("vkey").over(wb))
        .withColumn("fwd", F.min("vkey").over(wf))
        .filter(F.col("kind") == 1)
    )
    p_ms = epoch_ms(F.col("ts")).cast("long")
    back_gap = p_ms - F.col("back.v_ts_ms")   # >= 0
    fwd_gap = F.col("fwd.v_ts_ms") - p_ms     # > 0
    take_back = F.col("back").isNotNull() & (
        F.col("fwd").isNull() | (back_gap <= fwd_gap)
    )
    return (
        cand.filter(F.col("back").isNotNull() | F.col("fwd").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(take_back, F.col("back.view_id"))
            .otherwise(F.col("fwd.view_id"))
            .alias("view_id"),
            F.when(take_back, back_gap)
            .otherwise(-fwd_gap)
            .cast("long")
            .alias("gap_ms"),
        )
    )
