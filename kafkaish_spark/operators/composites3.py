"""Third round of composite operators: the remaining TPC-H shapes
expressible on the driver schema (Q4/Q5/Q12/Q14/Q15/Q19/Q21 — the
ones that need no partsupp table), plus the map higher-order-function
surface (transform_values / map_filter).

The driver tables lack l_commitdate / l_receiptdate / l_shipmode, so
the Q4/Q12/Q19/Q21 predicates are re-based on columns that exist
(lateness := l_shipdate vs o_orderdate); the SHAPE of each plan —
EXISTS-groupby, conditional aggregation, disjunctive join predicates,
anti-joined self-correlation — is what each query exercises, and the
oracle uses the textbook correlated-subquery formulation so the
decorrelated Spark plan is proven equivalent, not just plausible.

Same conventions as ``relational.py`` / ``composites2.py``: computed
columns aliased identically on both sides, doubles folded through the
exact-decimal helpers (``functions/exact.py``), top-k tie-broken on a
unique key.  Reference parity note: the reference (kafkaish) computes
none of these — they are [NS] north-star processing-layer operators
per SURVEY.md §2.2/§2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum, dsum_sql
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t


# ---------------------------------------------------------------- TPC-H Q4
@query(
    "q_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders in a quarter
    that had at least one slow lineitem (shipped >60 days after the
    order date — the schema's stand-in for receipt>commit), counted by
    priority.  The EXISTS becomes a LEFT SEMI join whose condition
    spans both sides; the date filter cuts orders BEFORE the join so
    the semi-join probe side is a quarter, not seven years.  At scale
    the semi join shuffles both sides on orderkey once and the
    five-group aggregate is a cheap second Exchange."""
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# ---------------------------------------------------------------- TPC-H Q5
@query(
    "q_tpch_q5_local_supplier",
    bench=True,
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue from orders
    where the supplying supplier sits in the same ASIA nation as the
    customer.  The same-nation constraint rides INSIDE the supplier
    join condition (suppkey AND nationkey) rather than as a post-join
    filter, so mismatched pairs never materialize.  orders is filtered
    to one year and joined to lineitem on orderkey (the single big
    shuffle); customer and supplier broadcast; nation/region fold into
    the supplier broadcast.  Five joins, one Exchange on the fact."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf, "nation")
    asia_nation = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey", "n_name")
    s = t(spark, sf, "supplier").join(
        F.broadcast(asia_nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------- TPC-H Q12
@query(
    "q_tpch_q12_priority_class",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def q_tpch_q12_priority_class(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): for slow
    1997 shipments (>60 days after order — the receipt>commit
    stand-in; l_linestatus stands in for shipmode), split line counts
    into urgent-ish vs everything else via conditional aggregation —
    both counts from ONE pass, no second scan or self-join.  The
    year filter prunes lineitem at the scan; the lateness predicate
    needs o_orderdate so it runs post-join, which is exactly where the
    original puts it too."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    o = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q14
@query(
    "q_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT round(100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' "
                                   "THEN l_extendedprice * (1 - l_discount) "
                                   "ELSE 0 END")}
                 / {dsum_sql('l_extendedprice * (1 - l_discount)')}, 6)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): the percentage of one month's
    revenue that came from PROMO parts.  Both the conditional sum and
    the total come out of a single aggregate over the broadcast
    lineitem⋈part join — one fact scan, zero shuffles before the
    1-row global aggregate.  Exact-decimal sums + one IEEE division +
    round(6) keep the ratio bit-identical across engines and across
    any partitioning of the 100 TB fact."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = t(spark, sf, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * dsum(promo) / dsum(rev), 6).alias(
                "promo_revenue"
            )
        )
    )


# ---------------------------------------------------------------- TPC-H Q15
@query(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue — the scalar-MAX-subquery shape.  The per-supplier revenue
    aggregate is computed ONCE and reused for both the max and the
    final filter (in SQL this is the view TPC-H mandates); the 1-row
    max broadcasts back against it, and the supplier dimension
    broadcasts for the name lookup.  Revenue folds through exact
    decimals, so the equality against MAX is exact — no
    last-ulp-dropped-winner risk that a raw double sum would carry."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------- TPC-H Q19
@query(
    "q_tpch_q19_disjunctive",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#4' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    three OR'd brand/size/quantity bands spanning both join sides.
    Catalyst CNF-converts the disjunction and pushes the derivable
    conjuncts to each scan (quantity 1-30 to lineitem, size 1-15 +
    brand IN set to part) while the full predicate stays on the
    broadcast join — the part scan reads three brands, not 25.  The
    single-row conditional aggregate makes pruning quality THE cost of
    this query, which is why it's the classic pushdown benchmark."""
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("l_quantity").between(1, 11)
        & F.col("p_size").between(1, 5)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("l_quantity").between(10, 20)
        & F.col("p_size").between(1, 10)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("l_quantity").between(20, 30)
        & F.col("p_size").between(1, 15)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------- TPC-H Q21
@query(
    "q_tpch_q21_waiting_suppliers",
    oracle="""
    WITH j AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 75 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F')
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM j l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM j l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM j l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q_tpch_q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the sole
    late supplier in a finished multi-supplier order, counted per late
    line.  The textbook form is lineitem × EXISTS(lineitem) × NOT
    EXISTS(lineitem) — three scans and two correlated self-joins.
    Rewritten Spark-first as ONE per-order aggregate: an order
    qualifies iff it has >1 distinct supplier and exactly 1 distinct
    LATE supplier, and its numwait contribution is its late-line
    count — same semantics (proven against the EXISTS oracle), one
    shuffle on orderkey instead of three self-join shuffles.  That
    rewrite is the difference between one pass and three over a
    100 TB fact."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")
    ).cast("int")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(
                F.when(F.col("late") == 1, F.col("l_suppkey"))
            ).alias("n_late_supp"),
            F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
                "late_supp"
            ),
            F.sum("late").alias("n_late_lines"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------- map HOFs
@query(
    "q_map_transform_props",
    oracle="""
    WITH vals AS (
      SELECT CAST(regexp_extract(props, '(-?[0-9]+)', 1) AS BIGINT) AS v
      FROM events WHERE props IS NOT NULL)
    SELECT 'k' AS map_key,
           COUNT(*) AS n_odd,
           CAST(SUM(v * v) AS BIGINT) AS sq_sum
    FROM vals WHERE v % 2 <> 0
    GROUP BY map_key
    """,
)
def q_map_transform_props(spark: SparkSession, sf: str) -> DataFrame:
    """Map higher-order functions: parse the JSON payload to
    map<string,long>, square every value with transform_values, keep
    odd entries with map_filter (odd square <=> odd value, which is
    what the oracle filters on), then explode and aggregate per key.
    Both lambdas run as Catalyst expressions inside codegen — no
    Python, no shuffle before the per-key aggregate.  This is the
    schema-on-read mutation path for payload maps whose keys are not
    known ahead of time (the reference's arbitrary BSON payloads,
    /root/reference/src/topic.js:26-29)."""
    ev = t(spark, sf, "events").filter(F.col("props").isNotNull())
    m = F.from_json("props", "map<string,long>")
    squared = F.transform_values(m, lambda _, v: v * v)
    odd = F.map_filter(squared, lambda _, v: v % 2 != 0)
    entries = ev.select(F.explode(odd).alias("map_key", "sq"))
    return entries.groupBy("map_key").agg(
        F.count(F.lit(1)).alias("n_odd"),
        F.sum("sq").cast("bigint").alias("sq_sum"),
    )
