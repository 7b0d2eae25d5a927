"""TPC-H Q2 / Q9 / Q11 / Q16 / Q20 — the partsupp-family shapes,
re-based on the driver schema (which has no partsupp table) via a
SUPPLY relation derived from lineitem:

    supply(part, supplier) := GROUP BY (l_partkey, l_suppkey) with
      sp_cost_c := MIN(round(l_extendedprice * 100 / l_quantity))
                   — the best observed unit price in cents (the
                   ps_supplycost stand-in), and
      sp_qty    := SUM(l_quantity)  — all-time supplied volume
                   (the ps_availqty stand-in).

What each query exercises is its textbook PLAN SHAPE, stated in the
oracle as the classic correlated-subquery formulation so the
decorrelated Spark plan is proven equivalent, not just plausible:

- Q2  — correlated scalar subquery against a grouped MIN (min-cost
        supplier per part), decorrelated to aggregate + re-join.
- Q9  — multi-way profit join (fact x supply x 4 dims) grouped by
        nation x year.
- Q11 — group-by with HAVING against a global-scalar subquery
        (share-of-total threshold).
- Q16 — count-distinct group-by behind a NOT IN anti-join.
- Q20 — double-nested IN chain with a correlated scalar aggregate
        in the innermost predicate.

Exactness: all money flows on the integer cents grid
(CAST(round(x * 100) AS BIGINT)); the unit-cost division
``l_extendedprice * 100 / l_quantity`` is the same left-associated
IEEE expression on both engines (l_quantity is integral-valued by
data contract, so the BIGINT casts agree despite DuckDB rounding vs
Spark truncating doubles).  No float ever crosses an aggregate.

Reference parity: the reference (kafkaish) computes none of these —
[NS] north-star per SURVEY.md §2.2; TPC-H coverage goes to 22/22 with
this module (round-3 verdict item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# The derived supply relation, shared by all five oracles.
_SUPPLY_SQL = """
    supply AS (
      SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
             MIN(CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT))
               AS sp_cost_c,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sp_qty
      FROM lineitem GROUP BY 1, 2)
"""


def _supply(spark: SparkSession, sf: str, li: DataFrame | None = None) -> DataFrame:
    """The Spark twin of the supply CTE.  One shuffle on the composite
    (partkey, suppkey) key with full map-side partial aggregation —
    at 100 TB this is the canonical pre-aggregation that turns every
    per-(part, supplier) question into a join against a table ~1000x
    smaller than the fact."""
    li = li if li is not None else t(spark, sf, "lineitem")
    unit_cost_c = F.round(
        F.col("l_extendedprice") * 100 / F.col("l_quantity")
    ).cast("long")
    return li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(
        F.min(unit_cost_c).alias("sp_cost_c"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("sp_qty"),
    )


# ---------------------------------------------------------------- TPC-H Q2
@query(
    "q_tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    eur AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    costs AS (
      SELECT sp_partkey, sp_cost_c, s_name, s_acctbal, n_name
      FROM supply JOIN eur ON sp_suppkey = s_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           sp_cost_c AS supply_cost_c
    FROM part JOIN costs ON p_partkey = sp_partkey
    WHERE p_size BETWEEN 10 AND 30
      AND p_name LIKE '%widget'
      AND sp_cost_c = (SELECT MIN(c2.sp_cost_c) FROM costs c2
                       WHERE c2.sp_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each widget-family
    part in a size band, the EUROPE supplier(s) offering the lowest
    unit cost — the correlated-scalar-subquery-against-grouped-MIN
    pattern.  The oracle states the textbook correlated form; here it
    is decorrelated by hand: per-part MIN over the regional cost table,
    joined back on (partkey, min_cost) — which is exactly what
    Catalyst's RewriteCorrelatedScalarSubquery would produce, made
    explicit so the plan is inspectable.

    Scale: supply is the one fact-sized shuffle; the European supplier
    dim (supplier x nation x region) broadcasts into it, and the
    per-part MIN rides a WINDOW over the same partkey partitioning
    instead of a groupBy-plus-rejoin — one exchange of the cost table
    total, where the aggregate-and-join decorrelation would pay two
    plus a join.  part broadcasts into the final projection.  Top-100
    is tie-broken on the unique (s_name, p_partkey) pair so LIMIT is
    deterministic."""
    from pyspark.sql import Window

    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    eur = (
        t(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = _supply(spark, sf).join(
        F.broadcast(eur), F.col("sp_suppkey") == F.col("s_suppkey")
    ).select("sp_partkey", "sp_cost_c", "s_name", "s_acctbal", "n_name")
    w_part = Window.partitionBy("sp_partkey")
    best = costs.withColumn(
        "min_cost_c", F.min("sp_cost_c").over(w_part)
    ).filter(F.col("sp_cost_c") == F.col("min_cost_c"))
    p = t(spark, sf, "part").filter(
        F.col("p_size").between(10, 30) & F.col("p_name").like("%widget")
    ).select("p_partkey", "p_name")
    return (
        best.join(F.broadcast(p), F.col("sp_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("sp_cost_c").alias("supply_cost_c"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------- TPC-H Q9
@query(
    "q_tpch_q9_product_profit",
    oracle=f"""
    WITH {_SUPPLY_SQL}
    SELECT n_name AS nation,
           EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)
                    - sp_cost_c * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS profit_c
    FROM lineitem
    JOIN supply   ON sp_partkey = l_partkey AND sp_suppkey = l_suppkey
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): revenue minus supply cost
    for red-family parts, by supplier nation x order year.  Profit per
    line is exact integer cents: revenue on the cents grid minus
    unit-cost-cents x quantity.

    Scale: the red-part filter broadcasts into lineitem FIRST, so both
    the supply pre-aggregation and the profit join run on ~1/8 of the
    fact (building supply from the filtered fact is semantically
    identical — a part's supply rows all carry that part's key).  The
    two data-sized shuffles are supply's (partkey, suppkey) group-by
    and the orders join on orderkey; part/supplier/nation broadcast.
    The oracle keeps the unfiltered textbook join order to prove the
    pushed-down plan equivalent."""
    p_red = t(spark, sf, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = t(spark, sf, "lineitem").join(
        F.broadcast(p_red), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    sup = _supply(spark, sf, li=li)
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    rev_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    amount_c = rev_c - F.col("sp_cost_c") * F.col("l_quantity").cast("long")
    return (
        li.join(
            sup,
            (F.col("l_partkey") == F.col("sp_partkey"))
            & (F.col("l_suppkey") == F.col("sp_suppkey")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount_c).cast("long").alias("profit_c"))
    )


# ---------------------------------------------------------------- TPC-H Q11
@query(
    "q_tpch_q11_important_stock",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    nat AS (
      SELECT sp_partkey, sp_cost_c * sp_qty AS value_c
      FROM supply
      JOIN supplier ON sp_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    SELECT sp_partkey AS p_partkey,
           CAST(SUM(value_c) AS BIGINT) AS value_c
    FROM nat GROUP BY 1
    HAVING CAST(SUM(value_c) AS BIGINT) * 1000 >
           (SELECT CAST(SUM(value_c) AS BIGINT) FROM nat)
    """,
)
def q_tpch_q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value
    (cost x volume) over one nation's suppliers, keeping parts whose
    value exceeds 1/1000 of the nation total — HAVING against a
    global-scalar subquery.  The share test is integer-exact
    (value x 1000 > total), never a float fraction.

    Scale: the nation filter broadcasts into supply and the per-part
    SUM is a partial-agg shuffle.  The grand total re-aggregates the
    PER-PART frame (identical subplan on both sides of the broadcast,
    so Spark's ReuseExchange serves the second consumer from the first
    shuffle) — the scalar subquery costs one 1-row exchange over
    |parts| rows, never a second pass over supply."""
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7").select(
        "n_nationkey"
    )
    nat_supp = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    nat = (
        _supply(spark, sf)
        .join(F.broadcast(nat_supp), F.col("sp_suppkey") == F.col("s_suppkey"))
        .select(
            "sp_partkey",
            (F.col("sp_cost_c") * F.col("sp_qty")).alias("value_c"),
        )
    )
    per_part = nat.groupBy(F.col("sp_partkey").alias("p_partkey")).agg(
        F.sum("value_c").cast("long").alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select("p_partkey", "value_c")
    )


# ---------------------------------------------------------------- TPC-H Q16
@query(
    "q_tpch_q16_supplier_cnt",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey
      FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT sp_suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs JOIN part ON p_partkey = sp_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND sp_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers can provide each surviving (brand, type, size) bucket,
    excluding blacklisted suppliers — a NOT IN subquery (negative
    account balance stands in for the reference's complaint scan)
    ahead of a count-distinct rollup.

    Scale: the distinct (part, supplier) pair set is the only
    fact-sized shuffle; the blacklist is a broadcast ANTI join (the
    decorrelated NOT IN — s_suppkey is non-null so the semantics
    match); part broadcasts; the count-distinct shuffles the surviving
    pairs once more on the 3-column group key."""
    pairs = (
        t(spark, sf, "lineitem")
        .select(
            F.col("l_partkey").alias("sp_partkey"),
            F.col("l_suppkey").alias("sp_suppkey"),
        )
        .distinct()
    )
    blacklist = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(blacklist),
            F.col("sp_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("sp_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("sp_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- TPC-H Q20
@query(
    "q_tpch_q20_promotion_suppliers",
    oracle=f"""
    WITH {_SUPPLY_SQL}
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (
        SELECT sp_suppkey FROM supply
        WHERE sp_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND sp_qty > 2 * (
              SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
              FROM lineitem
              WHERE l_partkey = sp_partkey AND l_suppkey = sp_suppkey
                AND l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'))
    """,
)
def q_tpch_q20_promotion_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): European suppliers
    holding excess stock of a small-family part — all-time supplied
    volume more than double what they shipped in 1997.  The oracle is
    the textbook DOUBLE-NESTED IN chain with a correlated scalar SUM
    innermost; here each nesting level decorrelates explicitly:
    the correlated SUM becomes a (partkey, suppkey)-grouped aggregate
    of the 1997 fact slice joined back (suppliers with NO 1997
    shipments fall out of the inner join exactly as the NULL
    comparison excludes them in the oracle), the part IN becomes a
    broadcast semi join, and the outer IN a semi join on suppkey.

    Scale: both fact passes (all-time supply, 1997 slice) are
    partial-agg shuffles on the same composite key — AQE can reuse the
    exchange; everything else broadcasts.  Never a per-supplier
    subquery execution."""
    small = t(spark, sf, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    li = t(spark, sf, "lineitem")
    li_small = li.join(
        F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    sup = _supply(spark, sf, li=li_small)
    qty97 = (
        li_small.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("q_partkey"),
            F.col("l_suppkey").alias("q_suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_1997"))
    )
    overstocked = (
        sup.join(
            qty97,
            (F.col("sp_partkey") == F.col("q_partkey"))
            & (F.col("sp_suppkey") == F.col("q_suppkey")),
        )
        .filter(F.col("sp_qty") > 2 * F.col("qty_1997"))
        .select("sp_suppkey")
        .distinct()
    )
    r = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = t(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    return (
        t(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(overstocked),
            F.col("s_suppkey") == F.col("sp_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
