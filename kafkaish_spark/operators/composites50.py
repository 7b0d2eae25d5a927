"""Round-9 wave 1: the audit→action loop closed — the join-strategy
ADVISOR (functions/advisor.py) as driver-provable queries.

The r8 pre-flight audit family (composites47.py) computes the numbers
that decide broadcast vs plain-shuffle vs salted join; r8 verdict item
5 asked for the consumer.  These queries prove the two halves of it:

- ``q_advisor_strategy_table``: the DECISION itself, oracle-paired —
  the real ``advise_join`` runs per edge (measuring exact dim bytes
  and the hottest fact-key share) and its verdicts are hash-compared
  against the same decision rule spelled out in ANSI SQL.  The table
  covers all three regimes: broadcast (nation/region at target scale
  1×), shuffle (customer at 10 000× — corpus-growing dim, mild keys),
  salt (the q_join_skew_stress_salted hot key at 10 000×, ~75% of
  fact rows on ONE key).
- ``q_advised_star_revenue``: the APPLICATION, oracle-paired — a
  three-hop star rollup where every dim hop goes through
  ``advised_join`` with measured advice; the oracle is the plain SQL
  join, so the advisor can reshape the PLAN but provably not the
  ANSWER.

Reference parity: [NS] — the reference (kafkaish, ~350 LoC pub/sub,
src/topic.js) has no query planner at all; this is the cost-based step
Spark's CBO approximates from ANALYZE statistics, computed exactly.

House exactness: bytes/counts exact BIGINTs (octet_length == DuckDB
strlen), shares a single IEEE division rounded to 6, money in exact
decimal cents (functions.exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.functions.exact import dsum, dsum_sql
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_BC = 10 * 1024 * 1024  # broadcast threshold (advisor default)
_HOT = 0.125  # hot-share salt threshold (advisor default)

# (edge, dim per-row bytes in SQL, dim table SQL, fact table SQL,
#  fact key SQL, scale factor) — dim byte arithmetic mirrors
# advisor.dim_projected_bytes: octet_length per string, 8 per
# fixed-width column, applied to the dim's ACTUAL projection
_STRESS_KEY = "CASE WHEN {k} % 4 <> 0 THEN 0 ELSE {k} END"


def _strategy_oracle() -> str:
    edges = [
        # broadcast regime at target scale 1x: the full nation frame
        ("nation->customer", 1,
         "SELECT 8 + strlen(n_name) + 8 AS b FROM nation",
         "SELECT c_nationkey AS k FROM customer"),
        ("region->nation", 1,
         "SELECT 8 + strlen(r_name) AS b FROM region",
         "SELECT n_regionkey AS k FROM nation"),
        # corpus-growing dim at 10000x: out of the broadcast regime,
        # keys mild -> plain shuffle
        ("customer->orders", 10000,
         "SELECT 8 + strlen(c_name) + 8 + 8 + strlen(c_mktsegment) AS b"
         " FROM customer",
         "SELECT o_custkey AS k FROM orders"),
        # the stress key at 10000x: ~75% of fact rows on one key -> salt
        ("hotkey->lineitem", 10000,
         "SELECT DISTINCT 8 AS b, "
         + _STRESS_KEY.format(k="o_orderkey") + " AS hk FROM orders",
         "SELECT " + _STRESS_KEY.format(k="l_orderkey")
         + " AS k FROM lineitem"),
    ]
    parts = []
    for edge, scale, dim_sql, fact_sql in edges:
        parts.append(f"""
        SELECT '{edge}' AS edge,
               CASE WHEN dim_bytes * {scale} <= {_BC} THEN 'broadcast'
                    WHEN raw_share >= {_HOT} THEN 'salt'
                    ELSE 'shuffle' END AS strategy,
               dim_bytes,
               CASE WHEN dim_bytes * {scale} <= {_BC} THEN 0.0
                    ELSE round(raw_share, 6) END AS hot_share
        FROM (
          SELECT (SELECT CAST(COALESCE(SUM(b), 0) AS BIGINT)
                  FROM ({dim_sql})) AS dim_bytes,
                 -- threshold on the RAW share exactly like advise_join;
                 -- round only the REPORTED column (review r10: rounding
                 -- before the CASE flips a within-5e-7-of-threshold key)
                 (SELECT CAST(MAX(n) AS DOUBLE) / SUM(n)
                  FROM (SELECT COUNT(*) AS n FROM ({fact_sql})
                        GROUP BY k)) AS raw_share)""")
    return " UNION ALL ".join(parts)


@query("q_advisor_strategy_table", oracle=_strategy_oracle())
def q_advisor_strategy_table(spark: SparkSession, sf: str) -> DataFrame:
    """The advisor's verdict per edge, hash-compared against the same
    decision rule in ANSI SQL — broadcast for nation/region at 1×,
    shuffle for the 10 000×-scaled customer dim, salt for the stress
    key (the r8 bench_skew finding made engine behavior: AQE's skew
    split never fires on a pre-partitioned dim side, so the planner
    must decide salting UP FRONT from the hot-key share).

    ``scale_factor`` extrapolates dim bytes to target scale — the
    100 TB honesty knob: a dim that measures 120 KB at a test sf but
    grows with the corpus must not be judged broadcastable from a toy
    measurement.  The hot SHARE is scale-free and needs none.

    Scale: per edge, one column-pruned linear agg over the dim and (in
    the non-broadcast regime only) one hash agg + top-1 over the fact
    key — the advisor's own cost model; verdicts are bounded driver
    scalars (4 rows).  Exactness: bytes exact BIGINTs, share one IEEE
    division rounded to 6 on both engines."""
    from kafkaish_spark.functions.advisor import advise_join

    def hot(col: str):
        return (
            F.when(F.col(col) % 4 != 0, F.lit(0))
            .otherwise(F.col(col))
            .cast("long")
        )

    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    edges = [
        ("nation->customer", c.select(F.col("c_nationkey").alias("k")),
         n, 1),
        ("region->nation", n.select(F.col("n_regionkey").alias("k")),
         r.select("r_regionkey", "r_name"), 1),
        ("customer->orders", o.select(F.col("o_custkey").alias("k")),
         c, 10_000),
        ("hotkey->lineitem",
         li.select(hot("l_orderkey").alias("k")),
         o.select(hot("o_orderkey").alias("hk")).distinct(), 10_000),
    ]
    rows = []
    for edge, fact, dim, scale in edges:
        a = advise_join(fact, dim, "k", scale_factor=scale)
        rows.append(
            (edge, a.strategy, a.dim_bytes, round(a.hot_share, 6))
        )
    return spark.createDataFrame(
        rows, "edge string, strategy string, dim_bytes long, hot_share double"
    )


@query(
    "q_advised_star_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_advised_star_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue by customer nation where BOTH dim hops go through
    ``advised_join`` with measured advice (customer and nation fit the
    broadcast threshold at target scale 1×, so the advisor yields the
    4-BroadcastHashJoin star plan — plan-asserted in
    tests/test_advisor.py).  The oracle is the plain SQL join: the
    advisor reshapes plans, provably never answers.

    Scale: the advisor's measurement is two column-pruned dim aggs at
    plan time; the query itself is the star-join shape — fact scanned
    once, zero fact-side shuffle before the rollup when every dim
    broadcasts.  Exactness: counts exact, revenue exact-decimal sum."""
    from kafkaish_spark.functions.advisor import advised_join

    li = t(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_custkey",
    )
    c = t(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    joined = advised_join(
        advised_join(advised_join(li, o, "l_orderkey"), c, "o_custkey"),
        n,
        "c_nationkey",
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


# (edge label, table, grouping key) — shared by the oracle SQL and the
# engine-side query so the two can never drift
_AGG_EDGES = [
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("lineitem.l_linenumber", "lineitem", "l_linenumber"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("customer.c_nationkey", "customer", "c_nationkey"),
]


def _agg_strategy_oracle() -> str:
    parts = [
        f"""
        SELECT '{edge}' AS grouping_key,
               CASE WHEN raw_share >= {_HOT} THEN 'salt'
                    ELSE 'plain' END AS strategy,
               round(raw_share, 6) AS hot_share
        FROM (SELECT CAST(MAX(n) AS DOUBLE) / SUM(n) AS raw_share
              FROM (SELECT COUNT(*) AS n FROM {table} GROUP BY {key}))"""
        for edge, table, key in _AGG_EDGES
    ]
    return " UNION ALL ".join(parts)


@query("q_advisor_agg_strategy", oracle=_agg_strategy_oracle())
def q_advisor_agg_strategy(spark: SparkSession, sf: str) -> DataFrame:
    """The aggregation advisor's verdict per grouping key (the r10
    symmetry completion of q_advisor_strategy_table): the real
    ``advise_agg`` measures each key's hottest share and its salt/plain
    decision is hash-compared against the same rule in ANSI SQL.
    Covers both regimes twice over: l_returnflag (~half the rows on one
    flag) and l_linenumber (~a quarter on line 1) earn salt;
    o_custkey and c_nationkey are uniform — plain.

    Scale: per edge one map-partial hash agg + top-1 (the advisor's
    own cost model), memoized per (sf, edge) so plan enumeration stays
    lazy; verdicts are bounded driver scalars (4 rows).  Exactness:
    the share is ONE IEEE division of exact counts rounded to 6 on
    both engines."""
    from kafkaish_spark.functions.advisor import advise_agg_cached

    rows = []
    for edge, table, key in _AGG_EDGES:
        a = advise_agg_cached(
            t(spark, sf, table).select(key), key, cache_key=(sf, edge)
        )
        rows.append((edge, a.strategy, round(a.hot_share, 6)))
    return spark.createDataFrame(
        rows, "grouping_key string, strategy string, hot_share double"
    )


@query(
    "q_advised_agg_quantity_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
           CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_advised_agg_quantity_stats(spark: SparkSession, sf: str) -> DataFrame:
    """An aggregate routed through ``advised_agg`` with measured
    (cached) advice — the r10 completion of the advisor: joins AND
    group-bys now share the audit→action loop (r9 verdict item 5).
    ``l_returnflag`` has 3 values with the hottest carrying ~half the
    fact rows, so the measured hot share clears the salt threshold and
    the advisor picks the q_agg_salted_skew two-phase plan: phase 1
    pre-aggregates (flag, pmod(xxhash64(values), 64)) — 64-way
    parallel however hot the flag — and phase 2 merges the 3×64
    partials.  The oracle is the plain GROUP BY: the advisor reshapes
    the plan, provably never the answer (all four aggregates are
    monoids, enforced by advised_agg itself).

    Scale: the measurement is one map-partial hash agg + top-1, run
    once per (data, key) and cached; the salted plan's second shuffle
    carries keys × buckets rows — constant in corpus size.  Exactness:
    counts/cents/quantities all exact BIGINTs (l_quantity is integral
    DOUBLE in the testdata — cast on BOTH engines)."""
    from kafkaish_spark.functions.advisor import (
        advise_agg_cached,
        advised_agg,
    )

    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    adv = advise_agg_cached(
        li, "l_returnflag", cache_key=(sf, "lineitem.l_returnflag")
    )
    return advised_agg(
        li,
        "l_returnflag",
        {
            "n_items": ("count", None),
            "sum_cents": ("sum", F.col("cents")),
            "min_qty": ("min", F.col("qty")),
            "max_qty": ("max", F.col("qty")),
        },
        advice=adv,
        salt_on=["cents", "qty"],
    )
