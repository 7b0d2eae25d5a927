"""Round-11 wave: the window-strategy advisor as driver-provable
queries — the advisor's THIRD leg (r10 verdict item 7), completing the
shuffle-consumer family: joins (r9, composites50), aggregations (r10),
and now windows.

Windows have the harshest skew economics of the three: a window's
partition is ONE reducer task and no map-side partial exists to shrink
it — every row of the hottest partition key lands in a single task's
sort buffer.  The constant-cardinality window gate
(tests/test_registry_contract.py, the r5 audit) FAILS such windows;
``advise_window`` supplies the decision and ``advised_rank`` the
two-phase rewrite (the q_train_global_shuffle decomposition,
generalized to per-key histograms) the gate's offenders are told to
use.

- ``q_advisor_window_strategy``: the DECISION, oracle-paired — the
  real ``advise_window`` measures each partition key's hottest share
  and its two_phase/plain verdict is hash-compared against the same
  rule in ANSI SQL.  Covers both regimes twice over.
- ``q_advised_window_order_rank``: the APPLICATION, oracle-paired —
  a per-status price rank routed through ``advised_rank`` with
  measured advice (o_orderstatus holds ~1/3 of the rows per value →
  two_phase); the oracle is the plain SQL window, so the advisor can
  reshape the PLAN but provably not the ANSWER.

Reference parity: [NS] — the reference (kafkaish, ~350 LoC pub/sub,
/root/reference/src/topic.js) has no query surface.

House exactness: shares are ONE IEEE division of exact counts rounded
to 6 on both engines; ranks are exact integers from a deterministic
unique order (cents, orderkey); money in exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

_HOT = 0.125  # hot-share threshold (advisor default)

# (edge label, table, window partition key) — shared by the oracle SQL
# and the engine-side query so the two can never drift.  l_returnflag
# (~half the rows on one flag) and o_orderstatus (~1/3 per status) are
# the fat-window regime; o_custkey and c_nationkey partition finely.
_WIN_EDGES = [
    ("lineitem.l_returnflag", "lineitem", "l_returnflag"),
    ("orders.o_orderstatus", "orders", "o_orderstatus"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("customer.c_nationkey", "customer", "c_nationkey"),
]


def _window_strategy_oracle() -> str:
    parts = [
        f"""
        SELECT '{edge}' AS partition_key,
               CASE WHEN raw_share >= {_HOT} THEN 'two_phase'
                    ELSE 'plain' END AS strategy,
               round(raw_share, 6) AS hot_share
        FROM (SELECT CAST(MAX(n) AS DOUBLE) / SUM(n) AS raw_share
              FROM (SELECT COUNT(*) AS n FROM {table} GROUP BY {key}))"""
        for edge, table, key in _WIN_EDGES
    ]
    return " UNION ALL ".join(parts)


@query("q_advisor_window_strategy", oracle=_window_strategy_oracle())
def q_advisor_window_strategy(spark: SparkSession, sf: str) -> DataFrame:
    """The window advisor's verdict per partition key (the r11
    completion of the advisor family): the real ``advise_window``
    measures each key's hottest share and its two_phase/plain decision
    is hash-compared against the same rule in ANSI SQL.

    Scale: per edge one map-partial hash agg + top-1 (the same
    scale-free statistic the join/agg advisors use), memoized per
    (sf, edge) so plan enumeration stays lazy; verdicts are bounded
    driver scalars (4 rows).  Exactness: the share is ONE IEEE
    division of exact counts rounded to 6 on both engines."""
    from kafkaish_spark.functions.advisor import advise_window_cached

    rows = []
    for edge, table, key in _WIN_EDGES:
        a = advise_window_cached(
            t(spark, sf, table).select(key), key, cache_key=(sf, edge)
        )
        rows.append((edge, a.strategy, round(a.hot_share, 6)))
    return spark.createDataFrame(
        rows, "partition_key string, strategy string, hot_share double"
    )


@query(
    "q_advised_window_order_rank",
    bench=True,
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS rnk
      FROM orders)
    SELECT o_orderkey, o_orderstatus, cents, CAST(rnk AS BIGINT) AS rnk
    FROM ranked
    WHERE rnk <= 50
    ORDER BY o_orderstatus, rnk
    """,
)
def q_advised_window_order_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Cheapest-50 orders per status, ranked through ``advised_rank``
    with measured advice: o_orderstatus puts ~1/3 of the corpus in one
    window partition, so the advisor picks the TWO-PHASE plan —
    histogram into $10k price buckets, rank within (status, bucket) in
    parallel, add the bucket's starting position from the per-status
    prefix over the bounded (status, bucket) histogram.  The oracle is
    the plain SQL window: the advisor reshapes plans, provably never
    answers.

    Scale: no task ever sorts more than one bucket's slice of a
    status (~1/50th of it here; bucket width is the operator's knob);
    the prefix window runs over a keys x buckets frame, broadcast
    back.  The plain one-window plan would put a third of 100 TB into
    a single sort task — the exact shape the registry's window gate
    exists to reject.  Exactness: (cents, orderkey) is a unique
    deterministic order; ranks exact ints cast to BIGINT on both
    engines."""
    from kafkaish_spark.functions.advisor import (
        advise_window_cached,
        advised_rank,
    )

    o = t(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    advice = advise_window_cached(
        o.select("o_orderstatus"),
        "o_orderstatus",
        cache_key=(sf, "orders.o_orderstatus"),
    )
    # top_k=50 declares the query's own ``rnk <= 50`` filter to the
    # operator (optimization r13): the within-bucket rank gets a
    # map-side WindowGroupLimit prune (each task ships <= 50 rows per
    # (status, bucket) instead of the bucket's whole slice) and
    # offset->=50 buckets drop out of the broadcast prefix.  Result
    # set unchanged — the guarantee is every row with rnk <= 50
    # survives, and the filter below still applies.
    ranked = advised_rank(
        o,
        "o_orderstatus",
        ["cents", "o_orderkey"],
        F.floor(F.col("cents") / F.lit(1_000_000)).cast("long"),
        rank_name="rnk",
        advice=advice,
        top_k=50,
    )
    return (
        ranked.filter(F.col("rnk") <= 50)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "cents",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("o_orderstatus", "rnk")
    )
