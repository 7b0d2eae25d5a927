"""functions/advisor.py — the audit→action loop (r8 verdict item 5).

Pins: (a) the DECISIONS — broadcast for nation/region at target scale
1×, salt for the stress key at 10 000× (the bench_skew motivating
case: AQE's skew split never fires on a pre-partitioned dim side, so
salting must be decided up front), shuffle for a corpus-growing dim
with mild keys; (b) the PLANS advised_join produces for each verdict;
(c) EQUIVALENCE — every strategy returns the plain join's rows."""

from pyspark.sql import functions as F

from kafkaish_spark.functions.advisor import (
    JoinAdvice,
    advise_join,
    advised_join,
    dim_projected_bytes,
    fact_hot_share,
)
from kafkaish_spark.sources.tables import load_table as t


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _hot(col):
    return (
        F.when(F.col(col) % 4 != 0, F.lit(0)).otherwise(F.col(col))
        .cast("long")
    )


def test_advisor_picks_broadcast_for_nation_and_region(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    for dim in (n, r):
        a = advise_join(c, dim, "k")
        assert a.strategy == "broadcast"
        assert a.dim_bytes_at_scale <= a.broadcast_bytes
        assert a.hot_share == 0.0  # skew scan skipped in broadcast regime


def test_advisor_picks_salt_for_the_stress_key(spark, sf_dir):
    """~75% of lineitem rows collapse onto hot_key 0; at 10 000× the
    dim is out of the broadcast regime, so the hot share decides."""
    li = t(spark, sf_dir, "lineitem").select(_hot("l_orderkey").alias("k"))
    dim = (
        t(spark, sf_dir, "orders")
        .select(_hot("o_orderkey").alias("k"))
        .distinct()
    )
    a = advise_join(li, dim, "k", scale_factor=10_000)
    assert a.strategy == "salt"
    assert a.hot_key == 0
    assert a.hot_share > 0.5  # the designed ~75% collapse


def test_advisor_picks_shuffle_for_mild_keys_at_scale(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    c = t(spark, sf_dir, "customer")
    a = advise_join(o, c, "k", scale_factor=10_000)
    assert a.strategy == "shuffle"
    assert a.hot_share < a.hot_share_threshold


def test_advised_join_broadcast_plan_and_equivalence(spark, sf_dir):
    """The advised star (q_advised_star_revenue) plans every dim hop
    as a BroadcastHashJoin — the fact side never shuffles before the
    rollup — and matches the plain join row-for-row."""
    from kafkaish_spark.operators.composites50 import q_advised_star_revenue

    df = q_advised_star_revenue(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .count()
    )
    got = {(r["n_name"], r["n_lines"]) for r in df.collect()}
    want = {(r["n_name"], r["count"]) for r in plain.collect()}
    assert got == want


def test_advised_join_salt_plan_and_equivalence(spark, sf_dir):
    """A salt verdict routes through salted_join: the plan is the
    pinned shuffle regime (SortMergeJoin, no dim broadcast) and the
    rows are bit-identical to the plain join."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select(_hot("l_orderkey").alias("k"), "l_linenumber")
    )
    dim = (
        t(spark, sf_dir, "orders")
        .select(_hot("o_orderkey").alias("k"))
        .distinct()
        .withColumn("band", (F.col("k") % 7).cast("long"))
    )
    advice = advise_join(li, dim, "k", scale_factor=10_000)
    assert advice.strategy == "salt"
    out = advised_join(li, dim, "k", advice=advice)
    plan = _plan(out)
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    got = out.groupBy("band").count().collect()
    want = li.join(dim, "k").groupBy("band").count().collect()
    assert {(r["band"], r["count"]) for r in got} == {
        (r["band"], r["count"]) for r in want
    }


def test_advice_is_cacheable_and_explicit(spark, sf_dir):
    """A persisted JoinAdvice short-circuits measurement: advised_join
    with advice= runs zero advisor jobs (the production pattern — the
    planner measures once per (table, key) and caches)."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber"
    )
    dim = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderstatus"
    )
    cached = JoinAdvice("broadcast", 0, 0, None, 0.0, 1, 1.0)
    plan = _plan(advised_join(li, dim, "k", advice=cached))
    assert "BroadcastHashJoin" in plan, plan


def test_advise_agg_salts_hot_key_and_leaves_uniform_plain(spark, sf_dir):
    """The r10 aggregation side of the advisor (r9 verdict item 5):
    l_returnflag's hottest value carries ~half the fact rows -> salt;
    o_custkey is uniform -> plain."""
    from kafkaish_spark.functions.advisor import advise_agg

    li = t(spark, sf_dir, "lineitem").select("l_returnflag")
    hot = advise_agg(li, "l_returnflag")
    assert hot.strategy == "salt"
    assert hot.hot_share >= hot.hot_share_threshold
    o = t(spark, sf_dir, "orders").select("o_custkey")
    mild = advise_agg(o, "o_custkey")
    assert mild.strategy == "plain"
    assert mild.hot_share < mild.hot_share_threshold


def test_advised_agg_plans_match_verdicts(spark, sf_dir):
    """Salt verdict -> the two-phase plan (an exchange on (key, _salt)
    before the merge exchange on key); plain verdict -> one exchange.
    Both return the plain group-by's rows."""
    from kafkaish_spark.functions.advisor import AggAdvice, advised_agg

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    aggs = {"n": ("count", None), "mx": ("max", F.col("qty"))}
    salted = advised_agg(
        li, "l_returnflag", aggs,
        advice=AggAdvice("salt", "N", 0.5, 0.125), salt_on=["qty"],
    )
    plain = advised_agg(
        li, "l_returnflag", aggs,
        advice=AggAdvice("plain", None, 0.0, 0.125),
    )
    sp, pp = _plan(salted), _plan(plain)
    # two-phase: exchange on (key, _salt) then the tiny merge exchange
    assert "_salt" in sp and sp.count("hashpartitioning(l_returnflag") == 2, sp
    assert "_salt" not in pp and pp.count("hashpartitioning") == 1, pp
    rows = lambda df: {  # noqa: E731
        (r["l_returnflag"], r["n"], r["mx"]) for r in df.collect()
    }
    want = {
        (r["l_returnflag"], r["n"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.max("qty").alias("mx"))
        .collect()
    }
    assert rows(salted) == want and rows(plain) == want


def test_advised_agg_rejects_non_monoid_kinds(spark, sf_dir):
    import pytest

    from kafkaish_spark.functions.advisor import AggAdvice, advised_agg

    li = t(spark, sf_dir, "lineitem").select("l_returnflag")
    with pytest.raises(ValueError, match="monoid"):
        advised_agg(
            li, "l_returnflag", {"bad": ("avg", F.lit(1))},
            advice=AggAdvice("plain", None, 0.0, 0.125),
        )


def test_advised_agg_property_random_frames(spark):
    """Hypothesis property (the salted_join property's aggregation
    twin): for ANY small (key, value) multiset — including NULL values,
    single-key collapse (the hot shape), and empty frames — the salted
    two-phase plan's rows equal the plain group-by's for every monoid
    kind, at several salt widths."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafkaish_spark.functions.advisor import AggAdvice, advised_agg

    rows = st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(st.none(), st.integers(-50, 50)),
        ),
        min_size=0,
        max_size=25,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=rows, buckets=st.sampled_from([2, 7]))
    def run(data, buckets):
        fact = spark.createDataFrame(
            data or [(None, None)], "k int, v int"
        )
        if not data:
            fact = fact.filter("k IS NOT NULL")
        aggs = {
            "n": ("count", None),
            "s": ("sum", F.col("v")),
            "lo": ("min", F.col("v")),
            "hi": ("max", F.col("v")),
        }
        key = lambda r: (r["k"], r["n"], r["s"], r["lo"], r["hi"])  # noqa: E731
        plain = sorted(
            map(
                key,
                advised_agg(
                    fact, "k", aggs,
                    advice=AggAdvice("plain", None, 0.0, 0.125),
                ).collect(),
            )
        )
        salted = sorted(
            map(
                key,
                advised_agg(
                    fact, "k", aggs,
                    advice=AggAdvice("salt", 0, 1.0, 0.125),
                    salt_buckets=buckets, salt_on=["v"],
                ).collect(),
            )
        )
        assert salted == plain

    run()


def test_measurement_helpers_are_exact(spark):
    """dim_projected_bytes and fact_hot_share on a frame with known
    arithmetic: 3 rows x (8 fixed + octet_length) and a 2/4 hot key."""
    dim = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "k long, s string"
    )
    assert dim_projected_bytes(dim) == 3 * 8 + 2
    fact = spark.createDataFrame(
        [(7,), (7,), (8,), (9,)], "k long"
    )
    key, share = fact_hot_share(fact, "k")
    assert key == 7 and share == 0.5


# ------------------------------------------------------------- windows


def test_advise_window_decides_by_hot_share(spark, sf_dir):
    """The window advisor's two regimes on real tables: o_orderstatus
    (~1/3 of rows in one window partition) → two_phase; o_custkey
    (fine partitioning) → plain."""
    from kafkaish_spark.functions.advisor import advise_window
    from kafkaish_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    assert advise_window(o, "o_orderstatus").strategy == "two_phase"
    assert advise_window(o, "o_custkey").strategy == "plain"


def test_advised_rank_two_phase_equals_plain(spark):
    """The two-phase decomposition is exact: on a skewed synthetic
    frame with a unique order column, ranks from the bucketed plan
    equal the one-window plan bit-for-bit — including order values
    that straddle bucket boundaries, buckets with a single row, a
    NULL partition key, and NULL order values (NULL bucket): the
    histogram join is NULL-safe, so the strategy can never change row
    counts (review r11)."""
    from kafkaish_spark.functions.advisor import WindowAdvice, advised_rank

    rows = [(k, v) for k in ("a", "b") for v in range(1, 101)]
    rows += [("a", 1000 + v) for v in range(50)]  # skew + far bucket
    rows += [("a", None), ("b", None)]  # NULL order -> NULL bucket
    rows += [(None, 7), (None, None)]  # NULL partition key
    fact = spark.createDataFrame(rows, "k string, v long").repartition(8)
    bucket = (F.col("v") / F.lit(16)).cast("long")
    plain = advised_rank(
        fact, "k", ["v"], bucket,
        advice=WindowAdvice("plain", None, 0.0, 0.125),
    )
    two = advised_rank(
        fact, "k", ["v"], bucket,
        advice=WindowAdvice("two_phase", "a", 0.6, 0.125),
    )
    from collections import Counter

    key = lambda r: (r["k"], r["v"], r["rnk"])  # noqa: E731
    # multiset compare — tuples contain Nones, which Python won't sort
    assert Counter(map(key, two.collect())) == Counter(
        map(key, plain.collect())
    )


def test_advised_rank_descending_equals_plain(spark):
    """DESC ranks (1 = largest) must also be bit-identical between the
    plans — the prefix accumulates from the other end of the SAME
    bucket histogram, and NULL order values (nulls last under DESC)
    land after every numeric bucket in both."""
    from collections import Counter

    from kafkaish_spark.functions.advisor import WindowAdvice, advised_rank

    rows = [(k, v) for k in ("a", "b") for v in range(1, 101)]
    rows += [("a", 1000 + v) for v in range(50)]
    rows += [("a", None), ("b", None), (None, 7), (None, None)]
    fact = spark.createDataFrame(rows, "k string, v long").repartition(8)
    bucket = (F.col("v") / F.lit(16)).cast("long")
    plain = advised_rank(
        fact, "k", ["v"], bucket, ascending=False,
        advice=WindowAdvice("plain", None, 0.0, 0.125),
    )
    two = advised_rank(
        fact, "k", ["v"], bucket, ascending=False,
        advice=WindowAdvice("two_phase", "a", 0.6, 0.125),
    )
    key = lambda r: (r["k"], r["v"], r["rnk"])  # noqa: E731
    assert Counter(map(key, two.collect())) == Counter(
        map(key, plain.collect())
    )


def test_advised_rank_two_phase_plan_shape(spark, sf_dir):
    """The two-phase plan must contain NO window partitioned only by
    the hot key over the corpus: every corpus-scale window carries the
    bucket column, and the hot-key-only prefix window runs above an
    aggregate (the bounded histogram)."""
    from kafkaish_spark.functions.advisor import WindowAdvice, advised_rank
    from kafkaish_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("long").alias("p")
    )
    two = advised_rank(
        o, "o_orderstatus", ["p", "o_orderkey"],
        F.floor(F.col("p") / F.lit(10_000)).cast("long"),
        advice=WindowAdvice("two_phase", "P", 0.34, 0.125),
    )
    plan = two._jdf.queryExecution().executedPlan().toString()
    import re

    for line in plan.splitlines():
        m = re.search(r"\bWindow(?:Exec)?\s+\[[^\]]*\],\s*\[([^\]]*)\]", line)
        if not m:
            continue
        cols = {c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()}
        # the only status-only window is the histogram prefix (its
        # child aggregates); the corpus rank window must carry _wbucket
        if cols == {"o_orderstatus"}:
            assert "_w_n" in plan  # histogram aggregate present
        else:
            assert "_wbucket" in cols, line
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_advised_rank_rejects_internal_name_collisions(spark):
    """A fact frame already carrying _wbucket (or the rank output
    name) must be rejected loudly, same convention as advised_agg."""
    import pytest as _pytest

    from kafkaish_spark.functions.advisor import WindowAdvice, advised_rank

    fact = spark.createDataFrame([(1, 2)], "k long, _wbucket long")
    with _pytest.raises(ValueError, match="collide"):
        advised_rank(
            fact, "k", ["_wbucket"], F.lit(0),
            advice=WindowAdvice("two_phase", 1, 1.0, 0.125),
        )
