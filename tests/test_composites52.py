"""Round-9 wave 3 tests: t-digest rank-error invariant (pure-python
properties + the Spark query end-to-end) and the Holt fold's
equivalence to a plain python recurrence."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkaish_spark.operators.composites52 import (
    DELTA,
    tdigest_compress,
    tdigest_quantile,
)

# ---------------------------------------------------------------- pure


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=500,
    ),
    st.integers(2, 8),
)
@settings(max_examples=60, deadline=None)
def test_tdigest_compress_invariants(values, n_parts):
    """Weight is conserved, centroid count is bounded, means stay
    sorted and inside the value range — for ANY split of the input
    into partitions followed by a merge (the distributed shape)."""
    delta = 50
    # per-partition digests, then merge of the summaries
    k = max(1, len(values) // n_parts)
    cents = []
    for i in range(0, len(values), k):
        cents.extend(
            tdigest_compress([(v, 1) for v in values[i : i + k]], delta)
        )
    merged = tdigest_compress(cents, delta)
    assert sum(w for _, w in merged) == len(values)
    assert len(merged) <= delta + 1
    means = [m for m, _ in merged]
    assert means == sorted(means)
    assert min(values) - 1e-9 <= means[0] and means[-1] <= max(values) + 1e-9


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=50,
        max_size=500,
    ),
    st.sampled_from([0.5, 0.9, 0.99]),
    st.integers(2, 8),
)
@settings(max_examples=60, deadline=None)
def test_tdigest_rank_error_bound(values, q, n_parts):
    """The estimated quantile's TRUE rank sits within q +- 2/delta +
    one-value slack — the bound the uniform weight cap guarantees for
    any partitioning (each centroid holds <= ceil(W/delta) + max
    single insert of the mass, and interpolation stays inside the
    centroid span)."""
    delta = 50
    k = max(1, len(values) // n_parts)
    cents = []
    for i in range(0, len(values), k):
        cents.extend(
            tdigest_compress([(v, 1) for v in values[i : i + k]], delta)
        )
    merged = tdigest_compress(cents, delta)
    est = tdigest_quantile(merged, q)
    s = sorted(values)
    n = len(s)
    lo = sum(1 for v in s if v < est - 1e-9) / n
    hi = sum(1 for v in s if v <= est + 1e-9) / n
    # true rank interval [lo, hi] must intersect q +- tolerance
    tol = 2.0 / delta + 2.0 / n
    assert lo - tol <= q <= hi + tol, (q, lo, hi, est)


def test_tdigest_quantile_monotone():
    cents = tdigest_compress([(float(v), 1) for v in range(1000)], 64)
    qs = [i / 100 for i in range(1, 100)]
    ests = [tdigest_quantile(cents, q) for q in qs]
    assert ests == sorted(ests)


# ---------------------------------------------------------------- spark


def test_tdigest_query_matches_exact_within_bound(spark, sf_dir):
    from kafkaish_spark.operators.composites52 import (
        q_sketch_tdigest_quantiles,
    )
    from kafkaish_spark.sources.tables import load_table

    out = {
        (r["event_type"], r["q"]): r["value_est"]
        for r in q_sketch_tdigest_quantiles(spark, sf_dir).collect()
    }
    assert out, "digest produced no rows"
    vals = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .toPandas()
    )
    for (et, q), est in out.items():
        s = vals.loc[vals["event_type"] == et, "value"].dropna().sort_values()
        n = len(s)
        lo = (s < est - 1e-9).sum() / n
        hi = (s <= est + 1e-9).sum() / n
        tol = 2.0 / DELTA + 2.0 / n
        assert lo - tol <= q <= hi + tol, (et, q, est, lo, hi)


def _holt_python(ys, a=0.3, g=0.2):
    l, b = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        l_new = a * y + (1.0 - a) * (l + b)
        b = g * (l_new - l) + (1.0 - g) * b
        l = l_new
    return l, b


def test_holt_fold_matches_python(spark, sf_dir):
    """The Spark struct-fold reproduces the plain-python Holt
    recurrence exactly (same op order -> bit-equal doubles)."""
    from kafkaish_spark.operators.composites52 import q_ts_holt_linear
    from kafkaish_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: (r["level"], r["trend"], r["forecast_7d"])
        for r in q_ts_holt_linear(spark, sf_dir).collect()
    }
    assert got, "no event types"
    days = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .count()
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in days:
        series.setdefault(r["event_type"], []).append(float(r["count"]))
    for et, ys in series.items():
        if len(ys) < 2:
            assert et not in got
            continue
        l, b = _holt_python(ys)
        assert got[et] == pytest.approx(
            (round(l, 6), round(b, 6), round(l + 7 * b, 6)), abs=1e-9
        ), et


def test_holt_lambda_note():
    """The fold processes elements 2..T with seed (y1, y2-y1): spelled
    here as the executable statement of the query's semantics on a
    tiny closed-form case (ys = [1, 3]: fold over [3] only)."""
    l, b = _holt_python([1.0, 3.0])
    # l1=1, b1=2; t=2: l = .3*3 + .7*(1+2) = 3.0; b = .2*(3-1)+.8*2 = 2.0
    assert (l, b) == pytest.approx((3.0, 2.0))


def test_geo_queries_basic(spark, sf_dir):
    """Wave-2 smoke + structural invariants: bbox counts are exact and
    consistent (n_nations <= n_customers), anchor distances are
    non-negative and bounded by half the great circle, and the grid-NN
    result covers a nonempty customer subset with min <= max."""
    from kafkaish_spark.operators.composites51 import (
        q_geo_bbox_customers,
        q_geo_grid_nearest_supplier,
        q_geo_haversine_nation_anchor,
    )

    boxes = q_geo_bbox_customers(spark, sf_dir).collect()
    assert {r["box"] for r in boxes} == {
        "tropics",
        "north_temperate",
        "pacific_ring",
        "cold_south",
    }
    for r in boxes:
        assert 0 <= r["n_nations"] <= r["n_customers"]

    anchors = q_geo_haversine_nation_anchor(spark, sf_dir).collect()
    assert anchors
    for r in anchors:
        assert 0.0 <= r["min_km"] <= r["max_km"] <= 20037.6  # half circumference

    nn = q_geo_grid_nearest_supplier(spark, sf_dir).collect()
    assert nn
    for r in nn:
        assert r["n_customers"] >= 1
        assert 0.0 <= r["min_km"] <= r["max_km"]


def test_geo_bbox_is_one_scan(spark, sf_dir):
    """r10 rewrite (r9 verdict item 7): the box report must read the
    customer table ONCE — the r9 form unioned 4 filtered scans, a 4x
    scan multiplier at 100 TB."""
    from kafkaish_spark.operators.composites51 import q_geo_bbox_customers

    plan = (
        q_geo_bbox_customers(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan


def _brute_nearest(points, sites):
    """Exact integer brute force: (p_id -> (d2, s_id)) with the same
    wraparound metric and tie-break the engine uses."""
    out = {}
    for p_id, plat, plon in points:
        best = None
        for s_id, _tag, slat, slon in sites:
            dlon = min((plon - slon) % 36000, (slon - plon) % 36000)
            d2 = (plat - slat) ** 2 + dlon * dlon
            if best is None or (d2, s_id) < best:
                best = (d2, s_id)
        out[p_id] = best
    return out


def test_grid_nearest_complete_matches_brute_force_sparse(spark):
    """The ring-expansion fallback (r9 verdict item 6): with only TWO
    sites on the whole grid, almost every point has an empty 3x3 (and
    most an empty 7x7) neighborhood — the r9 bounded probe would drop
    them.  grid_nearest_complete must return EVERY point exactly once
    with its true nearest site (exact d2 + id tie-break equality vs
    python brute force), and the fallback legs must actually engage."""
    from kafkaish_spark.operators.composites51 import grid_nearest_complete

    points = [
        (k, (k * 9973) % 17000, (k * 6151) % 36000) for k in range(1, 201)
    ]
    # two far-apart sites; site 2 near the date line to exercise wrap
    sites = [(1, 10, 100, 150), (2, 20, 16900, 35950)]
    p_df = spark.createDataFrame(
        points, "p_id long, p_latm long, p_lonm long"
    )
    s_df = spark.createDataFrame(
        sites, "s_id long, s_tag long, s_latm long, s_lonm long"
    )
    got = grid_nearest_complete(p_df, s_df).collect()
    assert len(got) == len(points)  # every point, exactly once
    assert len({r["p_id"] for r in got}) == len(points)
    want = _brute_nearest(points, sites)
    for r in got:
        assert (r["d2"], r["s_id"]) == want[r["p_id"]], r
    radii = {r["settle_r"] for r in got}
    assert max(radii) > 1, radii  # the fallback legs engaged


@pytest.mark.parametrize("seed,n_sites", [(7, 1), (11, 3), (23, 5)])
def test_grid_nearest_complete_matches_brute_force_random(
    spark, seed, n_sites
):
    """Randomized sparse fixtures (seeded — deterministic across
    runs): site counts 1/3/5 scattered by a multiplicative hash, 150
    points; the ring expansion must return the exact brute-force
    nearest for every point regardless of where the sites land
    (corner cells, date-line cells, shared cells)."""
    from kafkaish_spark.operators.composites51 import grid_nearest_complete

    points = [
        (k, (k * 9973) % 17000, (k * 6151) % 36000) for k in range(1, 151)
    ]
    sites = [
        (
            i,
            i,
            (i * seed * 7919 + 13) % 17000,
            (i * seed * 104729 + 5) % 36000,
        )
        for i in range(1, n_sites + 1)
    ]
    got = grid_nearest_complete(
        spark.createDataFrame(points, "p_id long, p_latm long, p_lonm long"),
        spark.createDataFrame(
            sites, "s_id long, s_tag long, s_latm long, s_lonm long"
        ),
    ).collect()
    assert len(got) == len(points)
    want = _brute_nearest(points, sites)
    for r in got:
        assert (r["d2"], r["s_id"]) == want[r["p_id"]], r


def test_grid_nn_complete_covers_every_customer(spark, sf_dir):
    """The registered query's coverage contract: totals equal
    |customer| (the bounded headliner may drop; the complete variant
    may not)."""
    from kafkaish_spark.operators.composites51 import q_geo_grid_nn_complete
    from kafkaish_spark.sources.tables import load_table as t

    rows = q_geo_grid_nn_complete(spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) == t(
        spark, sf_dir, "customer"
    ).count()


@given(
    st.lists(
        st.integers(0, 10_000).map(float), min_size=2, max_size=40
    )
)
@settings(max_examples=40, deadline=None)
def test_holt_duckdb_fold_matches_python(ys):
    """The DuckDB side of the Holt fold (list_reduce over the
    [level, trend] ARRAY accumulator) equals the python recurrence on
    arbitrary series — the regression guard for the DuckDB 1.0
    struct-lambda miscomputation the array form works around (a
    struct accumulator silently corrupts the second field; see the
    module docstring)."""
    import duckdb

    from kafkaish_spark.operators.composites52 import _b_next, _l_next

    lam = f"(acc, e) -> [{_l_next(1)}, {_b_next(1)}]"
    elems = ", ".join(f"[{y}::DOUBLE, 0.0::DOUBLE]" for y in ys[1:])
    seed = f"[{ys[0]}::DOUBLE, {ys[1] - ys[0]}::DOUBLE]"
    q = f"SELECT list_reduce([{seed}, {elems}], {lam})"
    got = duckdb.sql(q).fetchall()[0][0]
    l, b = _holt_python(ys)
    assert got[0] == pytest.approx(l, abs=1e-12, rel=1e-12)
    assert got[1] == pytest.approx(b, abs=1e-12, rel=1e-12)
