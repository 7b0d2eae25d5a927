"""Round-9 wave 2: spatial analytics — the geo family.

The inventory had every 1-D range pattern (interval joins, as-of,
bbox-less band joins) but no 2-D spatial operator.  This module adds
the three canonical shapes a telemetry / logistics pipeline needs:

- ``q_geo_bbox_customers``: point-in-bounding-box classification —
  pure integer range predicates, the filter-pushdown-friendly form
  every spatial index ultimately reduces to.
- ``q_geo_haversine_nation_anchor``: great-circle distance
  (haversine) between each customer point and its nation's anchor
  point — the distance-to-centroid report, trig on both engines from
  ONE shared SQL fragment so the IEEE evaluation order is identical.
- ``q_geo_grid_nearest_supplier``: nearest-neighbor via GRID-CELL
  BUCKETING — the 100 TB spatial-join pattern: points land in 15°
  integer cells, the small side fans out to its 3x3 cell
  neighborhood (explode of 9 offsets, with longitude wraparound),
  candidates meet in an equi-join ON THE CELL ID, and a per-point
  top-1 picks the nearest candidate.  Never an all-pairs cross join:
  candidate count is |points| x (suppliers per 9 cells), and the
  equi-join shuffles on the cell key exactly like any other join —
  this is how BigQuery/Sedona-style spatial joins actually scale.

Coordinates are DERIVED deterministically from integer keys (the
testdata has no geo columns): centi-degree integers
``latm = (key*9973) % 17000`` (lat = latm/100 - 85, poles excluded)
and ``lonm = (key*6151) % 36000`` (lon = lonm/100 - 180) — exact
BIGINT arithmetic on both engines, so cell ids and box membership
are float-free.  Nearest-neighbor RANKING uses the exact integer
squared equirectangular metric (wraparound-aware centi-degree
deltas), so candidate order is engine-independent by construction;
haversine enters only in the REPORTED min/max, rounded to 3 (meter
precision on km values — trig ulp differences sit ~1e-12 away from
any rounding boundary).

Reference parity: [NS] — the reference (kafkaish, ~350 LoC pub/sub,
/root/reference/src/topic.js) has no query surface at all; spatial
ops are north-star pipeline extensions.

Scale: bbox = scan + pushed range predicates; anchor = broadcast join
against the 25-row nation frame; grid-NN = one equi-join on the cell
key (small side pre-exploded 9x) + WindowGroupLimit top-1 per point.
No cross joins, no trig in any join condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafkaish_spark.functions.parallelism import cut_lineage
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# --- shared coordinate / distance fragments (same text on both engines)

_LATM = "(({k}) * 9973) % 17000"  # centi-degrees, 0..16999 -> lat-85..84.99
_LONM = "(({k}) * 6151) % 36000"  # centi-degrees, 0..35999 -> lon-180..179.99

# haversine on centi-degree int columns; one fragment, identical IEEE
# op order on both engines (both parse a*b*c left-assoc, both lower
# radians(x) to x*pi/180)
_HAV = (
    "12742.0 * asin(sqrt("
    "sin(radians((({lat2}) - ({lat1})) / 100.0) / 2)"
    " * sin(radians((({lat2}) - ({lat1})) / 100.0) / 2)"
    " + cos(radians(({lat1}) / 100.0 - 85.0))"
    " * cos(radians(({lat2}) / 100.0 - 85.0))"
    " * sin(radians((({lon2}) - ({lon1})) / 100.0) / 2)"
    " * sin(radians((({lon2}) - ({lon1})) / 100.0) / 2)))"
)

# exact integer squared equirectangular metric (ranking only):
# wraparound-aware lon delta, plain lat delta, both centi-degrees
_D2 = (
    "((({latm1}) - ({latm2})) * (({latm1}) - ({latm2})))"
    " + (least((({lonm1}) - ({lonm2}) + 36000) % 36000,"
    "          (({lonm2}) - ({lonm1}) + 36000) % 36000)"
    "    * least((({lonm1}) - ({lonm2}) + 36000) % 36000,"
    "            (({lonm2}) - ({lonm1}) + 36000) % 36000))"
)

# 15-degree integer grid: cy in 0..11 (latm+500 shifts the -85 origin
# onto a -90 grid), cx in 0..23.  Inputs are small non-negative ints,
# so floor(x / 1500.0) is exact (quotient < 24, and x/1500.0 is exact
# IEEE whenever it lands on an integer) and parses on BOTH engines —
# Spark has no // operator and DuckDB no `div` infix.
_CY = "CAST(floor(((({latm}) + 500)) / 1500.0) AS BIGINT)"
_CX = "CAST(floor((({lonm})) / 1500.0) AS BIGINT)"

_BOXES = [
    # (name, latm_lo, latm_hi, lonm_lo, lonm_hi) — centi-degree ints,
    # half-open [lo, hi)
    ("tropics", 6200, 10800, 0, 36000),  # lat in [-23, 23)
    ("north_temperate", 12000, 15100, 0, 36000),  # lat in [35, 66)
    ("pacific_ring", 0, 17000, 13000, 22000),  # lon in [-50, 40)
    ("cold_south", 0, 3500, 0, 36000),  # lat in [-85, -50)
]


def _bbox_oracle() -> str:
    latm = _LATM.format(k="c_custkey")
    lonm = _LONM.format(k="c_custkey")
    parts = [
        f"""
        SELECT '{name}' AS box,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
        FROM customer
        WHERE ({latm}) >= {la} AND ({latm}) < {lb}
          AND ({lonm}) >= {oa} AND ({lonm}) < {ob}"""
        for name, la, lb, oa, ob in _BOXES
    ]
    return " UNION ALL ".join(parts)


@query("q_geo_bbox_customers", oracle=_bbox_oracle())
def q_geo_bbox_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-bounding-box classification: customers per literal
    box (overlapping boxes count a point twice).  r10 rewrite (r9
    verdict item 7): ONE scan — each customer row explodes into the
    box labels it falls in (a <=4-element array filtered of nulls),
    then a single hash aggregate per box computes count + distinct
    nations.  The r9 version unioned 4 filtered scans; at 100 TB a 4x
    scan multiplier on an audit query is real money, and the pushed
    range predicates it bought prune nothing here (every box matches
    ~20-30%% of rows, far above row-group selectivity).  A 4-row
    literal frame left-joins the aggregate so an EMPTY box still
    reports zeros exactly like the oracle's per-box UNION ALL arms.
    All membership tests are exact integer comparisons on the derived
    centi-degree coordinates; oracle unchanged."""
    c = t(spark, sf, "customer")
    latm = F.expr(_LATM.format(k="c_custkey"))
    lonm = F.expr(_LONM.format(k="c_custkey"))
    labels = F.array(
        *[
            F.when(
                (latm >= la) & (latm < lb) & (lonm >= oa) & (lonm < ob),
                F.lit(name),
            )
            for name, la, lb, oa, ob in _BOXES
        ]
    )
    lab = c.select(
        "c_nationkey",
        F.explode(F.filter(labels, lambda x: x.isNotNull())).alias("box"),
    )
    agg = lab.groupBy("box").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
    )
    boxes = spark.createDataFrame(
        [(name,) for name, *_ in _BOXES], "box string"
    )
    return boxes.join(agg, "box", "left").select(
        "box",
        F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce("n_nations", F.lit(0)).cast("long").alias("n_nations"),
    )


_ANCHOR_HAV = _HAV.format(
    lat1=_LATM.format(k="c_custkey"),
    lon1=_LONM.format(k="c_custkey"),
    lat2=_LATM.format(k="n_nationkey"),
    lon2=_LONM.format(k="n_nationkey"),
)


@query(
    "q_geo_haversine_nation_anchor",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(MIN({_ANCHOR_HAV}), 3) AS min_km,
           round(MAX({_ANCHOR_HAV}), 3) AS max_km
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q_geo_haversine_nation_anchor(spark: SparkSession, sf: str) -> DataFrame:
    """Great-circle distance from each customer point to its nation's
    anchor point; per nation, count + min/max distance.  The haversine
    expression is the SAME SQL fragment on both engines (identical
    token-level IEEE op order); min/max are order-free aggregates, so
    no accumulation-order hazard — the only float risk is a trig ulp
    landing exactly on a round(,3) boundary (~1e-12 vs 5e-4 margin).
    Scale: broadcast join against the 25-row nation dim, partial agg
    before the single group-by shuffle."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    d = F.expr(_ANCHOR_HAV)
    return (
        j.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.min(d), 3).alias("min_km"),
            F.round(F.max(d), 3).alias("max_km"),
        )
        .orderBy("n_name")
    )


_NN_HAV = _HAV.format(lat1="c_latm", lon1="c_lonm", lat2="s_latm", lon2="s_lonm")
_NN_D2 = _D2.format(latm1="c_latm", latm2="s_latm", lonm1="c_lonm", lonm2="s_lonm")


def _grid_nn_oracle() -> str:
    c_latm = _LATM.format(k="c_custkey")
    c_lonm = _LONM.format(k="c_custkey")
    s_latm = _LATM.format(k="s_suppkey * 31 + 7")
    s_lonm = _LONM.format(k="s_suppkey * 31 + 7")
    return f"""
    WITH cpts AS (
      SELECT c_custkey, {c_latm} AS c_latm, {c_lonm} AS c_lonm,
             ({_CY.format(latm=c_latm)}) AS cy,
             ({_CX.format(lonm=c_lonm)}) AS cx
      FROM customer),
    spts AS (
      SELECT s_suppkey, s_nationkey, {s_latm} AS s_latm, {s_lonm} AS s_lonm,
             ({_CY.format(latm=s_latm)}) AS cy,
             ({_CX.format(lonm=s_lonm)}) AS cx
      FROM supplier),
    cand AS (
      SELECT c.c_custkey, s.s_suppkey, s.s_nationkey,
             ({_NN_D2}) AS d2, ({_NN_HAV}) AS km
      FROM cpts c JOIN spts s
        ON ((s.cx - c.cx + 24) % 24) IN (0, 1, 23)
       AND abs(s.cy - c.cy) <= 1),
    best AS (
      SELECT c_custkey, s_suppkey, s_nationkey, km,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rn
      FROM cand)
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(MIN(km), 3) AS min_km,
           round(MAX(km), 3) AS max_km
    FROM best WHERE rn = 1
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """


@query("q_geo_grid_nearest_supplier", oracle=_grid_nn_oracle(), bench=True)
def q_geo_grid_nearest_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest supplier per customer via grid-cell bucketing: suppliers
    fan out to their 3x3 cell neighborhood (explode of 9 offsets,
    longitude wraps at the date line, latitude edges clamp by the join
    finding no partner), candidates meet in an EQUI-join on (cy, cx),
    and a row_number top-1 per customer picks the nearest — ranked on
    the exact integer squared equirectangular metric (engine-
    independent ordering; suppkey tie-break), haversine reported.
    Customers with no supplier in their neighborhood are absent —
    the declared semantics of a bounded spatial probe (supplier keys
    are scrambled *31+7 so the two point sets don't collide).

    Scale: the ONLY join is hash/sort-merge on the cell id — never
    all-pairs; the small side grows 9x (explode), the big side never
    moves except for the join shuffle.  The top-1 compiles to
    WindowGroupLimit (rank pushdown), so each partition keeps one row
    per customer before the exchange.  Exactness: cells and ranking
    pure BIGINT; reported km rounded to 3 with min/max (order-free).
    """
    c = t(spark, sf, "customer").selectExpr(
        "c_custkey",
        f"{_LATM.format(k='c_custkey')} AS c_latm",
        f"{_LONM.format(k='c_custkey')} AS c_lonm",
    )
    c = c.selectExpr(
        "c_custkey",
        "c_latm",
        "c_lonm",
        f"{_CY.format(latm='c_latm')} AS cy",
        f"{_CX.format(lonm='c_lonm')} AS cx",
    )
    s = t(spark, sf, "supplier").selectExpr(
        "s_suppkey",
        "s_nationkey",
        f"{_LATM.format(k='s_suppkey * 31 + 7')} AS s_latm",
        f"{_LONM.format(k='s_suppkey * 31 + 7')} AS s_lonm",
    )
    # fan the small side out to its 3x3 neighborhood; join key = the
    # NEIGHBOR cell, so a customer cell meets every supplier within
    # one cell in each direction
    s = s.selectExpr(
        "s_suppkey",
        "s_nationkey",
        "s_latm",
        "s_lonm",
        f"{_CY.format(latm='s_latm')} AS scy",
        f"{_CX.format(lonm='s_lonm')} AS scx",
    ).selectExpr(
        "s_suppkey",
        "s_nationkey",
        "s_latm",
        "s_lonm",
        "explode(array(-1, 0, 1)) AS dy",
        "scy",
        "scx",
    ).selectExpr(
        "s_suppkey",
        "s_nationkey",
        "s_latm",
        "s_lonm",
        "scy + dy AS cy",
        "explode(array(scx - 1, scx, scx + 1)) AS cx0",
    ).selectExpr(
        "s_suppkey",
        "s_nationkey",
        "s_latm",
        "s_lonm",
        "cy",
        "(cx0 + 24) % 24 AS cx",
    )
    # rank on the exact integer metric only; the 5-trig haversine is
    # DEFERRED past the top-1 filter (optimization r12, guide §1.2):
    # it used to be evaluated for every candidate of the 9x fan-out
    # while only the winner's km is consumed — computing it on the
    # survivors (one row per customer) measured 1.57 -> 0.88 s with
    # bit-identical output (same fragment, same operand values, fewer
    # evaluations).  The four coordinate ints ride through the window
    # in km's place; WindowGroupLimit still prunes to one row per
    # customer per partition before the exchange.
    cand = c.join(s, ["cy", "cx"]).select(
        "c_custkey",
        "s_suppkey",
        "s_nationkey",
        "c_latm",
        "c_lonm",
        "s_latm",
        "s_lonm",
        F.expr(_NN_D2).alias("d2"),
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("s_nationkey", F.expr(_NN_HAV).alias("km"))
    )
    return (
        best.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.min("km"), 3).alias("min_km"),
            F.round(F.max("km"), 3).alias("max_km"),
        )
        .orderBy("s_nationkey")
    )


# ------------------------------------------------- complete grid-NN
# q_geo_grid_nearest_supplier is a documented bounded probe: a point
# with an empty 3x3 neighborhood silently drops.  The r10 completion
# (r9 verdict item 6) adds the guaranteed-nearest variant: unmatched
# points re-probe at widening radii, and a round's winner is accepted
# only when it PROVABLY beats every unprobed cell.

_PS_D2 = _D2.format(latm1="p_latm", latm2="s_latm", lonm1="p_lonm", lonm2="s_lonm")
_PS_HAV = _HAV.format(lat1="p_latm", lon1="p_lonm", lat2="s_latm", lon2="s_lonm")

# ring schedule: 3x3, then 7x7, then the full wrapped grid (Chebyshev
# 12 covers all 24 wrapped columns and all 12 rows from any cell)
_NN_ROUNDS = (1, 3, 12)
_CELL = 1500  # centi-degrees per grid cell


def grid_nearest_complete(points: DataFrame, sites: DataFrame) -> DataFrame:
    """Guaranteed nearest site per point via ring-expanding grid probes.

    ``points``: (p_id, p_latm, p_lonm); ``sites``: (s_id, s_tag,
    s_latm, s_lonm); returns every point exactly once as (p_id, s_id,
    s_tag, d2, km, settle_r) where (s_id, d2) is the TRUE nearest
    (exact integer equirectangular metric, s_id tie-break) — the
    property tests/test_composites51.py pins against brute force on a
    sparse fixture.

    Per round r in (1, 3, 12): round 1 covers EVERY point, so the
    SITE side fans out to its 3x3 neighborhood (9x the small side, the
    headliner's shape) while points join on their own cell; the
    straggler legs invert — the shrunken unmatched-point side fans out
    to its wrapped (2r+1)^2 disc and sites stay keyed by their own
    cell.  Either way candidates meet in an EQUI-join on the cell id,
    a WindowGroupLimit top-1 picks the round's best, and the point
    SETTLES only if d2 <= (r*1500)^2: a point in
    any unprobed cell (Chebyshev distance >= r+1) is at least r*1500+1
    centi-degrees away on some axis, so an accepted winner provably
    beats everything unseen.  An unguaranteed winner is re-derived at
    the next radius (the next disc includes this round's cells).  The
    last round's wrapped disc covers the whole grid, so it settles
    unconditionally — every point gets its true nearest even on a
    corpus whose sites are arbitrarily sparse.

    Scale: each leg is one equi-join on the cell key; leg r's cost is
    |unmatched_r| x (2r+1)^2 exploded probes, and |unmatched| shrinks
    with site density — on uniform data virtually everything settles
    at r=1 and the fallback legs join empty frames.  The full-grid leg
    is the honest worst case: points that reach it genuinely need to
    see every cell (their 7x7 was empty), and they meet each site
    exactly once — bounded by |stragglers| x |sites|, never an
    all-pairs over the corpus.

    Lineage note (optimization r12): each leg's ``best`` frame feeds
    TWO consumers — the settled union and the next leg's anti-join —
    and Catalyst copies the whole subtree into both, so the physical
    plan grew a copy of leg 1 inside leg 2 and copies of both inside
    leg 3 (169 nodes, ~17 Exchanges; measured, the copies were really
    re-executed).  ``localCheckpoint(eager=False)`` on each
    multiply-consumed round's best (the final leg feeds only the
    union, so it skips the checkpoint and its planning pass)
    truncates the lineage: every leg is computed ONCE per run —
    exactly the "insert a checkpoint between legs" recommendation the
    earlier lineage note deferred to cluster deployments (guide §3.3
    "materialising an intermediate truncates the plan"), now measured
    worthwhile at bench scale too (2.31 s -> 1.84 s isolated, results
    bit-identical).  Lazy (not eager) so the legs still execute inside
    the consuming action rather than as serial build-time jobs; the
    checkpointed frames are the settled winners — bounded by |points|
    — and live only for the run."""
    sites = sites.selectExpr(
        "s_id",
        "s_tag",
        "s_latm",
        "s_lonm",
        f"{_CY.format(latm='s_latm')} AS cy",
        f"{_CX.format(lonm='s_lonm')} AS cx",
    )
    pts = points.selectExpr(
        "p_id",
        "p_latm",
        "p_lonm",
        f"{_CY.format(latm='p_latm')} AS pcy",
        f"{_CX.format(lonm='p_lonm')} AS pcx",
    )
    settled = []
    for r in _NN_ROUNDS:
        if r == _NN_ROUNDS[0]:
            # round 1 runs over EVERY point, so fan out the SITE side
            # (the small one, 9x — the headliner's documented shape)
            # and let points join on their own cell: the big side
            # never explodes before the shuffle (review r10)
            fan = sites.selectExpr(
                "s_id", "s_tag", "s_latm", "s_lonm",
                "explode(array(cy - 1, cy, cy + 1)) AS fcy",
                "cx AS scx",
            ).selectExpr(
                "s_id", "s_tag", "s_latm", "s_lonm", "fcy AS cy",
                "explode(array(scx - 1, scx, scx + 1)) AS fcx",
            ).selectExpr(
                "s_id", "s_tag", "s_latm", "s_lonm", "cy",
                "(fcx + 24) % 24 AS cx",
            )
            probes = pts.select(
                "p_id", "p_latm", "p_lonm",
                F.col("pcy").alias("cy"), F.col("pcx").alias("cx"),
            )
        else:
            # straggler legs: the shrunken point side fans out to its
            # wrapped (2r+1)^2 disc; sites stay keyed by their own cell
            fan = sites
            probes = pts.withColumn(
                "cy",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(-r), F.lit(r)),
                        lambda d: F.col("pcy") + d,
                    )
                ),
            ).withColumn(
                "cx",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(-r), F.lit(r)),
                            lambda d: (F.col("pcx") + d + F.lit(48)) % 24,
                        )
                    )
                ),
            )
        # rank on the exact integer metric; haversine is DEFERRED past
        # the top-1 filter and the settle gate (same r12 rewrite as the
        # 3x3 headliner) — trig runs once per SETTLED point, not once
        # per exploded candidate
        cand = probes.join(fan, ["cy", "cx"]).select(
            "p_id",
            "s_id",
            "s_tag",
            "p_latm",
            "p_lonm",
            "s_latm",
            "s_lonm",
            F.expr(_PS_D2).alias("d2"),
        )
        w = Window.partitionBy("p_id").orderBy("d2", "s_id")
        best = cand.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        )
        if r != _NN_ROUNDS[-1]:
            guarantee = (_CELL * r) ** 2
            best = best.where(F.col("d2") <= guarantee)
        best = best.select(
            "p_id",
            "s_id",
            "s_tag",
            "d2",
            F.expr(_PS_HAV).alias("km"),
            F.lit(r).alias("settle_r"),
        )
        settled.append(best)
        if r != _NN_ROUNDS[-1]:
            # winners feed TWO consumers (union + next leg's anti-join):
            # truncate lineage so the leg computes once.  The final leg
            # has a single consumer — checkpointing it would only add a
            # planning pass.  cut_lineage is localCheckpoint here and
            # persist(MEMORY_AND_DISK) under
            # SPARK_GRAFT_RELIABLE_CHECKPOINT=1 (the cluster seam:
            # localCheckpoint partitions are not recomputable after
            # executor loss — see functions/parallelism.py).
            settled[-1] = best = cut_lineage(best)
            pts = pts.join(best.select("p_id"), "p_id", "left_anti")
    out = settled[0]
    for leg in settled[1:]:
        out = out.unionByName(leg)
    return out


def _grid_nn_complete_oracle() -> str:
    c_latm = _LATM.format(k="c_custkey")
    c_lonm = _LONM.format(k="c_custkey")
    s_latm = _LATM.format(k="s_suppkey * 31 + 7")
    s_lonm = _LONM.format(k="s_suppkey * 31 + 7")
    d2 = _D2.format(latm1="c_latm", latm2="s_latm", lonm1="c_lonm", lonm2="s_lonm")
    hav = _HAV.format(lat1="c_latm", lon1="c_lonm", lat2="s_latm", lon2="s_lonm")
    return f"""
    WITH cpts AS (
      SELECT c_custkey, {c_latm} AS c_latm, {c_lonm} AS c_lonm FROM customer),
    spts AS (
      SELECT s_suppkey, s_nationkey, {s_latm} AS s_latm, {s_lonm} AS s_lonm
      FROM supplier),
    best AS (
      SELECT c_custkey, s_suppkey, s_nationkey, km,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rn
      FROM (SELECT c.c_custkey, s.s_suppkey, s.s_nationkey,
                   ({d2}) AS d2, ({hav}) AS km
            FROM cpts c CROSS JOIN spts s))
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(MIN(km), 3) AS min_km,
           round(MAX(km), 3) AS max_km
    FROM best WHERE rn = 1
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """


@query("q_geo_grid_nn_complete", oracle=_grid_nn_complete_oracle(), bench=True)
def q_geo_grid_nn_complete(spark: SparkSession, sf: str) -> DataFrame:
    """EVERY customer's true nearest supplier via the ring-expanding
    grid probe (``grid_nearest_complete``) — the guaranteed companion
    to the bounded 3x3 headliner: same cell-keyed equi-joins, but
    unmatched customers re-probe at radii 1 -> 3 -> 12 (full wrapped
    grid) and a winner is accepted only when d2 <= (r*1500)^2 proves
    no unprobed cell can beat it.  The oracle is the BRUTE-FORCE cross
    join (the quadratic sf0.01 twin, the same honesty pattern as the
    exact-Jaccard twin of MinHash): hash-equality means the fallback
    returns exactly the true nearest for all customers, not just the
    densely-surrounded ones.  Output shape matches the headliner so
    the two reports diff directly; count totals here always equal
    |customer|."""
    c = t(spark, sf, "customer").selectExpr(
        "c_custkey AS p_id",
        f"{_LATM.format(k='c_custkey')} AS p_latm",
        f"{_LONM.format(k='c_custkey')} AS p_lonm",
    )
    s = t(spark, sf, "supplier").selectExpr(
        "s_suppkey AS s_id",
        "s_nationkey AS s_tag",
        f"{_LATM.format(k='s_suppkey * 31 + 7')} AS s_latm",
        f"{_LONM.format(k='s_suppkey * 31 + 7')} AS s_lonm",
    )
    nn = grid_nearest_complete(c, s)
    return (
        nn.groupBy(F.col("s_tag").alias("s_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.min("km"), 3).alias("min_km"),
            F.round(F.max("km"), 3).alias("max_km"),
        )
        .orderBy("s_nationkey")
    )
