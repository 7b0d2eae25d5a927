"""Round-9 wave 8: exact point-in-polygon — computational geometry as
pure integer SQL.

``q_geo_point_in_polygon`` classifies the composites51 customer
points against literal polygons (one convex, one irregular convex,
one CONCAVE) by ray casting, entirely in BIGINT arithmetic: an edge
crosses the +x ray from point (px, py) iff the edge straddles py
((y1 > py) != (y2 > py) — the half-open rule that counts shared
vertices exactly once) and the intersection lies right of px, decided
WITHOUT division by the sign-adjusted cross product
(x1-px)(y2-y1) + (x2-x1)(py-y1).  Odd crossing parity = inside.
Exact: coordinates are centi-degree integers (composites51's derived
grid), the cross products stay under 2^31, no float appears anywhere
— the float-free twin of the haversine family, and the primitive a
geofencing pipeline runs per event at ingest.

Scale: the edge table is 13 literal rows broadcast against the point
scan (a declared-bounded nested-loop — the small side is the literal
geometry, the classic spatial-filter shape); crossings aggregate per
(polygon, point) with map-side partials, then per polygon.  At real
scale the polygon set rides along exactly like this — geometry is
broadcast state, points never shuffle except for the final count.
Polygons sit away from the antimeridian seam; wraparound handling
belongs to the grid join (composites51), not the planar parity test
(documented limit).

Reference parity: [NS] — north-star analytics; the reference
(/root/reference/src/topic.js) is pub/sub only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkaish_spark.operators.composites51 import _LATM, _LONM
from kafkaish_spark.plans.registry import query
from kafkaish_spark.sources.tables import load_table as t

# (polygon, vertices as (lonm, latm) integer centi-degrees); the
# third one is concave (the notch between its last two vertices)
_POLYGONS = {
    "triangle_west": [(2000, 2000), (8000, 3000), (5000, 9000)],
    "quad_mid": [(12000, 4000), (21000, 6000), (19000, 13000), (13000, 11000)],
    "concave_east": [
        (24000, 2000),
        (34000, 2000),
        (34000, 10000),
        (29000, 5000),
        (24000, 10000),
    ],
}


def _edges():
    rows = []
    for name, verts in _POLYGONS.items():
        for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
            rows.append((name, x1, y1, x2, y2))
    return rows


# ray-cast indicator on integer coords: straddle test + sign-adjusted
# cross product (no division, no float)
_IND = """
    CASE WHEN ((y1 > py) != (y2 > py))
          AND (CASE WHEN y2 > y1
                    THEN (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
                    ELSE -((x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1))
               END) > 0
         THEN 1 ELSE 0 END
"""


def _pip_oracle() -> str:
    vals = ", ".join(
        f"('{n}', {x1}, {y1}, {x2}, {y2})" for n, x1, y1, x2, y2 in _edges()
    )
    px = _LONM.format(k="c_custkey")
    py = _LATM.format(k="c_custkey")
    return f"""
    WITH pts AS (
      SELECT c_custkey, c_nationkey,
             CAST({px} AS BIGINT) AS px, CAST({py} AS BIGINT) AS py
      FROM customer),
    edges(polygon, x1, y1, x2, y2) AS (VALUES {vals}),
    crossings AS (
      SELECT e.polygon, p.c_custkey, p.c_nationkey,
             SUM({_IND}) AS k
      FROM pts p CROSS JOIN edges e
      GROUP BY e.polygon, p.c_custkey, p.c_nationkey)
    SELECT polygon,
           CAST(COUNT(*) AS BIGINT) AS n_inside,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
    FROM crossings WHERE k % 2 = 1
    GROUP BY polygon ORDER BY polygon
    """


@query("q_geo_point_in_polygon", oracle=_pip_oracle())
def q_geo_point_in_polygon(spark: SparkSession, sf: str) -> DataFrame:
    """Customers inside each literal polygon by integer ray casting
    (see module docstring): per polygon, the point count and distinct
    nations.  The concave polygon is the regression guard — convex
    shortcuts (sign-of-all-cross-products) would misclassify its
    notch, parity does not."""
    c = t(spark, sf, "customer").selectExpr(
        "c_custkey",
        "c_nationkey",
        f"CAST({_LONM.format(k='c_custkey')} AS BIGINT) AS px",
        f"CAST({_LATM.format(k='c_custkey')} AS BIGINT) AS py",
    )
    edges = spark.createDataFrame(
        _edges(), "polygon string, x1 long, y1 long, x2 long, y2 long"
    )
    crossings = (
        c.crossJoin(F.broadcast(edges))
        .withColumn("ind", F.expr(_IND))
        .groupBy("polygon", "c_custkey", "c_nationkey")
        .agg(F.sum("ind").alias("k"))
    )
    return (
        crossings.where(F.col("k") % 2 == 1)
        .groupBy("polygon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_inside"),
            F.countDistinct("c_nationkey").cast("long").alias("n_nations"),
        )
        .orderBy("polygon")
    )
