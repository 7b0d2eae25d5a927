"""Round-9 wave 8 tests: integer ray-cast point-in-polygon against a
pure-python reference, including hand-picked points around the
concave notch."""

import pytest

from kafkaish_spark.operators.composites57 import _POLYGONS


def _inside(poly, px, py):
    """Textbook ray cast (float-free, same half-open rule)."""
    k = 0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            cross = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
            if (cross if y2 > y1 else -cross) > 0:
                k += 1
    return k % 2 == 1


def test_concave_notch_classified_correctly():
    """The point inside the notch of concave_east is OUTSIDE the
    polygon; points in its two lobes are inside — the case a
    convexity shortcut gets wrong."""
    poly = _POLYGONS["concave_east"]
    assert not _inside(poly, 29000, 8000)  # in the notch
    assert _inside(poly, 25500, 5000)  # west lobe
    assert _inside(poly, 33000, 5000)  # east lobe
    assert not _inside(poly, 20000, 5000)  # far outside


def test_pip_query_matches_rowlevel(spark, sf_dir):
    from kafkaish_spark.operators.composites57 import (
        q_geo_point_in_polygon,
    )

    got = {
        r["polygon"]: (r["n_inside"], r["n_nations"])
        for r in q_geo_point_in_polygon(spark, sf_dir).collect()
    }
    rows = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    )
    for name, poly in _POLYGONS.items():
        inside = [
            r
            for r in rows
            if _inside(
                poly,
                (r["c_custkey"] * 6151) % 36000,
                (r["c_custkey"] * 9973) % 17000,
            )
        ]
        if not inside:
            assert name not in got
            continue
        assert got[name] == (
            len(inside),
            len({r["c_nationkey"] for r in inside}),
        ), name
