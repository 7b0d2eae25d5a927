"""Ordered-fold aggregation — the repo's core bit-reproducibility
primitive for float reductions.

A plain float SUM/PRODUCT over a distributed frame is partition-order
dependent in its last ulp; the ordered fold collects (key, value)
structs, sorts by key, and folds left-to-right from an identity seed —
the exact sequence DuckDB's ``list(v ORDER BY k)`` +
``list_reduce(list_prepend(seed, ...))`` evaluates, so both engines
produce the same IEEE double (PageRank, k-means, PCA, logistic GD,
Kaplan-Meier, chi-square drift all build on this).

Identity seeds are exact: ``0.0 + x == x`` and ``1.0 * x == x`` for
every finite IEEE double, so the seed never perturbs the fold.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_fold(
    key: Column,
    val: Column,
    zero: Column,
    op: Callable[[Column, Column], Column],
) -> Column:
    """Aggregate expression: fold ``val`` over rows in ascending
    ``key`` order with ``op``, starting from ``zero``.  Usable anywhere
    an aggregate expression is (groupBy().agg(...) / agg(...))."""
    return F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(key.alias("k"), val.alias("x")))
            ),
            lambda s: s["x"],
        ),
        zero,
        op,
    )


def ordered_sum(key: Column, val: Column) -> Column:
    """Order-independent-by-construction float sum (0.0-seeded fold)."""
    return ordered_fold(key, val, F.lit(0.0), lambda acc, x: acc + x)


def ordered_product(key: Column, val: Column) -> Column:
    """Deterministic float product (1.0-seeded fold) — survival curves,
    damped chains."""
    return ordered_fold(key, val, F.lit(1.0), lambda acc, x: acc * x)
