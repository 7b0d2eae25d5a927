"""Vector math over ``array<float>`` columns, JVM-side (no Python UDFs).

All arithmetic is done in DOUBLE with sequential accumulation
(``aggregate`` folds left-to-right), matching the element-order-exact
semantics of the DuckDB oracle's list functions, so cosine scores are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
