"""Cross-engine-exact aggregate helpers.

Floating-point SUM/AVG depend on accumulation order, which differs
between Spark (partition tree) and the DuckDB oracle (its own
parallelism) — a raw ``SUM(double)`` can hash-mismatch in the last ulp.
Casting each input to DECIMAL first makes the aggregation exact integer
arithmetic in BOTH engines; one final cast back to DOUBLE is then
deterministic.  The double->decimal cast itself rounds the same way in
both engines for non-tie values (ties at the 4th decimal of a double
essentially never occur in real data).

This also reflects good practice at scale: money columns aggregated as
decimals are reproducible run-to-run regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 6 matters: TPC-H money expressions are products of up to three
# 2-decimal factors, i.e. EXACT 6-decimal values — at scale 6 the
# double->decimal cast recovers the exact grid value on both engines
# (no rounding ties), whereas scale 4 hits true half-way ties that
# Spark (HALF_UP on shortest repr) and DuckDB (scaled-double rounding)
# resolve differently.
SCALE = 6
_DEC = f"decimal(18,{SCALE})"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """avg as exact-decimal sum / count — one IEEE division, same in
    both engines (plain AVG(decimal) returns different types/paths)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1))
    return out.alias(alias) if alias else out


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{SCALE}))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT(*))"
