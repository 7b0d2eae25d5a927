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


def spread(df: DataFrame, min_ratio: float = 0.25) -> DataFrame:
    """Repartition ``df`` to default parallelism iff its current
    partition count is below ``min_ratio`` x the cores available.
    ``getNumPartitions`` inspects the physical plan without running a
    job."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(1, int(cores * min_ratio)):
        return df.repartition(cores)
    return df
