"""Plan-hygiene helpers: guarded re-parallelization for
under-partitioned scans (``spread``) and lineage truncation for
multiply-consumed subtrees (``cut_lineage``).

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

import os

from pyspark.sql import DataFrame

# cut_lineage storage seam (r12 verdict item 9): set to any non-empty
# value other than "0" on a real cluster.
RELIABLE_CHECKPOINT_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"


def cut_lineage(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate the lineage of a multiply-consumed subtree so Catalyst
    plans and executes it ONCE (guide §3.3 "materialising an
    intermediate truncates the plan" — without the cut, each consumer
    gets its own copy of the whole subtree and the copies really
    re-execute; measured on the geo ring-expansion legs, r12).

    Default storage is ``localCheckpoint``: the cheapest cut, but the
    checkpointed partitions live only in executor block storage and
    are NOT recomputable after executor loss — perfectly safe on
    local[N] (one process, one "executor") and for anything that
    re-runs on failure, but on a multi-node cluster a lost executor
    fails the job.  Set ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` there to
    use ``persist(MEMORY_AND_DISK)`` instead: the cached relation
    still deduplicates the subtree in the plan, and a lost partition
    is recomputed from lineage rather than failing the job.  The
    persisted frames are released by Spark's cache eviction / session
    stop (callers of this helper produce per-run bounded frames —
    settled geo winners, CC label rounds — not corpus-sized data)."""
    if os.environ.get(RELIABLE_CHECKPOINT_ENV, "0") not in ("", "0"):
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=eager)


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
