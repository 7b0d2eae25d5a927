"""SparkSession factory with scale-appropriate defaults.

Local test profile is ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
configs below are the ones that matter on a real cluster too: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for any
Python<->JVM data movement, and a shuffle-partition count sized to the
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafkaish-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a multi-executor cluster the same settings apply; only ``master``
    would change (provided externally via spark-submit).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Shuffle parallelism is ENV-parameterised, never a baked-in
    # constant (optimization guide §2.2 / round-12 rule): locally it
    # defaults to the core count (small frames, AQE coalesces below
    # it), on a cluster set SPARK_GRAFT_SHUFFLE_PARTITIONS to
    # 2-4x total executor cores (or higher with AQE coalescing on,
    # which this session always enables) so post-shuffle partitions
    # land in the 100 MB-1 GB band at the deployment's data size.
    shuffle_n = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # INT96 (the legacy default) writes NO footer min/max stats, which
        # kills row-group skipping on ts predicates and the footer-driven
        # retention jobs; micros is the modern interoperable encoding
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.streaming.schemaInference", "false")
        # Python Data Source API: allow readers that implement
        # pushFilters (sources/pyds.py) — off by default in 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    return builder.getOrCreate()


def session_token(spark: SparkSession) -> tuple[str, int]:
    """Stable identity for cache keys.  ``id(spark)`` is unsafe: after
    a stopped session is garbage-collected, CPython can hand the same
    id to a NEW session, silently serving a cached frame bound to the
    dead one (round-3 ADVICE item 5).  (applicationId, startTime) is
    unique per JVM application instance and never recycled."""
    sc = spark.sparkContext
    return (sc.applicationId, sc.startTime)
