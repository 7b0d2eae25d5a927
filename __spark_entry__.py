"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``kafkaish_spark`` (see SURVEY.md §2 inventory);
this module just adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exercises the full log layer end-to-end: publish the events table
    into a real parquet topic log (offset assignment), then
    replay-aggregate counts+value by event routing key over tumbling
    hours (scan -> filter -> project -> group-by -> sort).
    """
    import tempfile

    from pyspark.sql import functions as F

    from kafkaish_spark.sources.topic_log import Engine

    sf_dir = "/root/testdata/sf0.001"
    from kafkaish_spark.sources.tables import load_table

    eng = Engine(spark, tempfile.mkdtemp(prefix="kafkaish_entry_"))
    topic = eng.prepare_topic("flagship")
    events = load_table(spark, sf_dir, "events")
    topic.publish_df(
        events.select(
            F.col("event_type").alias("event"),
            F.col("props").alias("message"),
            F.col("ts"),
        )
    )
    replayed = topic.replay(since=0)
    return (
        replayed.groupBy(
            F.col("event").alias("event_type"),
            F.date_trunc("hour", "ts").alias("hour_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.sum(F.get_json_object("message", "$.k").cast("long")).alias("k_sum"),
        )
        .orderBy("event_type", "hour_start")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kafkaish_spark.plans.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    from kafkaish_spark.plans.registry import oracle_map

    return oracle_map()
