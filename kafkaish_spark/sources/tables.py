"""Loaders for the driver's TPC-H-ish parquet tables (TESTDATA.md).

Plain ``spark.read.parquet`` so Catalyst gets full pushdown / pruning;
no caching here — callers decide lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL).  Read it as a raw
    nanosecond LONG via the legacy conf, then rebuild a proper timestamp
    column at microsecond precision (integer division — ns values
    ~1.7e18 exceed double's 2^53 exact range, so no float math).
    DuckDB's oracle view truncates ns->us the same way.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
