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
    # The source instant is a UTC epoch; deliver it as TIMESTAMP_NTZ
    # holding the UTC wall-clock (like every other testdata table).
    # Plain TIMESTAMP would be re-rendered through the *Python-process*
    # local zone at collect() — hours of drift vs the naive-UTC oracle
    # when the caller (e.g. the driver's own plain session) isn't UTC.
    # The session-tz pin makes the TIMESTAMP->NTZ cast below read the
    # instant as UTC; it must be set before the plan is analyzed.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df.select("event_id", "ts", "user_id", "event_type", "value", "props")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 16,
) -> None:
    """Persist ``df`` as an external bucketed+sorted table: both sides
    of a repeated equi-join written this way co-locate by ``key``, so
    the join compiles to a zero-Exchange sort-merge join (asserted in
    tests/test_operators.py).  This is the 100 TB answer to "this join
    runs every hour": pay the shuffle once at write time, never at read
    time.  The bucket count is a real tuning knob — it fixes join
    parallelism, so size it to the cluster (e.g. 2-4x executor cores),
    not to the data."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
