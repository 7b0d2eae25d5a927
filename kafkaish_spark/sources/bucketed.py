"""Shared bucketed-layout protocol (r12, review finding: composites61
had grown a near-verbatim copy of composites28's layout code — two
copies of a self-heal protocol drift independently).

``ensure_bucketed_layout`` materializes a set of tables as BUCKETED
parquet (bucketBy on each table's join key, equal bucket counts) under
one warehouse directory, self-healed on caller-supplied content
fingerprints: valid files on disk are re-registered as external tables
without a rewrite (a fresh session has an empty catalog but perfectly
good bucket files, and rewriting would yank data out from under a
concurrent session); anything else is rebuilt under the location's
writer lock.  Bucket layout is the offline half of the zero-exchange
join — both sides pre-hashed into the same bucket count on disk, so
the join needs no runtime Exchange at any scale.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def ensure_bucketed_layout(
    spark: SparkSession,
    loc_root: str,
    sides: Sequence[tuple[str, DataFrame, str, str]],
    n_buckets: int,
    fingerprints: Sequence[tuple[str, Callable[[DataFrame], tuple]]],
) -> None:
    """Materialize/refresh the layout.

    sides: (table_name, source_df, bucket_key, subdir) per table.
    fingerprints: (subdir, agg) pairs; ``agg(df) -> tuple`` must be
    CONTENT-sensitive for every column a consumer reads (review r12:
    a key-only checksum let a regenerated fixture with identical keys
    but different measures silently serve stale buckets).  The source
    fingerprint is computed from the side dfs, the disk fingerprint by
    re-reading the written files; all pairs must match for reuse.
    """
    by_sub = {sub: df for _n, df, _k, sub in sides}
    want = [tuple(agg(by_sub[sub])) for sub, agg in fingerprints]

    def _disk_ok() -> bool:
        for _n, _df, _k, sub in sides:
            if not os.path.isdir(os.path.join(loc_root, sub)):
                return False
        try:
            got = [
                tuple(agg(spark.read.parquet(os.path.join(loc_root, sub))))
                for sub, agg in fingerprints
            ]
        except Exception:
            return False
        return got == want

    from kafkaish_spark.sources.topic_log import writer_lock

    os.makedirs(loc_root, exist_ok=True)
    with writer_lock(loc_root, "bucket-layout build"):
        if _disk_ok():
            for name, df, key, sub in sides:
                if not spark.catalog.tableExists(name):
                    ddl = df._jdf.schema().toDDL()
                    loc = os.path.join(loc_root, sub)
                    spark.sql(
                        f"CREATE TABLE {name} ({ddl}) USING parquet "
                        f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                        f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
                    )
        else:
            import shutil

            for name, df, key, sub in sides:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                loc = os.path.join(loc_root, sub)
                shutil.rmtree(loc, ignore_errors=True)
                (
                    df.repartition(n_buckets, key)
                    .write.format("parquet")
                    .option("path", loc)
                    .bucketBy(n_buckets, key)
                    .sortBy(key)
                    .mode("overwrite")
                    .saveAsTable(name)
                )
    for name, _df, _key, _sub in sides:
        # drop any file listing cached before a concurrent rebuild
        spark.sql(f"REFRESH TABLE {name}")
