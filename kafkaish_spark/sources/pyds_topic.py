"""``kafkaish_topic`` — a custom Spark 4 Python DataSource for topic logs
(log-directory-level; the engine-level sibling is ``sources/pyds.py``
whose ``kafkaish`` format adds Catalyst filter pushdown, the
executor-parallel stream reader, and the write side — both formats
register together via ``pyds.register``).

The Spark-native connector surface for the reference's consumer API
(`/root/reference/src/topic.js:118-201` replayFrom — offset-ranged scan
of the log): ``spark.read.format("kafkaish_topic")`` over a topic
directory, with

- ``start_offset`` pushdown: segment files whose parquet-footer max
  offset is below the requested start are never opened (the same
  footer-stats pruning ``Topic.offset_for_time`` uses) — mirroring the
  reference's server-side ``_id > last`` cursor predicate;
- ``event`` routing pushed to parquet row-group filtering via pyarrow
  (the reference filters client-side per doc, src/topic.js:172-173);
- one InputPartition per segment file, so a 100 TB topic reads with
  full cluster parallelism;
- Arrow-batch transfer: ``read`` yields pyarrow RecordBatches, not
  per-row Python tuples.

A ``SimpleDataSourceStreamReader`` twin makes the same topic tailable
from ``spark.readStream`` without the parquet file-source's directory
listing — offsets in the stream checkpoint are LOG offsets, making the
commit log introspectable (ack ≙ committed max offset + 1).

This module exists alongside the plain parquet readers in
``topic_log.py`` to cover the connector-authoring surface itself: the
same API a user would use to hang a real external system (REST, KV
store, message bus) onto this engine.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("offset", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("event", StringType(), True),
        StructField("message", StringType(), True),
    ]
)


def _segment_files(path: str) -> list[str]:
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith("_")
    )


def _footer_offset_range(
    fpath: str,
) -> tuple[int | None, int | None, bool]:
    """(min, max, complete) of the offset column from parquet footer
    stats — no data pages read.  ``complete`` is False when any row
    group lacks min/max stats; the partial bounds are still returned so
    tail computations can fall back to a column read instead of
    silently under-reporting (which would reuse live offsets)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(fpath).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if "offset" not in idx:
            return None, None, False
        lo, hi = None, None
        complete = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["offset"]).statistics
            if st is None or not st.has_min_max:
                complete = False
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return lo, hi, complete
    except Exception:
        return None, None, False


def _file_offset_max(fpath: str) -> int | None:
    """Exact max(offset) reading only the offset column — the fallback
    when footer stats are partial.  A segment lacking the column
    entirely returns None; any OTHER read failure RAISES (matching
    pyds._file_offset_max): a silently understated tail would hide a
    live segment's messages from the stream bound, and loud beats
    wrong."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(fpath).metadata
    if "offset" not in {
        meta.schema.column(i).name for i in range(meta.num_columns)
    }:
        return None
    tbl = pq.read_table(fpath, columns=["offset"])
    if tbl.num_rows == 0:
        return None
    return pc.max(tbl["offset"]).as_py()


class _SegmentPartition(InputPartition):
    def __init__(self, fpath: str):
        self.fpath = fpath


def _read_segment(fpath: str, start_offset: int, event: str | None):
    """Yield Arrow RecordBatches of envelope rows past start_offset,
    with the event filter pushed into the parquet scan."""
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    dataset = ds.dataset(fpath, format="parquet")
    flt = pc.field("offset") > start_offset
    if event is not None:
        flt = flt & (pc.field("event") == event)
    scanner = dataset.scanner(
        columns=["offset", "ts", "event", "message"], filter=flt
    )
    for batch in scanner.to_batches():
        if batch.num_rows:
            yield batch


class KafkaishTopicReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kafkaish_topic requires option 'path'")
        self.start_offset = int(options.get("start_offset", 0))
        self.event = options.get("event")

    def partitions(self):
        parts = []
        for f in _segment_files(self.path):
            _, hi, complete = _footer_offset_range(f)
            if complete and hi is not None and hi <= self.start_offset:
                continue  # footer-stats pruning: segment fully acked
            parts.append(_SegmentPartition(f))
        return parts or [_SegmentPartition("")]

    def read(self, partition):
        if not partition.fpath:
            return
        yield from _read_segment(partition.fpath, self.start_offset, self.event)


class KafkaishTopicStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch tail of the topic: stream offsets ARE log offsets."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kafkaish_topic requires option 'path'")
        self.event = options.get("event")
        starting = options.get("starting_offsets", "earliest")
        if starting == "latest":
            self._initial = self._max_offset()
        else:
            self._initial = int(options.get("start_offset", 0))

    def _max_offset(self) -> int:
        hi = 0
        for f in _segment_files(self.path):
            _, h, complete = _footer_offset_range(f)
            if not complete:
                h = _file_offset_max(f)  # exact, offset column only
            if h is not None:
                hi = max(hi, h)
        return hi

    def initialOffset(self):
        return {"offset": self._initial}

    def read(self, start: dict):
        end = {"offset": self._max_offset()}
        return iter(self._rows_between(start["offset"], end["offset"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows_between(start["offset"], end["offset"]))

    def _rows_between(self, lo: int, hi: int):
        if hi <= lo:
            return []
        out = []
        for f in _segment_files(self.path):
            flo, fhi, complete = _footer_offset_range(f)
            if complete:
                if fhi is not None and fhi <= lo:
                    continue
                if flo is not None and flo > hi:
                    continue
            for batch in _read_segment(f, lo, self.event):
                for row in batch.to_pylist():
                    if row["offset"] <= hi:
                        out.append(
                            (row["offset"], row["ts"], row["event"], row["message"])
                        )
        out.sort(key=lambda r: r[0])
        return out


class KafkaishTopicDataSource(DataSource):
    """spark.read.format("kafkaish_topic").option("path", <topic/log>)
    [.option("start_offset", n)][.option("event", name)] — plus the
    streaming twin via spark.readStream."""

    @classmethod
    def name(cls) -> str:
        return "kafkaish_topic"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return KafkaishTopicReader(self.options)

    def simpleStreamReader(self, schema):
        return KafkaishTopicStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the 'kafkaish_topic' format."""
    spark.dataSource.register(KafkaishTopicDataSource)
