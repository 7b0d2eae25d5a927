"""``spark.read.format("kafkaish")`` — the topic log as a first-class
Spark Data Source, via the Python Data Source API (Spark 4.x,
``pyspark.sql.datasource``).

The reference exposes its log only through its own client object
(`kafkaish().connect()` -> topic handle, /root/reference/src/index.js:3-5);
there is no way to hand the log to a query engine as a TABLE.  This
module closes that gap idiomatically: the log becomes a named source
any Spark reader can load —

    spark.dataSource.register(KafkaishDataSource)
    df = (spark.read.format("kafkaish")
          .option("path", engine.root).option("topic", "orders").load())

    stream = (spark.readStream.format("kafkaish")
              .option("path", engine.root).option("topic", "orders").load())

Batch path (``KafkaishBatchReader``):
- one ``InputPartition`` per log segment file — the same file-granular
  parallelism the JVM parquet reader uses, so a 10k-segment topic
  fans out across the cluster;
- ``pushFilters`` accepts offset comparisons and event equality, and
  partition planning PRUNES whole segments on their parquet footer
  min/max offset stats before any task launches (the Python-side twin
  of row-group skipping); surviving filters are re-applied exactly on
  the Arrow table, so accepting them is semantically lossless;
- each task reads its file with pyarrow and yields Arrow
  RecordBatches — zero row-at-a-time Python.

Streaming path (``KafkaishPartitionedStreamReader`` — the one
``streamReader()`` returns): a full ``DataSourceStreamReader`` whose
offset dict is the topic's publish offset — the official-API analog
of the reference's tailable cursor (src/topic.js:81-117), but
EXECUTOR-PARALLEL: each trigger's offset range is planned onto the
log segments overlapping it (footer-stats pruned, like the batch
reader) and each segment is read on an executor as Arrow batches.
Rows never funnel through the driver, so a fat backlog drains with
cluster parallelism — the r8 driver-side bottleneck is gone.  The
driver only reads footers (``latestOffset``).
``KafkaishStreamReader`` (a ``SimpleDataSourceStreamReader``, rows
through the driver — the reference's actual delivery model, one
cursor loop on one node) is kept for API parity/tests but is shadowed
by the partitioned reader at runtime.

Write path: ``df.write.format("kafkaish").mode("append")`` appends to
the log through the V2 two-phase commit (executors stage, the driver
commit assigns contiguous offsets after the tail — see the write-side
comment block), and ``writeStream.format("kafkaish")`` is a per-epoch
exactly-once sink (committed batchIds are markers, so checkpoint
retries cannot double-append) — together they make topic-to-topic
relays (`readStream` -> transform -> `writeStream`) a one-liner.

Offsets here are the ENGINE's message offsets reused as streaming
progress markers — one integer per topic, resume-exact.

SQL-surface caveat (verified on Spark 4.1.2): ``CREATE TABLE ... USING
kafkaish OPTIONS (path ..., topic ...)`` plans, but the catalog
integration hands the Python DataSource an EMPTY options dict at read
time, so SQL-defined tables cannot reach the log — a platform
limitation of the Python Data Source API, not of this connector.  For
SQL access, load through the DataFrame API and register a view (what
sources/typed.py's topic views do).
"""

from __future__ import annotations

import contextlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

ENVELOPE_DDL = "offset bigint, ts timestamp, event string, message string"


def _log_dir(options: dict) -> str:
    path = options.get("path")
    topic = options.get("topic")
    if not path or not topic:
        raise ValueError(
            "kafkaish source needs .option('path', <engine root>) and "
            ".option('topic', <name>)"
        )
    return os.path.join(path, topic, "log")


def _segment_files(log_dir: str) -> list[str]:
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"no such topic log: {log_dir}")
    out = []
    for root, _dirs, files in os.walk(log_dir):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith("_"):
                out.append(os.path.join(root, f))
    return out


def _footer_offset_range(
    file: str,
) -> tuple[int | None, int | None, bool]:
    """(min, max, complete) of the ``offset`` column from parquet
    footer stats — no data pages read.  The column index is resolved BY
    NAME from the footer schema (not assumed to be physically first): a
    segment written with a different column order would otherwise be
    silently mis-pruned.  ``complete`` is True only when EVERY row
    group carried min/max stats: partial stats are still returned (the
    max over the row groups that have them) so callers that need an
    upper bound can fall back to a data read instead of silently
    treating the file as empty — a segment with one statless row group
    must never make ``_tail()`` reuse live offsets."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(file).metadata
    if meta.num_rows == 0:
        return None, None, True
    idx = None
    for i in range(meta.num_columns):
        if meta.schema.column(i).name == "offset":
            idx = i
            break
    if idx is None:
        return None, None, False
    lo = hi = None
    complete = True
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            complete = False
            continue
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return lo, hi, complete


def _file_offset_max(file: str) -> int | None:
    """Exact max(offset) by reading ONLY the offset column — the
    fallback when footer stats are partial.  One column of one file,
    never the log.  A segment lacking the column entirely (one way
    ``complete=False`` arises) returns None; any OTHER read failure
    (transient I/O, corrupt data page) RAISES — this feeds the
    writer's tail computation, and silently dropping a live segment's
    offsets from max() would let the next append reuse live offsets
    (the duplicate-offset corruption the single-writer lock exists to
    prevent).  Loud beats wrong here."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(file).metadata
    if "offset" not in {
        meta.schema.column(i).name for i in range(meta.num_columns)
    }:
        return None
    tbl = pq.read_table(file, columns=["offset"])
    if tbl.num_rows == 0:
        return None
    return pc.max(tbl["offset"]).as_py()


class _SegmentPartition(InputPartition):
    def __init__(self, file: str):
        self.file = file


class KafkaishBatchReader(DataSourceReader):
    """File-per-partition batch reader with offset/event pushdown."""

    def __init__(self, options: dict):
        self.log_dir = _log_dir(options)
        # bounds are half-open/closed to mirror Topic.replay: since is
        # exclusive, until inclusive
        self.min_excl: int | None = None
        self.max_incl: int | None = None
        self.event: str | None = None

    def pushFilters(self, filters):  # noqa: N802 — API name
        for f in filters:
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)) and f.attribute == (
                "offset",
            ):
                lo = int(f.value) if isinstance(f, GreaterThan) else int(f.value) - 1
                self.min_excl = lo if self.min_excl is None else max(self.min_excl, lo)
            elif isinstance(f, (LessThan, LessThanOrEqual)) and f.attribute == (
                "offset",
            ):
                hi = int(f.value) - 1 if isinstance(f, LessThan) else int(f.value)
                self.max_incl = hi if self.max_incl is None else min(self.max_incl, hi)
            elif isinstance(f, EqualTo) and f.attribute == ("event",):
                self.event = str(f.value)
            else:
                yield f  # unsupported: Spark re-applies it

    def partitions(self):
        import pyarrow.parquet as pq

        parts = []
        prune = self.min_excl is not None or self.max_incl is not None
        for file in _segment_files(self.log_dir):
            # segment pruning on footer metadata — no data pages are
            # read for empty or out-of-range segments
            if pq.ParquetFile(file).metadata.num_rows == 0:
                continue  # the topic seed file / compacted-away segment
            if prune:
                # prune only on COMPLETE stats — partial bounds don't
                # cover the statless row groups, so the file stays in
                # and read()'s row filter does the work
                lo, hi, complete = _footer_offset_range(file)
                if lo is not None and complete:
                    if self.min_excl is not None and hi <= self.min_excl:
                        continue
                    if self.max_incl is not None and lo > self.max_incl:
                        continue
            parts.append(_SegmentPartition(file))
        # an empty topic still needs one (empty) partition so load()
        # returns a 0-row frame instead of failing planning
        return parts or [_SegmentPartition("")]

    def read(self, partition: _SegmentPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if not partition.file:
            return
        tbl = pq.read_table(
            partition.file, columns=["offset", "ts", "event", "message"]
        )
        mask = None

        def _and(m, cond):
            return cond if m is None else pc.and_(m, cond)

        if self.min_excl is not None:
            mask = _and(mask, pc.greater(tbl["offset"], self.min_excl))
        if self.max_incl is not None:
            mask = _and(mask, pc.less_equal(tbl["offset"], self.max_incl))
        if self.event is not None:
            mask = _and(mask, pc.equal(tbl["event"], self.event))
        if mask is not None:
            tbl = tbl.filter(mask)
        # normalize ts to micros-no-tz: Spark's Arrow bridge expects the
        # TimestampType batches timezone-naive
        ts = tbl["ts"]
        if pa.types.is_timestamp(ts.type) and (
            ts.type.tz is not None or ts.type.unit != "us"
        ):
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"),
                "ts",
                pc.cast(ts, pa.timestamp("us")),
            )
        for batch in tbl.to_batches():
            yield batch


class _RangePartition(InputPartition):
    def __init__(self, file: str, min_excl: int, max_incl: int):
        self.file = file
        self.min_excl = min_excl
        self.max_incl = max_incl


class KafkaishPartitionedStreamReader(DataSourceStreamReader):
    """Executor-parallel streaming reader — the scale path Spark picks
    when a full ``streamReader`` exists.  Each trigger covers the
    offset range (last committed tail, current tail]; ``partitions``
    maps that range onto the log segments overlapping it (footer-stats
    pruned, like the batch reader), and each partition is read on an
    EXECUTOR as Arrow batches — rows never funnel through the driver,
    so a fat backlog drains with cluster parallelism.  The simple
    reader below is kept for reference/tests but is shadowed by this
    one at runtime."""

    def __init__(self, options: dict):
        self.log_dir = _log_dir(options)
        self.replay = str(options.get("replay", "true")).lower() != "false"

    def _tail(self) -> int:
        tail = 0
        for file in _segment_files(self.log_dir):
            _lo, hi, complete = _footer_offset_range(file)
            if not complete:
                # partial footer stats: read the offset column for the
                # exact max — an under-reported tail would reuse live
                # offsets on the next append
                hi = _file_offset_max(file)
            if hi is not None:
                tail = max(tail, hi)
        return tail

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        return {"offset": 0 if self.replay else self._tail()}

    def latestOffset(self) -> dict:  # noqa: N802 — API name
        return {"offset": self._tail()}

    def partitions(self, start: dict, end: dict):
        import pyarrow.parquet as pq

        lo, hi = int(start["offset"]), int(end["offset"])
        parts = []
        for file in _segment_files(self.log_dir):
            if pq.ParquetFile(file).metadata.num_rows == 0:
                continue
            smin, smax, complete = _footer_offset_range(file)
            if complete and smin is not None and (smax <= lo or smin > hi):
                continue
            parts.append(_RangePartition(file, lo, hi))
        return parts  # an empty range legitimately plans zero partitions

    def read(self, partition: _RangePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            partition.file, columns=["offset", "ts", "event", "message"]
        )
        mask = pc.and_(
            pc.greater(tbl["offset"], partition.min_excl),
            pc.less_equal(tbl["offset"], partition.max_incl),
        )
        tbl = tbl.filter(mask)
        ts = tbl["ts"]
        if pa.types.is_timestamp(ts.type) and (
            ts.type.tz is not None or ts.type.unit != "us"
        ):
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"),
                "ts",
                pc.cast(ts, pa.timestamp("us")),
            )
        for batch in tbl.to_batches():
            yield batch

    def commit(self, end: dict) -> None:
        pass  # durable progress lives in the streaming checkpoint


class KafkaishStreamReader(SimpleDataSourceStreamReader):
    """Tailable-cursor analog over the official streaming API: the
    stream offset IS the topic's publish offset."""

    def __init__(self, options: dict):
        self.options = options
        self.log_dir = _log_dir(options)
        # replay=true (default) starts from the beginning like the
        # reference's replay:true subscriptions; replay=false starts at
        # the tail observed at first trigger (live-only)
        self.replay = str(options.get("replay", "true")).lower() != "false"

    def _scan(self, min_excl: int, max_incl: int | None):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        rows: list[tuple] = []
        tail = min_excl
        for file in _segment_files(self.log_dir):
            tbl = pq.read_table(
                file, columns=["offset", "ts", "event", "message"]
            )
            if tbl.num_rows == 0:
                continue
            tail = max(tail, pc.max(tbl["offset"]).as_py() or 0)
            mask = pc.greater(tbl["offset"], min_excl)
            if max_incl is not None:
                mask = pc.and_(mask, pc.less_equal(tbl["offset"], max_incl))
            tbl = tbl.filter(mask)
            rows.extend(
                zip(
                    tbl["offset"].to_pylist(),
                    tbl["ts"].to_pylist(),
                    tbl["event"].to_pylist(),
                    tbl["message"].to_pylist(),
                )
            )
        rows.sort(key=lambda r: r[0])
        return rows, tail

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        if self.replay:
            return {"offset": 0}
        _rows, tail = self._scan(0, None)
        return {"offset": tail}

    def read(self, start: dict):
        rows, tail = self._scan(int(start["offset"]), None)
        return iter(rows), {"offset": max(tail, int(start["offset"]))}

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        rows, _tail = self._scan(int(start["offset"]), int(end["offset"]))
        return iter(rows)

    def commit(self, end: dict) -> None:
        # progress is durable in the streaming checkpoint; the log
        # itself keeps every message (retention is the topic's policy)
        pass


# ---------------------------------------------------------------- write side
#
# ``df.write.format("kafkaish")`` appends (event, message[, ts]) rows
# to the topic log with the V2 two-phase commit protocol doing what the
# reference's publish callback does (ack = durable write,
# src/topic.js:25-40), but transactionally:
#
#   executors  -> stage their partitions as parquet files (no offsets
#                 yet — offset assignment needs the global tail);
#   driver     -> commit() orders the staged files by partition id,
#                 assigns contiguous offsets after the current tail,
#                 rewrites each staged file as a proper log segment
#                 (per-file streaming, never whole-batch memory), and
#                 only then makes them visible; abort() deletes staging.
#
# A failed/speculative task's orphan stage file is ignored: commit only
# touches files named in the tasks' commit messages.  The streaming
# sink adds per-epoch idempotence: a committed batchId is recorded in a
# marker file, so Structured Streaming retries cannot double-append —
# the exactly-once contract the reference cannot offer.
# Single-writer per topic, like publish_df.


class _StagedFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int, pid: int):
        self.path = path
        self.rows = rows
        self.pid = pid


def _arrow_envelope_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("offset", pa.int64(), nullable=False),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
            pa.field("event", pa.string()),
            pa.field("message", pa.string()),
        ]
    )


class KafkaishBatchWriter(DataSourceArrowWriter):
    def __init__(self, options: dict, overwrite: bool):
        if overwrite:
            raise ValueError(
                "kafkaish topics are append-only logs; use mode('append')"
            )
        self.log_dir = _log_dir(options)
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"no such topic log: {self.log_dir}")
        if any(
            e.startswith("pub_date=") for e in os.listdir(self.log_dir)
        ):
            # flat segment files inside a hive-partitioned layout make
            # the JVM reader fail with conflicting directory structures
            raise ValueError(
                "kafkaish sink does not support date-partitioned topics; "
                "publish through Topic.publish_df instead"
            )
        import uuid

        self.stage_dir = os.path.join(
            os.path.dirname(self.log_dir), "_staging", uuid.uuid4().hex
        )

    # -- executors -----------------------------------------------------
    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.stage_dir, exist_ok=True)
        path = os.path.join(
            self.stage_dir, f"stage-{pid:05d}-{uuid.uuid4().hex}.parquet"
        )
        batches = [b for b in iterator if b.num_rows]
        n = sum(b.num_rows for b in batches)
        if n:
            tbl = pa.Table.from_batches(batches)
            names = set(tbl.schema.names)
            if not {"event", "message"} <= names:
                raise ValueError(
                    "kafkaish sink needs (event string, message string"
                    f"[, ts timestamp]) columns, got {sorted(names)}"
                )
            pq.write_table(tbl, path)
        return _StagedFile(path, n, pid)

    # -- driver --------------------------------------------------------
    def _tail(self) -> int:
        tail = 0
        for file in _segment_files(self.log_dir):
            _lo, hi, complete = _footer_offset_range(file)
            if not complete:
                hi = _file_offset_max(file)  # exact max, offset column only
            if hi is not None:
                tail = max(tail, hi)
        return tail

    def _finalize_staged(
        self, staged: list, out_dir: str, tag: str
    ) -> list[str]:
        """Rewrite the tasks' staged files as final log segments in
        ``out_dir``: contiguous offsets assigned after the current
        tail, envelope schema enforced, one output file per non-empty
        stage file (streamed — never whole-batch memory).  File names
        are DETERMINISTIC in (tag, sequence) so a crashed-and-retried
        finalize overwrites its own partial output instead of
        orphaning it.  Returns the written file names in order."""
        import datetime

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        offset = self._tail()
        now = datetime.datetime.now(datetime.timezone.utc)
        schema = _arrow_envelope_schema()
        names: list[str] = []
        for m in sorted(staged, key=lambda m: m.pid):
            if not m.rows:
                continue
            tbl = pq.read_table(m.path)
            offsets = pa.array(
                range(offset + 1, offset + 1 + m.rows), pa.int64()
            )
            offset += m.rows
            if "ts" in tbl.schema.names:
                ts = pc.cast(tbl["ts"], pa.timestamp("us", tz="UTC"))
            else:
                ts = pa.array([now] * m.rows, pa.timestamp("us", tz="UTC"))
            out = pa.Table.from_arrays(
                [
                    offsets,
                    ts,
                    pc.cast(tbl["event"], pa.string()),
                    pc.cast(tbl["message"], pa.string()),
                ],
                schema=schema,
            )
            name = f"part-{tag}-{len(names):05d}.parquet"
            pq.write_table(out, os.path.join(out_dir, name))
            names.append(name)
        return names

    def _publish_staged(self, staged: list) -> None:
        import uuid

        self._finalize_staged(staged, self.log_dir, f"w{uuid.uuid4().hex}")

    def _cleanup(self) -> None:
        import shutil

        shutil.rmtree(self.stage_dir, ignore_errors=True)

    def commit(self, messages):
        from kafkaish_spark.sources.topic_log import writer_lock

        try:
            # offset assignment reads the tail: single-writer guard,
            # same lock Topic.publish_df takes
            with writer_lock(
                os.path.dirname(self.log_dir), what="dsv2 append"
            ):
                self._publish_staged([m for m in messages if m is not None])
        finally:
            self._cleanup()

    def abort(self, messages):
        self._cleanup()


class KafkaishStreamWriter(DataSourceStreamArrowWriter, KafkaishBatchWriter):
    """Per-epoch exactly-once streaming sink, journaled and namespaced.

    Two failure modes the naive marker-per-batchId design had (round-4
    advice) are closed here:

    1. **Cross-run marker collisions.** batchIds restart at 0 for every
       new checkpoint, so a topic-global marker dir would silently drop
       epoch 0 of the next query writing to the same topic.  Markers
       now live under a namespace derived from the query's
       ``checkpointLocation`` (the stable per-run identity Structured
       Streaming already guarantees) — same checkpoint = same namespace
       (recovery still dedups), fresh checkpoint = fresh namespace.
    2. **Non-atomic commit.** The epoch's rows are first finalized
       (offsets assigned) into a prepared dir INSIDE the namespace,
       then a ``committing`` journal listing the renames is written
       atomically, then the renames run, then the journal flips to
       ``committed`` — the stage/commit/roll-forward protocol of
       sources/transactions.py.  A crash mid-publish leaves the
       journal, so the checkpoint retry FINISHES the old publish
       (ignoring its own freshly staged twin files) instead of
       re-appending the whole batch.

    Markers older than ``_RETAIN`` epochs are pruned after each commit,
    and namespaces of dead runs are garbage-collected on writer init
    once untouched for ``_DEAD_RUN_SECS`` (Spark retains at most
    ``spark.sql.streaming.minBatchesToRetain`` = 100 batches, so no
    retry can reach further back)."""

    _RETAIN = 200
    _DEAD_RUN_SECS = 7 * 24 * 3600

    def __init__(self, options: dict, overwrite: bool):
        import hashlib

        KafkaishBatchWriter.__init__(self, options, overwrite)
        opts = {str(k).lower(): v for k, v in options.items()}
        ident = opts.get("checkpointlocation") or opts.get("writerid")
        if not ident:
            raise ValueError(
                "kafkaish streaming sink needs a stable per-run identity "
                "for its exactly-once epoch markers: set "
                ".option('checkpointLocation', <dir>) (or a custom "
                ".option('writerId', <id>))"
            )
        self._run = hashlib.sha256(str(ident).encode()).hexdigest()[:16]
        self._epochs_root = os.path.join(
            os.path.dirname(self.log_dir), "_staging", "_epochs"
        )
        self.marker_dir = os.path.join(self._epochs_root, self._run)
        self._gc_dead_runs()

    # the stream ABC re-declares write as abstract AHEAD of the batch
    # implementation in the MRO; bind the concrete one explicitly
    write = KafkaishBatchWriter.write

    # -- marker/journal helpers -----------------------------------------
    def _read_marker(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _write_marker(self, path: str, doc: dict) -> None:
        os.makedirs(self.marker_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, path)

    def _gc_dead_runs(self) -> None:
        import shutil
        import time

        cutoff = time.time() - self._DEAD_RUN_SECS
        # dead run namespaces AND orphaned stage dirs from crashed
        # attempts (write() ran, commit never did)
        staging_root = os.path.dirname(self._epochs_root)
        for root in (self._epochs_root, staging_root):
            if not os.path.isdir(root):
                continue
            for entry in os.listdir(root):
                d = os.path.join(root, entry)
                if (
                    d in (self.marker_dir, self._epochs_root, self.stage_dir)
                    or not os.path.isdir(d)
                ):
                    continue
                try:
                    newest = max(
                        (e.stat().st_mtime for e in os.scandir(d)),
                        default=os.stat(d).st_mtime,
                    )
                    if newest < cutoff:
                        shutil.rmtree(d, ignore_errors=True)
                except OSError:
                    continue  # concurrent writer; its run, its GC

    def _gc_markers(self, batch_id: int) -> None:
        if not os.path.isdir(self.marker_dir):
            return
        for f in os.listdir(self.marker_dir):
            if f.endswith(".json"):
                stem = f[:-5]
                if stem.isdigit() and int(stem) < batch_id - self._RETAIN:
                    try:
                        os.remove(os.path.join(self.marker_dir, f))
                    except OSError:
                        pass

    # -- commit protocol -------------------------------------------------
    def commit(self, messages, batchId):  # noqa: N803 — API name
        import shutil

        from kafkaish_spark.sources.topic_log import writer_lock

        marker = os.path.join(self.marker_dir, f"{batchId}.json")
        prep = os.path.join(self.marker_dir, f"prep-{batchId}")
        with writer_lock(
            os.path.dirname(self.log_dir), what="dsv2 stream epoch"
        ), contextlib.ExitStack() as cleanup:
            cleanup.callback(self._cleanup)
            doc = self._read_marker(marker)
            if doc is None:
                # fresh attempt: finalize into the prepared dir, then
                # journal the renames (the commit point)
                staged = [m for m in messages if m is not None]
                os.makedirs(prep, exist_ok=True)
                # run hash in the segment name: deterministic within a
                # run (idempotent retry) but collision-free across runs
                # writing to the same topic
                names = self._finalize_staged(
                    staged, prep, f"s{self._run}-b{batchId}"
                )
                doc = {
                    "state": "committing",
                    "names": names,
                    "prep": prep,
                    "rows": sum(m.rows for m in staged),
                }
                self._write_marker(marker, doc)
            if doc["state"] == "committing":
                # roll forward (first attempt and crash-retry alike):
                # deterministic names make this idempotent
                for name in doc["names"]:
                    src = os.path.join(doc["prep"], name)
                    dst = os.path.join(self.log_dir, name)
                    if os.path.exists(src) and not os.path.exists(dst):
                        os.replace(src, dst)
                shutil.rmtree(doc["prep"], ignore_errors=True)
                self._write_marker(
                    marker, {"state": "committed", "rows": doc["rows"]}
                )
            # else: already committed — the retry is a no-op
            self._gc_markers(int(batchId))

    def abort(self, messages, batchId):  # noqa: N803 — API name
        self._cleanup()


class KafkaishDataSource(DataSource):
    """The registrable source class (``spark.dataSource.register``)."""

    @classmethod
    def name(cls) -> str:
        return "kafkaish"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema) -> KafkaishBatchReader:
        return KafkaishBatchReader(self.options)

    def streamReader(self, schema) -> KafkaishPartitionedStreamReader:  # noqa: N802
        return KafkaishPartitionedStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> KafkaishBatchWriter:
        return KafkaishBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):  # noqa: N802
        return KafkaishStreamWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration of BOTH topic-log formats on a session:
    'kafkaish' (engine-level: path=engine root + topic name, pushed
    filters, executor-parallel streaming, write side — this module)
    and 'kafkaish_topic' (log-directory-level reader, sources/
    pyds_topic.py).  Also enables Python-data-source filter pushdown
    (runtime-settable SQL conf, off by default in 4.1) — without it
    Spark refuses any reader that implements pushFilters."""
    from kafkaish_spark.sources.pyds_topic import KafkaishTopicDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KafkaishDataSource)
    spark.dataSource.register(KafkaishTopicDataSource)


# ---------------------------------------------------------------- oracle query
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.plans.registry import query  # noqa: E402
from kafkaish_spark.sources.tables import load_table as t  # noqa: E402

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# Topic roots whose pyds fixture was fingerprint-validated this process
# (inputs are immutable within a process — same discipline as
# operators/cdc._VALIDATED_LOGS, optimization r12): the count+fingerprint
# self-heal probes are two eager aggregation jobs per call, pure
# plan-build overhead on every repeat invocation.
_VALIDATED_LOGS: set[str] = set()


@query(
    "q_pyds_topic_scan",
    oracle="""
    SELECT lang AS event,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
    FROM documents GROUP BY lang
    """,
    bench=True,  # the connector-scan nightly path (r4 verdict item 5);
    # min-of-2 reports the steady state (topic already materialized)
)
def q_pyds_topic_scan(spark: SparkSession, sf: str) -> DataFrame:
    """documents -> published into a real topic log (event = lang,
    message = JSON payload) -> read back through the PYTHON DATA SOURCE
    (``format('kafkaish')``) -> per-event fingerprint vs the
    parquet-native oracle.  Proves the whole connector chain: publish
    offset assignment, segment listing, Arrow-batch reads, and JSON
    payload extraction — any dropped/duplicated/corrupted message moves
    a sum.

    The topic is materialized once per sf under the repo warehouse and
    reused (publish is idempotent by count + content-fingerprint check
    — rebuild on mismatch, the rollup self-heal pattern; the
    fingerprint catches regenerated testdata with the same row count
    but different contents, which a bare count check would silently
    reuse)."""
    from kafkaish_spark.sources.topic_log import Engine

    d = t(spark, sf, "documents")
    root = os.path.join(
        _REPO_ROOT, "spark-warehouse", "_pyds",
        os.path.basename(sf.rstrip("/")) or "default",
    )
    eng = Engine(spark, root)
    topic = eng.prepare_topic("docs")
    # Validate once per (root, process): testdata cannot change within a
    # session, so repeat calls (bench min-of-N, driver sweeps) go straight
    # to the measured connector scan (optimization r12, guide §1.2).
    if root not in _VALIDATED_LOGS:
        n_docs, fp_docs = d.agg(
            F.count(F.lit(1)), F.sum("doc_id").cast("long")
        ).first()

        def _topic_fp() -> tuple[int, int | None]:
            row = topic.replay(since=0).agg(
                F.count(F.lit(1)),
                F.sum(F.get_json_object("message", "$.doc_id").cast("long")),
            ).first()
            return row[0], row[1]

        if topic.latest() != n_docs or _topic_fp() != (n_docs, fp_docs):
            if topic.latest():  # stale topic from older testdata: rebuild
                import shutil

                shutil.rmtree(os.path.join(root, "docs"))
                eng = Engine(spark, root)
                topic = eng.prepare_topic("docs")
            topic.publish_df(
                d.select(
                    F.col("lang").alias("event"),
                    F.to_json(F.struct("doc_id", "n_chars")).alias("message"),
                )
            )
        _VALIDATED_LOGS.add(root)
    register(spark)
    back = (
        spark.read.format("kafkaish")
        .option("path", root)
        .option("topic", "docs")
        .load()
    )
    return back.groupBy("event").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.sum(F.get_json_object("message", "$.doc_id").cast("long"))
        .cast("long")
        .alias("sum_doc_id"),
        F.sum(F.get_json_object("message", "$.n_chars").cast("long"))
        .cast("long")
        .alias("sum_n_chars"),
    )
