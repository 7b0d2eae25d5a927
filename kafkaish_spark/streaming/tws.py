"""Spark 4 ``transformWithState`` kernels — the new-generation
arbitrary-state API over topic streams.

``applyInPandasWithState`` (streaming/stateful.py) carries ONE opaque
state tuple per key.  ``transformWithStateInPandas`` replaces it with
a typed state STORE per key — named ValueState / ListState / MapState
variables, per-state TTLs, event-driven timers, and RocksDB as the
backing provider — which is exactly the shape a per-subscriber
bookkeeping kernel wants: counters per event type, not one blob.

The kernel here is the composite the old API cannot express cleanly:
per user, a MapState of per-event-type counts PLUS a ValueState of
running cents totals, updated per micro-batch, emitted in update mode.
State is sharded by key across executors; at 100 TB of events the
state store scales with ACTIVE keys (RocksDB spills cold keys to
disk), never with stream length.

The reference has no stateful processing at all — subscriber callbacks
hold ad-hoc in-process state that dies with the process
(/root/reference/src/topic.js:90-117); checkpointed typed state is the
durable replacement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

# transformWithState's driver<->JVM control protocol is protobuf-based
# (pyspark.sql.streaming.proto); without the google.protobuf package
# every query crashes at pre-init.  Same environment-gate pattern as
# the Avro jar and PIL: the kernel below is real code, the pytest
# skips with the bootstrap when the package is absent.
try:  # pragma: no cover - environment-dependent
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:
    HAS_TWS = False

TWS_BOOTSTRAP = (
    "pip install protobuf   # lights up transformWithState "
    "(streaming/tws.py) — Spark's new typed-state streaming API"
)
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("user_total_cents", LongType()),
    ]
)


class PerTypeCounts(StatefulProcessor):
    """Per-user typed state: MapState event_type -> count, ValueState
    running cents total.  Each batch emits the updated (user,
    event_type) counter rows for the types TOUCHED in that batch,
    each carrying the user's current total — the per-subscriber
    bookkeeping view a billing/quota consumer keeps."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n bigint"
        )
        self._cents = handle.getValueState("cents", "total bigint")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        total = self._cents.get()[0] if self._cents.exists() else 0
        touched: dict[str, int] = {}
        for pdf in rows:
            total += int(pdf["value"].mul(100).round().sum())
            for et, n in pdf.groupby("event_type").size().items():
                touched[et] = touched.get(et, 0) + int(n)
        for et, add in touched.items():
            have = (
                self._counts.getValue((et,))[0]
                if self._counts.containsKey((et,))
                else 0
            )
            self._counts.updateValue((et,), (have + add,))
        self._cents.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(touched),
                "event_type": list(touched),
                "n": [self._counts.getValue((et,))[0] for et in touched],
                "user_total_cents": [total] * len(touched),
            }
        )

    def close(self) -> None:
        pass


def per_type_counts(stream: DataFrame) -> DataFrame:
    """Apply the typed-state kernel to a (streaming or restarted)
    events frame with (user_id, event_type, value) columns.  Requires
    the RocksDB state store provider (set by ``enable_tws`` below) —
    transformWithState's state layout is RocksDB-only."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        PerTypeCounts(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def enable_tws(spark) -> str:
    """Switch the session's state store provider to RocksDB (required
    by transformWithState; runtime-settable, applies to queries started
    afterwards).  Returns the previous provider so callers can
    restore it."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return prev
