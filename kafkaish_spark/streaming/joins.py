"""Stream-stream joins over topic logs.

A kafkaish user correlating two topics (e.g. every 'purchase' with the
'click' that preceded it) would buffer state by hand in subscriber
callbacks.  Structured Streaming does it natively: both sides are
watermarked, the join condition carries a time bound, and the state
store holds only rows young enough to still find a partner — bounded
state at unbounded stream length, sharded by the join key across
executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on ``key`` where the right
    row happened in [left_ts - max_delay, left_ts].

    Columns come out prefixed ``l_`` / ``r_``.  The watermark bounds
    how long unmatched rows wait in state (and therefore how late a
    partner may arrive) — the knob between completeness and state size.
    """
    l = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    if l.isStreaming:
        l = l.withWatermark(f"l_{left_ts}", watermark)
    if r.isStreaming:
        r = r.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") <= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            >= F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {max_delay}")
        )
    )
    return l.join(r, cond, how)


def enrich(
    stream: DataFrame,
    dim: DataFrame,
    key,
    *,
    how: str = "left",
    hint: str = "broadcast",
) -> DataFrame:
    """Stream-static enrichment: join a (streaming) topic frame against
    a static dimension table — the lookup-table pattern every event
    pipeline needs (order events x customer dim, doc stream x source
    metadata).

    The static side is re-read per micro-batch by Structured Streaming
    (so slowly-changing dimensions pick up updates without restarting
    the query) and hinted ``broadcast`` by default: at 1000 executors
    the dimension ships once per batch and the stream side never
    shuffles — a stateless join, unlike stream-stream, so no watermark
    is needed."""
    return stream.join(dim.hint(hint), key, how)
