"""Idempotent producer over the topic log — the Kafka
``enable.idempotence`` analog: each producer names itself and numbers
its batches; a retried batch number is suppressed instead of appended.

The reference's publish has no producer identity at all — a client
that times out and retries appends twice (src/topic.js:25-40 acks only
on the insert callback).  ``Topic.publish_df(dedup=True)`` already
dedups by PAYLOAD (content anti-join); this module adds the cheaper
and more precise SEQUENCE dedup: O(1) metadata check per batch, no log
scan, and two genuinely identical payload batches (a legal re-send of
the same data as a NEW batch) still both land.

Protocol (single-writer per topic, like every publish path here):

- per-producer state file ``<topic>/_producers/<producer_id>.json``
  holding the highest committed sequence number;
- ``seq <= recorded``  -> duplicate retry, SKIPPED (returns the
  recorded seq so the caller can resynchronize);
- ``seq == recorded+1`` -> publish, then atomically advance the state
  file (write-then-rename);
- anything else -> raise (the OutOfOrderSequenceException analog: a
  gap means a lost batch, which silent acceptance would hide).

Crash window: between the publish landing and the state-file rename,
a crash leaves the log ahead of the state; the producer's RETRY of the
same seq would then double-append.  Callers needing that last inch of
exactly-once publish through ``sources.transactions.publish_transaction``
(journaled) or ``publish_df(dedup=True)`` (content-keyed); the
sequence check is the cheap first line that handles the common
timeout-retry case with zero data reads.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _state_path(topic, producer_id: str) -> str:
    pdir = os.path.join(topic.root, "_producers")
    os.makedirs(pdir, exist_ok=True)
    if not producer_id.replace("-", "").replace("_", "").isalnum():
        raise ValueError(f"invalid producer_id {producer_id!r}")
    return os.path.join(pdir, f"{producer_id}.json")


def last_seq(topic, producer_id: str) -> int:
    """Highest committed sequence for this producer (0 = none)."""
    path = _state_path(topic, producer_id)
    try:
        with open(path) as f:
            return int(json.load(f)["seq"])
    except (OSError, ValueError, KeyError):
        return 0


def publish_idempotent(
    topic, df: DataFrame, producer_id: str, seq: int
) -> dict:
    """Publish ``df`` as batch number ``seq`` of ``producer_id``.
    Returns {"published": n, "skipped": bool, "seq": committed_seq}.
    A duplicate ``seq`` is a no-op; a sequence gap raises."""
    recorded = last_seq(topic, producer_id)
    if seq <= recorded:
        return {"published": 0, "skipped": True, "seq": recorded}
    if seq != recorded + 1:
        raise ValueError(
            f"sequence gap for producer {producer_id!r}: have {recorded}, "
            f"got {seq} (a lost batch must fail loudly, not re-number)"
        )
    before = topic.latest()
    topic.publish_df(df)
    published = topic.latest() - before
    path = _state_path(topic, producer_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"seq": seq, "rows": published}, f)
    os.replace(tmp, path)
    return {"published": published, "skipped": False, "seq": seq}


# ---------------------------------------------------------------- oracle query
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafkaish_spark.plans.registry import query  # noqa: E402
from kafkaish_spark.sources.tables import load_table as t  # noqa: E402

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


@query(
    "q_log_idempotent_producer",
    oracle="""
    SELECT lang AS event,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents GROUP BY lang
    """,
)
def q_log_idempotent_producer(spark: SparkSession, sf: str) -> DataFrame:
    """The idempotent-producer contract checked AS DATA: documents are
    published in two halves (seq 1, seq 2), with seq 1 RETRIED in
    between — the retry must be suppressed, so the topic holds every
    doc exactly once and the per-lang fingerprint equals the oracle's
    direct computation.  A double-append or a dropped half moves a
    count or a sum."""
    from kafkaish_spark.sources.topic_log import Engine

    d = t(spark, sf, "documents")
    n_docs, fp_docs = d.agg(
        F.count(F.lit(1)), F.sum("doc_id").cast("long")
    ).first()
    root = os.path.join(
        _REPO_ROOT, "spark-warehouse", "_idem",
        os.path.basename(sf.rstrip("/")) or "default",
    )
    eng = Engine(spark, root)
    topic = eng.prepare_topic("docs_idem")

    def _topic_fp():
        row = topic.replay(since=0).agg(
            F.count(F.lit(1)),
            F.sum(F.get_json_object("message", "$.doc_id").cast("long")),
        ).first()
        return row[0], row[1]

    if topic.latest() != n_docs or _topic_fp() != (n_docs, fp_docs):
        if topic.latest():  # stale topic from regenerated testdata
            import shutil

            shutil.rmtree(os.path.join(root, "docs_idem"))
            eng = Engine(spark, root)
            topic = eng.prepare_topic("docs_idem")
        payload = d.select(
            F.col("lang").alias("event"),
            F.to_json(F.struct("doc_id")).alias("message"),
            (F.col("doc_id") % 2).alias("half"),
        )
        first = payload.filter(F.col("half") == 0).drop("half")
        second = payload.filter(F.col("half") == 1).drop("half")
        r1 = publish_idempotent(topic, first, "loader", 1)
        assert not r1["skipped"]
        r1b = publish_idempotent(topic, first, "loader", 1)  # timeout retry
        assert r1b["skipped"] and r1b["published"] == 0
        r2 = publish_idempotent(topic, second, "loader", 2)
        assert not r2["skipped"]
    back = topic.replay(since=0)
    return back.groupBy("event").agg(
        F.count(F.lit(1)).cast("long").alias("n_msgs"),
        F.sum(F.get_json_object("message", "$.doc_id").cast("long"))
        .cast("long")
        .alias("sum_doc_id"),
    )
