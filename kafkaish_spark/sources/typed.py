"""Typed topics: a schema-registry + dead-letter-queue layer over the
schemaless message log.

The reference publishes arbitrary JSON with no contract
(src/topic.js:25-40) — fine for 10 messages, fatal at 100 TB, where a
producer that silently changes a field type poisons every consumer
downstream.  Kafka ecosystems solve this with a Schema Registry
(schema per subject, compatibility-checked evolution) and a
dead-letter queue for non-conforming records.  This module is that
layer, Spark-native:

- **Registry**: one DDL schema per (topic, event), stored as JSON
  under ``<topic>/_schema/`` with a version history.  Registration
  enforces BACKWARD compatibility by default — a new version may add
  nullable fields or widen them, but never drop or retype a field a
  reader of old data relies on.
- **Schema-on-write**: ``publish_typed`` validates rows against the
  registered schema IN the publish job (a ``from_json`` round-trip —
  JVM expressions, no Python loop).  Non-conforming rows either fail
  the publish (``on_invalid='error'``) or route to the topic's
  ``<name>.dlq`` sibling with the reason attached
  (``on_invalid='dlq'``) — the all-or-something ingest contract.
- **Schema-on-read**: ``read_typed`` replays an event's messages and
  projects the JSON into COLUMNS with the registered schema — the
  topic becomes a typed table (filters on payload fields work, and at
  scale Catalyst prunes the json path evaluation to referenced
  fields).

Validation predicate: a row conforms iff its message parses under
FAILFAST-equivalent rules (``from_json`` yields non-null) AND every
non-nullable registry field is present and non-null.  Extra payload
fields are allowed (open-content model, like registry JSON schemas).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kafkaish_spark.sources.topic_log import Topic


class SchemaViolation(ValueError):
    """Raised on incompatible registration or failed validation."""


# ---------------------------------------------------------------- registry


def _schema_dir(topic: Topic) -> str:
    return os.path.join(topic.root, "_schema")


def _schema_path(topic: Topic, event: str) -> str:
    return os.path.join(_schema_dir(topic), f"{event}.json")


def get_schema(topic: Topic, event: str) -> str | None:
    """Latest registered DDL for (topic, event), or None."""
    path = _schema_path(topic, event)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["versions"][-1]["ddl"]


def schema_history(topic: Topic, event: str) -> list[dict]:
    path = _schema_path(topic, event)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["versions"]


def _backward_compatible(old: StructType, new: StructType) -> str | None:
    """None if ``new`` can read data written under ``old``; else the
    first violation.  Backward rules: every old field must survive
    with the same type; brand-new fields must be nullable (old data
    has no value for them)."""
    new_by_name = {f.name: f for f in new.fields}
    for f in old.fields:
        g = new_by_name.get(f.name)
        if g is None:
            return f"field {f.name!r} was dropped"
        if g.dataType != f.dataType:
            return (
                f"field {f.name!r} retyped "
                f"{f.dataType.simpleString()} -> {g.dataType.simpleString()}"
            )
        if f.nullable and not g.nullable:
            return (
                f"field {f.name!r} tightened to NOT NULL "
                "(old data may hold nulls)"
            )
    old_names = {f.name for f in old.fields}
    for g in new.fields:
        if g.name not in old_names and not g.nullable:
            return f"new field {g.name!r} must be nullable"
    return None


def register_schema(
    topic: Topic, event: str, ddl: str, check_compat: bool = True
) -> int:
    """Register (or evolve) the schema for ``event`` on ``topic``.
    Returns the new version number.  Raises SchemaViolation when the
    evolution is not backward compatible (unless check_compat=False —
    the registry equivalent of compatibility mode NONE)."""
    new_struct = StructType.fromDDL(ddl)  # also validates the DDL
    path = _schema_path(topic, event)
    versions: list[dict] = schema_history(topic, event)
    if versions:
        if versions[-1]["ddl"] == ddl:
            return versions[-1]["version"]  # idempotent re-register
        if check_compat:
            old_struct = StructType.fromDDL(versions[-1]["ddl"])
            why = _backward_compatible(old_struct, new_struct)
            if why is not None:
                raise SchemaViolation(
                    f"incompatible schema for {topic.name}/{event}: {why}"
                )
    versions.append(
        {
            "version": len(versions) + 1,
            "ddl": ddl,
            "registered_at": time.time(),
        }
    )
    os.makedirs(_schema_dir(topic), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"event": event, "versions": versions}, f, indent=1)
    os.replace(tmp, path)
    return len(versions)


# ---------------------------------------------------------------- validation


def _conforms(message_col, ddl: str):
    """Boolean column: does the JSON message conform to ``ddl``?  The
    parse and the required-field probes are all JVM json expressions —
    validation costs one pass over the payload column, no UDF."""
    parsed = F.from_json(message_col, ddl)
    ok = parsed.isNotNull()
    for f in StructType.fromDDL(ddl).fields:
        if not f.nullable:
            ok = ok & parsed.getField(f.name).isNotNull()
    return ok


def validate_df(df: DataFrame, event: str, ddl: str) -> DataFrame:
    """Tag ``df`` (event, message, ...) with ``_conforms`` for rows of
    ``event`` (other events pass through untagged/true)."""
    return df.withColumn(
        "_conforms",
        F.when(F.col("event") == event, _conforms(F.col("message"), ddl))
        .otherwise(F.lit(True)),
    )


# ---------------------------------------------------------------- publish/read


def publish_typed(
    topic: Topic,
    df: DataFrame,
    on_invalid: str = "error",
) -> dict:
    """Schema-on-write publish: every row whose event has a registered
    schema must conform.  ``on_invalid='error'`` -> SchemaViolation
    (nothing published); ``'dlq'`` -> non-conforming rows are published
    to ``<topic>.dlq`` with a ``reason`` wrapper and the conforming
    remainder proceeds.  Events with no registered schema pass through
    (contract applies where declared — register a schema to enforce).

    Returns {'published': n, 'dlq': n}.  The validation predicate runs
    inside the same Spark jobs that publish — one extra column, no
    extra pass."""
    if on_invalid not in ("error", "dlq"):
        raise ValueError("on_invalid must be 'error' or 'dlq'")
    checked = df
    events = [
        os.path.splitext(f)[0]
        for f in (
            os.listdir(_schema_dir(topic))
            if os.path.isdir(_schema_dir(topic))
            else []
        )
        if f.endswith(".json")
    ]
    cond = F.lit(True)
    for event in events:
        ddl = get_schema(topic, event)
        cond = cond & F.when(
            F.col("event") == event, _conforms(F.col("message"), ddl)
        ).otherwise(F.lit(True))
    checked = df.withColumn("_conforms", cond)
    checked = checked.persist()
    try:
        n_bad = checked.filter(~F.col("_conforms")).count()
        if n_bad and on_invalid == "error":
            raise SchemaViolation(
                f"{n_bad} rows violate registered schemas on "
                f"{topic.name!r} (on_invalid='error': nothing published)"
            )
        n_pub = 0
        good = checked.filter(F.col("_conforms")).drop("_conforms")
        if not good.isEmpty():
            n_pub = topic.publish_df(good).count()
        if n_bad:
            dlq = Topic(
                topic.spark,
                os.path.dirname(topic.root),
                f"{topic.name}.dlq",
            )
            bad = checked.filter(~F.col("_conforms")).select(
                F.col("event"),
                F.to_json(
                    F.struct(
                        F.lit("schema_violation").alias("reason"),
                        F.col("message").alias("original"),
                    )
                ).alias("message"),
                *(["ts"] if "ts" in checked.columns else []),
            )
            dlq.publish_df(bad)
        return {"published": n_pub, "dlq": n_bad}
    finally:
        checked.unpersist()


def read_typed(topic: Topic, event: str, since: int = 0) -> DataFrame:
    """Schema-on-read: replay ``event`` messages and project the JSON
    payload into typed COLUMNS per the registered schema — envelope
    columns (offset, ts) kept, ``message`` replaced by its fields."""
    ddl = get_schema(topic, event)
    if ddl is None:
        raise SchemaViolation(
            f"no schema registered for {topic.name}/{event}"
        )
    rows = topic.replay(since=since, event=event)
    parsed = rows.withColumn("_payload", F.from_json("message", ddl))
    return parsed.select(
        "offset",
        "ts",
        "event",
        *[
            F.col(f"_payload.{f.name}").alias(f.name)
            for f in StructType.fromDDL(ddl).fields
        ],
    )


def stream_typed(topic: Topic, event: str, **stream_kwargs) -> DataFrame:
    """Streaming schema-on-read: the live tail of ``event`` messages
    projected into typed columns under the registered schema — the
    streaming twin of ``read_typed``.  Feed it to any writeStream
    (windowed aggregates on payload FIELDS now work: the topic behaves
    like a streaming table).  Late schema evolution is safe for the
    same reason the batch path is: BACKWARD compatibility means the
    registered schema always reads older payloads (new fields null).
    """
    ddl = get_schema(topic, event)
    if ddl is None:
        raise SchemaViolation(
            f"no schema registered for {topic.name}/{event}"
        )
    s = topic.stream(event=event, **stream_kwargs)
    parsed = s.withColumn("_payload", F.from_json("message", ddl))
    return parsed.select(
        "offset",
        "ts",
        "event",
        *[
            F.col(f"_payload.{f.name}").alias(f.name)
            for f in StructType.fromDDL(ddl).fields
        ],
    )


def create_typed_view(topic: Topic, event: str, view_name: str) -> None:
    """Register ``read_typed(topic, event)`` as a temp view so the SQL
    surface sees the topic as a TABLE:
    ``spark.sql(f"SELECT ... FROM {view_name} WHERE ...")``."""
    read_typed(topic, event).createOrReplaceTempView(view_name)


# ---------------------------------------------------------------- oracle query
from pyspark.sql import SparkSession  # noqa: E402

from kafkaish_spark.plans.registry import query  # noqa: E402
from kafkaish_spark.sources.tables import load_table as t  # noqa: E402

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_DOC_EVENT_DDL = (
    "doc_id bigint not null, lang string not null, n_chars bigint"
)


@query(
    "q_typed_topic_roundtrip",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(CASE WHEN doc_id % 10 <> 0 THEN n_chars END) AS BIGINT)
             AS sum_n_chars
    FROM documents GROUP BY lang
    """,
)
def q_typed_topic_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-on-write + schema-on-read, fault-injected: documents are
    published as typed 'doc' events where every doc_id % 10 == 0 row
    carries a null n_chars (nullable per the registry — accepted) and
    the registered schema requires doc_id/lang non-null; read_typed
    projects the payload back into typed columns and the per-lang
    fingerprint must equal the parquet-native oracle.  Proves the
    registry round-trip is lossless AND that nullable-field handling
    matches declared schema semantics end-to-end through the log."""
    import shutil

    d = t(spark, sf, "documents")
    n_docs, fp_docs = d.agg(
        F.count(F.lit(1)), F.sum("doc_id").cast("long")
    ).first()
    root = os.path.join(
        _REPO_ROOT, "spark-warehouse", "_typed",
        os.path.basename(sf.rstrip("/")) or "default",
    )
    from kafkaish_spark.sources.topic_log import Engine

    eng = Engine(spark, root)
    topic = eng.prepare_topic("docs_typed")
    register_schema(topic, "doc", _DOC_EVENT_DDL)

    def _topic_fp():
        # content fingerprint, not just a count: regenerated testdata
        # with the same row count must still force a rebuild
        row = topic.replay(since=0).agg(
            F.count(F.lit(1)),
            F.sum(F.get_json_object("message", "$.doc_id").cast("long")),
        ).first()
        return row[0], row[1]

    if topic.latest() != n_docs or _topic_fp() != (n_docs, fp_docs):
        if topic.latest():  # stale topic from regenerated testdata
            shutil.rmtree(os.path.join(root, "docs_typed"))
            eng = Engine(spark, root)
            topic = eng.prepare_topic("docs_typed")
            register_schema(topic, "doc", _DOC_EVENT_DDL)
        payload = F.to_json(
            F.struct(
                "doc_id",
                "lang",
                F.when(F.col("doc_id") % 10 != 0, F.col("n_chars")).alias(
                    "n_chars"
                ),
            )
        )
        stats = publish_typed(
            topic,
            d.select(F.lit("doc").alias("event"), payload.alias("message")),
            on_invalid="error",
        )
        assert stats["published"] == n_docs, stats
    typed = read_typed(topic, "doc")
    return typed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum("n_chars").cast("long").alias("sum_n_chars"),
    )
