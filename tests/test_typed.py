"""Typed topics (sources/typed.py): schema registry with backward
compatibility, schema-on-write validation with error/DLQ routing, and
schema-on-read column projection."""

import pytest
from pyspark.sql import functions as F

DDL_V1 = "user_id bigint not null, action string not null"
DDL_V2_OK = (
    "user_id bigint not null, action string not null, meta string"
)
DDL_DROP = "user_id bigint not null"
DDL_RETYPE = "user_id string not null, action string not null"
DDL_NEW_REQUIRED = (
    "user_id bigint not null, action string not null, meta string not null"
)


def test_registry_versions_and_backward_compat(engine):
    from kafkaish_spark.sources.typed import (
        SchemaViolation,
        get_schema,
        register_schema,
        schema_history,
    )

    topic = engine.prepare_topic("typed_reg")
    assert register_schema(topic, "click", DDL_V1) == 1
    assert register_schema(topic, "click", DDL_V1) == 1  # idempotent
    assert register_schema(topic, "click", DDL_V2_OK) == 2  # add nullable
    assert get_schema(topic, "click") == DDL_V2_OK
    assert [v["version"] for v in schema_history(topic, "click")] == [1, 2]
    for bad in (DDL_DROP, DDL_RETYPE, DDL_NEW_REQUIRED):
        with pytest.raises(SchemaViolation):
            register_schema(topic, "click", bad)
    # compatibility mode NONE allows anything
    assert register_schema(topic, "click", DDL_DROP, check_compat=False) == 3


def test_publish_typed_error_mode_publishes_nothing(engine, spark):
    from kafkaish_spark.sources.typed import (
        SchemaViolation,
        publish_typed,
        register_schema,
    )

    topic = engine.prepare_topic("typed_err")
    register_schema(topic, "click", DDL_V1)
    df = spark.createDataFrame(
        [
            ("click", '{"user_id": 1, "action": "buy"}'),
            ("click", '{"user_id": null, "action": "buy"}'),  # required null
            ("click", "{broken"),  # unparseable
        ],
        "event string, message string",
    )
    with pytest.raises(SchemaViolation, match="2 rows"):
        publish_typed(topic, df, on_invalid="error")
    assert topic.latest() == 0  # all-or-nothing under error mode


def test_publish_typed_dlq_routes_bad_rows(engine, spark):
    from kafkaish_spark.sources.typed import publish_typed, register_schema

    topic = engine.prepare_topic("typed_dlq")
    register_schema(topic, "click", DDL_V1)
    df = spark.createDataFrame(
        [
            ("click", '{"user_id": 1, "action": "buy"}'),
            ("click", '{"user_id": 2, "action": "sell", "extra": true}'),
            ("view", "anything goes — no schema registered"),
            ("click", '{"action": "missing user"}'),
            ("click", "{broken"),
        ],
        "event string, message string",
    )
    stats = publish_typed(topic, df, on_invalid="dlq")
    assert stats == {"published": 3, "dlq": 2}
    assert topic.latest() == 3
    dlq = engine.prepare_topic("typed_dlq.dlq")
    bad = dlq.replay(since=0).collect()
    assert len(bad) == 2
    for r in bad:
        assert r["event"] == "click"
        assert '"reason":"schema_violation"' in r["message"]
    # originals are preserved for replay-after-fix
    import json as _json

    originals = {_json.loads(r["message"])["original"] for r in bad}
    assert originals == {'{"action": "missing user"}', "{broken"}


def test_read_typed_projects_columns(engine, spark):
    from kafkaish_spark.sources.typed import (
        SchemaViolation,
        publish_typed,
        read_typed,
        register_schema,
    )

    topic = engine.prepare_topic("typed_read")
    register_schema(topic, "click", DDL_V2_OK)
    df = spark.createDataFrame(
        [
            ("click", '{"user_id": 7, "action": "buy", "meta": "m1"}'),
            ("click", '{"user_id": 8, "action": "sell"}'),  # meta absent -> null
        ],
        "event string, message string",
    )
    publish_typed(topic, df, on_invalid="error")
    typed = read_typed(topic, "click").orderBy("offset")
    assert typed.columns == ["offset", "ts", "event", "user_id", "action", "meta"]
    rows = typed.collect()
    assert [(r["user_id"], r["action"], r["meta"]) for r in rows] == [
        (7, "buy", "m1"),
        (8, "sell", None),
    ]
    # payload-field filters work on the typed view
    assert typed.filter(F.col("action") == "buy").count() == 1
    with pytest.raises(SchemaViolation, match="no schema registered"):
        read_typed(topic, "view")


def test_schema_evolution_reads_old_data(engine, spark):
    """Backward compatibility is the POINT: data published under v1
    must read cleanly under v2 (new nullable field = null)."""
    from kafkaish_spark.sources.typed import (
        publish_typed,
        read_typed,
        register_schema,
    )

    topic = engine.prepare_topic("typed_evo")
    register_schema(topic, "click", DDL_V1)
    publish_typed(
        topic,
        spark.createDataFrame(
            [("click", '{"user_id": 1, "action": "buy"}')],
            "event string, message string",
        ),
    )
    register_schema(topic, "click", DDL_V2_OK)  # evolve
    publish_typed(
        topic,
        spark.createDataFrame(
            [("click", '{"user_id": 2, "action": "sell", "meta": "x"}')],
            "event string, message string",
        ),
    )
    rows = read_typed(topic, "click").orderBy("offset").collect()
    assert [(r["user_id"], r["meta"]) for r in rows] == [(1, None), (2, "x")]


def test_stream_typed_projects_live_tail(engine, spark, tmp_path):
    """stream_typed delivers typed columns per micro-batch, resumes
    from the checkpoint, and tolerates a schema evolution between
    drains (old payloads read under the new schema)."""
    from kafkaish_spark.sources.typed import (
        publish_typed,
        register_schema,
        stream_typed,
    )

    topic = engine.prepare_topic("typed_stream")
    register_schema(topic, "click", DDL_V1)
    publish_typed(
        topic,
        spark.createDataFrame(
            [("click", '{"user_id": 1, "action": "buy"}'),
             ("click", '{"user_id": 2, "action": "sell"}')],
            "event string, message string",
        ),
    )
    got = []

    def drain():
        q = (
            stream_typed(topic, "click")
            .writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r["user_id"], r["action"], r["meta"] if "meta" in df.columns else None)
                    for r in df.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert sorted(got) == [(1, "buy", None), (2, "sell", None)]
    # evolve, publish under v2, resume: only the new message arrives,
    # projected under the evolved schema
    register_schema(topic, "click", DDL_V2_OK)
    publish_typed(
        topic,
        spark.createDataFrame(
            [("click", '{"user_id": 3, "action": "buy", "meta": "m"}')],
            "event string, message string",
        ),
    )
    got.clear()
    drain()
    assert got == [(3, "buy", "m")]


def test_create_typed_view_sql_surface(engine, spark):
    from kafkaish_spark.sources.typed import (
        create_typed_view,
        publish_typed,
        register_schema,
    )

    topic = engine.prepare_topic("typed_view")
    register_schema(topic, "click", DDL_V1)
    publish_typed(
        topic,
        spark.createDataFrame(
            [("click", '{"user_id": 5, "action": "buy"}'),
             ("click", '{"user_id": 6, "action": "sell"}')],
            "event string, message string",
        ),
    )
    create_typed_view(topic, "click", "clicks_v")
    row = spark.sql(
        "SELECT sum(user_id) AS s FROM clicks_v WHERE action = 'buy'"
    ).first()
    assert row["s"] == 5
