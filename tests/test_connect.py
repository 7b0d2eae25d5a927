"""Source/sink connector tests: CSV/JSON/parquet ingest into a topic,
export back out, and schema-on-read payload typing."""

import json

from pyspark.sql import functions as F


def test_csv_ingest_roundtrip(engine, spark, tmp_path):
    from kafkaish_spark.sources.connect import ingest, messages_as

    src = tmp_path / "src_csv"
    spark.createDataFrame(
        [("click", 1, "alice"), ("view", 2, "bob")],
        "kind string, n long, who string",
    ).coalesce(1).write.mode("overwrite").option("header", "true").csv(str(src))

    topic = engine.prepare_topic("csv_in")
    written = ingest(topic, str(src), "csv", event_col="kind")
    assert written.count() == 2

    typed = messages_as(topic.replay(), "n long, who string")
    got = {r["event"]: (r["payload"]["n"], r["payload"]["who"]) for r in typed.collect()}
    assert got == {"click": (1, "alice"), "view": (2, "bob")}


def test_json_ingest_with_ts(engine, spark, tmp_path):
    from kafkaish_spark.sources.connect import ingest

    src = tmp_path / "src_json"
    spark.createDataFrame(
        [("purchase", "2024-03-01 10:00:00", 99.5)],
        "etype string, when string, amount double",
    ).coalesce(1).write.mode("overwrite").json(str(src))

    topic = engine.prepare_topic("json_in")
    ingest(topic, str(src), "json", event_col="etype", ts_col="when")
    row = topic.replay().collect()[0]
    assert row["event"] == "purchase"
    assert str(row["ts"]).startswith("2024-03-01 10:00:00")
    assert json.loads(row["message"])["amount"] == 99.5


def test_export_partitioned_by_event(engine, spark, tmp_path):
    from kafkaish_spark.sources.connect import export, publish_json_docs

    topic = engine.prepare_topic("exp")
    publish_json_docs(topic, [{"i": 1}, {"i": 2}], event="a")
    publish_json_docs(topic, [{"i": 3}], event="b")

    out = tmp_path / "out"
    n = export(topic, str(out), "parquet", partition_by_event=True)
    assert n == 3
    back = spark.read.parquet(str(out))
    assert {r["event"] for r in back.select("event").distinct().collect()} == {"a", "b"}
    # partition pruning: reading one event dir touches one partition
    only_a = spark.read.parquet(str(out)).filter(F.col("event") == "a")
    assert only_a.count() == 2


def test_infer_payload_schema(engine):
    from kafkaish_spark.sources.connect import infer_payload_schema, publish_json_docs

    topic = engine.prepare_topic("infer")
    publish_json_docs(topic, [{"k": 1, "s": "x"}, {"k": 2, "s": "y"}], event="e")
    schema = infer_payload_schema(topic)
    assert "k:bigint" in schema and "s:string" in schema
