"""Kafka wrapper conformance — no broker in this container, so this
pins everything testable without one: option construction (the
delivery knobs that map to the reference's FlushLength/offset
semantics) and the envelope mapping over the connector's fixed
output schema (key/value/topic/partition/offset/timestamp). The
actual wire transport is Spark's built-in connector."""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.sources.kafka import KafkaSink, KafkaSource


def test_source_option_construction():
    s = KafkaSource(
        bootstrap_servers="b:9092",
        topics="t1,t2",
        starting_offsets="earliest",
        max_offsets_per_trigger=5000,
    )
    opts = s._opts()
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "5000"

    p = KafkaSource(bootstrap_servers="b:9092", topics="logs-.*", subscribe_pattern=True)
    assert p._opts()["subscribePattern"] == "logs-.*"
    assert "subscribe" not in p._opts()


def test_envelope_mapping(spark):
    """Connector schema → canonical envelope: binary key/value become
    strings, partition/offset land in attributes, timestamp becomes
    ingest_ts — SURVEY.md §1.2's 1:1 carrier mapping."""
    raw = spark.createDataFrame(
        [(b"k1", b"v1", "topic-a", 3, 42, "2024-01-01 00:00:00")],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp string",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    env = KafkaSource(bootstrap_servers="x", topics="t")._to_envelope(raw)
    row = env.collect()[0]
    assert row["key"] == "k1"
    assert row["value"] == "v1"
    assert row["topic"] == "topic-a"
    assert row["attributes"] == {"partition": "3", "offset": "42"}
    assert row["ingest_ts"] is not None
    assert env.columns == ["key", "value", "topic", "attributes", "ingest_ts"]


def test_sink_prep_adds_null_key(spark):
    df = spark.createDataFrame([("only-value",)], "value string")
    out = KafkaSink(bootstrap_servers="x", topic="t")._prep(df)
    assert out.columns == ["key", "value"]
    row = out.collect()[0]
    assert row["key"] is None and row["value"] == "only-value"


def test_sink_option_construction():
    k = KafkaSink(bootstrap_servers="b:9092", topic="out", options={"kafka.acks": "all"})
    opts = k._opts()
    assert opts["topic"] == "out"
    assert opts["kafka.acks"] == "all"
