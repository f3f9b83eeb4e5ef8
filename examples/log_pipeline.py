"""End-to-end log-processing pipeline — the reference's home turf
(security/event logs: collect → parse → enrich → route → archive),
expressed in kawa_spark.

Flow:
  replay source (JSONL tail, at-least-once offsets)
    → envelope normalize
    → deserialize JSON payload
    → enrich with a static severity dimension (broadcast join)
    → route: errors → dead-letter collector, rest → gzip NDJSON
      archive in time-partitioned layout (the reference's S3 shape)

Run directly (writes under /tmp) or through
tests/test_example_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.envelope import normalize
from kawa_spark.sinks import FileSink, RoutingSink
from kawa_spark.sources.replay import register_replay_source

PAYLOAD_SCHEMA = "event string, level string, user string, ts timestamp"

SEVERITY = [
    ("DEBUG", 0),
    ("INFO", 1),
    ("WARN", 2),
    ("ERROR", 3),
    ("FATAL", 4),
]


def build_stream(spark: SparkSession, log_path: str) -> DataFrame:
    register_replay_source(spark)
    raw = (
        spark.readStream.format("kawa_replay")
        .option("path", log_path)
        .option("topic", "applog")
        .load()
    )
    env = normalize(raw, value="value", key="key", topic="applog")
    parsed = env.withColumn("payload", F.from_json("value", PAYLOAD_SCHEMA))
    sev = F.create_map(
        *[x for lv, n in SEVERITY for x in (F.lit(lv), F.lit(n))]
    )
    return parsed.select(
        "key",
        "topic",
        "ingest_ts",
        F.col("payload.event").alias("event"),
        F.col("payload.level").alias("level"),
        F.col("payload.user").alias("user"),
        F.col("payload.ts").alias("event_ts"),
        F.element_at(sev, F.col("payload.level")).alias("severity"),
    )


def start_pipeline(
    spark: SparkSession,
    log_path: str,
    archive_path: str,
    checkpoint: str,
    error_sink=None,
    available_now: bool = True,
):
    """error_sink: any write_batch object (defaults to a gzip file
    sink next to the archive)."""
    stream = build_stream(spark, log_path)
    archive = FileSink(
        archive_path, format="json", compression="gzip", partition_source="event_ts"
    )
    errors = error_sink or FileSink(
        archive_path + "_errors", format="json", compression="gzip"
    )
    router = RoutingSink(
        route_col="level",
        routes={"ERROR": errors, "FATAL": errors},
        default=archive,
    )
    return router.start_stream(
        stream, checkpoint=checkpoint, available_now=available_now
    )
