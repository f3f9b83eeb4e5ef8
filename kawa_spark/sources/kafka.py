"""Kafka source/sink wrappers (envelope-mapped).

The reference's CI provisions Kafka but ships no Kafka code or tests
(/root/reference/docker-compose.yml:14-50 — SURVEY.md §5); SURVEY.md
§1.2 designates Kafka as the natural carrier for the envelope (key /
value / topic map 1:1). Spark's built-in Kafka connector does the
heavy lifting; these wrappers pin the envelope mapping and the
delivery knobs. No broker exists in this container — construction is
cheap and unit-testable, connection happens only at stream start.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaSource:
    bootstrap_servers: str
    topics: str  # comma-separated, or pattern with subscribe_pattern
    starting_offsets: str = "latest"
    max_offsets_per_trigger: int | None = None  # FlushLength parity
    subscribe_pattern: bool = False
    options: dict[str, str] = field(default_factory=dict)

    def _opts(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            ("subscribePattern" if self.subscribe_pattern else "subscribe"): self.topics,
            "startingOffsets": self.starting_offsets,
            **self.options,
        }
        if self.max_offsets_per_trigger:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return opts

    def _to_envelope(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
            F.col("topic").alias("topic"),
            F.create_map(
                F.lit("partition"), F.col("partition").cast("string"),
                F.lit("offset"), F.col("offset").cast("string"),
            ).alias("attributes"),
            F.col("timestamp").alias("ingest_ts"),
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return self._to_envelope(
            spark.read.format("kafka").options(**self._opts()).load()
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._to_envelope(
            spark.readStream.format("kafka").options(**self._opts()).load()
        )


@dataclass
class KafkaSink:
    bootstrap_servers: str
    topic: str
    options: dict[str, str] = field(default_factory=dict)

    def _prep(self, df: DataFrame) -> DataFrame:
        cols = set(df.columns)
        out = df
        if "key" not in cols:
            out = out.withColumn("key", F.lit(None).cast("string"))
        return out.select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )

    def _opts(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
            **self.options,
        }

    def write_batch(self, df: DataFrame) -> None:
        self._prep(df).write.format("kafka").options(**self._opts()).save()

    def start_stream(self, df, trigger=None, checkpoint=None, available_now=False):
        from kawa_spark.sinks.sinks import _start

        return _start(
            self._prep(df).writeStream.format("kafka").options(**self._opts()),
            trigger,
            checkpoint,
            available_now,
        )
