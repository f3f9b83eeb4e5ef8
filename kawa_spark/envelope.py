"""The canonical message envelope (kawa Message[T] parity).

Reference: Message[T]{Key, Value, Topic, Attributes}
(/root/reference/types.go:10-26). In Spark the envelope is a row
schema; the payload starts as bytes/string ("schema-on-read") and is
lifted to a typed struct by a deserializer handler — the analogue of
DeserializationSource/TransformUnmarshalJSON
(/root/reference/types.go:163-195).

The ack function (/root/reference/types.go:48-58) deliberately has NO
per-row equivalent: delivery guarantees are per-microbatch via
checkpointed offset commit (SURVEY.md §3.4) — stronger, not weaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),        # sharding/routing key
        StructField("value", StringType(), True),      # payload (raw)
        StructField("topic", StringType(), True),      # provenance
        StructField("attributes", MapType(StringType(), StringType()), True),
        StructField("ingest_ts", TimestampType(), True),
    ]
)

ENVELOPE_COLS = [f.name for f in ENVELOPE_SCHEMA.fields]


def normalize(
    df: DataFrame,
    value: str | Column = "value",
    key: str | Column | None = None,
    topic: str | None = None,
    attributes: Column | None = None,
) -> DataFrame:
    """Project any DataFrame onto the canonical envelope schema."""
    val = F.col(value).cast("string") if isinstance(value, str) else value.cast("string")
    k = (
        F.lit(None).cast("string")
        if key is None
        else (F.col(key) if isinstance(key, str) else key).cast("string")
    )
    return df.select(
        k.alias("key"),
        val.alias("value"),
        F.lit(topic).cast("string").alias("topic"),
        (
            attributes
            if attributes is not None
            else F.create_map().cast(MapType(StringType(), StringType()))
        ).alias("attributes"),
        F.current_timestamp().alias("ingest_ts"),
    )


def deserialize_json(df: DataFrame, schema: StructType | str) -> DataFrame:
    """DeserializationSource parity: lift value:string → typed struct,
    preserving key/topic/attributes (/root/reference/types.go:169-195).
    Malformed payloads yield a null struct (inspect with .filter)."""
    return df.withColumn("value", F.from_json(F.col("value"), schema))


def deserialize_csv(df: DataFrame, schema: str, sep: str = ",") -> DataFrame:
    """CSV DeserFunc analogue via from_csv."""
    return df.withColumn(
        "value", F.from_csv(F.col("value"), schema, {"sep": sep})
    )
