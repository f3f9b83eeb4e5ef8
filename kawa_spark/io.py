"""Table access for the driver-generated testdata.

One reader used by every query so pushdown/pruning behavior is uniform:
``spark.read.parquet`` gives Catalyst the parquet footprint directly —
filters and projections land in the scan (PushedFilters / ReadSchema),
which is the whole 100 TB story: a query touching 2 columns of
lineitem must read 2 column chunks, not 11.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects. Read it as a raw long (legacy flag — set here
        # too in case the driver built its own session) and truncate to
        # microseconds, matching DuckDB's ns→µs truncation semantics.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass  # static conf on some builds; session default covers it
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
