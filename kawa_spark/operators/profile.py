"""Dataset profiling — the data-quality pass a training pipeline runs
before ingesting a new source: per-column null counts, cardinalities,
ranges, in ONE scan.

All columns' statistics are computed in a single aggregate (no
per-column scans); the long format (one row per column) is produced by
unpivoting the single stats row — driver cost is O(columns), scan cost
is one pass regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """Long-format numeric profile: (column, n_rows, n_nulls,
    n_distinct, min_val, max_val, sum_val)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias(f"__sum_{c}"),
        ]
    stats = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
            F.col(f"__sum_{c}").alias("sum_val"),
        )
        for c in columns
    ]
    return stats.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
