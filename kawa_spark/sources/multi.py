"""Fan-in source (kawa multi-source parity).

Reference: N sources race into one channel, no ordering/fairness
guarantee (/root/reference/x/multi/multisrc.go:15-17, 37-72). Spark's
unionByName over streaming DataFrames has exactly those semantics:
microbatches interleave sources without ordering promises.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession


@dataclass
class MultiSource:
    sources: list  # objects with read/read_stream

    def read(self, spark: SparkSession) -> DataFrame:
        return reduce(
            lambda a, b: a.unionByName(b), (s.read(spark) for s in self.sources)
        )

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return reduce(
            lambda a, b: a.unionByName(b),
            (s.read_stream(spark) for s in self.sources),
        )
