"""Driver contract for the kawa_spark engine.

``entry(spark)`` — flagship query (TPC-H Q1-shape hash aggregation)
on sf0.001. ``queries()`` / ``oracle_sql()`` — the full declared
surface from SURVEY.md §2B, registered in kawa_spark.registry by the
kawa_spark.queries modules.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may run this file from anywhere; make the repo importable
sys.path.insert(0, "/root/repo")

from kawa_spark import registry  # noqa: E402

registry.load_all()

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["agg_hash_groupby"](spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
