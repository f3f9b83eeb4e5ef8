"""Query registry backing ``__spark_entry__.py``.

Each operator from SURVEY.md §2B registers here under a stable key:
a Spark builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string the
driver runs side-by-side. Keys without an oracle get rows-only checks
(streaming-only / approximate / UDF-defined semantics).

Cross-engine float discipline (the reason oracles hash-match):
aggregate money math is done in DECIMAL (exact, order-independent —
a parallel Spark sum and a sequential DuckDB sum of decimals are
bit-identical) and cast to DOUBLE only at the end; both engines then
hold the identical IEEE value. See kawa_spark/functions/exact.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from kawa_spark.queries import (  # noqa: F401
        relational,
        joins,
        windows,
        events,
        llm_dedup,
        llm_similarity,
        llm_text,
        llm_multimodal,
        udfs,
        streaming_mode,
        stats,
        tpch,
        ts_ops,
        extras,
        llm_corpus,
    )
