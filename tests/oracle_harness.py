"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and an
order-insensitive value fingerprint. Used by tests/test_oracle_parity.py
so every mismatch is caught locally before the driver sees it.
"""

from __future__ import annotations

import math
from datetime import datetime
from typing import Any

import duckdb

from kawa_spark.io import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def fingerprint(cols: list[str], rows: list[tuple]) -> tuple:
    """Order-insensitive: sort columns by name, then sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    shaped = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return tuple(sorted(shaped, key=repr))


def compare(spark, sf_dir: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    report = {
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "values_match": False,
    }
    if report["count_match"] and report["cols_match"]:
        report["values_match"] = fingerprint(s_cols, s_rows) == fingerprint(
            d_cols, d_rows
        )
        if not report["values_match"]:
            fa, fb = fingerprint(s_cols, s_rows), fingerprint(d_cols, d_rows)
            diffs = [
                (a, b) for a, b in zip(fa, fb) if a != b
            ][:3]
            report["sample_diffs"] = diffs
    return report
