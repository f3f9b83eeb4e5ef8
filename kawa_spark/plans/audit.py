"""Physical-plan audit: mechanical checks for the scale antipatterns
that .explain review catches by eye (docs/SCALE.md).

Usage: ``audit_plan(df)`` returns a list of warning strings — empty
means the plan passes. Wire into tests (see tests/test_plan_audit.py)
so plan regressions fail CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(
    df: DataFrame,
    expect_pushed_filters: bool = False,
    max_scan_columns: int | None = None,
    forbid_cartesian: bool = True,
    forbid_python_row_udf: bool = True,
) -> list[str]:
    plan = _executed_plan(df)
    warnings: list[str] = []

    if forbid_cartesian and "CartesianProduct" in plan:
        warnings.append(
            "CartesianProduct in plan — unbounded cross join; add a join "
            "key or broadcast the small side"
        )
    if "BroadcastNestedLoopJoin" in plan and "BuildRight" not in plan and "BuildLeft" not in plan:
        warnings.append("BroadcastNestedLoopJoin without a build side marker")
    if forbid_python_row_udf and re.search(r"BatchEvalPython", plan):
        warnings.append(
            "BatchEvalPython (row-at-a-time Python UDF) in the plan — use "
            "pandas_udf / mapInPandas (ArrowEvalPython) instead"
        )
    if expect_pushed_filters and "PushedFilters: []" in plan:
        warnings.append(
            "scan has no pushed filters but the query filters — predicate "
            "not reaching the parquet reader"
        )
    if max_scan_columns is not None:
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
            ncols = len([c for c in m.group(1).split(",") if ":" in c])
            if ncols > max_scan_columns:
                warnings.append(
                    f"scan reads {ncols} columns (> {max_scan_columns}) — "
                    "projection not pruned"
                )
    return warnings


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan."""
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", _executed_plan(df)))
