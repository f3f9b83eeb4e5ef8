#!/usr/bin/env python
"""Dump .explain('formatted') for named query keys to plans/<tag>/.

Usage: python scripts/dump_plans.py <out_dir> <suffix> <key> [key ...]
       e.g. python scripts/dump_plans.py plans/r16 after similarity_ivf

SF dir from $SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE is
SF-independent; the small build keeps capture cheap)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kawa_spark import registry
from kawa_spark.session import get_spark


def main() -> None:
    out_dir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    sf = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    registry.load_all()
    spark = get_spark(app_name="kawa_plan_dump")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    for key in keys:
        df = registry.QUERIES[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {key} ({suffix}) {sf} ==\n\n{plan}")
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
