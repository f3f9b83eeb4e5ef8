"""Ship the kawa_spark package to executor Python workers.

Worker-side closures (pandas UDFs, mapInPandas, applyInPandas) are
cloudpickled; any reference to a kawa_spark module global is pickled
*by reference* and re-imported on the worker — which fails unless the
package is on the worker's path. Two defenses:

1. Policy: worker closures are written self-contained (nested defs,
   stdlib/pandas/numpy imports only). This is the default.
2. ``ensure_shipped(spark)``: zips the package and ``addPyFile``s it,
   for operators that legitimately want shared worker-side helpers.

On a real cluster this is the same mechanism as ``--py-files``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "kawa_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(key)
