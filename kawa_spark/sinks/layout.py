"""Write-side data layout for scan pruning (clustered parquet).

Parquet scans skip whole files/row-groups when a pushed filter falls
outside the file's column min/max statistics — but only if the
writer CLUSTERED the data so those ranges are narrow and disjoint. A
shuffle-partitioned write sprays every key range across every file
and the statistics prune nothing; at 100 TB that is the difference
between reading 3 files and reading 30,000 for a point-range query.

``write_clustered`` is the standard recipe:
* ``repartitionByRange(n, cols)`` — a range shuffle (sampled
  quantile boundaries) puts disjoint key ranges in disjoint tasks;
* ``sortWithinPartitions(cols)`` — orders rows inside each file so
  row-group statistics are narrow too (parquet keeps per-row-group
  min/max);
* plain parquet write — the statistics come for free.

The effect is verified mechanically in tests/test_layout.py by
reading each output file's parquet footer statistics via pyarrow and
asserting the clustered column's [min, max] ranges are pairwise
disjoint — the property pruning needs — while an unclustered write
of the same data shows every file spanning the full key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
