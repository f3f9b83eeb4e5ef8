"""Clustered writes produce file statistics that actually prune
(sinks/layout.py): pairwise-disjoint per-file min/max on the cluster
column, verified from the parquet footers via pyarrow."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kawa_spark.sinks.layout import write_clustered


def _file_ranges(path: str, col: str) -> list[tuple]:
    """[(min, max)] of `col` per parquet file, from footer stats."""
    out = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def test_clustered_write_has_disjoint_file_ranges(spark, tmp_path):
    df = spark.range(100_000).select(
        # write order deliberately scrambled so clustering must work
        F.xxhash64("id").alias("scramble"),
        F.col("id").alias("k"),
    ).orderBy("scramble").drop("scramble")
    path = str(tmp_path / "clustered")
    write_clustered(df, path, ["k"], n_files=8)

    ranges = sorted(_file_ranges(path, "k"))
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlap: [{lo1},{hi1}] vs [{lo2},{hi2}]"
    # coverage: the union of ranges spans the key space
    assert ranges[0][0] == 0 and ranges[-1][1] == 99_999


def test_unclustered_write_spans_everything(spark, tmp_path):
    """The negative control: a hash-partitioned write gives every
    file ~the full key range — statistics prune nothing."""
    df = spark.range(100_000).select(F.col("id").alias("k"))
    path = str(tmp_path / "sprayed")
    df.repartition(8).write.mode("overwrite").parquet(path)
    ranges = _file_ranges(path, "k")
    assert len(ranges) == 8
    full = 99_999
    for lo, hi in ranges:
        assert hi - lo > full * 0.9  # each file spans ~everything
