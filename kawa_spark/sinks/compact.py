"""Small-file compaction for parquet table directories.

The operational problem at 100 TB: every micro-batch / task writes
its own file, and a partition accumulates thousands of KB-sized
parquet files whose footer/open costs dominate scans (the "small
files problem"). The fix is periodic compaction — rewrite a
partition's files into ~target-size files — done SELECTIVELY so a
nightly job touches only the partitions that actually fragmented,
never the whole table.

Design:
* Partition discovery and sizing are driver-side filesystem metadata
  walks (no Spark job, no data read).
* Only leaf directories with more than ``min_files`` fragments AND
  mean file size below ``target_bytes`` are rewritten — an
  already-compact partition costs one listdir.
* Each selected partition is rewritten by its own bounded Spark job:
  read leaf → repartition(ceil(bytes/target)) → write temp → atomic
  directory swap. Failure mid-rewrite leaves the original partition
  intact (the temp dir is adjacent, swapped only after success).
* Hive-partition columns live in the directory names, not the files,
  so per-leaf rewrites preserve the table's partitioning exactly.

The atomic-swap step assumes rename is atomic (true on POSIX and
HDFS; on S3-style object stores the swap becomes copy+delete and a
table format with a commit log — Delta/Iceberg — is the right tool
instead; neither ships in this container, see docs/STATUS.md).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 << 20


def _leaf_dirs(root: str) -> list[str]:
    """Directories under root that directly contain parquet files."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if any(f.endswith(".parquet") for f in files):
            out.append(dirpath)
    return out


def _parquet_stats(leaf: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the leaf's parquet fragments."""
    n = tot = 0
    for f in os.listdir(leaf):
        if f.endswith(".parquet"):
            n += 1
            tot += os.path.getsize(os.path.join(leaf, f))
    return n, tot


def plan_compaction(
    root: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 4,
) -> list[tuple[str, int, int, int]]:
    """[(leaf, n_files, total_bytes, n_output_files)] for every leaf
    worth rewriting. Pure metadata — safe to call anywhere."""
    plan = []
    for leaf in _leaf_dirs(root):
        n, tot = _parquet_stats(leaf)
        if n <= min_files:
            continue
        if tot // n >= target_bytes:  # fragments already target-sized
            continue
        plan.append((leaf, n, tot, max(1, math.ceil(tot / target_bytes))))
    return plan


def compact_parquet(
    spark: SparkSession,
    root: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 4,
) -> dict:
    """Compact fragmented leaf partitions under ``root``.

    Returns {"compacted": [(leaf, files_before, files_after)],
    "skipped": n_leaves_left_alone}.
    """
    plan = plan_compaction(root, target_bytes, min_files)
    n_leaves = len(_leaf_dirs(root))
    done = []
    for leaf, n, _tot, n_out in plan:
        tmp = f"{leaf}.__compact_{uuid.uuid4().hex[:8]}"
        # coalesce, not repartition: narrowing file count needs no
        # shuffle — each output task reads a slice of input files
        (
            spark.read.parquet(leaf)
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = f"{leaf}.__old_{uuid.uuid4().hex[:8]}"
        os.rename(leaf, old)
        try:
            os.rename(tmp, leaf)
        except OSError:
            os.rename(old, leaf)  # roll back: original wins
            raise
        shutil.rmtree(old)
        after, _ = _parquet_stats(leaf)
        done.append((leaf, n, after))
    return {"compacted": done, "skipped": n_leaves - len(done)}
