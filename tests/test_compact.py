"""Small-file compaction (sinks/compact.py): selective per-partition
rewrite, data preserved exactly, already-compact partitions untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kawa_spark.sinks.compact import compact_parquet, plan_compaction


def _n_parquet(leaf: str) -> int:
    return len([f for f in os.listdir(leaf) if f.endswith(".parquet")])


def _write_fragmented(spark, path: str) -> None:
    """Hive-partitioned table: dt=a fragmented into 32 tiny files,
    dt=b a single file (already compact)."""
    a = spark.range(10_000).select(
        F.col("id"), F.lit("a").alias("dt")
    ).repartition(32)
    a.write.partitionBy("dt").mode("overwrite").parquet(path)
    b = spark.range(10_000, 12_000).select(
        F.col("id"), F.lit("b").alias("dt")
    ).coalesce(1)
    b.write.partitionBy("dt").mode("append").parquet(path)


def test_compaction_is_selective_and_lossless(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _write_fragmented(spark, path)
    before = {
        r["dt"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert _n_parquet(os.path.join(path, "dt=a")) == 32

    plan = plan_compaction(path, target_bytes=1 << 30, min_files=4)
    assert [p[0] for p in plan] == [os.path.join(path, "dt=a")]

    res = compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    assert len(res["compacted"]) == 1
    leaf, n_before, n_after = res["compacted"][0]
    assert (n_before, n_after) == (32, 1)
    assert _n_parquet(os.path.join(path, "dt=b")) == 1  # untouched

    after = {
        r["dt"]: (r["n"], r["s"])
        for r in spark.read.parquet(path)
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert after["a"] == (10_000, sum(range(10_000)))
    assert after["b"] == (2_000, sum(range(10_000, 12_000)))
    assert before.keys() == after.keys()


def test_compaction_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(path)
    res = compact_parquet(spark, path)
    assert res["compacted"] == []
    assert res["skipped"] == 1


def test_scratch_dirs_are_not_partitions(spark, tmp_path):
    """ADVICE r7: leftover .__compact_*/.__old_* dirs contain parquet
    files and must NOT be seen as real leaves by plan/compact."""
    path = str(tmp_path / "tbl3")
    _write_fragmented(spark, path)
    # simulate a crashed run: unswapped temp output next to the leaf
    leaf = os.path.join(path, "dt=a")
    tmp = leaf + ".__compact_deadbeef"
    spark.read.parquet(leaf).coalesce(1).write.parquet(tmp)
    plan = plan_compaction(path, target_bytes=1 << 30, min_files=4)
    assert [p[0] for p in plan] == [leaf]  # scratch not planned

    res = compact_parquet(
        spark, path, target_bytes=1 << 30, min_files=4, orphan_min_age_s=0
    )
    assert res["recovered"] == [tmp]
    assert not os.path.exists(tmp)  # orphan temp cleaned up
    n = spark.read.parquet(path).count()
    assert n == 12_000  # no duplicate rows from scratch data


def test_crash_between_renames_recovers(spark, tmp_path):
    """Worst-case crash window: leaf renamed away, temp not yet
    renamed in. The next run must roll the .__old_* backup back."""
    path = str(tmp_path / "tbl4")
    _write_fragmented(spark, path)
    leaf = os.path.join(path, "dt=a")
    old = leaf + ".__old_cafebabe"
    os.rename(leaf, old)  # the mid-swap crash state
    assert not os.path.exists(leaf)

    res = compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    # leaf-missing backups are recovered regardless of age (the
    # partition is invisible to readers) — no age override needed
    assert old in res["recovered"]
    assert os.path.exists(leaf) and not os.path.exists(old)
    # recovery restored the partition, then this run compacted it
    assert len(res["compacted"]) == 1
    after = {
        r["dt"]: (r["n"], r["s"])
        for r in spark.read.parquet(path)
        .groupBy("dt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
        .collect()
    }
    assert after["a"] == (10_000, sum(range(10_000)))
    assert after["b"] == (2_000, sum(range(10_000, 12_000)))


def test_fresh_scratch_of_live_run_left_alone(spark, tmp_path):
    """Concurrent-run guard: scratch YOUNGER than orphan_min_age_s is
    assumed to belong to a live overlapping run and must not be
    recovered (the leaf still exists, so readers are unaffected)."""
    path = str(tmp_path / "tbl5")
    _write_fragmented(spark, path)
    leaf = os.path.join(path, "dt=a")
    tmp = leaf + ".__compact_12345678"
    spark.read.parquet(leaf).coalesce(1).write.parquet(tmp)
    res = compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    assert res["recovered"] == []
    assert os.path.exists(tmp)  # live run's rewrite untouched


def test_concurrent_run_excluded_by_lock(spark, tmp_path):
    """A live lock (pid alive) makes a second run raise instead of
    racing its recovery against the first run's swap (ADVICE r8)."""
    import pytest

    from kawa_spark.sinks.compact import _LOCK_NAME

    path = str(tmp_path / "tbl6")
    _write_fragmented(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    with open(lock, "w") as f:
        f.write(str(os.getpid()))  # "other run" that is demonstrably alive
    with pytest.raises(RuntimeError, match="already running"):
        compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    os.unlink(lock)


def test_stale_lock_of_dead_run_is_reaped(spark, tmp_path):
    """A crashed run's lock (dead pid) must not wedge compaction
    forever: the next run reaps it, recovers, and proceeds."""
    from kawa_spark.sinks.compact import _LOCK_NAME

    path = str(tmp_path / "tbl7")
    _write_fragmented(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    with open(lock, "w") as f:
        f.write("999999999")  # beyond pid_max: guaranteed dead
    res = compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    assert len(res["compacted"]) == 1
    assert not os.path.exists(lock)  # released after the run


def test_lock_pid_reuse_detected_by_starttime(spark, tmp_path):
    """A crashed run's pid can be REUSED by an unrelated live process;
    a pid-only probe would call the lock live forever (ADVICE r9). The
    lock records pid:starttime, so a starttime mismatch against the
    pid's current occupant marks the lock stale and it is reaped."""
    from kawa_spark.sinks.compact import _LOCK_NAME, _proc_start

    assert _proc_start(os.getpid()) is not None  # Linux container

    path = str(tmp_path / "tbl8")
    _write_fragmented(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    # "crashed owner": our own live pid (the reuser) but a starttime
    # that cannot match any real process
    with open(lock, "w") as f:
        f.write(f"{os.getpid()}:0")
    res = compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    assert len(res["compacted"]) == 1
    assert not os.path.exists(lock)


def test_lock_same_starttime_still_excludes(spark, tmp_path):
    """The inverse of the pid-reuse case: a recorded starttime that
    MATCHES the pid's current occupant is a live owner — raise."""
    import pytest

    from kawa_spark.sinks.compact import _LOCK_NAME, _proc_start

    path = str(tmp_path / "tbl9")
    _write_fragmented(spark, path)
    lock = os.path.join(path, _LOCK_NAME)
    me = os.getpid()
    with open(lock, "w") as f:
        f.write(f"{me}:{_proc_start(me)}")
    with pytest.raises(RuntimeError, match="already running"):
        compact_parquet(spark, path, target_bytes=1 << 30, min_files=4)
    os.unlink(lock)
