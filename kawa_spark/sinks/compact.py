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
  read leaf → coalesce(ceil(bytes/target)) → write temp → directory
  swap. Failure during the REWRITE leaves the original partition
  intact (the temp dir is adjacent and only swapped in after a
  successful write). The swap itself is two renames and is NOT
  crash-atomic: a process kill between them leaves the partition
  parked at its ``.__old_*`` name. That window is recoverable, not
  destructive — no data is deleted until both renames succeed — and
  ``_recover_orphans`` (run at the start of every ``compact_parquet``)
  rolls a parked partition back and clears stale temp dirs, so the
  next compaction run self-heals a crashed one. A filesystem with an
  atomic exchange (renameat2 RENAME_EXCHANGE, HDFS rename-overwrite)
  or a table format with a commit log (Delta/Iceberg — not in this
  container) closes the window completely; see docs/STATUS.md.
* ``_leaf_dirs`` ignores in-flight ``.__compact_*`` / ``.__old_*``
  dirs, so a concurrent or crashed run's temp files are never
  mistaken for real partitions.
* Runs are serialized per root by an O_EXCL pid lock file — a second
  ``compact_parquet`` on the same root raises instead of letting its
  orphan recovery race the first run's swap (ADVICE r8); a crashed
  run's stale lock (dead pid) is reaped automatically.
* Hive-partition columns live in the directory names, not the files,
  so per-leaf rewrites preserve the table's partitioning exactly.
"""

from __future__ import annotations

import math
import os
import shutil
import time
import uuid

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 << 20

_COMPACT_TAG = ".__compact_"
_OLD_TAG = ".__old_"


def _is_scratch(path: str) -> bool:
    """True for compaction temp/backup dirs (and anything inside one)."""
    return _COMPACT_TAG in path or _OLD_TAG in path


_LOCK_NAME = _COMPACT_TAG + "lock"  # matches _is_scratch by prefix


def _proc_start(pid: int) -> str | None:
    """The process's kernel start time (clock ticks since boot) from
    ``/proc/<pid>/stat`` field 22 — the stable identity that survives
    pid reuse. None when the process is gone or /proc is unavailable
    (non-Linux), in which case callers fall back to liveness-only."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read()
        # comm (field 2) may contain spaces/parens; parse after the
        # LAST ')' — the canonical procfs idiom.
        return stat[stat.rindex(b")") + 2 :].split()[19].decode()
    except (OSError, ValueError, IndexError):
        return None


def _acquire_lock(root: str) -> str:
    """Per-root mutual exclusion for compaction runs (ADVICE r8).

    Without this, a second run's orphan recovery could rmtree a live
    run's age-expired ``.__compact_*`` between its write and its swap;
    the live run would then rename a partially-deleted tmp over the
    leaf and delete its backup — a data-loss interleaving. An
    O_CREAT|O_EXCL lock file holding the owner's identity closes it:
    the swap is driver-side ``os.rename``, so competing runs are
    same-host by construction and a local process probe is a sound
    staleness test (a crashed run's lock is reaped, a live run's
    raises).

    The lock records ``pid:starttime`` (kernel start-time ticks from
    /proc), not pid alone: after a crash, the pid can be reused by an
    unrelated process, and a pid-only probe would report the lock
    live forever (ADVICE r9). A recorded starttime that no longer
    matches the current occupant of that pid means the owner is dead
    — the lock is stale and reaped. Locks written without a
    starttime (older format, or non-Linux) degrade to the
    liveness-only probe, documented as possibly needing manual
    removal after pid reuse."""
    path = os.path.join(root, _LOCK_NAME)
    for _ in range(2):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                me = os.getpid()
                start = _proc_start(me)
                f.write(f"{me}:{start}" if start is not None else str(me))
            return path
        except FileExistsError:
            pid, rec_start = 0, None
            try:
                raw = open(path).read().strip()
                pid_s, _, start_s = raw.partition(":")
                pid = int(pid_s or "0")
                rec_start = start_s or None
            except (OSError, ValueError):
                pid = 0
            alive = False
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True  # exists, owned elsewhere
            if alive and rec_start is not None:
                cur_start = _proc_start(pid)
                if cur_start is not None and cur_start != rec_start:
                    alive = False  # pid reused by an unrelated process
            if alive:
                raise RuntimeError(
                    f"compaction of {root!r} already running (pid {pid})"
                )
            try:
                os.unlink(path)  # stale lock from a crashed run
            except FileNotFoundError:
                pass
    raise RuntimeError(f"could not acquire compaction lock for {root!r}")


def _leaf_dirs(root: str) -> list[str]:
    """Directories under root that directly contain parquet files.
    Compaction scratch dirs (``.__compact_*`` temp output, ``.__old_*``
    backups from a crashed run) hold parquet files too and MUST NOT be
    treated as real partitions (ADVICE r7)."""
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if _is_scratch(dirpath):
            continue
        if any(f.endswith(".parquet") for f in files):
            out.append(dirpath)
    return out


def _recover_orphans(root: str, min_age_s: float = 3600.0) -> list[str]:
    """Self-heal scratch left by a run that crashed mid-swap.

    Cases (leaf = scratch path with its tag suffix stripped):
    * ``.__old_*`` present, leaf MISSING → crashed between the two
      renames: roll the backup back to the leaf (original data wins).
    * ``.__old_*`` present, leaf present → crashed after rename-in but
      before cleanup: the leaf is already the compacted data; drop the
      backup.
    * ``.__compact_*`` → incomplete or unswapped rewrite output: drop.

    ``min_age_s`` is the concurrent-run guard (code review r8):
    scratch younger than this is assumed to belong to a LIVE
    overlapping run and is left alone — recovering it would rmtree an
    in-flight rewrite or steal a backup mid-swap. Except: an
    ``.__old_*`` whose leaf is missing is always recovered regardless
    of age (the partition is invisible to readers right now; a live
    run in its microseconds-wide rename gap loses its own swap but no
    data — its rename fails loudly). Concurrent ``compact_parquet``
    runs on one root are excluded outright by the per-root pid lock
    (``_acquire_lock``, ADVICE r8); the age guard remains as defense
    in depth for recovery invoked outside that lock.

    Returns the scratch paths handled (for the caller's report)."""
    handled = []
    now = time.time()

    def _old_enough(p: str) -> bool:
        try:
            return now - os.path.getmtime(p) >= min_age_s
        except OSError:
            return True  # vanished mid-walk → nothing to protect

    # walk bottom-up not needed: scratch dirs are siblings of leaves,
    # never nested inside other scratch
    for dirpath, dirs, _files in os.walk(root):
        if _is_scratch(dirpath):
            dirs[:] = []
            continue
        for d in list(dirs):
            p = os.path.join(dirpath, d)
            if _OLD_TAG in d:
                leaf = p[: p.index(_OLD_TAG)]
                if not os.path.exists(leaf):
                    os.rename(p, leaf)  # reader-visible hole: always fix
                elif _old_enough(p):
                    shutil.rmtree(p)
                else:
                    continue
                handled.append(p)
                dirs.remove(d)
            elif _COMPACT_TAG in d and _old_enough(p):
                shutil.rmtree(p)
                handled.append(p)
                dirs.remove(d)
    return handled


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
    orphan_min_age_s: float = 3600.0,
) -> dict:
    """Compact fragmented leaf partitions under ``root``.

    Serialized per root by an O_EXCL pid lock (``_acquire_lock``):
    a concurrent run raises instead of racing recovery against a live
    rewrite's swap. Then recovers any scratch a previous crashed run
    left behind (see ``_recover_orphans``; ``orphan_min_age_s`` is a
    second line of defense for scratch whose lock was lost).

    Returns {"compacted": [(leaf, files_before, files_after)],
    "skipped": n_leaves_left_alone, "recovered": [scratch paths]}.
    """
    lock = _acquire_lock(root)
    try:
        recovered = _recover_orphans(root, min_age_s=orphan_min_age_s)
        plan = plan_compaction(root, target_bytes, min_files)
        n_leaves = len(_leaf_dirs(root))
        done = []
        for leaf, n, _tot, n_out in plan:
            tmp = f"{leaf}{_COMPACT_TAG}{uuid.uuid4().hex[:8]}"
            # coalesce, not repartition: narrowing file count needs no
            # shuffle — each output task reads a slice of input files
            (
                spark.read.parquet(leaf)
                .coalesce(n_out)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            old = f"{leaf}{_OLD_TAG}{uuid.uuid4().hex[:8]}"
            os.rename(leaf, old)
            try:
                os.rename(tmp, leaf)
            except OSError:
                os.rename(old, leaf)  # roll back: original wins
                raise
            shutil.rmtree(old)
            after, _ = _parquet_stats(leaf)
            done.append((leaf, n, after))
        return {
            "compacted": done,
            "skipped": n_leaves - len(done),
            "recovered": recovered,
        }
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
