"""Long-running streaming soak (VERDICT r01 task 9).

The reference's drain contract (/root/reference/x/batcher/
batcher.go:380-400): a live pipeline under a periodic flush timer
keeps making progress while messages arrive, stops gracefully with
the in-flight batch completed, and a restarted pipeline resumes from
the ack ledger without losing or re-delivering anything. Spark twin:
``trigger(processingTime=…)`` + checkpoint, a Watchdog listener
proving liveness, ``stop()`` mid-stream, then a restart on the same
checkpoint that must deliver exactly the rows the first run missed.
"""

from __future__ import annotations

import time
import uuid

from kawa_spark.sources.replay import register_replay_source
from kawa_spark.streaming.listener import Watchdog


def test_processing_time_soak_stop_resume(spark, tmp_path):
    register_replay_source(spark)
    log = tmp_path / "soak.jsonl"
    log.touch()
    cp = str(tmp_path / "cp")

    # exactly-once ledger: value → number of times any microbatch
    # delivered it (foreachBatch survives restarts, unlike a memory
    # sink, which drops its table when the query restarts).
    # foreachBatch itself is AT-LEAST-once across a stop/restart
    # boundary: a batch whose sink ran but whose offset commit was
    # interrupted re-runs under the SAME batchId after restart. The
    # documented exactly-once recipe is an idempotent sink keyed on
    # batchId — modeled here by skipping already-applied batch ids,
    # exactly what a transactional sink's (batchId) ledger does.
    seen: dict[str, int] = {}
    applied_bids: set[int] = set()

    def sink(df, bid: int) -> None:
        if bid in applied_bids:
            return
        applied_bids.add(bid)
        for r in df.select("value").collect():
            seen[r["value"]] = seen.get(r["value"], 0) + 1

    def start():
        return (
            spark.readStream.format("kawa_replay")
            .option("path", str(log))
            .load()
            .writeStream.foreachBatch(sink)
            .trigger(processingTime="1 second")
            .option("checkpointLocation", cp)
            .start()
        )

    def emit(n: int) -> list[str]:
        vals = [uuid.uuid4().hex for _ in range(n)]
        with open(log, "a") as f:
            for v in vals:
                f.write(v + "\n")
        return vals

    wd = Watchdog(stall_seconds=3600)
    spark.streams.addListener(wd)
    q = start()
    try:
        # phase 1: live flow — emit in waves, watch progress advance
        first = emit(20)
        deadline = time.time() + 60
        while time.time() < deadline and len(seen) < 20:
            time.sleep(0.25)
        assert set(first) <= set(seen), "wave 1 not delivered"
        first += emit(15)
        deadline = time.time() + 60
        while time.time() < deadline and len(seen) < 35:
            time.sleep(0.25)
        assert set(first) == set(seen), "wave 2 not delivered"

        # liveness: the watchdog saw progress and flags no stall
        assert wd.check() == set()
        assert str(q.id) in wd.last_progress

        # phase 2: graceful stop with data already on disk but not yet
        # read — stop() must finish the in-flight batch cleanly
        tail = emit(25)
        q.stop()
        q.awaitTermination(60)
        assert not q.isActive
        assert q.exception() is None
        delivered_before_restart = dict(seen)

        # phase 3: restart on the same checkpoint — resumes from the
        # committed offset: every tail row arrives, nothing re-delivers
        q2 = start()
        try:
            deadline = time.time() + 90
            while time.time() < deadline and not (
                set(tail) <= set(seen)
            ):
                time.sleep(0.25)
            assert set(tail) <= set(seen), (
                f"restart lost rows: {len(set(tail) - set(seen))} missing"
            )
            # exactly-once across the stop/restart boundary
            dups = {v: c for v, c in seen.items() if c != 1}
            assert not dups, f"duplicate deliveries: {dups}"
            assert set(seen) == set(first) | set(tail)
        finally:
            q2.stop()
            q2.awaitTermination(30)
        # rows delivered before the restart stayed delivered
        assert set(delivered_before_restart) <= set(seen)
    finally:
        spark.streams.removeListener(wd)
        if q.isActive:
            q.stop()
