"""Watchdog / observability (kawa parity).

Reference: the batcher's watchdog detects a stuck pipeline — flushes
in flight but no progress (/root/reference/x/batcher/batcher.go:296-339);
OTel spans wrap recv/handle/send (/root/reference/processor.go:91-120).

Spark-native form: a StreamingQueryListener tracking per-batch
progress; staleness (no progress within ``stall_seconds``) flips
``stalled`` and invokes the callback — alerting-pipeline ready.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener


class Watchdog(StreamingQueryListener):
    def __init__(
        self,
        stall_seconds: float = 60.0,
        on_stall: Callable[[str], None] | None = None,
    ) -> None:
        self.stall_seconds = stall_seconds
        self.on_stall = on_stall
        self.last_progress: dict[str, float] = {}
        self.rows_per_second: dict[str, float] = {}
        self.batch_durations_ms: dict[str, float] = {}
        self.stalled: set[str] = set()

    # --- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.last_progress[str(event.id)] = time.monotonic()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        self.last_progress[qid] = time.monotonic()
        self.rows_per_second[qid] = p.processedRowsPerSecond or 0.0
        self.batch_durations_ms[qid] = (p.durationMs or {}).get("triggerExecution", 0)
        self.stalled.discard(qid)

    def onQueryTerminated(self, event) -> None:
        self.last_progress.pop(str(event.id), None)

    def onQueryIdle(self, event) -> None:
        self.last_progress[str(event.id)] = time.monotonic()

    # --- watchdog check (call from a monitor loop) --------------------------
    def check(self) -> set[str]:
        now = time.monotonic()
        for qid, ts in self.last_progress.items():
            if now - ts > self.stall_seconds and qid not in self.stalled:
                self.stalled.add(qid)
                if self.on_stall:
                    self.on_stall(qid)
        return set(self.stalled)
