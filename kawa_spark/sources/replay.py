"""Custom streaming source via the Spark 4 Python DataSource API —
the engine's Source-plugin surface.

Parity target: kawa's poller (batch Poll(max) → per-message Recv,
/root/reference/x/poller/poller.go:15-81 — porting the intent, not
its Recv bug, see SURVEY.md §2A) and, structurally, any external
system bridge (MQTT's channel pump, x/mqtt/mqtt.go:240-273).

ReplaySource tails a newline-delimited file: offset = byte position,
each microbatch polls up to ``max_lines_per_batch`` new lines.
``readBetweenOffsets`` replays any committed range — which is exactly
the at-least-once redelivery contract: offsets commit only after the
sink succeeds; a crash before commit re-reads the same range.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.max_lines = int(options.get("maxlinesperbatch", 1000))
        self.topic = options.get("topic", "replay")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _read_from(self, pos: int, limit: int | None):
        rows = []
        end = pos
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                f.seek(pos)
                while True:
                    if limit is not None and len(rows) >= limit:
                        break
                    line = f.readline()
                    if not line or not line.endswith(b"\n"):
                        break  # incomplete tail line: wait for writer
                    end = f.tell()
                    text = line.decode("utf-8").rstrip("\n")
                    rows.append((str(len(rows)), text, self.topic))
        return rows, end

    def read(self, start: dict):
        rows, end = self._read_from(start["pos"], self.max_lines)
        return iter(rows), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        with open(self.path, "rb") as f:
            f.seek(start["pos"])
            blob = f.read(end["pos"] - start["pos"])
        return iter(
            (str(i), line, self.topic)
            for i, line in enumerate(blob.decode("utf-8").splitlines())
        )


class ReplayDataSource(DataSource):
    """spark.readStream.format("kawa_replay").option("path", …)"""

    @classmethod
    def name(cls) -> str:
        return "kawa_replay"

    def schema(self) -> str:
        return "key string, value string, topic string"

    def simpleStreamReader(self, schema) -> _ReplayStreamReader:
        return _ReplayStreamReader(self.options)


def register_replay_source(spark) -> None:
    """Register the format (ships the package so executors can
    unpickle the reader)."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(ReplayDataSource)
