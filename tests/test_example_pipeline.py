"""The examples/log_pipeline.py flow end-to-end: tail → parse →
enrich → route → archive, with offset resume."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo/examples")

from log_pipeline import start_pipeline  # noqa: E402


class _Collector:
    def __init__(self):
        self.rows = []

    def write_batch(self, df):
        self.rows.extend(r.asDict() for r in df.collect())


def _emit(log, i, level):
    with open(log, "a") as f:
        f.write(
            json.dumps(
                {
                    "event": f"evt-{i}",
                    "level": level,
                    "user": f"u{i % 3}",
                    "ts": f"2024-02-01 0{i % 10}:00:00",
                }
            )
            + "\n"
        )


def test_log_pipeline_routes_and_archives(spark, tmp_path):
    log = tmp_path / "app.jsonl"
    archive = str(tmp_path / "archive")
    cp = str(tmp_path / "cp")
    for i, lv in enumerate(["INFO", "ERROR", "WARN", "FATAL", "INFO"]):
        _emit(log, i, lv)

    errors = _Collector()
    q = start_pipeline(spark, str(log), archive, cp, error_sink=errors)
    q.awaitTermination(120)

    # errors routed with enrichment intact
    assert sorted(r["event"] for r in errors.rows) == ["evt-1", "evt-3"]
    assert {r["severity"] for r in errors.rows} == {3, 4}

    # the rest archived as gzip NDJSON in time partitions
    archived = spark.read.json(archive)
    assert sorted(r["event"] for r in archived.collect()) == [
        "evt-0",
        "evt-2",
        "evt-4",
    ]
    import glob
    import os

    assert glob.glob(os.path.join(archive, "dt=2024-02-01", "hr=*"))

    # resume: only new records flow on the next drain
    _emit(log, 9, "ERROR")
    errors.rows.clear()
    q2 = start_pipeline(spark, str(log), archive, cp, error_sink=errors)
    q2.awaitTermination(120)
    assert [r["event"] for r in errors.rows] == ["evt-9"]
