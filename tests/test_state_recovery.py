"""Stateful-stream recovery: applyInPandasWithState resumes from the
checkpointed state store — totals continue across query restarts (the
streaming ack/state contract end-to-end)."""

from __future__ import annotations

from kawa_spark.sources.replay import register_replay_source
from kawa_spark.streaming.stateful import running_total

from pyspark.sql import functions as F


def test_running_total_survives_restart(spark, tmp_path):
    register_replay_source(spark)
    log = tmp_path / "events.jsonl"
    cp = str(tmp_path / "cp")
    collected: dict[int, float] = {}

    def drain():
        raw = (
            spark.readStream.format("kawa_replay")
            .option("path", str(log))
            .load()
        )
        parsed = raw.select(
            F.from_json(
                "value", "event_id long, user_id long, ts timestamp, value double"
            ).alias("v")
        ).select("v.*")
        q = (
            running_total(parsed)
            .writeStream.foreachBatch(
                lambda df, bid: collected.update(
                    {r["event_id"]: r["running_total"] for r in df.collect()}
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", cp)
            .start()
        )
        q.awaitTermination(120)

    import json

    def emit(eid, uid, ts, val):
        with open(log, "a") as f:
            f.write(
                json.dumps(
                    {"event_id": eid, "user_id": uid, "ts": ts, "value": val}
                )
                + "\n"
            )

    emit(1, 7, "2024-01-01 10:00:00", 10.0)
    emit(2, 7, "2024-01-01 10:05:00", 5.0)
    drain()
    assert collected[1] == 10.0 and collected[2] == 15.0

    # restart with more data for the same user: state must carry over
    emit(3, 7, "2024-01-01 10:10:00", 2.5)
    emit(4, 8, "2024-01-01 10:11:00", 1.0)
    drain()
    assert collected[3] == 17.5  # 15.0 carried from the state store
    assert collected[4] == 1.0
