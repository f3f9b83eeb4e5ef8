"""Stateful streaming operators vs their batch twins."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.io import stream_table, table
from kawa_spark.streaming.stateful import running_total, session_totals

SF = "/root/testdata/sf0.001"


def _drain(df, name, timeout=180):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)


def test_running_total_matches_batch(spark):
    name = f"rt_{uuid.uuid4().hex[:8]}"
    _drain(running_total(stream_table(spark, SF, "events")), name)
    got = {
        r["event_id"]: r["running_total"] for r in spark.table(name).collect()
    }
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["event_id"]: r["rt"]
        for r in table(spark, SF, "events")
        .select("event_id", F.sum("value").over(w).alias("rt"))
        .collect()
    }
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)


def test_session_totals_subset_of_batch_sessions(spark):
    name = f"st_{uuid.uuid4().hex[:8]}"
    _drain(session_totals(stream_table(spark, SF, "events")), name)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["total_value"], 4))
        for r in spark.table(name).collect()
    }
    batch = (
        table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
        )
        .select("user_id", F.col("w.start").alias("session_start"), "n", "tv")
    )
    want = {
        (r["user_id"], r["session_start"]): (r["n"], r["tv"]) for r in batch.collect()
    }
    # closed sessions must match the batch sessions exactly; the last
    # (still-open) session per user stays in state
    assert len(got) > 0
    for k, v in got.items():
        assert k in want, f"spurious session {k}"
        assert abs(v[1] - want[k][1]) < 1e-6 and v[0] == want[k][0]
