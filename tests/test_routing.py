"""Content-based routing sink: rows reach exactly the sink their
route column selects; unmatched rows land in the default."""

from __future__ import annotations

from kawa_spark.sinks import RoutingSink


class _Collector:
    def __init__(self):
        self.rows = []

    def write_batch(self, df):
        self.rows.extend(r.asDict() for r in df.collect())


def test_routing_batch(spark):
    df = spark.createDataFrame(
        [
            ("error", "e1"),
            ("click", "c1"),
            ("error", "e2"),
            ("signup", "s1"),
            (None, "n1"),
        ],
        "event_type string, payload string",
    )
    errors, clicks, rest = _Collector(), _Collector(), _Collector()
    sink = RoutingSink(
        route_col="event_type",
        routes={"error": errors, "click": clicks},
        default=rest,
    )
    sink.write_batch(df)
    assert sorted(r["payload"] for r in errors.rows) == ["e1", "e2"]
    assert [r["payload"] for r in clicks.rows] == ["c1"]
    assert sorted(r["payload"] for r in rest.rows) == ["n1", "s1"]


def test_routing_stream(spark, tmp_path):
    drop = tmp_path / "in"
    drop.mkdir()
    for i, t in enumerate(["error", "click", "error"]):
        (drop / f"{i}.txt").write_text(f"{t}|p{i}\n")
    from pyspark.sql import functions as F

    src = (
        spark.readStream.format("text")
        .load(str(drop))
        .select(
            F.split_part(F.col("value"), F.lit("|"), F.lit(1)).alias("event_type"),
            F.split_part(F.col("value"), F.lit("|"), F.lit(2)).alias("payload"),
        )
    )
    dropped = _Collector()
    coll_e = _Collector()
    q = RoutingSink(
        route_col="event_type", routes={"error": coll_e}, default=dropped
    ).start_stream(src, checkpoint=str(tmp_path / "cp"), available_now=True)
    q.awaitTermination(60)
    assert sorted(r["payload"] for r in coll_e.rows) == ["p0", "p2"]
    assert [r["payload"] for r in dropped.rows] == ["p1"]
