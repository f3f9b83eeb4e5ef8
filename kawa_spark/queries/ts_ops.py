"""Time-series operators: as-of join + hypertable-style rollup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.functions.exact import dec
from kawa_spark.io import table
from kawa_spark.operators.asof import asof_join
from kawa_spark.registry import register


@register(
    "join_asof",
    oracle="""
    SELECT
      p.event_id,
      p.user_id,
      p.ts,
      c.ts AS ts_right,
      c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase gets the user's most recent prior click
    (operators/asof.py: union + one keyed window pass, single
    shuffle). Oracle: DuckDB's native ASOF LEFT JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        purchases, clicks, on="user_id", right_payload=["click_value"]
    ).select("event_id", "user_id", "ts", "ts_right", "click_value")


@register(
    "rollup_multires",
    oracle="""
    SELECT
      CASE WHEN GROUPING(hour_b) = 1 THEN 'day'
           WHEN GROUPING(minute_b) = 1 THEN 'hour'
           ELSE '5min' END AS resolution,
      day_b,
      hour_b,
      minute_b,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT
        value,
        CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_b,
        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_b,
        TIMESTAMP '1970-01-01 00:00:00'
          + CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)
            * INTERVAL '1 second' AS minute_b
      FROM events
    )
    GROUP BY ROLLUP (day_b, hour_b, minute_b)
    HAVING GROUPING(day_b) = 0
    """,
)
def rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: 5min → hour →
    day rollups of the event stream in ONE scan + ONE shuffle via
    ROLLUP over nested time buckets (instead of three passes). The
    grand-total row is dropped (HAVING GROUPING(day_b)=0)."""
    e = table(spark, sf_dir, "events")
    bucketed = e.select(
        "value",
        F.date_trunc("day", "ts").alias("day_b"),
        F.date_trunc("hour", "ts").alias("hour_b"),
        F.window("ts", "5 minutes").getField("start").alias("minute_b"),
    )
    rolled = (
        bucketed.rollup("day_b", "hour_b", "minute_b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.grouping("day_b").alias("__g_day"),
            F.grouping("hour_b").alias("__g_hour"),
            F.grouping("minute_b").alias("__g_min"),
        )
        .filter(F.col("__g_day") == 0)
    )
    resolution = (
        F.when(F.col("__g_hour") == 1, "day")
        .when(F.col("__g_min") == 1, "hour")
        .otherwise("5min")
    )
    return rolled.select(
        resolution.alias("resolution"),
        "day_b",
        "hour_b",
        "minute_b",
        "n_events",
        "total_value",
    )
