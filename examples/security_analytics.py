"""Security-analytics pipeline — composing the r8 detection tier the
way a SOC pipeline actually layers it (kawa's home domain: the
reference exists to shuttle security logs, /root/reference/README.md:
7-16; this is what runs on the other end of that shuttle):

  events
    → debounce            (adjacent-duplicate suppression — the
                           at-least-once ingest cleanup)
    → template extraction (drain-style masking → pattern id)
    → three detectors over the clean stream:
        * rate limiter    (trailing-window per-user flood flag)
        * heavy hitters   (top-K users per event type)
        * template drift  (new-pattern / growth alerting)
    → one alert relation  (union of detector verdicts, severity-coded)

Every stage is a registry operator (oracle-verified individually);
the example shows they COMPOSE — the debounced stream feeds all three
detectors without re-reading the source, and the alert union is a
narrow column-aligned unionByName.

Run directly (`python examples/security_analytics.py [sf_dir]`) or
through tests/test_example_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.io import table
from kawa_spark.queries.events import (
    DEBOUNCE_GAP_US,
    HH_TOP_K,
    RATE_LIMIT,
    RATE_WINDOW_US,
)
from kawa_spark.queries.logs import DAY_US, mask_template


def debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events minus back-to-back same-type repeats per user (the
    events_dedup_adjacent predicate), with the template column
    attached once for every downstream detector."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    msg = F.concat(
        F.col("event_type"),
        F.lit(" uid="),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("props"),
    )
    t = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "value",
        mask_template(msg).alias("template"),
    ).select(
        "*",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("us").over(w).alias("prev_us"),
    )
    keep = (
        F.col("prev_us").isNull()
        | ~F.col("prev_type").eqNullSafe(F.col("event_type"))
        | (F.col("us") - F.col("prev_us") > DEBOUNCE_GAP_US)
    )
    return t.filter(keep).drop("prev_type", "prev_us")


def flood_alerts(clean: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-RATE_WINDOW_US, 0)
    )
    n = F.count(F.lit(1)).over(w)
    return (
        clean.select("user_id", "event_type", "us", n.alias("n"))
        .filter(F.col("n") > RATE_LIMIT)
        .select(
            F.lit("flood").alias("alert"),
            F.lit(2).alias("severity"),
            F.col("user_id").cast("string").alias("subject"),
            F.concat(
                F.lit("rate "), F.col("n").cast("string"),
                F.lit(" > "), F.lit(RATE_LIMIT).cast("string"),
                F.lit(" in window at us="), F.col("us").cast("string"),
            ).alias("detail"),
        )
    )


def heavy_hitter_alerts(clean: DataFrame) -> DataFrame:
    counts = clean.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), "user_id"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HH_TOP_K)
        .select(
            F.lit("heavy_hitter").alias("alert"),
            F.lit(1).alias("severity"),
            F.col("user_id").cast("string").alias("subject"),
            F.concat(
                F.lit("#"), F.col("rank").cast("string"),
                F.lit(" on "), F.col("event_type"),
                F.lit(" ("), F.col("n_events").cast("string"),
                F.lit(" events)"),
            ).alias("detail"),
        )
    )


def drift_alerts(clean: DataFrame) -> DataFrame:
    """New templates, or templates growing >2× day-over-day."""
    daily = (
        clean.select(
            (F.col("us") - F.pmod(F.col("us"), F.lit(DAY_US)))
            .alias("day_us"),
            "template",
        )
        .groupBy("template", "day_us")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("template").orderBy("day_us")
    d = daily.select(
        "*", F.lag("n").over(w).alias("prev_n")
    )
    flagged = d.filter(
        F.col("prev_n").isNull() | (F.col("n") > 2 * F.col("prev_n"))
    )
    return flagged.select(
        F.when(F.col("prev_n").isNull(), F.lit("new_template"))
        .otherwise(F.lit("template_surge"))
        .alias("alert"),
        F.lit(3).alias("severity"),
        F.col("template").alias("subject"),
        F.concat(
            F.lit("n="), F.col("n").cast("string"),
            F.lit(" prev="), F.coalesce(F.col("prev_n").cast("string"), F.lit("-")),
        ).alias("detail"),
    )


def alert_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline: one cleaned stream, three detectors,
    one severity-ordered alert table."""
    clean = debounced_events(spark, sf_dir).persist()
    alerts = (
        flood_alerts(clean)
        .unionByName(heavy_hitter_alerts(clean))
        .unionByName(drift_alerts(clean))
    )
    return alerts.orderBy(F.col("severity").desc(), "alert", "subject", "detail")


if __name__ == "__main__":
    from kawa_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="security_analytics_example")
    out = alert_relation(spark, sf_dir)
    out.show(30, truncate=False)
    print(f"total alerts: {out.count()}")
