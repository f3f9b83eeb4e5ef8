"""Salted operators produce identical results to their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.io import table
from kawa_spark.operators.salt import replicated_broadcast_join, salted_aggregate

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_equals_plain(spark):
    l = table(spark, SF, "lineitem")
    plain = (
        l.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    salted = salted_aggregate(
        l,
        keys=["l_returnflag"],
        aggs=[
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ],
        final_aggs=[F.sum("s").alias("s"), F.sum("n").alias("n")],
        salt_cols=["l_orderkey", "l_linenumber"],
    ).collect()
    key = lambda rows: sorted((r["l_returnflag"], r["s"], r["n"]) for r in rows)
    assert key(plain) == key(salted)


def test_replicated_join_equals_plain(spark):
    o = table(spark, SF, "orders")
    c = table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        replicated_broadcast_join(
            o.withColumnRenamed("o_custkey", "c_custkey"), c, key="c_custkey"
        )
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    as_map = lambda rows: {r["c_mktsegment"]: r["count"] for r in rows}
    assert as_map(plain) == as_map(salted)
