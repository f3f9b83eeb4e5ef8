"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle — the 100 TB strategy for repeated fact-fact
joins (docs/SCALE.md). Asserts the physical plan has NO Exchange."""

from __future__ import annotations

import uuid

from kawa_spark.io import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        suffix = uuid.uuid4().hex[:8]
        lt, ot = f"lineitem_b_{suffix}", f"orders_b_{suffix}"
        (
            table(spark, SF, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(lt)
        )
        (
            table(spark, SF, "orders")
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(ot)
        )
        j = spark.table(lt).join(
            spark.table(ot),
            spark.table(lt)["l_orderkey"] == spark.table(ot)["o_orderkey"],
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == table(spark, SF, "lineitem").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
