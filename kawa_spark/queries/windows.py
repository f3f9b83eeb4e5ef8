"""Window-function surface (ranking + analytic) — SURVEY.md §2B.

Window functions shuffle once on the partition key and sort within
partitions; at 100 TB the thing to watch is partition-key cardinality
(here customer — high cardinality, so partitions are small and no
single task balloons). All tie-breaks are explicit so results are
deterministic and oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.functions.exact import dec
from kawa_spark.io import table
from kawa_spark.registry import register


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT
        o_custkey,
        o_orderkey,
        o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        RANK()       OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC) AS rnk,
        DENSE_RANK() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC) AS drnk,
        NTILE(4)     OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS quartile
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window functions."""
    o = table(spark, sf_dir, "orders")
    w_tie = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_tie).alias("rn"),
            F.rank().over(w_price).alias("rnk"),
            F.dense_rank().over(w_price).alias("drnk"),
            F.ntile(4).over(w_tie).alias("quartile"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_extra",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      PERCENT_RANK() OVER w AS pct_rank,
      CUME_DIST() OVER w AS cume,
      NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS second_best,
      LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS worst_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value / last_value — the
    distribution-rank tier. percent_rank and cume_dist reduce to
    integer-ratio divisions, identical IEEE in both engines."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_best"),
        F.last("o_orderkey").over(w_full).alias("worst_order"),
    )


@register(
    "window_analytic",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      o_orderdate,
      o_totalprice,
      LAG(o_totalprice)  OVER w AS prev_price,
      LEAD(o_totalprice) OVER w AS next_price,
      FIRST_VALUE(o_totalprice) OVER w AS first_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first + a running decimal sum (exact, so the running
    total hash-matches the oracle at any row count)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.sum(dec("o_totalprice")).over(w_run).cast("double").alias("running_spend"),
    )
