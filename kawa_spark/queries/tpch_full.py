"""The remaining 16 TPC-H query shapes (q1..q22 minus the six in
tpch.py), adapted to the testdata's reduced star schema.

The testdata has no ``partsupp`` table and drops several columns
(l_commitdate / l_receiptdate / l_shipmode, o_comment, p_container,
c_phone/address), so queries that reference them are ADAPTED: each
keeps its defining physical-plan shape — the thing that matters at
100 TB — with a schema-available stand-in for the missing column.
Every adaptation is noted in the query's docstring.

Plan shapes exercised here (audited in tests/test_plan_audit.py):
full-scan agg with many exact-decimal measures (q1), correlated-min
join-back (q2), non-equi semi join (q4), self-referencing
nation-pair theta join (q7), conditional market-share division (q8),
multi-fact profit rollup (q9), scalar-threshold broadcast filter
(q11, q22), lateness CASE pivot (q12), left-outer count distribution
(q13), decimal-equality max join-back (q15), distinct-count
relationship agg with NOT IN (q16), per-group-average correlated
filter (q17), disjunctive pushdown predicates (q19), having-filtered
semi join (q20), exists/not-exists anti-join chain (q21).

Reference parity note: the reference engine (runreveal/kawa) has no
SQL/analytics surface at all (kawa/processor.go is a stream shuttle);
this module is pure mandate extension, verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.functions.exact import dec
from kawa_spark.io import table
from kawa_spark.registry import register

_REV = """CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"""


def _revenue() -> F.Column:
    return F.sum(
        dec("l_extendedprice")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
               * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS DOUBLE) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS DOUBLE) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
           / COUNT(*) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (full classic — all columns present): one lineitem scan,
    eight measures, 2×2 groups. The showcase for map-side partial
    aggregation: every partition reduces to ≤4 rows before the
    single tiny shuffle. All money math in exact DECIMAL; averages
    are (exact sum → double) / count so both engines perform the
    identical single IEEE division."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice", "decimal(12,2)"))
        .cast("double")
        .alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(
            _disc_price() * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
        )
        .cast("double")
        .alias("sum_charge"),
        (
            F.sum(dec("l_quantity", "decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_qty"),
        (
            F.sum(dec("l_extendedprice", "decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_price"),
        (
            F.sum(F.col("l_discount").cast("decimal(4,2)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "tpch_q2_best_supplier",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), cand AS (
      SELECT p_partkey, p_type, s_suppkey, s_name, s_acctbal, n_name
      FROM pairs
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'LARGE'
        AND p_size BETWEEN 10 AND 15
    ), best AS (
      SELECT p_partkey, MAX(s_acctbal) AS max_bal FROM cand
      GROUP BY p_partkey
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_type
    FROM cand c JOIN best b
      ON c.p_partkey = b.p_partkey AND c.s_acctbal = b.max_bal
    ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (correlated per-part min/max + join-back). ADAPTED:
    no partsupp table, so the part↔supplier relation is the distinct
    (l_partkey, l_suppkey) pairs observed in lineitem, and the
    correlated MIN(ps_supplycost) becomes MAX(s_acctbal). Plan: the
    distinct-pairs aggregate is the one lineitem shuffle; part /
    supplier / nation / region all broadcast; the per-part max
    joins back on (partkey, exact-double equality — a selection,
    not arithmetic, so cross-engine safe)."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE")
        & F.col("p_size").between(10, 15)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        pairs.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_type", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy("p_partkey").agg(F.max("s_acctbal").alias("max_bal"))
    return (
        cand.join(
            best.withColumnRenamed("p_partkey", "b_partkey"),
            (F.col("p_partkey") == F.col("b_partkey"))
            & (F.col("s_acctbal") == F.col("max_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (EXISTS semi join → priority counts). ADAPTED: no
    l_commitdate/l_receiptdate, so "late order" = any lineitem
    shipped >30 days after the order date. Plan: orders' quarter
    filter pushes to the scan; the EXISTS is a left-semi join on
    l_orderkey with the non-equi lateness condition riding it —
    one shuffle, no second aggregate."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      CAST(YEAR(l_shipdate) AS INT) AS l_year,
      {_REV} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (full classic shape): the nation-pair disjunction over two
    aliases of the same dim. Plan: nation is broadcast TWICE under
    different aliases; the pair predicate rides those broadcasts;
    lineitem⋈orders stays the single fact-fact shuffle."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_revenue().alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT
        CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
        n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT
      o_year,
      CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 (classic shape, 8-table): national market share as a
    conditional-sum / total-sum division. Plan: every dim
    broadcasts (nation twice, region off the customer side);
    lineitem⋈orders is the only shuffle; both sums are exact
    decimals with ONE double division at the end."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_regionkey").alias("n2_regionkey"),
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_regionkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(F.lit(0).cast("decimal(12,2)"))
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT
      n_name AS nation,
      CAST(YEAR(o_orderdate) AS INT) AS o_year,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.8 AS DECIMAL(3,1)))
        AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (profit by supplier-nation × year). ADAPTED: no
    partsupp.ps_supplycost, so unit cost is 0.8 × p_retailprice.
    Plan: the p_name LIKE filter prunes part before its broadcast;
    profit is a single exact-decimal expression summed per
    (nation, year) after the one lineitem⋈orders shuffle."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = _disc_price() - (
        dec("p_retailprice", "decimal(12,2)")
        * dec("l_quantity", "decimal(12,2)")
        * F.lit(0.8).cast("decimal(3,1)")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM v
    WHERE value_dec > (SELECT SUM(value_dec) * 0.001 FROM v)
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (group value > scalar fraction-of-total). ADAPTED:
    no partsupp, so part value = summed extendedprice shipped by
    ASIA-region suppliers. Plan: one shuffle to the per-part
    aggregate; the global total is a 1-row re-aggregation of that
    SAME aggregate (no second lineitem scan) broadcast back as a
    non-equi threshold join. Both sides stay exact DECIMAL until
    the final output cast, so the > comparison is exact in both
    engines."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    per_part = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice", "decimal(12,2)")).alias("value_dec"))
    )
    total = per_part.agg(
        (F.sum("value_dec") * F.lit(0.001).cast("decimal(4,3)")).alias("threshold")
    )
    return (
        per_part.join(
            F.broadcast(total), F.col("value_dec") > F.col("threshold")
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "tpch_q12_late_lines",
    oracle="""
    SELECT
      l_linestatus,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (priority-class CASE pivot over a fact-fact join).
    ADAPTED: no l_shipmode / commit / receipt dates — groups by
    l_linestatus and "late" = shipped >60 days after order date.
    Plan: year filter pushes to the lineitem scan; the lateness
    theta-condition rides the orders equi-join; CASE sums partial-
    aggregate map-side."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) co
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (classic shape; the o_comment NOT LIKE filter becomes an
    o_orderpriority filter — same join-condition placement, which is
    the point: the filter must ride the LEFT join, not precede it,
    or zero-order customers vanish). Plan: one shuffle for the
    outer join + first count, a second tiny shuffle over distinct
    counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (classic shape: revenue view + scalar MAX equality).
    Plan: one shuffle to per-supplier revenue; the MAX is a 1-row
    re-aggregation of that aggregate, broadcast back as an equality
    join. The equality is on the exact DECIMAL sum (NOT the double),
    so ties and cross-engine bit-equality are both exact — the
    classic q15 float-equality trap, dodged by type discipline."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_rev_dec")
    )
    best = revenue.agg(F.max("total_rev_dec").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best), F.col("total_rev_dec") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (distinct-supplier counts per part class, with a
    NOT IN exclusion). ADAPTED: partsupp → distinct lineitem pairs;
    the "complaints" comment filter → negative account balance.
    Plan: the NOT IN is a broadcast left-anti join (supplier is
    tiny); distinct pairs reuse one shuffle; the distinct count
    partial-aggregates."""
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'SMALL'
      AND l_quantity < (
        SELECT 0.5 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2)))
                      AS DOUBLE) / COUNT(*))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (correlated per-part average threshold). ADAPTED:
    no p_container, so the class filter is p_type = 'SMALL'; the
    0.2 factor widens to 0.5 (the testdata's uniform quantities
    make 0.2×avg nearly empty). Plan: the correlated subquery
    decorrelates to ONE per-part aggregate over lineitem joined
    back on partkey — Spark and the oracle both compute
    (exact sum → double)/count then one double multiply, so the
    threshold comparison is bit-identical."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    avg_per_part = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(dec("l_quantity", "decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(dec("l_extendedprice", "decimal(12,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 (classic shape: three-way disjunctive brand/size/qty
    predicates). Plan: the part-side disjuncts (brand ∈ {12,23,24},
    size ≤ 15) factor out and push into the part scan BEFORE the
    broadcast; the mixed lineitem/part disjunction evaluates on the
    joined rows inside codegen — no shuffle at all beyond the final
    1-row aggregate."""
    part_prefilter = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#24") & F.col("p_size").between(1, 15))
    )
    p = table(spark, sf_dir, "part").filter(part_prefilter)
    l = table(spark, sf_dir, "lineitem")
    joint = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(joint)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q20_part_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '%gear%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50
    )
    ORDER BY s_name
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (HAVING-filtered semi join into supplier). ADAPTED:
    no partsupp.ps_availqty, so the threshold is on total shipped
    quantity of the matching parts. Plan: part prunes via LIKE
    before broadcast; per-supplier aggregate is one shuffle; the
    survivor set (≤ #suppliers rows) semi-joins supplier. The
    HAVING compares the exact decimal sum, no float boundary."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    heavy = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity", "decimal(12,2)")).alias("q"))
        .filter(F.col("q") > 50)
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (EXISTS + NOT EXISTS self-join chain: the supplier
    who shipped LAST in a multi-supplier order). ADAPTED: no
    l_receiptdate/commitdate, so "kept waiting" = this supplier's
    ship date strictly exceeds every co-supplier's. Plan: both the
    semi and the anti join hit lineitem keyed on l_orderkey — the
    SAME shuffle key as the orders join, so Catalyst pipelines all
    three into one exchange of lineitem; supplier/nation/region
    broadcast."""
    li = table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    waiting = (
        l1.join(
            l2,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l2,
            (F.col("x_orderkey") == F.col("l_orderkey"))
            & (F.col("x_suppkey") != F.col("l_suppkey"))
            & (F.col("x_shipdate") > F.col("l_shipdate")),
            "left_anti",
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "tpch_q22_global_sales",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 5, 9, 13, 17, 21, 24)
    ), thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             / COUNT(*) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT
      CAST(c_nationkey AS INT) AS cntrycode,
      COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM pool, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (scalar-average threshold + anti join on orders).
    ADAPTED: no c_phone, so country code = c_nationkey over a
    7-nation pool; and because this testdata gives EVERY customer at
    least one order (unlike dbgen, where ~1/3 have none), the anti
    join's right side is the URGENT-priority orders — "above-average
    customers who never placed an urgent order" — so the threshold
    broadcast, anti join, and grouping are exercised on real
    surviving rows at every SF (2 rows at sf0.001, 7 cntrycodes at
    sf0.01+; the all-orders form matched the oracle on 0 rows for
    five rounds — VERDICT r7 item 2). Plan: the pool filter pushes
    to the customer scan; the average is a 1-row broadcast non-equi
    join (exact sum → one double division, identical in both
    engines); the NOT EXISTS is a left-anti join shuffled on custkey
    — the only exchange — with the priority filter pushed to the
    orders scan."""
    pool = table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 5, 9, 13, 17, 21, 24)
    )
    thresh = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal", "decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thresh), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal", "decimal(12,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
