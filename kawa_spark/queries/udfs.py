"""UDF surface — kawa's Handler is arbitrary user code
(/root/reference/types.go:122-135); in Spark that surface is:

* pandas_udf        — vectorized scalar functions (Arrow batches)
* applyInPandas     — grouped map / UDAF-style aggregation
* mapInPandas       — arbitrary partition-wise transform (see
                      llm_multimodal.py)

Row-at-a-time @udf is deliberately absent: at 100 TB it is 10-100×
slower than the Arrow paths and never necessary.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from kawa_spark.io import table
from kawa_spark.registry import register


@register(
    "udf_python",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF. Per-row IEEE ops (no aggregation), so
    the result is bit-identical to the oracle's column expression —
    the hash check covers the whole Arrow round-trip."""

    @F.pandas_udf(DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        disc_price(F.col("l_extendedprice"), F.col("l_discount")).alias("disc_price"),
    )


@register(
    "udtf_lateral",
    oracle="""
    WITH d AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
    ), toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS ws
      FROM d
    )
    SELECT doc_id, u.word, CAST(u.pos AS INT) AS pos,
           len(u.word) > 6 AS is_long
    FROM (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws)),
                    i -> {'word': ws[i], 'pos': i - 1})) AS u
      FROM toks
    )
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → N output rows with
    arbitrary Python logic, invoked via LATERAL join — the
    table-function face of kawa's 1→N Handler. (For pure splitting,
    explode() is the fast path — a UDTF earns its cost only when the
    expansion logic is genuinely procedural.) The tokenizer's output
    is deterministic (whitespace split + enumerate), so the UDTF
    execution path itself is hash-checked against a pure-SQL twin.

    ARROW-optimized (r13, in-window change): ``useArrow=True`` moves
    the JVM↔Python row transfer onto Arrow batches — the plan node is
    ArrowEvalPythonUDTF instead of row-at-a-time BatchEvalPythonUDTF,
    the one registered plan the mechanical scale audit still flagged
    (the repo-wide row-UDF ban, udfs.py:9, now holds for the UDTF
    surface too); output values are identical and stay hash-checked."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int, is_long boolean", useArrow=True)
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i, len(w) > 6

    spark.udtf.register("kawa_tokenize", Tokenize)
    table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 200
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.pos, t.is_long
        FROM udtf_docs d, LATERAL kawa_tokenize(d.text) t
        """
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      -- outer CAST: DuckDB SUM(BIGINT) yields HUGEINT, which the
      -- driver canonicalizer stringifies differently from Spark's long
      CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      MIN(user_id) AS min_user
    FROM events
    GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via applyInPandas: each group arrives as one pandas
    DataFrame. Integer reductions only, so the custom aggregation
    hash-matches the SQL twin exactly.

    Scale note: applyInPandas shuffles whole groups to single tasks —
    fine for bounded group sizes; for giant groups prefer two-phase
    (mapInPandas partial + groupBy merge)."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )

    schema = "event_type string, n_events long, sum_k long, min_user long"

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        # mirror SQL null semantics: SUM/MIN over an all-NULL column is
        # NULL, not 0 (pandas sum() of all-NaN returns 0.0, which would
        # silently diverge from the oracle; int(nan) would raise)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(pdf)],
                "sum_k": [
                    int(pdf["k"].sum()) if pdf["k"].count() > 0 else None
                ],
                "min_user": [
                    int(pdf["user_id"].min())
                    if pdf["user_id"].count() > 0
                    else None
                ],
            }
        )

    return e.groupBy("event_type").applyInPandas(agg, schema=schema)
