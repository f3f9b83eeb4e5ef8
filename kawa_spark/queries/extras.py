"""Additional query surface: null handling, ordered string agg,
correlated subqueries, time-range window frames, text normalization,
dedup keeper extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.functions.exact import dec
from kawa_spark.io import table
from kawa_spark.registry import register


@register(
    "null_handling",
    oracle="""
    SELECT
      c.c_custkey,
      COALESCE(o.o_orderstatus, 'NONE') AS status_or_none,
      NULLIF(c.c_mktsegment, 'BUILDING') AS seg_nullable,
      CASE WHEN o.o_orderkey IS NULL THEN 0.0 ELSE o.o_totalprice END
        AS price_or_zero,
      o.o_orderkey IS NOT NULL AS has_order
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON o.o_custkey = c.c_custkey
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / conditional defaults over outer-join nulls."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    j = c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
    return j.select(
        "c_custkey",
        F.coalesce("o_orderstatus", F.lit("NONE")).alias("status_or_none"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullable"),
        F.when(F.col("o_orderkey").isNull(), F.lit(0.0))
        .otherwise(F.col("o_totalprice"))
        .alias("price_or_zero"),
        F.col("o_orderkey").isNotNull().alias("has_order"),
    )


@register(
    "agg_string_collect",
    oracle="""
    SELECT
      n_name,
      string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
      COUNT(*) AS n_suppliers
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is unordered by
    contract (task order), so determinism comes from array_sort before
    joining — at any parallelism."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    JOIN (
      SELECT o_custkey,
             2 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*)) AS threshold
      FROM orders GROUP BY o_custkey
    ) t ON t.o_custkey = o.o_custkey
    WHERE o.o_totalprice > t.threshold
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders above 2× their customer's
    average. Catalyst decorrelates this into exactly the aggregate+
    join the oracle states; we build the decorrelated form directly
    with the exact-decimal average so both engines hash-match."""
    o = table(spark, sf_dir, "orders")
    thresholds = o.groupBy(F.col("o_custkey").alias("t_custkey")).agg(
        (
            F.lit(2)
            * (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    return (
        o.join(thresholds, F.col("o_custkey") == F.col("t_custkey"))
        .filter(F.col("o_totalprice") > F.col("threshold"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "window_range_time",
    oracle="""
    SELECT
      user_id,
      event_id,
      ts,
      CAST(SUM(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS rolling_24h_value,
      COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch(ts)
                     RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        AS rolling_24h_events
    FROM events
    """,
)
def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range window frame: per-user rolling 24 h sums — the
    sliding-aggregate pattern that needs RANGE (value-based) frames,
    not ROWS. Ordered on epoch seconds; decimal keeps sums exact."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-86400, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("rolling_24h_value"),
        F.count(F.lit(1)).over(w).alias("rolling_24h_events"),
    )


@register(
    "text_normalize",
    oracle="""
    SELECT
      doc_id,
      lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
                                ' +', ' ', 'g'))) AS norm_text,
      strlen(lower(trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'),
                                       ' +', ' ', 'g')))) AS norm_len
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning pass every text pipeline needs: strip non-alnum,
    collapse whitespace, casefold — pure column expressions."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""), " +", " "
            )
        )
    )
    return d.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


@register(
    "agg_argminmax",
    oracle="""
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) * 100000000
               + o_orderkey AS pricekey
      FROM orders
    )
    SELECT
      o_orderpriority,
      arg_max(o_orderkey, pricekey) AS priciest_order,
      arg_min(o_orderkey, pricekey) AS cheapest_order
    FROM keyed
    GROUP BY o_orderpriority
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by with a tie-proof composite ordering key (price
    in exact cents ⊕ orderkey) — engine-native argmax is
    nondeterministic under ties, so the key makes ties impossible."""
    o = table(spark, sf_dir, "orders")
    pricekey = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(100000000)
        + F.col("o_orderkey")
    )
    k = o.select("o_orderpriority", "o_orderkey", pricekey.alias("pricekey"))
    return k.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", "pricekey").alias("priciest_order"),
        F.min_by("o_orderkey", "pricekey").alias("cheapest_order"),
    )


@register(
    "agg_bitwise_bool",
    oracle="""
    SELECT
      l_returnflag,
      bit_or(l_linenumber) AS lines_or,
      bit_and(l_linenumber) AS lines_and,
      bool_or(l_quantity > 49) AS any_max_qty,
      bool_and(l_quantity > 0) AS all_positive,
      COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_no_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise/boolean aggregates + FILTERed count."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.bit_or("l_linenumber").alias("lines_or"),
        F.bit_and("l_linenumber").alias("lines_and"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_max_qty"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_no_discount"),
    )


@register(
    "scalar_string_extra",
    oracle="""
    SELECT
      p_partkey,
      split_part(p_name, ' ', 1) AS first_word,
      split_part(p_name, ' ', 2) AS second_word,
      translate(p_brand, 'ABC', 'xyz') AS brand_translated,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      repeat(p_type, 2) AS type_doubled,
      reverse(p_name) AS name_reversed,
      CAST(strpos(p_name, 'e') AS INTEGER) AS first_e_pos,
      p_retailprice > 1000 AND p_size >= 25 AS big_and_pricey
    FROM part
    """,
)
def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second tier of the scalar string library (split_part, translate,
    pad/repeat/reverse/locate, boolean expressions)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.translate("p_brand", "ABC", "xyz").alias("brand_translated"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.repeat("p_type", 2).alias("type_doubled"),
        F.reverse("p_name").alias("name_reversed"),
        F.locate("e", F.col("p_name")).cast("int").alias("first_e_pos"),
        ((F.col("p_retailprice") > 1000) & (F.col("p_size") >= 25)).alias(
            "big_and_pricey"
        ),
    )


@register(
    "interval_arithmetic",
    oracle="""
    SELECT
      o_orderkey,
      o_orderdate + INTERVAL '90' DAY AS due_date,
      o_orderdate - INTERVAL '12' HOUR AS half_day_before,
      CAST(o_orderdate AS DATE) + 30 AS ship_by,
      epoch(TIMESTAMP '2002-01-01 00:00:00' - o_orderdate) AS seconds_to_2002
    FROM orders
    """,
)
def interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp/interval arithmetic (day/hour offsets, date math,
    epoch differences) — exact integer semantics in both engines."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 12 HOURS")).alias(
            "half_day_before"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("ship_by"),
        (
            F.lit("2002-01-01 00:00:00").cast("timestamp").cast("double")
            - F.col("o_orderdate").cast("timestamp").cast("double")
        ).alias("seconds_to_2002"),
    )


def _profile_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    parts = [
        f"""
        SELECT '{c}' AS "column",
          COUNT(*) AS n_rows,
          COUNT(*) - COUNT({c}) AS n_nulls,
          COUNT(DISTINCT {c}) AS n_distinct,
          MIN(CAST({c} AS DOUBLE)) AS min_val,
          MAX(CAST({c} AS DOUBLE)) AS max_val,
          CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        FROM lineitem
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@register("data_profile", oracle=_profile_oracle())
def data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan numeric profiling of lineitem (operators/profile.py).
    The oracle's UNION-ALL-per-column form states the semantics; the
    implementation computes all columns in a single aggregate."""
    from kawa_spark.operators.profile import profile_numeric

    return profile_numeric(
        table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
    )


@register(
    "pipeline_dedup_corpus",
    oracle="""
    WITH normed AS (
      SELECT doc_id, lang, n_chars,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
      FROM documents
    ), keepers AS (
      SELECT MIN(doc_id) AS keeper_id
      FROM normed GROUP BY md5(norm)
    ), kept AS (
      SELECT n.* FROM normed n JOIN keepers k ON k.keeper_id = n.doc_id
    )
    SELECT
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      CAST(SUM(CASE WHEN strlen(norm) >= 100 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_long_docs
    FROM kept
    GROUP BY lang
    """,
)
def pipeline_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition: normalize →
    exact-dedup (keeper policy) → quality gate → per-language stats —
    the multi-stage flow a real corpus build runs, as ONE declarative
    plan (Catalyst fuses the stages; nothing materializes between)."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    normed = d.select("doc_id", "lang", "n_chars", norm.alias("norm"))
    keepers = normed.groupBy(F.md5("norm").alias("h")).agg(
        F.min("doc_id").alias("keeper_id")
    )
    kept = normed.join(
        keepers, F.col("doc_id") == F.col("keeper_id"), "left_semi"
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.sum(F.when(F.length("norm") >= 100, 1).otherwise(0))
        .cast("long")
        .alias("n_long_docs"),
    )


@register(
    "text_edit_distance",
    oracle="""
    WITH heads AS (
      SELECT doc_id, lang, substring(text, 1, 40) AS head
      FROM documents WHERE doc_id < 200
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist
    FROM heads a JOIN heads b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 20
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-match pairs on document heads, blocked by
    lang — the character-level fuzzy-match primitive (complementing
    the token-level jaccard ops). Integer distances → exact oracle."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "lang", F.substring("text", 1, 40).alias("head"))
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 20)
    )


@register(
    "json_roundtrip",
    oracle="""
    SELECT
      event_id,
      CAST(props->>'$.k' AS INTEGER) AS k,
      json_object('event_id', event_id, 'type', event_type,
                  'k', CAST(props->>'$.k' AS INTEGER)) AS reencoded
    FROM events
    """,
)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full JSON surface: parse (from_json) → restructure → re-emit
    (to_json). Field order in to_json follows the struct definition,
    matched to the oracle's json_object order."""
    e = table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    reencoded = F.to_json(
        F.struct(
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("type"),
            k.alias("k"),
        )
    )
    return e.select("event_id", k.alias("k"), reencoded.alias("reencoded"))


@register(
    "dedup_keeper_corpus",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d
    JOIN (
      SELECT MIN(doc_id) AS keeper_id
      FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ) k ON k.keeper_id = d.doc_id
    """,
)
def dedup_keeper_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual dedup OUTPUT: the corpus restricted to keeper rows
    (min doc_id per normalized content hash) via a semi-join — the
    materialization step after dedup_exact_norm's group pass."""
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    keepers = d.groupBy(F.md5(norm).alias("h")).agg(
        F.min("doc_id").alias("keeper_id")
    )
    return d.join(
        keepers, F.col("doc_id") == F.col("keeper_id"), "left_semi"
    ).select("doc_id", "lang", "n_chars")
