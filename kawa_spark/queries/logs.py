"""Log-pattern extraction — drain-style message templating.

kawa's whole reason to exist is shuttling security/observability log
streams (/root/reference/README.md:7-16); the first analytical thing
every log platform does with those streams is collapse raw messages
into TEMPLATES ("user <NUM> logged in from <IP>") so operators see a
few hundred patterns instead of billions of lines. The classic online
algorithm is Drain (He et al., ICWS 2017 — a fixed-depth parse tree
over token prefixes); its batch-equivalent core is deterministic
masking of variable tokens followed by a group-by on the masked
string, which is exactly expressible as column regexes + one
aggregate, so the whole operator stays JVM-side and oracle-checkable.

The masking tiers mirror what log templaters ship: IPv4s, then hex
runs (ids/digests), then bare integers/decimals. Order matters — an
IP would otherwise be eaten token-wise by the number rule — and both
engines apply the same ordered rewrites, so templates hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.io import table
from kawa_spark.registry import register

# ordered masking rules (applied first to last); POSIX-compatible so
# the identical pattern strings run in Spark (Java regex) and DuckDB
# (RE2) with the same semantics
MASK_RULES: list[tuple[str, str]] = [
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b0x[0-9a-fA-F]+\b|\b[0-9a-f]{8,}\b", "<HEX>"),
    (r"\b\d+(\.\d+)?\b", "<NUM>"),
]


def mask_template(col: F.Column) -> F.Column:
    """Apply the ordered masking rules to a message column."""
    out = col
    for pat, repl in MASK_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def _mask_sql(expr: str) -> str:
    """The identical rewrite chain in DuckDB SQL ('g' = replace all,
    Spark's regexp_replace default)."""
    out = expr
    for pat, repl in MASK_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


_RAW_MSG_SQL = (
    "event_type || ' uid=' || CAST(user_id AS VARCHAR) || ' ' || props"
)


def raw_msg_col() -> F.Column:
    """The Spark twin of ``_RAW_MSG_SQL`` — the one place the
    synthetic raw-log-line shape lives (needs event_type, user_id,
    props in scope)."""
    return F.concat(
        F.col("event_type"),
        F.lit(" uid="),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("props"),
    )


@register(
    "logs_pattern_templates",
    oracle=f"""
    WITH msgs AS (
      SELECT user_id,
             {_RAW_MSG_SQL} AS msg,
             {_mask_sql(_RAW_MSG_SQL)} AS template
      FROM events
    )
    SELECT template,
           COUNT(*) AS n_lines,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(msg) AS sample_msg
    FROM msgs
    GROUP BY template
    ORDER BY n_lines DESC, template
    """,
)
def logs_pattern_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse raw log lines into templates with per-template volume,
    distinct-actor count, and a deterministic sample line (the MIN raw
    message, so both engines pick the same exemplar).

    The raw line is synthesized from the event row (type + uid +
    props JSON) — the shape kawa's deserialized envelopes carry
    (/root/reference/types.go:163-195 turns raw bytes into exactly
    such typed-field + payload records).

    Scale: masking is per-row JVM regex (whole-stage codegen — no
    UDF); the aggregate shuffles on the TEMPLATE, whose cardinality
    is the pattern count (~10²-10³ in real deployments, per the Drain
    paper), not line volume, with map-side combine doing the heavy
    lifting. COUNT(DISTINCT user_id) expands to the standard
    two-level aggregate; a deployment wanting it cheaper at 10⁹
    users/template swaps in approx_count_distinct or the KMV sketch
    (stats.kmv_distinct) — same plan shape."""
    e = table(spark, sf_dir, "events")
    msg = raw_msg_col()
    return (
        e.select(
            "user_id",
            msg.alias("msg"),
            mask_template(msg).alias("template"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("msg").alias("sample_msg"),
        )
        .orderBy(F.col("n_lines").desc(), "template")
    )


DAY_US = 86_400 * 1_000_000


def daily_template_counts(df: DataFrame) -> DataFrame:
    """Core: (template, day, n_lines) from any frame carrying
    ``us`` (epoch micros) and ``template`` — exact floor-division day
    buckets (functions/exact.floordiv ≡ DuckDB ``//``)."""
    from kawa_spark.functions.exact import floordiv

    return (
        df.select(floordiv(F.col("us"), DAY_US).alias("day"), "template")
        .groupBy("template", "day")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


def drift_enrich(daily: DataFrame) -> DataFrame:
    """Core of logs_template_drift over any (template, day, n_lines)
    table: appends day_total (that day's traffic) and prev_n (the
    template's previous OBSERVED day's count). Both windows run over
    the aggregated patterns×days table. The registered key projects
    share/growth/new-template from this; examples/security_analytics.py
    filters it for surge alerts."""
    w_day = Window.partitionBy("day")
    w_tpl = Window.partitionBy("template").orderBy("day")
    return daily.select(
        "template",
        "day",
        "n_lines",
        F.sum("n_lines").over(w_day).cast("long").alias("day_total"),
        F.lag("n_lines").over(w_tpl).cast("long").alias("prev_n"),
    )


# Shared verbatim by the batch key below and the online twin's
# oracle (streaming_mode.py::stream_exec_template_drift) so the two
# can never drift — the security.py FIRST_SEEN_SQL convention.
TEMPLATE_DRIFT_SQL = f"""
    WITH msgs AS (
      SELECT epoch_us(ts) // {DAY_US} AS day,
             {_mask_sql(_RAW_MSG_SQL)} AS template
      FROM events
    ), daily AS (
      SELECT template, day, COUNT(*) AS n_lines
      FROM msgs GROUP BY template, day
    ), enriched AS (
      SELECT template, day, n_lines,
             CAST(SUM(n_lines) OVER (PARTITION BY day) AS BIGINT)
               AS day_total,
             LAG(n_lines) OVER (PARTITION BY template ORDER BY day)
               AS prev_n
      FROM daily
    )
    SELECT template, day, n_lines, day_total,
           CAST(n_lines AS DOUBLE) / day_total AS day_share,
           CAST(prev_n AS BIGINT) AS prev_n,
           CASE WHEN prev_n IS NOT NULL
                THEN CAST(n_lines AS DOUBLE) / prev_n END AS growth,
           prev_n IS NULL AS is_new_template
    FROM enriched
    """


@register("logs_template_drift", oracle=TEMPLATE_DRIFT_SQL)
def logs_template_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template drift report — the operational layer on top of
    logs_pattern_templates: per (template, day) volume, its share of
    that day's traffic, growth vs the template's previous OBSERVED
    day, and a new-template flag (the signal log platforms alert on:
    a pattern that didn't exist yesterday, or one growing 10×).

    Exactness: day buckets are exact floor division of epoch-micros
    (functions/exact.floordiv ≡ DuckDB ``//`` — including pre-1970);
    counts are integers; share/growth are single double divisions of
    exact integers.

    Scale: masking is map-side regex; the daily aggregate shuffles on
    (template, day) with map-side combine — rows ∝ patterns × days.
    Both windows and the lag run over that aggregated table
    (|patterns|·|days| rows — thousands), so the heavy stage is the
    one aggregate, exactly like events_anomaly_zscore's hourly
    pre-aggregation."""
    e = table(spark, sf_dir, "events")
    msg = raw_msg_col()
    return drift_report(
        daily_template_counts(
            e.select(
                F.unix_micros("ts").alias("us"),
                mask_template(msg).alias("template"),
            )
        )
    )


def drift_report(daily: DataFrame) -> DataFrame:
    """The registered drift projection over any (template, day,
    n_lines) table — shared VERBATIM by the batch key (whose counts
    come from the batch aggregate) and the online twin (whose counts
    come from the streaming aggregate's complete-mode drain,
    streaming_mode.py::stream_exec_template_drift)."""
    enriched = drift_enrich(daily)
    return enriched.select(
        "template",
        "day",
        "n_lines",
        "day_total",
        (F.col("n_lines").cast("double") / F.col("day_total")).alias(
            "day_share"
        ),
        "prev_n",
        F.when(
            F.col("prev_n").isNotNull(),
            F.col("n_lines").cast("double") / F.col("prev_n"),
        ).alias("growth"),
        F.col("prev_n").isNull().alias("is_new_template"),
    )
