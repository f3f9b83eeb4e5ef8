"""Event-time operators, batch twins of the streaming surface.

Every query here also runs in streaming mode (see
kawa_spark/streaming/jobs.py and tests/test_streaming.py) — the batch
form is what the DuckDB oracle checks; Structured Streaming executes
the identical logical plan incrementally with watermarks.

kawa parity: the reference has NO event-time model (SURVEY.md §1.1) —
its only clock is the batcher's wall-clock flush timer
(/root/reference/x/batcher/batcher.go:341-371). These operators are
the mandate (M) extension, built on Spark's native event-time support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.functions.exact import dec, floordiv
from kawa_spark.io import table
from kawa_spark.registry import register


@register(
    "stream_tumbling_count",
    oracle="""
    SELECT
      date_trunc('hour', ts) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window ≙ the batcher's FlushFrequency trigger
    (/root/reference/x/batcher/batcher.go:346) promoted from wall time
    to event time. window('1 hour') is epoch-aligned = date_trunc."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT
      TIMESTAMP '1970-01-01 00:00:00'
        + (CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - 300 * off)
          * INTERVAL '1 second' AS window_start,
      event_type,
      COUNT(*) AS n_events
    FROM events CROSS JOIN (VALUES (0), (1)) AS offs(off)
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window 10 min / slide 5 min: each event lands in
    exactly two windows (starts at its 5-min bucket and 5 min before),
    which is what the oracle enumerates explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


@register(
    "stream_session",
    oracle="""
    WITH gaps AS (
      SELECT
        user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM gaps
    )
    SELECT
      user_id,
      MIN(ts) AS session_start,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via the native
    session_window — in streaming this runs on the state store with
    watermark-driven eviction; the oracle is the gaps-and-islands
    formulation. Session start == min event ts in both."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-dedup ≙ streaming dropDuplicates with watermark (state-store
    backed in stream mode; see streaming/jobs.py). Only the key columns
    are emitted so batch/stream/oracle agree deterministically."""
    e = table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").dropDuplicates()


@register(
    "stateful_running_total",
    oracle="""
    SELECT
      event_id, user_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(12,2)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_total
    FROM events
    """,
)
def stateful_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total. Batch: a window cumsum. Streaming: the
    same semantics via transformWithStateInPandas/applyInPandasWithState
    (streaming/stateful.py). Decimal accumulation keeps it exact."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("running_total"),
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "events_sessionize_batch",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS new_session
      FROM t
    ), sessions AS (
      SELECT user_id, event_id, ts_us,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_idx
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap — the lag→flag→running-
    sum→aggregate idiom (the batch twin of session_window, which
    covers the streaming side in stream_session). All timestamps as
    integer epoch-micros, so every boundary compare and the duration
    arithmetic are exact in both engines.

    Scale: both windows and the final aggregate partition on user_id —
    ONE shuffle total, state bounded per user. This is the shape that
    replaces per-event stateful code for offline session builds."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


# Shared verbatim by the batch key below and the online twin's
# oracle (streaming_mode.py::stream_exec_funnel) so the two can
# never drift — the FIRST_SEEN_SQL convention.
FUNNEL_SQL = """
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ), v AS (
      SELECT user_id, MIN(us) AS t_view FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.us) AS t_click
      FROM ev e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.us > v.t_view
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.us) AS t_purchase
      FROM ev e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.us > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                AS INTEGER) AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    """


@register("events_funnel", oracle=FUNNEL_SQL)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (view → click → purchase): per
    user, the first view, the first click strictly AFTER that view,
    and the first purchase strictly after that click — the ordered
    multi-step pattern a plain groupBy can't express (a click before
    any view must not count). Stage = how far the user got.

    Epoch-micros integer comparisons throughout (the sessionize
    idiom), so every boundary is exact in both engines. Scale: each
    funnel step is a groupBy/join keyed on user_id — Catalyst reuses
    one hash-partitioning across the chain; per-step state is one
    timestamp per user, never the event list. Step K's input is
    filtered to one event_type BEFORE its join, so the joins move
    |users|-sized tables, not the event log."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    return funnel_stages(ev)


def funnel_stages(ev: DataFrame) -> DataFrame:
    """Core funnel over any (user_id, event_type, us) frame —
    events_funnel binds it to the events table; the property test
    (tests/test_funnel_property.py) drives it on random synthetic
    streams against a brute-force Python reference."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    ).cast("int")
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", stage.alias("stage"))
    )


DAY_US = 86_400 * 1_000_000
HOUR_US = 3_600 * 1_000_000


@register(
    "events_retention_cohorts",
    oracle=f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) // {DAY_US} AS day FROM events
    ), cohort AS (
      SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
    ), sizes AS (
      SELECT cohort_day, COUNT(*) AS cohort_n
      FROM cohort GROUP BY cohort_day
    ), activity AS (
      SELECT DISTINCT c.cohort_day,
             CAST((e.day - c.cohort_day) // 7 AS BIGINT) AS week_offset,
             e.user_id
      FROM e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT a.cohort_day,
           a.week_offset,
           COUNT(*) AS n_active,
           s.cohort_n,
           CAST(COUNT(*) AS DOUBLE) / s.cohort_n AS retention
    FROM activity a JOIN sizes s ON a.cohort_day = s.cohort_day
    GROUP BY a.cohort_day, a.week_offset, s.cohort_n
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort table — the other classic sequential-behavior
    report next to the funnel: users grouped by first-seen day, and
    for each week offset since that day, how many of the cohort were
    active (any event). All integer day/week bucket arithmetic in
    epoch-micros; the single float is the final retention division of
    identical exact counts.

    Scale: cohort assignment is one user_id aggregate; activity
    dedups (cohort_day, week_offset, user_id) — shuffle keyed on the
    user (the join) then the cohort cell (the distinct+count); cohort
    sizes are a |days|-row table joined back (broadcastable at any
    corpus — days, not users). Nothing holds per-user event lists."""
    e = table(spark, sf_dir, "events").select(
        "user_id", floordiv(F.unix_micros("ts"), DAY_US).alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_n"))
    activity = (
        e.join(cohort, "user_id")
        .select(
            "cohort_day",
            floordiv(F.col("day") - F.col("cohort_day"), 7).alias(
                "week_offset"
            ),
            "user_id",
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "week_offset",
            "n_active",
            "cohort_n",
            (F.col("n_active").cast("double") / F.col("cohort_n")).alias(
                "retention"
            ),
        )
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             (epoch_us(ts) // {HOUR_US}) AS slot,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    ), base AS (
      SELECT event_type, slot, n_events,
             COUNT(*) OVER w AS base_n,
             SUM(n_events) OVER w AS base_sum,
             SUM(n_events * n_events) OVER w AS base_sumsq
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY slot
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(slot * {HOUR_US} AS BIGINT) AS hour_us,
           n_events,
           CAST(base_n AS BIGINT) AS base_n,
           CASE WHEN base_n >= 6 AND
                     CAST(base_sumsq AS DOUBLE)
                       - CAST(base_sum AS DOUBLE) * base_sum / base_n > 0
                THEN (n_events - CAST(base_sum AS DOUBLE) / base_n)
                     / sqrt((CAST(base_sumsq AS DOUBLE)
                             - CAST(base_sum AS DOUBLE) * base_sum / base_n)
                            / (base_n - 1))
                ELSE NULL END AS zscore,
           COALESCE(abs(
             CASE WHEN base_n >= 6 AND
                       CAST(base_sumsq AS DOUBLE)
                         - CAST(base_sum AS DOUBLE) * base_sum / base_n > 0
                  THEN (n_events - CAST(base_sum AS DOUBLE) / base_n)
                       / sqrt((CAST(base_sumsq AS DOUBLE)
                               - CAST(base_sum AS DOUBLE) * base_sum / base_n)
                              / (base_n - 1))
                  ELSE NULL END) > 3.0, FALSE) AS is_anomaly
    FROM base
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the event stream — the security-log
    staple of the reference's own domain: each (event_type, hour)'s
    count is scored against the TRAILING 24 hours' mean/stddev
    (the current hour excluded from its own baseline), flagged at
    |z| > 3. Needs ≥6 baseline hours and non-zero variance, else the
    score is null and the flag false.

    Exactness: hourly counts are integers; the rolling mean/variance
    come from integer power sums (Σx, Σx² over ≤24 BIGINT counts —
    exact in both engines), with the z computed in double from
    identical exact operands — so even the boolean flag hash-matches
    the oracle, rare for anything involving stddev (engine-native
    accumulators differ in summation order; see stats.py's same
    discipline).

    Scale: one hourly aggregate (shuffle on (type, slot) with
    map-side combine — output rows ∝ types × hours regardless of
    event volume), then ONE window per type over that aggregated
    table. The window's partition is |hours| rows per type — years
    of hourly data is ~10⁴ rows per key, trivially in-task."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            floordiv(F.unix_micros("ts"), HOUR_US).alias("slot"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("slot")
        .rowsBetween(-24, -1)
    )
    base = hourly.select(
        "event_type",
        "slot",
        "n_events",
        F.count(F.lit(1)).over(w).alias("base_n"),
        F.sum("n_events").over(w).alias("base_sum"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("base_sumsq"),
    )
    var_num = (
        F.col("base_sumsq").cast("double")
        - F.col("base_sum").cast("double") * F.col("base_sum") / F.col("base_n")
    )
    z = F.when(
        (F.col("base_n") >= 6) & (var_num > 0),
        (F.col("n_events") - F.col("base_sum").cast("double") / F.col("base_n"))
        / F.sqrt(var_num / (F.col("base_n") - 1)),
    )
    return base.select(
        "event_type",
        (F.col("slot") * HOUR_US).cast("long").alias("hour_us"),
        "n_events",
        F.col("base_n").cast("long").alias("base_n"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


RATE_WINDOW_US = 6 * HOUR_US  # trailing rate-limit window
RATE_LIMIT = 3  # max events per user per window before flagging


def rate_limit_annotate(
    df: DataFrame,
    window_us: int = RATE_WINDOW_US,
    limit: int = RATE_LIMIT,
) -> DataFrame:
    """Core of events_rate_limit over any frame carrying (user_id,
    us): append n_in_window (trailing RANGE count, inclusive) and
    is_limited, preserving every other column. The registered key
    binds it to the events table; examples/security_analytics.py
    drives it on the debounced stream."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    n = F.count(F.lit(1)).over(w)
    return df.select(
        "*", n.alias("n_in_window"), (n > limit).alias("is_limited")
    )


@register(
    "events_rate_limit",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
    )
    SELECT event_id, user_id, event_type, us,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {RATE_WINDOW_US} PRECEDING AND CURRENT ROW
           ) AS n_in_window,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {RATE_WINDOW_US} PRECEDING AND CURRENT ROW
           ) > {RATE_LIMIT} AS is_limited
    FROM t
    """,
)
def events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window rate limiting — the security-log primitive of
    the reference's domain (kawa ships log events; a rate limiter is
    the canonical per-key detection on top): each event is annotated
    with how many events its user produced in the trailing window
    (inclusive), and flagged once that exceeds the limit. The RANGE
    frame means simultaneous events (ties on us) see each other
    symmetrically in BOTH engines — no tie-break needed, unlike a
    ROWS frame.

    Exactness: integer epoch-micros ordering and integer counts; the
    flag is an integer comparison. Nothing floats.

    Scale: ONE shuffle on user_id; the range window is a single
    ordered pass per user. The frame pointers advance monotonically,
    but WindowExec buffers the WHOLE user partition in an
    ExternalAppendOnlyUnsafeRowArray (spilling to disk past
    spark.sql.windowExec.buffer.spill.threshold) — rows are not
    evicted as the frame slides (ADVICE r8). Per-key memory is
    therefore bounded by that key's total events with disk spill as
    the backstop, not by the window width; the streaming twin
    (streaming/stateful.py::rate_limited) is the form whose state IS
    window-bounded. Batch form shown to the oracle."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    return rate_limit_annotate(e)


HH_TOP_K = 10  # heavy hitters kept per event_type


def top_k_by_count(
    counts: DataFrame,
    part_col: str = "event_type",
    count_col: str = "n_events",
    tie_col: str = "user_id",
    k: int = HH_TOP_K,
) -> DataFrame:
    """Core of events_heavy_hitters over any pre-aggregated count
    table: deterministic rank (count desc, tie asc) filtered to the
    top K per partition — the shape Catalyst recognizes as a
    WindowGroupLimit on both shuffle sides. Preserves every column of
    ``counts``; the registered key binds it to (type, user) event
    counts, examples/security_analytics.py to the debounced stream's."""
    w = Window.partitionBy(part_col).orderBy(
        F.col(count_col).desc(), tie_col
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


@register(
    "events_heavy_hitters",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, user_id,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY event_type, user_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY n_events DESC, user_id) AS rank
      FROM counts
    )
    SELECT event_type, user_id, n_events, total_value,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {HH_TOP_K}
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K heavy hitters per event_type — who is hammering
    each endpoint. Deterministic tie-break on user_id so both engines
    rank identically; value totals ride along in exact DECIMAL.

    Scale: the groupBy pre-aggregates with map-side combine, so
    everything downstream runs over the (type, user) COUNT table —
    rows ∝ distinct pairs, never event volume. The rank-≤-K filter
    is recognized by Catalyst as a WindowGroupLimit and pushed to
    BOTH sides of the window's shuffle (verified in the formatted
    plan): each map task forwards only its local top-K per type, so
    the exchange carries ≤ K·partitions rows per type and no task
    ever sorts a full 10⁹-user partition — the "partial top-K +
    merge" pattern, already synthesized by the optimizer from the
    declarative form. An approximate (Misra-Gries / space-saving)
    sketch is deliberately NOT the registered form: its output
    depends on encounter order, which no deterministic oracle can
    mirror — agg_kmv_distinct covers the deterministic-sketch
    territory."""
    counts = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )
    return top_k_by_count(counts)


DEBOUNCE_GAP_US = 5 * 60 * 1_000_000  # adjacent-duplicate window


def adjacent_dedup(
    df: DataFrame, gap_us: int = DEBOUNCE_GAP_US
) -> DataFrame:
    """Core of events_dedup_adjacent over any frame carrying
    (user_id, event_id, event_type, us): drop rows repeating the same
    user's previous type within the gap, preserving every other
    column. The registered key binds it to the events table;
    examples/security_analytics.py runs it with a template column
    riding along."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = df.select(
        "*",
        F.lag("event_type").over(w).alias("__prev_type"),
        F.lag("us").over(w).alias("__prev_us"),
    )
    keep = (
        F.col("__prev_us").isNull()
        | ~F.col("__prev_type").eqNullSafe(F.col("event_type"))
        | (F.col("us") - F.col("__prev_us") > gap_us)
    )
    return t.filter(keep).drop("__prev_type", "__prev_us")


@register(
    "events_dedup_adjacent",
    oracle=f"""
    WITH t AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value,
             LAG(event_type) OVER w AS prev_type,
             LAG(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT event_id, user_id, event_type, us, value
    FROM t
    WHERE prev_us IS NULL
       OR prev_type IS DISTINCT FROM event_type
       OR us - prev_us > {DEBOUNCE_GAP_US}
    """,
)
def events_dedup_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / adjacent-duplicate suppression — the at-least-once
    ingest cleanup every log shuttle needs downstream (kawa's own
    delivery guarantee is at-least-once, /root/reference/README.md:
    33-38, so consumers see occasional duplicate bursts): an event is
    dropped when the SAME user's immediately-previous event has the
    same type within the debounce gap. Unlike stream_dedup (global
    key dedup), this keeps later re-occurrences — only back-to-back
    repeats collapse.

    Exactness: one lag window on integer epoch-micros with a
    deterministic (us, event_id) order; the survival predicate is
    pure integer/equality logic (IS DISTINCT FROM handles a null
    prev_type identically in both engines).

    Scale: ONE shuffle on user_id, then a per-row predicate — the
    window state is a single previous row per user. The streaming
    twin is dropDuplicatesWithinWatermark keyed on (user, type) —
    batch form shown to the oracle."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("us"), "value",
    )
    return adjacent_dedup(e)


@register(
    "events_markov_transitions",
    oracle="""
    WITH t AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      FROM t WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), totals AS (
      SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n,
           CAST(t.n_from AS BIGINT) AS n_from,
           CAST(p.n AS DOUBLE) / t.n_from AS p_transition
    FROM pairs p JOIN totals t USING (from_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov chain: counts and conditional
    probabilities of consecutive event-type transitions per user —
    the model behind "this session's behavior is improbable" security
    scoring and next-action prediction alike.

    Exactness: transition pairs come from a deterministic
    (us, event_id)-ordered lead; counts are integers and the
    probability is one double division of exact integers — both
    engines land identical bits.

    Scale: the lead window shuffles on user_id (bounded state: one
    row lookahead); the pair count shuffles on (from, to) — |types|²
    rows with map-side combine; the totals join is a |types|-row
    broadcast. Nothing scales with event volume past the first
    aggregate."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        "n_from",
        (F.col("n").cast("double") / F.col("n_from")).alias("p_transition"),
    )


@register(
    "events_cooccurrence_lift",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n_users AS (
      SELECT COUNT(DISTINCT user_id) AS n FROM inc
    ), per_type AS (
      SELECT event_type, COUNT(*) AS n_t FROM inc GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM inc a JOIN inc b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           CAST(ta.n_t AS BIGINT) AS n_a,
           CAST(tb.n_t AS BIGINT) AS n_b,
           CAST(p.n_ab AS DOUBLE) / u.n AS support,
           (CAST(p.n_ab AS DOUBLE) / ta.n_t) * (CAST(u.n AS DOUBLE) / tb.n_t)
             AS lift
    FROM pairs p
    JOIN per_type ta ON p.type_a = ta.event_type
    JOIN per_type tb ON p.type_b = tb.event_type
    CROSS JOIN n_users u
    """,
)
def events_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over the user × event-type incidence — the
    market-basket support/lift table ("users who trigger A also
    trigger B more than chance predicts"), the classic co-occurrence
    analytic over security and product logs alike. lift > 1 means the
    pair co-occurs above independence.

    Exactness: all counts are integers over the DISTINCT incidence;
    support and lift are double expressions of exact integers,
    written identically in both engines. Lift is computed as
    (n_ab/n_a)·(n/n_b) — never forming the n_a·n_b integer product,
    which at corpus scale wraps silently in non-ANSI Spark while the
    DuckDB oracle errors on HUGEINT overflow (ADVICE r8).

    Scale: the incidence dedup shuffles on (user, type) and its
    EXCHANGE IS REUSED — the self-join's two sides are byte-identical
    subplans under their aliases, so AQE's exchange reuse collapses
    them onto one shuffle whose files on disk serve as the cache
    (2 ReusedExchange nodes in the executed plan, verified); the
    count-distinct consumers plan narrower column-pruned aggregates
    of their own, which is cheaper than rescanning the cache would
    be. That replaces the earlier ``persist()`` (which leaked: a
    registry sweep never unpersisted it — ADVICE r8) with zero cache
    lifecycle.
    The self-join keys on user_id, where each user contributes ≤
    |types| rows, so join output is bounded by Σ_u |types_u|² — with
    a bounded type vocabulary this is linear in users, never in
    event volume. The pair aggregate lands on |types|² rows;
    per-type totals and the 1-row user count are broadcasts. For an
    UNBOUNDED item vocabulary (true market-basket at 10⁶ SKUs) the
    production guard is frequency pruning first (drop types below
    min-support — the a-priori property), implemented as
    ``cooccurrence_lift(inc, min_support=)`` below (the registered
    key runs unpruned: the testdata vocabulary is bounded)."""
    inc = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    return cooccurrence_lift(inc)


def cooccurrence_lift(inc: DataFrame, min_support: int = 0) -> DataFrame:
    """Core association miner over a DISTINCT (user_id, event_type)
    incidence — events_cooccurrence_lift binds it to events.

    ``min_support > 0`` is the unbounded-vocabulary production guard
    (a-priori property: a pair can never beat the support of its
    rarest item, so items below min-support cannot appear in any
    qualifying pair): per_type is filtered FIRST and the incidence
    semi-joined against the survivors before the user-keyed self-
    join, bounding the join input by the pruned Σ|types_u|².
    Support and totals are computed over the FULL incidence (pruning
    selects items, it does not re-define the corpus), so a surviving
    pair's numbers equal the unpruned run's — asserted by
    tests/test_cooccurrence_prune.py."""
    n_users = inc.agg(F.countDistinct("user_id").alias("n"))
    per_type = inc.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    kept = inc
    if min_support > 0:
        frequent = per_type.filter(F.col("n_t") >= min_support).select(
            "event_type"
        )
        kept = inc.join(F.broadcast(frequent), "event_type")
    a = kept.select("user_id", F.col("event_type").alias("type_a"))
    b = kept.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ta = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    tb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (F.col("n_ab").cast("double") / F.col("n")).alias("support"),
            (
                (F.col("n_ab").cast("double") / F.col("n_a"))
                * (F.col("n").cast("double") / F.col("n_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# event-type x day-of-week association (time-of-week structure)
# ---------------------------------------------------------------------------

# lift > DOW_NUM/DOW_DEN flags a cell as over-represented; evaluated
# as the cross-multiplied integer inequality
#   DEN·n_obs·n_total > NUM·n_type·n_dow
# in DECIMAL(38,0)/HUGEINT-safe casts (the beaconing discipline), so
# the boolean never touches a float and survives 100-TB marginals
# (n_obs·n_total ~ 1e24 wraps int64, fits 38 digits).
DOW_NUM, DOW_DEN = 3, 2

# A deterministic weekly-periodic stream planted in BOTH engines (the
# MAD_PLANT_SQL convention): DOW_PLANT_N events of a synthetic type,
# exactly 7 days apart, so ONE (type, dow) cell concentrates the
# type's whole mass (lift ≈ 7 ≫ 3/2 — the true class), while the
# Poisson-uniform natural types sit at lift ≈ 1 (the false class).
DOW_PLANT_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
DOW_PLANT_N = 70
DOW_PLANT_SQL = f"""
      SELECT 'planted_dowpeak' AS event_type,
             {DOW_PLANT_BASE_US} + i * 7 * {DAY_US} AS ts_us
      FROM generate_series(0, {DOW_PLANT_N - 1}) AS t(i)"""


def _dow_planted(spark: SparkSession) -> DataFrame:
    """Spark twin of DOW_PLANT_SQL (value-identical rows)."""
    return spark.range(DOW_PLANT_N).select(
        F.lit("planted_dowpeak").alias("event_type"),
        (F.lit(DOW_PLANT_BASE_US) + F.col("id") * (7 * DAY_US)).alias(
            "ts_us"
        ),
    )


# Shared verbatim by the batch key below and the online twin's oracle
# (streaming_mode.py::stream_exec_dow_association) — the FIRST_SEEN_SQL
# convention, so the two can never drift.
DOW_ASSOC_SQL = f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS ts_us FROM events
      UNION ALL{DOW_PLANT_SQL}
    ), cells AS (
      SELECT event_type,
             (((ts_us // {DAY_US}) % 7) + 7) % 7 AS dow,
             COUNT(*) AS n_obs
      FROM ev GROUP BY 1, 2
    ), per_type AS (
      SELECT event_type, SUM(n_obs) AS n_type FROM cells GROUP BY 1
    ), per_dow AS (
      SELECT dow, SUM(n_obs) AS n_dow FROM cells GROUP BY 1
    ), tot AS (
      SELECT SUM(n_obs) AS n_total FROM cells
    )
    SELECT c.event_type, CAST(c.dow AS BIGINT) AS dow, c.n_obs,
           CAST(t.n_type AS BIGINT) AS n_type,
           CAST(d.n_dow AS BIGINT) AS n_dow,
           CAST(x.n_total AS BIGINT) AS n_total,
           (CAST(c.n_obs AS DOUBLE) / t.n_type)
             * (CAST(x.n_total AS DOUBLE) / d.n_dow) AS lift,
           {DOW_DEN} * CAST(c.n_obs AS DECIMAL(38,0))
                     * CAST(x.n_total AS DECIMAL(38,0))
             > {DOW_NUM} * CAST(t.n_type AS DECIMAL(38,0))
                         * CAST(d.n_dow AS DECIMAL(38,0)) AS is_over
    FROM cells c
    JOIN per_type t USING (event_type)
    JOIN per_dow d USING (dow)
    CROSS JOIN tot x
    """


@register("events_dow_association", oracle=DOW_ASSOC_SQL)
def events_dow_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-of-week association — "does this event type cluster on
    particular weekdays?": the cooccurrence_lift discipline applied to
    temporal structure instead of co-incidence. Each (event_type,
    day-of-week) cell is scored against independence — lift =
    (n_obs/n_type)·(n_total/n_dow), the observed share of the type's
    events on that weekday over the weekday's share of all traffic —
    the contingency-table reading a SOC uses to spot cron-driven
    malware (activity pinned to one weekday) and a product team uses
    for weekly seasonality. A chi-square test statistic is Σ over
    these same cells of (obs−exp)²/exp; the per-cell lift + integer
    flag IS that table with the float math kept out of the
    hash-checked surface.

    Exactness: dow comes from the exact floor-div day (pre-1970-safe
    pmod in Spark, the ((d%7)+7)%7 twin in DuckDB); counts and
    marginals are integers; lift is the cooccurrence form (two exact
    single divisions, never an integer cross-product in doubles); the
    is_over flag is the DECIMAL(38,0) cross-multiplication (the
    beaconing discipline — n_obs·n_total wraps int64 at 100-TB
    marginals). One weekly-periodic stream is planted in BOTH engines
    (DOW_PLANT_SQL) so the true class is verified, not just the
    uniform-traffic false class.

    Scale: ONE full-stream shuffle (the (type, dow) cell rollup,
    map-side combined, output ≤ |types|·7 rows). All three marginals
    derive from the CELLS, never rescan events, and join back as
    broadcasts — the same tiny-table reuse shape as
    events_cooccurrence_lift.

    kawa parity: none (no aggregation surface in the reference —
    SURVEY.md §1.1); mandate (M) security-analytics extension."""
    e = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us")
    )
    ev = e.unionByName(_dow_planted(spark))
    cells = ev.groupBy(
        "event_type",
        F.pmod(floordiv(F.col("ts_us"), DAY_US), F.lit(7)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    return dow_association(cells)


def dow_association(cells: DataFrame) -> DataFrame:
    """Core contingency scorer over any (event_type, dow, n_obs) cell
    frame — events_dow_association binds it to the events table +
    planted stream; the online twin feeds it drained streaming cell
    counts. Marginals are aggregates OF THE CELLS (≤ |types|·7 rows),
    broadcast back; the property test
    (tests/test_dow_assoc_property.py) drives it against a
    brute-force Python contingency table."""

    def d38(c: str):
        return F.col(c).cast("decimal(38,0)")

    # No-op semantically (type and dow are never null), but load-
    # bearing for the plan: the marginal joins push DIFFERENT
    # isnotnull filters into their cell subplans (event_type for
    # per_type, dow for per_dow, none for tot), making the four
    # subplans byte-distinct — AQE exchange reuse needs identical
    # subtrees, and without it the full stream is scanned and
    # shuffled FOUR times. Pre-filtering both keys makes every branch
    # identical: one scan, one cell exchange, 3 ReusedExchange nodes
    # (plan-pinned by test_dow_association_marginals_reuse_cell_exchange).
    cells = cells.filter(
        F.col("event_type").isNotNull() & F.col("dow").isNotNull()
    )
    per_type = cells.groupBy("event_type").agg(
        F.sum("n_obs").cast("long").alias("n_type")
    )
    per_dow = cells.groupBy("dow").agg(
        F.sum("n_obs").cast("long").alias("n_dow")
    )
    tot = cells.agg(F.sum("n_obs").cast("long").alias("n_total"))
    return (
        cells.join(F.broadcast(per_type), "event_type")
        .join(F.broadcast(per_dow), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            "n_obs",
            "n_type",
            "n_dow",
            "n_total",
            (
                (F.col("n_obs").cast("double") / F.col("n_type"))
                * (F.col("n_total").cast("double") / F.col("n_dow"))
            ).alias("lift"),
            (
                F.lit(DOW_DEN) * d38("n_obs") * d38("n_total")
                > F.lit(DOW_NUM) * d38("n_type") * d38("n_dow")
            ).alias("is_over"),
        )
    )


# ---------------------------------------------------------------------------
# weekly day-of-week profile drift (trailing-baseline contingency view)
# ---------------------------------------------------------------------------

WEEK_US = 7 * 86_400 * 1_000_000

# A cell drifts when its share of the type's CURRENT week more than
# doubles its trailing-baseline share — share > (NUM/DEN)·base_share,
# evaluated as the cross-multiplied integer inequality
#   DEN·n_obs·base_total > NUM·base_n·n_type_week
# in DECIMAL(38,0) (the DOW_NUM/beaconing discipline: week counts ×
# corpus baselines overflow int64 at 100-TB marginals).
DOW_DRIFT_NUM, DOW_DRIFT_DEN = 2, 1

# A deterministic drifting stream planted in BOTH engines: 28 days of
# one-event-per-day uniform traffic (every dow baseline = 4 across any
# week alignment), then a 35-event burst on day 28 — the burst cell's
# weekly share (35/39) clears 2× its baseline share (4/24), while the
# same week's uniform tail cells and every natural Poisson-flat type
# verify the false class. Negative-free ids are irrelevant here (no
# event_id in the cell rollup); the type name is the plant key.
DOW_DRIFT_PLANT_N = 63  # 28 uniform days + 35 burst events
DOW_DRIFT_PLANT_SQL = f"""
      SELECT 'planted_dowdrift' AS event_type,
             {DOW_PLANT_BASE_US}
               + (CASE WHEN i < 28 THEN i * {DAY_US}
                       ELSE 28 * {DAY_US} + (i - 28) END) AS ts_us
      FROM generate_series(0, {DOW_DRIFT_PLANT_N - 1}) AS t(i)"""


def _dow_drift_planted(spark: SparkSession) -> DataFrame:
    """Spark twin of DOW_DRIFT_PLANT_SQL (value-identical rows)."""
    i = F.col("id")
    return spark.range(DOW_DRIFT_PLANT_N).select(
        F.lit("planted_dowdrift").alias("event_type"),
        (
            F.lit(DOW_PLANT_BASE_US)
            + F.when(i < 28, i * DAY_US).otherwise(
                F.lit(28 * DAY_US) + (i - 28)
            )
        ).alias("ts_us"),
    )


# Shared verbatim by the batch key below and the online twin's oracle
# (streaming_mode.py::stream_exec_dow_drift) — the FIRST_SEEN_SQL
# convention, so the two can never drift.
DOW_DRIFT_SQL = f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS ts_us FROM events
      UNION ALL{DOW_DRIFT_PLANT_SQL}
    ), cells AS (
      SELECT event_type,
             ts_us // {WEEK_US} AS week,
             (((ts_us // {DAY_US}) % 7) + 7) % 7 AS dow,
             COUNT(*) AS n_obs
      FROM ev GROUP BY 1, 2, 3
    ), enriched AS (
      SELECT event_type, week, dow, n_obs,
             CAST(SUM(n_obs) OVER (PARTITION BY event_type, week)
                  AS BIGINT) AS n_type_week,
             CAST(SUM(n_obs) OVER (
                    PARTITION BY event_type, dow ORDER BY week
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS base_n_raw,
             CAST(SUM(n_obs) OVER (
                    PARTITION BY event_type ORDER BY week
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT) AS base_total
      FROM cells
    )
    SELECT event_type, CAST(week AS BIGINT) AS week,
           CAST(dow AS BIGINT) AS dow, n_obs, n_type_week,
           CASE WHEN base_total IS NOT NULL
                THEN COALESCE(base_n_raw, 0) END AS base_n,
           base_total,
           CAST(n_obs AS DOUBLE) / n_type_week AS share,
           CASE WHEN base_total IS NOT NULL
                THEN CAST(COALESCE(base_n_raw, 0) AS DOUBLE) / base_total
           END AS base_share,
           CASE WHEN base_total IS NOT NULL THEN
             {DOW_DRIFT_DEN} * CAST(n_obs AS DECIMAL(38,0))
                             * CAST(base_total AS DECIMAL(38,0))
             > {DOW_DRIFT_NUM}
                 * CAST(COALESCE(base_n_raw, 0) AS DECIMAL(38,0))
                 * CAST(n_type_week AS DECIMAL(38,0))
           END AS is_drift,
           base_total IS NULL AS is_new_type
    FROM enriched
    """


@register("events_dow_drift", oracle=DOW_DRIFT_SQL)
def events_dow_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly day-of-week profile DRIFT — the template-drift
    projection applied to the contingency table: where
    events_dow_association asks "does this type cluster on a weekday
    over the WHOLE corpus?", this key asks "did this type's weekday
    profile CHANGE this week vs its trailing history?" — the SOC
    question for a service whose cron schedule moved, or a user whose
    weekly rhythm broke. Each (event_type, week, dow) cell carries its
    share of the type's current-week traffic and its trailing-baseline
    share (all PRIOR weeks, cumulative); the drift flag fires when the
    current share more than doubles the baseline share.

    Exactness: week/dow are exact floor-division buckets
    (functions/exact.floordiv ≡ DuckDB ``//``, pre-1970-safe pmod);
    counts and both baselines are integer window sums over the CELL
    table; share/base_share are single divisions of exact ints; the
    flag is the DECIMAL(38,0) cross-multiplication, never a float. A
    type's first observed week has no baseline → is_new_type (flag
    NULL), the template-drift is_new_template analogue.

    Scale: ONE full-stream shuffle (the (type, week, dow) cell rollup,
    map-side combined, output ≤ |types|·weeks·7 rows). All three
    window passes run over that aggregated cell table — the
    logs_template_drift plan shape; nothing downstream rescans events.
    Streaming twin: stream_exec_dow_drift (COUNT-only state, twin #16).

    kawa parity: none (no aggregation surface in the reference —
    SURVEY.md §1.1); mandate (M) security-analytics extension."""
    e = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us")
    )
    ev = e.unionByName(_dow_drift_planted(spark))
    cells = ev.groupBy(
        "event_type",
        floordiv(F.col("ts_us"), WEEK_US).alias("week"),
        F.pmod(floordiv(F.col("ts_us"), DAY_US), F.lit(7)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    return dow_drift_report(cells)


def dow_drift_report(cells: DataFrame) -> DataFrame:
    """Core drift projection over any (event_type, week, dow, n_obs)
    cell frame — the batch key binds the events rollup + plant; the
    online twin feeds it drained streaming cell counts. All windows
    run over the aggregated cells (≤ |types|·weeks·7 rows); the
    trailing baselines use RANGE … 1 PRECEDING so the current week
    never leaks into its own baseline. Property test:
    tests/test_dow_drift_property.py drives it against a brute-force
    Python cumulative table."""

    def d38(c) -> F.Column:
        return c.cast("decimal(38,0)")

    w_tw = Window.partitionBy("event_type", "week")
    w_cell = (
        Window.partitionBy("event_type", "dow")
        .orderBy("week")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_type = (
        Window.partitionBy("event_type")
        .orderBy("week")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    enriched = cells.select(
        "event_type",
        F.col("week").cast("long").alias("week"),
        F.col("dow").cast("long").alias("dow"),
        "n_obs",
        F.sum("n_obs").over(w_tw).cast("long").alias("n_type_week"),
        F.sum("n_obs").over(w_cell).cast("long").alias("base_n_raw"),
        F.sum("n_obs").over(w_type).cast("long").alias("base_total"),
    )
    has_base = F.col("base_total").isNotNull()
    base_n = F.coalesce(F.col("base_n_raw"), F.lit(0).cast("long"))
    return enriched.select(
        "event_type",
        "week",
        "dow",
        "n_obs",
        "n_type_week",
        F.when(has_base, base_n).alias("base_n"),
        "base_total",
        (F.col("n_obs").cast("double") / F.col("n_type_week")).alias(
            "share"
        ),
        F.when(
            has_base, base_n.cast("double") / F.col("base_total")
        ).alias("base_share"),
        F.when(
            has_base,
            F.lit(DOW_DRIFT_DEN) * d38(F.col("n_obs")) * d38(F.col("base_total"))
            > F.lit(DOW_DRIFT_NUM) * d38(base_n) * d38(F.col("n_type_week")),
        ).alias("is_drift"),
        F.col("base_total").isNull().alias("is_new_type"),
    )


# ---------------------------------------------------------------------------
# robust (median/MAD) volume anomaly
# ---------------------------------------------------------------------------

# A deterministic spike planted in BOTH engines (the PLANTS_SQL /
# embedding-dedup discipline): the synthetic stream's daily counts are
# Poisson-flat, so without planting, is_spike could verify only the
# all-false complement — the vacuous-flag class VERDICT r8 closed.
# Type 'planted_spike' gets a 100-events/day baseline over 30 days
# plus a 1000-event burst on day index 7.
MAD_PLANT_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
MAD_PLANT_N = 4_000  # 30 days x 100 baseline + 1000 burst

MAD_PLANT_SQL = f"""
      SELECT 'planted_spike' AS event_type,
             {MAD_PLANT_BASE_US}
               + (CASE WHEN i < 3000 THEN i % 30 ELSE 7 END) * {DAY_US}
               + i AS ts_us
      FROM generate_series(0, {MAD_PLANT_N - 1}) AS t(i)
"""


def _mad_planted(spark: SparkSession) -> DataFrame:
    """Spark twin of MAD_PLANT_SQL (value-identical rows)."""
    i = F.col("id")
    return spark.range(MAD_PLANT_N).select(
        F.lit("planted_spike").alias("event_type"),
        (
            F.lit(MAD_PLANT_BASE_US)
            + F.when(i < 3000, i % 30).otherwise(F.lit(7)) * F.lit(DAY_US)
            + i
        ).alias("ts_us"),
    )


# Shared verbatim by the batch key below and the online twin's
# oracle (streaming_mode.py::stream_exec_anomaly_mad) so the two can
# never drift — the security.py FIRST_SEEN_SQL convention.
ANOMALY_MAD_SQL = f"""
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS ts_us FROM events
      UNION ALL {MAD_PLANT_SQL}
    ), daily AS (
      SELECT event_type, ts_us // {DAY_US} AS day, COUNT(*) AS n
      FROM ev GROUP BY 1, 2
    ), med AS (
      SELECT event_type, quantile_disc(n, 0.5) AS med
      FROM daily GROUP BY 1
    ), dev AS (
      SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS dev
      FROM daily d JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type, quantile_disc(dev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type, CAST(d.day AS BIGINT) AS day, d.n,
           CAST(d.med AS BIGINT) AS med, CAST(d.dev AS BIGINT) AS dev,
           CAST(a.mad AS BIGINT) AS mad,
           (d.n - d.med) > 3 * a.mad AS is_spike
    FROM dev d JOIN mad a USING (event_type)
    """


@register("events_anomaly_mad", oracle=ANOMALY_MAD_SQL)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection — events_anomaly_zscore's
    resistant sibling: each (event_type, day)'s count is scored
    against the type's MEDIAN daily volume, with spread measured by
    the median absolute deviation (MAD) instead of a stddev. The
    median/MAD pair is the estimator security teams reach for when
    the baseline itself contains bursts: a single huge day drags a
    mean/stddev baseline (masking the very anomaly that moved it) but
    leaves the median untouched (50% breakdown point vs 0%).

    Exactness (why even the boolean hash-matches): counts are
    integers; both medians are DISCRETE percentiles — the actual data
    value at sorted index floor((n-1)/2), the stats.percentile_disc
    machinery that matches DuckDB quantile_disc — so med, dev, and
    mad are all exact int64 and the spike test (n − med) > 3·mad
    never touches a float. (A zscore needs the Σx/Σx² power-sum
    discipline for the same guarantee; the MAD form gets it for
    free.)

    Scale: ONE full-stream shuffle (the daily aggregate, map-side
    combined, output ∝ types × days). Everything downstream runs on
    that tiny table: two rank windows per type (|days| rows per
    partition) and two broadcast joins of |types|-row medians.

    kawa parity: none (no aggregation surface in the reference —
    SURVEY.md §1.1); mandate (M) security-analytics extension."""
    e = table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us")
    )
    ev = e.unionByName(_mad_planted(spark))
    daily = ev.groupBy(
        "event_type", floordiv(F.col("ts_us"), DAY_US).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return mad_scores(daily)


def disc_median(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Per-``key`` discrete median of ``val``: the actual data value
    at sorted 0-based index floor((n-1)/2) — the stats.percentile_disc
    machinery (matches DuckDB quantile_disc), rank-based so it scales
    like any window query. Tie order among equal values cannot change
    the picked VALUE, so the row_number is hash-safe."""
    w = Window.partitionBy(key).orderBy(val)
    wg = Window.partitionBy(key)
    ranked = df.select(
        key,
        F.col(val),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("cnt"),
    )
    return ranked.groupBy(key).agg(
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("cnt") - 1) * 0.5) + 1,
                F.col(val),
            )
        ).alias(out)
    )


def mad_scores(daily: DataFrame) -> DataFrame:
    """Core scorer over any (event_type, day, n) count table —
    events_anomaly_mad binds it to the events table + planted spike;
    the property test (tests/test_mad_property.py) drives it on
    random count tables against a brute-force Python reference."""
    med = disc_median(daily, "event_type", "n", "med")
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("n") - F.col("med"))
    )
    mad = disc_median(
        dev.select("event_type", "dev"), "event_type", "dev", "mad"
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        "n",
        "med",
        "dev",
        "mad",
        ((F.col("n") - F.col("med")) > 3 * F.col("mad")).alias("is_spike"),
    )
