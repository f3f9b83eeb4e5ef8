"""Security-log analytics: CIDR enrichment, windowed funnel
conversion, per-session improbability scoring.

kawa exists to ship security/observability logs
(/root/reference/README.md:7-16); these are the detections a SIEM
runs on the shipped stream once it lands. Each composes machinery
that already exists in this engine — the range-join shape
(joins.join_range_theta), the funnel (events.funnel_stages), the
sessionizer + Markov model (events.py) — into the reports a security
team actually reads: "which network did this come from", "how did
conversion move day over day", "which sessions behaved improbably".

Cross-engine float discipline as everywhere in this package: counts
are integers, every emitted double is either a single division of
exact integers or a min over bit-identical doubles — never a float
sum (order-dependent) and never a transcendental (Java Math.log and
libm log may differ in the last ulp, which the driver's value-hash
would catch; the rarity score is therefore an integer surrogate for
-log-likelihood, see events_session_rarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.io import table
from kawa_spark.queries.events import (
    DAY_US,
    SESSION_GAP_US,
    funnel_stages,
)
from kawa_spark.functions.exact import floordiv
from kawa_spark.registry import register

# ---------------------------------------------------------------------------
# CIDR / longest-prefix enrichment
# ---------------------------------------------------------------------------

# The corporate address plan: overlapping prefixes so longest-prefix
# match is genuinely exercised (an ip in corp-east-dc1 also matches
# corp-east and corp; the /12 must win). Bounds are inclusive
# [lo, hi] over the 32-bit integer form of the address. Nets sharing
# a prefix length are disjoint by CIDR construction, so per address
# at most one net matches at each plen — the (plen, net) struct max
# is tie-free (the net DESC tie-break in the oracle is belt and
# braces, never load-bearing).
CIDR_NETS: list[tuple[str, int, int, int]] = [
    # (net, prefix_len, lo, hi)
    ("corp", 8, 167772160, 184549375),  # 10.0.0.0/8
    ("corp-east", 10, 167772160, 171966463),  # 10.0.0.0/10
    ("corp-west", 10, 171966464, 176160767),  # 10.64.0.0/10
    ("corp-guest", 10, 180355072, 184549375),  # 10.192.0.0/10
    ("corp-east-dc1", 12, 167772160, 168820735),  # 10.0.0.0/12
    ("quarantine", 14, 171966464, 172228607),  # 10.64.0.0/14
]

# Deterministic synthetic source address per event (the testdata has
# no ip column): a Knuth multiplicative hash of event_id folded into
# 10.0.0.0/8. event_id is reduced mod 2^24 BEFORE the multiply —
# value-identical (c·(e mod 2^24) ≡ c·e (mod 2^24)) but the product
# stays ≤ 2^24·2654435761 ≈ 4.5e16, inside int64 for ANY event_id;
# the raw e·c form overflowed (ANSI Spark error, DuckDB HUGEINT
# divergence) once ids passed ~3.5e9 — caught by the 100× probe,
# whose id-shifting pushes event_id to ~1e10.
_IP_EXPR_SQL = "167772160 + ((event_id % 16777216) * 2654435761) % 16777216"


def _nets_values_sql() -> str:
    return ", ".join(
        f"('{n}', {p}, {lo}, {hi})" for n, p, lo, hi in CIDR_NETS
    )


@register(
    "logs_cidr_enrich",
    oracle=f"""
    WITH ips AS (
      SELECT event_id, user_id, {_IP_EXPR_SQL} AS ip FROM events
    ), nets(net, plen, lo, hi) AS (
      VALUES {_nets_values_sql()}
    ), matched AS (
      SELECT i.event_id, i.user_id, n.net, n.plen,
             ROW_NUMBER() OVER (PARTITION BY i.event_id
                                ORDER BY n.plen DESC, n.net DESC) AS rn
      FROM ips i JOIN nets n ON i.ip BETWEEN n.lo AND n.hi
    )
    SELECT net, CAST(plen AS BIGINT) AS plen,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM matched WHERE rn = 1
    GROUP BY net, plen
    """,
)
def logs_cidr_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix CIDR enrichment — the join every SIEM runs to
    turn a source address into a network name ("which subnet did this
    login come from"), and the natural consumer of the ``<IP>``
    tokens logs_pattern_templates masks out. Each event's address is
    matched against an overlapping CIDR plan and attributed to the
    MOST SPECIFIC matching prefix; output is per-network volume and
    distinct-actor counts.

    This is a genuinely different join shape from the equi-join
    family: an interval containment join (lo <= ip <= hi) against a
    dimension whose rows OVERLAP, followed by an argmax on prefix
    length. A naive plan (BroadcastNestedLoopJoin + per-event
    struct-max groupBy) shuffles the full event stream on event_id
    just to pick each row's best match; at 100 TB that shuffle IS
    the query. Here the whole match is map-side instead: the CIDR
    table — small by nature, routing tables are thousands of rows —
    is collapsed to a one-row array of (plen, net, lo, hi) structs
    and broadcast; each event row filters it with a codegen'd
    higher-order predicate and takes array_max, whose lexicographic
    struct order (plen first) IS longest-prefix match, tie-free
    because same-plen CIDRs are disjoint. Zero shuffle until the
    final rollup: n_events lands on |nets| keys; the distinct-actor
    count dedups (net, user) map-side first. For a radix-tree-sized
    plan (BGP full table ~1M routes) the production variant
    bucketizes addresses by /8 and equi-joins bucket-to-bucket first
    — the asof_join rewrite — before the in-bucket containment;
    composition documented, not needed at routing-table scale.

    Exactness: addresses and bounds are pure int64 arithmetic;
    counts are integers; no floats anywhere. Events matching no net
    are dropped (oracle's inner join); here the plan covers the
    derived space, so none are.
    """
    e = table(spark, sf_dir, "events").select(
        "user_id",
        (
            F.lit(167772160)
            + ((F.col("event_id") % F.lit(16777216)) * F.lit(2654435761))
            % F.lit(16777216)
        ).alias("ip"),
    )
    nets = spark.createDataFrame(
        [(n, p, lo, hi) for n, p, lo, hi in CIDR_NETS],
        "net string, plen long, lo long, hi long",
    )
    return (
        longest_prefix_match(e, nets)
        .groupBy("net", "plen")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def longest_prefix_match(ips: DataFrame, nets: DataFrame) -> DataFrame:
    """Core LPM over any frame with an integer ``ip`` column and a
    nets frame (net, plen, lo, hi) — logs_cidr_enrich binds it to the
    events-derived addresses; the property test
    (tests/test_cidr_property.py) drives it on random addresses and
    random nested CIDR plans against a brute-force Python reference.
    Adds ``net``/``plen`` of each row's most specific matching
    prefix; rows matching no net are dropped. Entirely map-side:
    the nets collapse to a broadcast one-row struct array, match +
    argmax are codegen'd higher-order functions per row."""
    nets_arr = nets.agg(
        F.collect_list(F.struct("plen", "net", "lo", "hi")).alias("nets")
    )
    return (
        ips.join(F.broadcast(nets_arr))  # 1-row broadcast: the plan array
        .withColumn(
            "best",
            F.array_max(
                F.filter(
                    "nets",
                    lambda n: (F.col("ip") >= n["lo"])
                    & (F.col("ip") <= n["hi"]),
                )
            ),
        )
        .filter(F.col("best").isNotNull())
        .drop("nets")
        .withColumn("net", F.col("best.net"))
        .withColumn("plen", F.col("best.plen"))
        .drop("best")
    )


# ---------------------------------------------------------------------------
# windowed funnel conversion
# ---------------------------------------------------------------------------


@register(
    "events_funnel_daily_conversion",
    oracle=f"""
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
    SELECT v.t_view // {DAY_US} AS day,
           COUNT(*) AS n_viewed,
           COUNT(c.user_id) AS n_clicked,
           COUNT(p.user_id) AS n_purchased,
           CAST(COUNT(c.user_id) AS DOUBLE) / COUNT(*) AS click_rate,
           CAST(COUNT(p.user_id) AS DOUBLE) / COUNT(*) AS purchase_rate
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    GROUP BY day
    """,
)
def events_funnel_daily_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Funnel conversion rates OVER TIME — the report a team actually
    watches: users cohorted by the day of their first view, and per
    day how many progressed to click and to purchase (VERDICT r8
    item 7's "windowed funnel" composition). Reuses
    events.funnel_stages verbatim (per-user strict-order stage
    timestamps, property-tested against brute force) and rolls it up
    on the exact floor-div day bucket of t_view.

    Exactness: stage timestamps and day buckets are integer
    epoch-micros (floordiv — matches DuckDB ``//`` on pre-1970 rows
    too); the rates are single divisions of exact counts.

    Scale: inherits the funnel's one-hash-partitioning user_id chain;
    the day rollup shuffles |users|-sized stage rows onto |days| keys
    with map-side combine. COUNT(col) skips nulls in both engines —
    that IS the per-stage conversion count, no extra filter."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    f = funnel_stages(ev)
    n_viewed = F.count(F.lit(1)).alias("n_viewed")
    n_clicked = F.count("t_click").alias("n_clicked")
    n_purchased = F.count("t_purchase").alias("n_purchased")
    return (
        f.select(
            floordiv(F.col("t_view"), DAY_US).alias("day"),
            "t_click",
            "t_purchase",
        )
        .groupBy("day")
        .agg(
            n_viewed,
            n_clicked,
            n_purchased,
            (F.count("t_click").cast("double") / F.count(F.lit(1))).alias(
                "click_rate"
            ),
            (
                F.count("t_purchase").cast("double") / F.count(F.lit(1))
            ).alias("purchase_rate"),
        )
    )


# ---------------------------------------------------------------------------
# per-session improbability
# ---------------------------------------------------------------------------


@register(
    "events_session_rarity",
    oracle=f"""
    WITH t AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_us
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, event_type, ts_us,
             SUM(CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us > {SESSION_GAP_US}
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS session_idx
      FROM t
    ), trans AS (
      SELECT user_id, session_idx, event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id, session_idx
               ORDER BY ts_us, event_id
             ) AS to_type
      FROM sessions
    ), tr AS (
      SELECT * FROM trans WHERE to_type IS NOT NULL
    ), pairs AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM tr GROUP BY 1, 2
    ), totals AS (
      SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT tr.user_id,
           CAST(tr.session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_transitions,
           CAST(SUM(t2.n_from - p.n) AS BIGINT) AS rarity,
           MIN(CAST(p.n AS DOUBLE) / t2.n_from) AS min_p
    FROM tr
    JOIN pairs p ON tr.from_type = p.from_type AND tr.to_type = p.to_type
    JOIN totals t2 ON tr.from_type = t2.from_type
    GROUP BY tr.user_id, tr.session_idx
    """,
)
def events_session_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session improbability scoring — "this session's behavior
    doesn't look like anyone's": sessionize (the events.py
    inactivity-gap idiom), take each session's event-type transitions,
    score them against the GLOBAL first-order Markov model fitted on
    those same transitions, and aggregate per session (VERDICT r8
    item 7's composition of events_markov_transitions with the
    sessionizer).

    Score design: the textbook score is Σ −log p over the session's
    transitions, but a float log is not cross-engine hash-stable
    (Java Math.log is only 1-ulp-accurate, libm's may be correctly
    rounded) and a float SUM is order-dependent. The emitted scores
    are therefore exact: ``rarity`` = Σ (n_from − n) — each term an
    integer "how many of this source state's transitions went
    elsewhere", large exactly when −log p is large — summed as
    int64, plus ``min_p``, the session's single least-likely
    transition probability (a min over bit-identical doubles, no
    summation). A deployment wanting nats multiplies outside the
    hash-checked surface. Sessions with no transition (single-event)
    carry no evidence and are omitted.

    Scale: sessionize + in-session lead are windows on the SAME
    user_id partitioning — one shuffle, reused. The model is |types|²
    pairs + |types| totals, both broadcast back onto the transition
    stream (map-side); the per-session aggregate shuffles on
    (user_id, session_idx) — bounded by session count, with map-side
    combine. Nothing holds per-session event lists."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    return session_rarity_scores(e, SESSION_GAP_US)


def session_rarity_scores(e: DataFrame, gap_us: int) -> DataFrame:
    """Core scorer over any (user_id, event_id, event_type, ts_us)
    frame — events_session_rarity binds it to the events table; the
    property test (tests/test_session_rarity_property.py) drives it
    on random event streams against a brute-force Python reference
    (sessionize → global transition model → per-session Σ(n_from−n)
    and min_p)."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    sessions = e.withColumn(
        "session_idx",
        F.sum(
            F.when(
                F.lag("ts_us").over(w).isNull()
                | (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        "ts_us", "event_id"
    )
    tr = (
        sessions.select(
            "user_id",
            "session_idx",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(ws).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    pairs = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    scored = tr.join(F.broadcast(pairs), ["from_type", "to_type"]).join(
        F.broadcast(totals), "from_type"
    )
    return scored.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum(F.col("n_from") - F.col("n")).cast("long").alias("rarity"),
        F.min(F.col("n").cast("double") / F.col("n_from")).alias("min_p"),
    )
