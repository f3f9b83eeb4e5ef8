"""Security-analytics pipeline — composing the r8 detection tier the
way a SOC pipeline actually layers it (kawa's home domain: the
reference exists to shuttle security logs, /root/reference/README.md:
7-16; this is what runs on the other end of that shuttle):

  events
    → debounce            (adjacent-duplicate suppression — the
                           at-least-once ingest cleanup)
    → template extraction (drain-style masking → pattern id)
    → fifteen detectors over the clean stream:
        * rate limiter    (trailing-window per-user flood flag)
        * heavy hitters   (top-K users per event type)
        * template drift  (new-pattern / growth alerting)
        * CIDR watch      (r9: longest-prefix net attribution —
                           anything landing in the quarantine net)
        * session rarity  (r9: sessions whose transition pattern is
                           improbable under the global Markov model)
        * beaconing       (r9: machine-regular callback cadence; the
                           planted streams simulate the C2 host so
                           the detector demonstrably fires)
        * impossible travel (r9: same actor on two networks inside
                           the hop window — the net-to-net matrix)
        * DGA domains     (r9: algorithmically generated callback
                           domains by string shape — integer entropy
                           surrogates, dga_features core)
        * volume spikes   (r9: per-type daily counts vs the robust
                           median/MAD baseline, mad_scores core)
        * password spray  (r9: one network touching many distinct
                           accounts in an hour — fan-in over the CIDR
                           LPM; the planted spray simulates the
                           credential-stuffing source so the detector
                           demonstrably fires)
        * typosquat       (r9: observed domains within edit distance
                           1-2 of the legit vocabulary — the fuzzy
                           dimension join, typosquat_matches core;
                           planted look-alike domains simulate the
                           phishing infrastructure)
        * lateral movement (r10: two-hop chains through the address
                           plan — A→B→C pivots the single-hop matrix
                           can't see, lateral_chains core; planted
                           walks simulate the pivot)
        * weekday affinity (r10: event types clustered on particular
                           weekdays — the contingency lift table,
                           dow_association core; quiet on uniform
                           demo traffic by design)
        * 3-hop lateral   (r11: A→B→C→D junction-continuous chains,
                           lateral_chains3 core; the highest-severity
                           alert in the book)
        * weekday drift   (r11: a type's weekday profile changing vs
                           its trailing baseline, dow_drift_report
                           core; quiet on stable traffic by design)
    → one alert relation  (union of detector verdicts, severity-coded)

Every detector calls the SAME core the oracle-verified registry
operator binds (events.adjacent_dedup / rate_limit_annotate /
top_k_by_count, logs.daily_template_counts / drift_enrich) — a
predicate or constant fix in the verified operators flows into this
pipeline automatically; nothing is re-implemented here (code review
r8). The example's contribution is the COMPOSITION: one debounced,
templated stream feeds all fifteen detectors without re-reading the
source, and the alert union is a narrow column-aligned unionByName.

Run directly (`python examples/security_analytics.py [sf_dir]`) or
through tests/test_example_pipeline.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.io import table
from kawa_spark.queries.events import (
    RATE_LIMIT,
    adjacent_dedup,
    rate_limit_annotate,
    top_k_by_count,
)
from kawa_spark.queries.logs import (
    daily_template_counts,
    drift_enrich,
    mask_template,
)
from kawa_spark.queries.security import (
    BEACON_CV2_DEN,
    BEACON_CV2_NUM,
    BEACON_MIN_GAPS,
    HOP_WINDOW_US,
    SPRAY_MIN_USERS,
    TYPOSQUAT_MAX_DIST,
    DGA_VOCAB,
    _planted_beacons,
    _planted_spray,
    _typo_plant_rows,
    beaconing_stats,
    dga_features,
    domain_col,
    ip_col,
    longest_prefix_match,
    net_hop_matrix,
    nets_df,
    session_rarity_scores,
    typosquat_matches,
)


def debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events minus back-to-back same-type repeats per user (the
    events_dedup_adjacent core), with the template column attached
    once for every downstream detector."""
    e = table(spark, sf_dir, "events")
    msg = F.concat(
        F.col("event_type"),
        F.lit(" uid="),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("props"),
    )
    return adjacent_dedup(
        e.select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            "value",
            mask_template(msg).alias("template"),
            # deterministic synthetic source address (the testdata has
            # no ip column) — the shared logs_cidr_enrich derivation
            ip_col(),
        )
    )


def flood_alerts(clean: DataFrame) -> DataFrame:
    return (
        rate_limit_annotate(clean.select("user_id", "event_type", "us"))
        .filter("is_limited")
        .select(
            F.lit("flood").alias("alert"),
            F.lit(2).alias("severity"),
            F.col("user_id").cast("string").alias("subject"),
            F.concat(
                F.lit("rate "), F.col("n_in_window").cast("string"),
                F.lit(" > "), F.lit(RATE_LIMIT).cast("string"),
                F.lit(" in window at us="), F.col("us").cast("string"),
            ).alias("detail"),
        )
    )


def heavy_hitter_alerts(clean: DataFrame) -> DataFrame:
    counts = clean.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return top_k_by_count(counts).select(
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


def drift_alerts(clean: DataFrame) -> DataFrame:
    """New templates, or templates growing >2× day-over-day."""
    enriched = drift_enrich(
        daily_template_counts(clean.select("us", "template"))
    )
    flagged = enriched.filter(
        F.col("prev_n").isNull() | (F.col("n_lines") > 2 * F.col("prev_n"))
    )
    return flagged.select(
        F.when(F.col("prev_n").isNull(), F.lit("new_template"))
        .otherwise(F.lit("template_surge"))
        .alias("alert"),
        F.lit(3).alias("severity"),
        F.col("template").alias("subject"),
        F.concat(
            F.lit("n="), F.col("n_lines").cast("string"),
            F.lit(" prev="),
            F.coalesce(F.col("prev_n").cast("string"), F.lit("-")),
        ).alias("detail"),
    )


def net_watch_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Events attributed (longest-prefix) to the quarantine net — a
    host talking from a quarantined range is a per-se alert."""
    hits = (
        longest_prefix_match(clean.select("user_id", "ip"), nets_df(spark))
        .filter(F.col("net") == "quarantine")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return hits.select(
        F.lit("quarantine_net").alias("alert"),
        F.lit(3).alias("severity"),
        F.col("user_id").cast("string").alias("subject"),
        F.concat(
            F.lit("n="), F.col("n_events").cast("string"),
            F.lit(" events from quarantine range"),
        ).alias("detail"),
    )


RARITY_MIN_P = 0.01  # a session whose least-likely transition is <1%


def rarity_alerts(clean: DataFrame) -> DataFrame:
    """Sessions containing a transition the global Markov model rates
    below RARITY_MIN_P — 'nobody behaves like this' sessions."""
    scores = session_rarity_scores(
        clean.select(
            "user_id", "event_id", "event_type", F.col("us").alias("ts_us")
        ),
        gap_us=30 * 60 * 1_000_000,
    )
    return scores.filter(F.col("min_p") < RARITY_MIN_P).select(
        F.lit("improbable_session").alias("alert"),
        F.lit(2).alias("severity"),
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("#"),
            F.col("session_idx").cast("string"),
        ).alias("subject"),
        F.concat(
            F.lit("min_p="), F.col("min_p").cast("string"),
            F.lit(" over "), F.col("n_transitions").cast("string"),
            F.lit(" transitions"),
        ).alias("detail"),
    )


def beacon_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Keys whose inter-arrival cadence is machine-regular
    (beaconing_stats core — the events_beaconing / stream_exec_
    beaconing semantics). The deterministic planted callback streams
    ride along exactly as in the registry key, simulating the C2 host
    so the detector demonstrably fires on the demo data."""
    stats = beaconing_stats(
        clean.select(
            "user_id", "event_type", F.col("us").alias("ts_us"), "event_id"
        ).unionByName(_planted_beacons(spark)),
        min_gaps=BEACON_MIN_GAPS,
        cv2_num=BEACON_CV2_NUM,
        cv2_den=BEACON_CV2_DEN,
    )
    return stats.filter(F.col("is_beacon")).select(
        F.lit("beaconing").alias("alert"),
        F.lit(3).alias("severity"),
        F.concat(
            F.col("user_id").cast("string"), F.lit("/"), F.col("event_type")
        ).alias("subject"),
        F.concat(
            F.lit("period_s="), F.round("period_s", 1).cast("string"),
            F.lit(" over "), F.col("n_gaps").cast("string"),
            F.lit(" gaps"),
        ).alias("detail"),
    )


def travel_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Net-to-net hops inside the hop window (net_hop_matrix core —
    the events_impossible_travel / stream_exec_impossible_travel
    semantics) over the debounced stream's attributed addresses."""
    attributed = longest_prefix_match(
        clean.select(
            "user_id", "event_id", F.col("us").alias("ts_us"), "ip"
        ),
        nets_df(spark),
    ).drop("plen", "ip")
    matrix = net_hop_matrix(attributed, HOP_WINDOW_US)
    return matrix.select(
        F.lit("impossible_travel").alias("alert"),
        F.lit(3).alias("severity"),
        F.concat(
            F.col("from_net"), F.lit(" -> "), F.col("to_net")
        ).alias("subject"),
        F.concat(
            F.lit("n_hops="), F.col("n_hops").cast("string"),
            F.lit(" users="), F.col("n_users").cast("string"),
            F.lit(" min_gap_s="),
            (F.col("min_gap_us") / 1_000_000).cast("long").cast("string"),
        ).alias("detail"),
    )


def dga_alerts(clean: DataFrame) -> DataFrame:
    """Domains whose label shape is DGA-like (dga_features core — the
    logs_dga_score semantics) over the debounced stream's resolved
    domains."""
    agg = (
        clean.select(
            "event_id", "user_id", domain_col().alias("domain")
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    feats = dga_features(agg)
    return feats.filter(F.col("is_dga")).select(
        F.lit("dga_domain").alias("alert"),
        F.lit(3).alias("severity"),
        F.col("domain").alias("subject"),
        F.concat(
            F.lit("len="), F.col("label_len").cast("string"),
            F.lit(" distinct="), F.col("n_distinct").cast("string"),
            F.lit(" digits="), F.col("n_digits").cast("string"),
            F.lit(" hits="), F.col("n_events").cast("string"),
        ).alias("detail"),
    )


def spike_alerts(clean: DataFrame) -> DataFrame:
    """Days whose per-type volume spikes past the robust median/MAD
    baseline (mad_scores core — the events_anomaly_mad semantics;
    here over the live stream only, no planted burst: the demo data's
    partial first/last days keep the output honest either way)."""
    from kawa_spark.queries.events import DAY_US, mad_scores
    from kawa_spark.functions.exact import floordiv

    daily = (
        clean.select(
            "event_type", floordiv(F.col("us"), DAY_US).alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    scored = mad_scores(daily)
    return scored.filter(F.col("is_spike")).select(
        F.lit("volume_spike").alias("alert"),
        F.lit(1).alias("severity"),
        F.concat(
            F.col("event_type"), F.lit("@d"), F.col("day").cast("string")
        ).alias("subject"),
        F.concat(
            F.lit("n="), F.col("n").cast("string"),
            F.lit(" med="), F.col("med").cast("string"),
            F.lit(" mad="), F.col("mad").cast("string"),
        ).alias("detail"),
    )


def spray_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Networks touching too many distinct accounts inside one hour
    (events_password_spray semantics — fan-in over the shared CIDR
    LPM; the planted spray simulates the stuffing source so the
    detector demonstrably fires on the demo data)."""
    from kawa_spark.functions.exact import floordiv
    from kawa_spark.queries.events import HOUR_US

    sign = clean.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.col("us").alias("ts_us"), "ip"
    )
    m = longest_prefix_match(
        sign.unionByName(_planted_spray(spark)), nets_df(spark)
    )
    rolled = m.groupBy(
        "net", floordiv(F.col("ts_us"), HOUR_US).alias("hour_slot")
    ).agg(
        F.count(F.lit(1)).alias("n_attempts"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return rolled.filter(F.col("n_users") >= SPRAY_MIN_USERS).select(
        F.lit("password_spray").alias("alert"),
        F.lit(3).alias("severity"),
        F.concat(
            F.col("net"), F.lit("@h"), F.col("hour_slot").cast("string")
        ).alias("subject"),
        F.concat(
            F.lit("users="), F.col("n_users").cast("string"),
            F.lit(" attempts="), F.col("n_attempts").cast("string"),
        ).alias("detail"),
    )


def typosquat_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Observed domains one or two edits from the legit vocabulary
    (logs_typosquat semantics — typosquat_matches core; the planted
    look-alike domains simulate the phishing infrastructure)."""
    plants = spark.createDataFrame(
        _typo_plant_rows(), "event_id long, user_id long, domain string"
    )
    agg = (
        clean.select("event_id", "user_id", domain_col().alias("domain"))
        .unionByName(plants)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    wl = spark.createDataFrame(
        [(d,) for d in DGA_VOCAB], "wl_domain string"
    )
    return typosquat_matches(agg, wl, TYPOSQUAT_MAX_DIST).select(
        F.lit("typosquat").alias("alert"),
        F.lit(2).alias("severity"),
        F.col("domain").alias("subject"),
        F.concat(
            F.lit("mimics "), F.col("wl_domain"),
            F.lit(" dist="), F.col("edit_dist").cast("string"),
            F.lit(" hits="), F.col("n_events").cast("string"),
        ).alias("detail"),
    )


def lateral_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Two-hop lateral-movement chains through the address plan
    (lateral_chains core — the events_lateral_movement semantics; the
    planted walks simulate the pivot so the detector demonstrably
    fires). Roundtrips (A→B→A bounces) are reported at lower
    severity than true A→B→C traversals."""
    from kawa_spark.queries.security import (
        CHAIN_WINDOW_US,
        _lm_plant_rows,
        lateral_chains,
    )

    base = clean.select(
        "user_id", "event_id", F.col("us").alias("ts_us"), "ip"
    )
    plants = spark.createDataFrame(
        _lm_plant_rows(), "event_id long, user_id long, ts_us long, ip long"
    )
    attributed = longest_prefix_match(
        base.unionByName(plants), nets_df(spark)
    ).drop("plen", "ip")
    chains = lateral_chains(attributed, HOP_WINDOW_US, CHAIN_WINDOW_US)
    return chains.select(
        F.lit("lateral_movement").alias("alert"),
        F.when(F.col("is_roundtrip"), F.lit(2)).otherwise(F.lit(3)).alias(
            "severity"
        ),
        F.concat(
            F.col("net_a"), F.lit(" -> "), F.col("net_b"),
            F.lit(" -> "), F.col("net_c"),
        ).alias("subject"),
        F.concat(
            F.lit("chains="), F.col("n_chains").cast("string"),
            F.lit(" users="), F.col("n_users").cast("string"),
            F.lit(" fastest_s="),
            (F.col("min_span_us") / 1_000_000).cast("long").cast("string"),
        ).alias("detail"),
    )


def weekday_alerts(clean: DataFrame) -> DataFrame:
    """Event types whose traffic clusters on particular weekdays
    (dow_association core — the events_dow_association semantics; no
    plant here: on uniform demo traffic the detector staying quiet IS
    the honest output, and the alert fires on any real weekly-cron
    structure)."""
    from kawa_spark.functions.exact import floordiv
    from kawa_spark.queries.events import DAY_US, dow_association

    cells = clean.groupBy(
        "event_type",
        F.pmod(floordiv(F.col("us"), DAY_US), F.lit(7)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    scored = dow_association(cells)
    return scored.filter(F.col("is_over")).select(
        F.lit("weekday_affinity").alias("alert"),
        F.lit(1).alias("severity"),
        F.concat(
            F.col("event_type"), F.lit("@dow"), F.col("dow").cast("string")
        ).alias("subject"),
        F.concat(
            F.lit("n="), F.col("n_obs").cast("string"),
            F.lit(" lift="), F.round("lift", 2).cast("string"),
        ).alias("detail"),
    )


def lateral3_alerts(spark: SparkSession, clean: DataFrame) -> DataFrame:
    """Three-hop chains through the address plan (lateral_chains3
    core — the events_lateral_movement_3hop semantics; the planted
    4-net walks simulate the deep pivot). The longest continuous
    chain is the highest-severity alert in the book: three
    junction-continuous hops have almost no benign explanation."""
    from kawa_spark.queries.security import (
        CHAIN3_WINDOW_US,
        _lm3_plant_rows,
        lateral_chains3,
    )

    base = clean.select(
        "user_id", "event_id", F.col("us").alias("ts_us"), "ip"
    )
    plants = spark.createDataFrame(
        _lm3_plant_rows(), "event_id long, user_id long, ts_us long, ip long"
    )
    attributed = longest_prefix_match(
        base.unionByName(plants), nets_df(spark)
    ).drop("plen", "ip")
    chains = lateral_chains3(attributed, HOP_WINDOW_US, CHAIN3_WINDOW_US)
    return chains.select(
        F.lit("lateral_movement_3hop").alias("alert"),
        F.when(F.col("is_roundtrip"), F.lit(3)).otherwise(F.lit(4)).alias(
            "severity"
        ),
        F.concat(
            F.col("net_a"), F.lit(" -> "), F.col("net_b"),
            F.lit(" -> "), F.col("net_c"), F.lit(" -> "), F.col("net_d"),
        ).alias("subject"),
        F.concat(
            F.lit("chains="), F.col("n_chains").cast("string"),
            F.lit(" users="), F.col("n_users").cast("string"),
            F.lit(" fastest_s="),
            (F.col("min_span_us") / 1_000_000).cast("long").cast("string"),
        ).alias("detail"),
    )


def weekday_drift_alerts(clean: DataFrame) -> DataFrame:
    """Event types whose weekday profile CHANGED this week vs their
    trailing history (dow_drift_report core — the events_dow_drift
    semantics; no plant: quiet-on-stable-traffic is the honest
    output, and the alert fires when a cron schedule moves)."""
    from kawa_spark.functions.exact import floordiv
    from kawa_spark.queries.events import DAY_US, WEEK_US, dow_drift_report

    cells = clean.groupBy(
        "event_type",
        floordiv(F.col("us"), WEEK_US).alias("week"),
        F.pmod(floordiv(F.col("us"), DAY_US), F.lit(7)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    scored = dow_drift_report(cells)
    return scored.filter(F.col("is_drift")).select(
        F.lit("weekday_drift").alias("alert"),
        F.lit(2).alias("severity"),
        F.concat(
            F.col("event_type"), F.lit("@w"), F.col("week").cast("string"),
            F.lit("/dow"), F.col("dow").cast("string"),
        ).alias("subject"),
        F.concat(
            F.lit("n="), F.col("n_obs").cast("string"),
            F.lit(" share="), F.round("share", 3).cast("string"),
            F.lit(" base="), F.round("base_share", 3).cast("string"),
        ).alias("detail"),
    )


def alert_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline: one cleaned stream, fifteen detectors,
    one severity-ordered alert table. No persist(): the detectors'
    plans share the debounce subtree byte-identically, so AQE
    exchange reuse serves the shared scan+shuffle from shuffle files
    — the cache-lifecycle-free form of the same sharing (the
    never-unpersisted persist() here was the ADVICE r8 leak class)."""
    clean = debounced_events(spark, sf_dir)
    alerts = (
        flood_alerts(clean)
        .unionByName(heavy_hitter_alerts(clean))
        .unionByName(drift_alerts(clean))
        .unionByName(net_watch_alerts(spark, clean))
        .unionByName(rarity_alerts(clean))
        .unionByName(beacon_alerts(spark, clean))
        .unionByName(travel_alerts(spark, clean))
        .unionByName(dga_alerts(clean))
        .unionByName(spike_alerts(clean))
        .unionByName(spray_alerts(spark, clean))
        .unionByName(typosquat_alerts(spark, clean))
        .unionByName(lateral_alerts(spark, clean))
        .unionByName(weekday_alerts(clean))
        .unionByName(lateral3_alerts(spark, clean))
        .unionByName(weekday_drift_alerts(clean))
    )
    return alerts.orderBy(F.col("severity").desc(), "alert", "subject", "detail")


if __name__ == "__main__":
    from kawa_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="security_analytics_example")
    out = alert_relation(spark, sf_dir)
    out.show(30, truncate=False)
    print(f"total alerts: {out.count()}")
