"""Property-based cross-check of the beaconing core
(security.beaconing_stats) against a brute-force Python reference on
random event streams — the gap floor-seconds, the exact integer CV^2
cross-multiplication, the min-gap threshold, and the lag ordering on
(ts_us, event_id) ties each have off-by-one traps.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import beaconing_stats

MIN_GAPS = 3
CV2_NUM = 1
CV2_DEN = 4


def _ref(events: list[tuple[int, str, int, int]]):
    """(user, type) -> (n_gaps, period_s, is_beacon), brute force."""
    by_key: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for u, et, ts, eid in events:
        by_key.setdefault((u, et), []).append((ts, eid))
    out = {}
    for key, evs in by_key.items():
        evs.sort()
        gaps = [
            (b[0] - a[0]) // 1_000_000 for a, b in zip(evs, evs[1:])
        ]
        n = len(gaps)
        if n < MIN_GAPS:
            continue
        sd = sum(gaps)
        sd2 = sum(g * g for g in gaps)
        out[key] = (
            n,
            float(sd) / n,
            CV2_DEN * (n * sd2 - sd * sd) <= CV2_NUM * sd * sd,
        )
    return out


@st.composite
def event_streams(draw):
    n_keys = draw(st.integers(1, 3))
    out = []
    eid = 0
    for k in range(n_keys):
        n = draw(st.integers(1, 12))
        # mix of regular and irregular spacing, µs-granular so the
        # floor-seconds conversion is actually exercised
        for _ in range(n):
            ts = draw(st.integers(0, 30_000_000))
            out.append((k, "t", ts, eid))
            eid += 1
    # one deterministic perfect beacon so the True branch is always hit
    for i in range(MIN_GAPS + 1):
        out.append((999, "t", i * 5_000_000, eid))
        eid += 1
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_streams())
def test_beaconing_matches_bruteforce(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_type string, ts_us long, event_id long"
    )
    got = {
        (r["user_id"], r["event_type"]): (
            r["n_gaps"],
            r["period_s"],
            r["is_beacon"],
        )
        for r in beaconing_stats(
            df, min_gaps=MIN_GAPS, cv2_num=CV2_NUM, cv2_den=CV2_DEN
        ).collect()
    }
    ref = _ref(events)
    assert got == ref, (events, got, ref)


def test_perfect_beacon_flags_true(spark):
    rows = [(1, "x", i * 300_000_000, i) for i in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, event_id long"
    )
    out = beaconing_stats(df, min_gaps=3, cv2_num=1, cv2_den=4).collect()
    assert len(out) == 1
    assert out[0]["is_beacon"] is True
    assert out[0]["period_s"] == 300.0


def test_poisson_like_flags_false(spark):
    # alternating 10 s / 590 s gaps: mean 300, CV = 290/300 > 1/2
    ts, rows = 0, []
    for i in range(20):
        rows.append((1, "x", ts, i))
        ts += 10_000_000 if i % 2 == 0 else 590_000_000
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long, event_id long"
    )
    out = beaconing_stats(df, min_gaps=3, cv2_num=1, cv2_den=4).collect()
    assert len(out) == 1
    assert out[0]["is_beacon"] is False
