"""Property-based cross-check of the session-rarity core
(security.session_rarity_scores) against a brute-force Python
reference on random event streams — sessionization boundaries, the
global transition model, and the integer rarity arithmetic each have
off-by-one traps (gap strictly-greater, per-session lead not
crossing session boundaries, single-event sessions omitted).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import session_rarity_scores

GAP = 100  # µs inactivity gap for the test streams


def _ref(events: list[tuple[int, int, str, int]]):
    """(user, session_idx) → (n_transitions, rarity, min_p)."""
    by_user: dict[int, list] = {}
    for u, eid, et, ts in events:
        by_user.setdefault(u, []).append((ts, eid, et))
    # sessionize + collect transitions
    trans: list[tuple[int, int, str, str]] = []
    for u, evs in by_user.items():
        evs.sort()
        sidx = 0
        prev_ts = None
        seq: list[tuple[int, str]] = []
        for ts, _eid, et in evs:
            if prev_ts is None or ts - prev_ts > GAP:
                sidx += 1
            seq.append((sidx, et))
            prev_ts = ts
        for (s1, a), (s2, b) in zip(seq, seq[1:]):
            if s1 == s2:
                trans.append((u, s1, a, b))
    # global model
    n: dict[tuple[str, str], int] = {}
    for _u, _s, a, b in trans:
        n[(a, b)] = n.get((a, b), 0) + 1
    n_from: dict[str, int] = {}
    for (a, _b), c in n.items():
        n_from[a] = n_from.get(a, 0) + c
    # per-session scores
    out: dict[tuple[int, int], tuple[int, int, float]] = {}
    for u, s, a, b in trans:
        cnt, rar, mp = out.get((u, s), (0, 0, None))
        p = n[(a, b)] / n_from[a]
        out[(u, s)] = (
            cnt + 1,
            rar + (n_from[a] - n[(a, b)]),
            p if mp is None else min(mp, p),
        )
    return out


@st.composite
def event_streams(draw):
    n_users = draw(st.integers(1, 3))
    out = []
    eid = 0
    for u in range(n_users):
        k = draw(st.integers(1, 20))
        for _ in range(k):
            ts = draw(st.integers(0, 1000))  # gaps of >100 common
            et = draw(st.sampled_from(["a", "b", "c"]))
            out.append((u, eid, et, ts))
            eid += 1
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_streams())
def test_session_rarity_matches_bruteforce(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_id long, event_type string, ts_us long"
    )
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_transitions"],
            r["rarity"],
            r["min_p"],
        )
        for r in session_rarity_scores(df, GAP).collect()
    }
    assert got == _ref(events), events
