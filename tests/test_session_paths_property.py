"""Property-based cross-check of the trigram path miner
(security.session_trigram_paths) against a brute-force Python
reference on random event streams — the traps are the same family as
session rarity's (leads must not cross session boundaries, ties in
the top-K cut must break deterministically) plus the distinct-walker
count per path.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import session_trigram_paths

GAP = 100  # µs inactivity gap for the test streams
K = 5  # small so the tie-broken cut is genuinely exercised


def _ref(events: list[tuple[int, int, str, int]], k: int):
    by_user: dict[int, list] = {}
    for u, eid, et, ts in events:
        by_user.setdefault(u, []).append((ts, eid, et))
    counts: dict[tuple[str, str, str], int] = {}
    walkers: dict[tuple[str, str, str], set] = {}
    for u, evs in by_user.items():
        evs.sort()
        # sessionize, then trigrams within each session
        seqs: list[list[str]] = []
        prev_ts = None
        for ts, _eid, et in evs:
            if prev_ts is None or ts - prev_ts > GAP:
                seqs.append([])
            seqs[-1].append(et)
            prev_ts = ts
        for seq in seqs:
            for a, b, c in zip(seq, seq[1:], seq[2:]):
                counts[(a, b, c)] = counts.get((a, b, c), 0) + 1
                walkers.setdefault((a, b, c), set()).add(u)
    ranked = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1], kv[0][2])
    )[:k]
    return {
        (a, b, c): (n, len(walkers[(a, b, c)])) for (a, b, c), n in ranked
    }


@st.composite
def event_streams(draw):
    n_users = draw(st.integers(1, 3))
    out = []
    eid = 0
    for u in range(n_users):
        k = draw(st.integers(1, 25))
        for _ in range(k):
            ts = draw(st.integers(0, 600))  # gaps of >100 common
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
def test_session_paths_match_bruteforce(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_id long, event_type string, ts_us long"
    )
    got = {
        (r["t0"], r["t1"], r["t2"]): (r["n"], r["n_users"])
        for r in session_trigram_paths(df, GAP, K).collect()
    }
    assert got == _ref(events, K), events
