"""Property-based cross-check of the KMV sketch core
(stats.kmv_distinct) against a brute-force Python replica — the
estimator is a deterministic function of md5, so the two must agree
to the last bit, including the estimate doubles.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.stats import KMV_K, _KMV_DENOM, kmv_distinct


def _u(value: int) -> float:
    h = hashlib.md5(str(value).encode()).hexdigest()
    return int(h[:15], 16) / _KMV_DENOM


def _ref(pairs: list[tuple[str, int]]) -> dict:
    groups: dict[str, set] = {}
    for g, v in pairs:
        groups.setdefault(g, set()).add(v)
    out = {}
    for g, vals in groups.items():
        ranked = sorted((_u(v), v) for v in vals)[:KMV_K]
        k_seen = len(ranked)
        u_k = ranked[-1][0]
        est = float(k_seen) if k_seen < KMV_K else (KMV_K - 1) / u_k
        out[g] = (len(vals), k_seen, est, abs(est - len(vals)) / len(vals) <= 0.5)
    return out


@st.composite
def grouped_values(draw):
    out = []
    for g in ("a", "b"):
        # straddle K=64 so both the exact-fallback (<K) and the
        # estimator (≥K) paths run
        n = draw(st.integers(1, 200))
        base = draw(st.integers(0, 10_000))
        out.extend((g, base + i) for i in range(n))
        # duplicates must not change anything
        out.extend((g, base + i) for i in range(min(n, 5)))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=grouped_values())
def test_kmv_matches_bruteforce(spark, pairs):
    df = spark.createDataFrame(pairs, "g string, v long")
    got = {
        r["event_type"]: (
            r["n_exact"],
            r["k_seen"],
            r["kmv_estimate"],
            r["within_tol"],
        )
        for r in kmv_distinct(df, "g", "v").collect()
    }
    want = _ref(pairs)
    assert got.keys() == want.keys()
    for g in want:
        ne, ks, est, tol = want[g]
        assert got[g][0] == ne and got[g][1] == ks
        assert got[g][2] == est, (g, got[g][2], est)  # bit-identical
        assert got[g][3] == tol


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=grouped_values())
def test_kmv_prefilter_is_estimate_invariant(spark, pairs):
    """The big-group prefilter (u < c·K/N̂) must not change ANY output
    bit: the estimate reads only the K minima, which survive the
    threshold with overwhelming probability (and deterministically on
    these inputs — md5 is fixed)."""
    df = spark.createDataFrame(pairs, "g string, v long")
    plain = {
        r["event_type"]: tuple(r) for r in kmv_distinct(df, "g", "v").collect()
    }
    pre = {
        r["event_type"]: tuple(r)
        for r in kmv_distinct(df, "g", "v", prefilter=True).collect()
    }
    assert plain == pre


def test_kmv_prefilter_invariant_on_large_group(spark):
    """A >>K group where the prefilter actually cuts (n_hat >> c·K):
    50k distincts → threshold ~5e-3 keeps ~256 of 50k rows, and the
    sketch output is still bit-identical."""
    df = spark.range(50_000).selectExpr("'big' AS g", "id AS v")
    plain = kmv_distinct(df, "g", "v").collect()
    pre = kmv_distinct(df, "g", "v", prefilter=True).collect()
    assert [tuple(r) for r in plain] == [tuple(r) for r in pre]
    assert plain[0]["k_seen"] == KMV_K


def _sliding_ref(pairs: list[tuple[int, int]], width: int) -> dict:
    """day → (n_exact, k_seen, estimate, within_tol), computing the
    KMV DIRECTLY over each observed day's trailing-window user set —
    independent of the banded fan-out construction under test."""
    by_day: dict[int, set] = {}
    for d, v in pairs:
        by_day.setdefault(d, set()).add(v)
    out = {}
    for d in by_day:
        users = set()
        for back in range(width):
            users |= by_day.get(d - back, set())
        ranked = sorted((_u(v), v) for v in users)[:KMV_K]
        k_seen = len(ranked)
        u_k = ranked[-1][0]
        est = float(k_seen) if k_seen < KMV_K else (KMV_K - 1) / u_k
        out[d] = (
            len(users), k_seen, est,
            abs(est - len(users)) / len(users) <= 0.5,
        )
    return out


@st.composite
def day_user_pairs(draw):
    out = set()
    n_days = draw(st.integers(1, 10))
    base_day = draw(st.sampled_from([0, -20, 19720]))
    for _ in range(n_days):
        # gaps so some windows DON'T cover all prior days, and
        # per-day populations straddling K=64
        d = base_day + draw(st.integers(0, 25))
        n = draw(st.integers(1, 120))
        vbase = draw(st.integers(0, 5_000))
        out |= {(d, vbase + i) for i in range(n)}
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=day_user_pairs(), width=st.sampled_from([1, 3, 7]))
def test_kmv_sliding_matches_direct_window_kmv(spark, pairs, width):
    """The banded fan-out (each day's sketch re-attributed to the
    windows it serves, deduped, re-ranked) must equal a KMV computed
    directly over each window's exact user set — the union identity
    end-to-end, bit-identical including the estimate doubles. The
    oracle mirrors the construction, so only an INDEPENDENT
    reference can catch a fan-out-range or dedup error."""
    from kawa_spark.queries.stats import kmv_sliding

    df = spark.createDataFrame(pairs, "day long, user_id long").distinct()
    got = {
        r["day"]: (
            r["n_exact"], r["k_seen"], r["kmv_estimate"], r["within_tol"]
        )
        for r in kmv_sliding(df, width=width).collect()
    }
    assert got == _sliding_ref(pairs, width), (len(pairs), width)
