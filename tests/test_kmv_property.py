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
