"""Property-based cross-check of the count-min sketch core
(stats.cms_frequencies) against an INDEPENDENT Python CMS built
directly on hashlib.md5 — the construction-mirroring oracle cannot
catch a shared hashing/bucketing error, this can. Also pins the
estimator's defining invariant (estimate >= exact, always) and that
the relative-width form equals the fixed-width form at the width it
resolves.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.stats import CMS_MIN_W, cms_frequencies

D = 4


def _bucket(i: int, key: int, w: int) -> int:
    h = hashlib.md5(str(key).encode()).hexdigest()
    return int(h[8 * i : 8 * i + 8], 16) % w


def _ref(keys: list[int], w: int):
    cells: dict[tuple[int, int], int] = {}
    for k in keys:
        for i in range(D):
            b = (i, _bucket(i, k, w))
            cells[b] = cells.get(b, 0) + 1
    out = {}
    for k in set(keys):
        exact = keys.count(k)
        est = min(cells[(i, _bucket(i, k, w))] for i in range(D))
        out[k] = (exact, est, est > exact)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    w=st.integers(2, 16),
)
def test_cms_matches_independent_reference(spark, keys, w):
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    got = {
        r["user_id"]: (r["n_exact"], r["n_cms"], r["is_over"])
        for r in cms_frequencies(df, "user_id", D, w).collect()
    }
    want = _ref(keys, w)
    assert got == want, (keys, w)
    # the estimator's defining invariant
    assert all(est >= exact for exact, est, _ in got.values())


def test_relative_width_equals_fixed_at_resolved_width(spark):
    """The registered key's relative form (w=None) must be
    bit-identical to the fixed form at the width it resolves:
    max(CMS_MIN_W, |keys| // 2)."""
    keys = [k % 13 for k in range(97)]  # 13 distinct keys -> w = 6
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    resolved = max(CMS_MIN_W, len(set(keys)) // 2)
    rel = {
        tuple(r) for r in cms_frequencies(df, "user_id", D, None).collect()
    }
    fixed = {
        tuple(r)
        for r in cms_frequencies(df, "user_id", D, resolved).collect()
    }
    assert rel == fixed


def test_cms_d_contract(spark):
    """d < 4 works (fewer rows = looser delta, same invariant); d > 4
    raises loudly — md5 only supplies 4 disjoint 8-hex-char rows, and
    a silently truncated sketch would report confidence the caller
    doesn't have (the stripped-assert trap under python -O)."""
    import pytest as _pytest

    df = spark.createDataFrame([(k % 5,) for k in range(40)], "user_id long")
    got = {
        r["user_id"]: (r["n_exact"], r["n_cms"])
        for r in cms_frequencies(df, "user_id", 2, 4).collect()
    }
    assert len(got) == 5
    assert all(est >= exact for exact, est in got.values())
    with _pytest.raises(ValueError, match="at most 4"):
        cms_frequencies(df, "user_id", 5, 4)
