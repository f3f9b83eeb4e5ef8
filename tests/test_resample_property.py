"""Property-based cross-check of the resample/forward-fill core
(ts_ops.resample_ffill) against a brute-force Python reference on
random sparse series — grid bounds, slot-representative tie-breaks,
and fill propagation are each easy to get subtly wrong.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.ts_ops import HOUR_US, resample_ffill


def _ref(events: list[tuple[int, int, int, float]]) -> dict:
    """user → {slot_us: (value_ffill, is_gap)}, pure Python."""
    by_user: dict[int, list] = {}
    for u, eid, us, v in events:
        by_user.setdefault(u, []).append((eid, us, v))
    out: dict = {}
    for u, evs in by_user.items():
        slots = {}
        for eid, us, v in evs:
            sl = us // HOUR_US
            # representative = max (us, event_id) in the slot
            cur = slots.get(sl)
            if cur is None or (us, eid) > (cur[0], cur[1]):
                slots[sl] = (us, eid, v)
        s0 = min(us // HOUR_US for _, us, _v in evs)
        s1 = max(us // HOUR_US for _, us, _v in evs)
        grid = {}
        last = None
        for sl in range(s0, s1 + 1):
            if sl in slots:
                last = slots[sl][2]
                grid[sl * HOUR_US] = (last, False)
            else:
                grid[sl * HOUR_US] = (last, True)
        out[u] = grid
    return out


@st.composite
def sparse_series(draw):
    n_users = draw(st.integers(1, 3))
    out = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 15))
        for _ in range(n):
            # spread across ~40 hours straddling the 1970 epoch so
            # gaps are common AND negative micros exercise the exact
            # floor-division bucketing (a truncating cast would land
            # pre-epoch rows one slot high — ADVICE r7); same-slot
            # collisions drive the representative tie-break
            us = draw(st.integers(-20 * HOUR_US, 20 * HOUR_US))
            out.append((u, eid, us, float(draw(st.integers(-50, 50)))))
            eid += 1
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=sparse_series())
def test_resample_matches_bruteforce(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_id long, us long, value double"
    )
    got: dict = {}
    for r in resample_ffill(df).collect():
        got.setdefault(r["user_id"], {})[r["slot_us"]] = (
            r["value_ffill"],
            r["is_gap"],
        )
    assert got == _ref(events), events


def test_span_guard_bounds_epoch_outlier(spark):
    """One dirty 1970-epoch row must NOT fan a key's grid out to
    ~490k rows when max_span_hours is set: the grid is clamped to the
    key's trailing window, and the outlier observation falls off the
    grid (it is older than every clamped slot)."""
    base = 490_000 * HOUR_US  # "now": ~56 years after epoch
    events = [
        (1, 0, 7, 1.0),              # dirty row: ~epoch
        (1, 1, base, 2.0),
        (1, 2, base + 5 * HOUR_US, 3.0),
        (2, 3, base, 9.0),           # clean key, 1 slot
    ]
    df = spark.createDataFrame(
        events, "user_id long, event_id long, us long, value double"
    )
    rows = resample_ffill(df, max_span_hours=48).collect()
    u1 = sorted(
        (r["slot_us"] for r in rows if r["user_id"] == 1)
    )
    # clamped: 48h window ending at the key's last slot → 49 slots,
    # not the ~490k an unclamped grid would explode to
    assert len(u1) == 49
    assert u1[0] == (base + 5 * HOUR_US) - 48 * HOUR_US
    assert u1[-1] == base + 5 * HOUR_US
    by_slot = {
        r["slot_us"]: (r["value_ffill"], r["is_gap"])
        for r in rows
        if r["user_id"] == 1
    }
    # the epoch outlier is off-grid; pre-first-obs slots are unfilled
    assert by_slot[u1[0]] == (None, True)
    assert by_slot[base] == (2.0, False)
    assert by_slot[base + HOUR_US] == (2.0, True)
    assert by_slot[base + 5 * HOUR_US] == (3.0, False)
    assert [r["slot_us"] for r in rows if r["user_id"] == 2] == [base]


def test_registered_clamped_form_uses_guard(spark):
    """The registered ts_resample_ffill_clamped key must run the
    max_span_hours=CLAMP_HOURS guard (VERDICT r8 item 4): per-key
    grid rows are capped at CLAMP_HOURS+1 on the real testdata, and
    every key's grid ends at its own last observed slot."""
    from kawa_spark.queries.ts_ops import CLAMP_HOURS
    from kawa_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["ts_resample_ffill_clamped"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r["user_id"], []).append(r["slot_us"])
    assert per_key  # non-vacuous
    for slots in per_key.values():
        assert len(slots) == CLAMP_HOURS + 1  # spans ~700h → clamp bites
        assert max(slots) - min(slots) == CLAMP_HOURS * HOUR_US
