"""Property-based cross-check of the weekly dow-profile drift scorer
(queries/events.dow_drift_report) against a brute-force Python
cumulative table, plus the plant/non-vacuity and twin-equality pins
for the registered pair.

Why this exists: the hash oracle mirrors the construction (the same
window algebra in both engines), so a shared logic error — baseline
including the current week, swapped cross-product sides — would
hash-match anyway. This test recomputes every column independently
from the raw cells with exact rationals.
"""

from __future__ import annotations

import random
from fractions import Fraction

from kawa_spark import registry
from kawa_spark.queries.events import (
    DOW_DRIFT_DEN,
    DOW_DRIFT_NUM,
    dow_drift_report,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _ref(cells):
    """Brute-force drift scoring: trailing baselines by direct
    summation over strictly-earlier weeks, flag by exact rational
    comparison (share > (NUM/DEN)·base_share)."""
    out = {}
    for t, w, d, n in cells:
        n_type_week = sum(
            cn for ct, cw, _, cn in cells if ct == t and cw == w
        )
        prior = [(cw, cd, cn) for ct, cw, cd, cn in cells if ct == t and cw < w]
        if not prior:
            out[(t, w, d)] = (n, n_type_week, None, None, None, True)
            continue
        base_total = sum(cn for _, _, cn in prior)
        base_n = sum(cn for _, cd, cn in prior if cd == d)
        drift = Fraction(n, n_type_week) > Fraction(
            DOW_DRIFT_NUM, DOW_DRIFT_DEN
        ) * Fraction(base_n, base_total)
        out[(t, w, d)] = (n, n_type_week, base_n, base_total, drift, False)
    return out


def test_dow_drift_matches_bruteforce(spark):
    """Random sparse cell tables — types absent on some weekdays and
    in some weeks, week gaps (the RANGE frame must sum all earlier
    OBSERVED weeks, not just week-1), first-week cells, heavy bursts.
    The Spark core's integers and flags must equal the exact rational
    reference; its double shares must be within one representation
    step of the Fractions."""
    rng = random.Random(0xD01F7)
    cells = []
    for ti in range(8):
        for w in (100, 101, 103, 107):  # deliberate gaps
            for d in range(7):
                if rng.random() < 0.45:
                    continue
                cells.append(
                    (f"t{ti}", w, d, rng.choice([1, 1, 2, 5, 40, 1000]))
                )
    df = spark.createDataFrame(
        cells, "event_type string, week long, dow long, n_obs long"
    )
    got = {
        (r["event_type"], r["week"], r["dow"]): r
        for r in dow_drift_report(df).collect()
    }
    want = _ref(cells)
    assert set(got) == set(want)
    drift_classes = {True: 0, False: 0}
    new_classes = {True: 0, False: 0}
    for k, (n, ntw, bn, bt, drift, is_new) in want.items():
        g = got[k]
        assert (g["n_obs"], g["n_type_week"]) == (n, ntw), k
        assert g["is_new_type"] == is_new, k
        if is_new:
            assert g["base_n"] is None and g["base_total"] is None, k
            assert g["base_share"] is None and g["is_drift"] is None, k
        else:
            assert (g["base_n"], g["base_total"]) == (bn, bt), k
            assert g["is_drift"] == drift, k
            assert abs(g["base_share"] - bn / bt) <= 1e-15, k
            drift_classes[drift] += 1
        new_classes[is_new] += 1
        assert abs(g["share"] - n / ntw) <= 1e-15, k
    assert drift_classes[True] and drift_classes[False], drift_classes
    assert new_classes[True] and new_classes[False], new_classes


def test_dow_drift_plant_burst_cell_flags(spark):
    """Non-vacuity pin: the planted burst cell (35 events on one
    weekday after 4 uniform weeks) is drift-flagged with the expected
    integer baselines, the plant's same-week uniform tail cells are
    NOT flagged, and natural types populate all three classes'
    complement (false + new-type rows exist)."""
    rows = registry.QUERIES["events_dow_drift"](spark, SF).collect()
    plant = [r for r in rows if r["event_type"] == "planted_dowdrift"]
    burst = [r for r in plant if r["n_obs"] == 35]
    assert len(burst) == 1, plant
    b = burst[0]
    assert b["is_drift"] is True
    assert b["n_type_week"] == 39  # 35 burst + 4 uniform tail days
    assert b["base_n"] == 4 and b["base_total"] == 24
    # uniform tail cells with an OBSERVED baseline never flag; cells
    # whose dow was absent from the baseline (base_n = 0, share went
    # 0 → positive) flag by definition — both subclasses must exist
    tail = [r for r in plant if not r["is_new_type"] and r["n_obs"] != 35]
    seen = [r for r in tail if r["base_n"] > 0]
    unseen = [r for r in tail if r["base_n"] == 0]
    assert seen and all(r["is_drift"] is False for r in seen), seen
    assert unseen and all(r["is_drift"] is True for r in unseen), unseen
    assert any(r["is_new_type"] for r in plant), plant
    natural = [r for r in rows if r["event_type"] != "planted_dowdrift"]
    assert any(r["is_drift"] is False for r in natural)


def test_dow_drift_online_twin_equals_batch(spark):
    """The sixteenth online/offline twin: the complete-mode streaming
    cell counts must reproduce the batch drift table exactly
    (COUNT-only state, order-insensitive)."""
    batch = {
        tuple(r)
        for r in registry.QUERIES["events_dow_drift"](spark, SF).collect()
    }
    online = {
        tuple(r)
        for r in registry.QUERIES["stream_exec_dow_drift"](
            spark, SF
        ).collect()
    }
    assert batch == online and batch
