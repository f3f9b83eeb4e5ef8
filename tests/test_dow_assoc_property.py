"""Property-based cross-check of the day-of-week association scorer
(queries/events.dow_association) against a brute-force Python
contingency table, plus the non-vacuity and twin-equality pins for
the registered pair.

Why this exists: the hash oracle mirrors the construction (same
marginal algebra in both engines), so a shared logic error — wrong
marginal, swapped numerator — would hash-match anyway. This test
recomputes lift and the integer flag independently from the raw
cells.
"""

from __future__ import annotations

import random
from fractions import Fraction

from kawa_spark import registry
from kawa_spark.queries.events import (
    DOW_DEN,
    DOW_NUM,
    DOW_PLANT_N,
    dow_association,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _ref(cells):
    """Brute-force contingency scoring: marginals by direct summation,
    lift as a Fraction (exact), flag by exact rational comparison."""
    n_type: dict[str, int] = {}
    n_dow: dict[int, int] = {}
    total = 0
    for t, d, n in cells:
        n_type[t] = n_type.get(t, 0) + n
        n_dow[d] = n_dow.get(d, 0) + n
        total += n
    out = {}
    for t, d, n in cells:
        lift = Fraction(n, n_type[t]) * Fraction(total, n_dow[d])
        over = lift > Fraction(DOW_NUM, DOW_DEN)
        out[(t, d)] = (n, n_type[t], n_dow[d], total, lift, over)
    return out


def test_dow_association_matches_bruteforce(spark):
    """Random sparse cell tables (types missing on some weekdays,
    single-event types whose lone cell lifts to ~7, heavy cells) —
    the Spark core's integers and flag must equal the exact rational
    reference, and its double lift must be within one representation
    step of the Fraction."""
    rng = random.Random(0xD0A)
    cells = []
    for ti in range(12):
        for d in range(7):
            if rng.random() < 0.4:
                continue  # sparse: not every type appears every day
            cells.append((f"t{ti}", d, rng.choice([1, 1, 2, 5, 40, 1000])))
    df = spark.createDataFrame(
        cells, "event_type string, dow long, n_obs long"
    )
    got = {
        (r["event_type"], r["dow"]): (
            r["n_obs"],
            r["n_type"],
            r["n_dow"],
            r["n_total"],
            r["lift"],
            r["is_over"],
        )
        for r in dow_association(df).collect()
    }
    want = _ref(cells)
    assert set(got) == set(want)
    flags = {True: 0, False: 0}
    for k, (n, nt, nd, tot, lift, over) in want.items():
        gn, gnt, gnd, gtot, glift, gover = got[k]
        assert (gn, gnt, gnd, gtot) == (n, nt, nd, tot), k
        assert gover == over, k
        assert abs(glift - float(lift)) <= 1e-12 * float(lift), k
        flags[over] += 1
    assert flags[True] and flags[False], flags


def test_dow_plant_is_the_only_true_cell(spark):
    """Non-vacuity pin (the spray/typosquat discipline): the planted
    weekly-periodic type is flagged, concentrated on one weekday, and
    natural uniform traffic never trips the 3/2 threshold."""
    rows = registry.QUERIES["events_dow_association"](spark, SF).collect()
    hot = [r for r in rows if r["is_over"]]
    cold = [r for r in rows if not r["is_over"]]
    assert len(hot) == 1, hot
    assert hot[0]["event_type"] == "planted_dowpeak"
    assert hot[0]["n_obs"] == hot[0]["n_type"] == DOW_PLANT_N
    assert cold, "no false class — natural traffic missing"


def test_dow_online_twin_equals_batch(spark):
    """The twelfth online/offline twin: the complete-mode streaming
    cell counts must reproduce the batch contingency table exactly
    (COUNT-only state, order-insensitive)."""
    batch = {
        tuple(r)
        for r in registry.QUERIES["events_dow_association"](
            spark, SF
        ).collect()
    }
    online = {
        tuple(r)
        for r in registry.QUERIES["stream_exec_dow_association"](
            spark, SF
        ).collect()
    }
    assert batch == online and batch
