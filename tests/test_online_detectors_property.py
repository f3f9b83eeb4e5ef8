"""Property-based cross-checks of the two late-r9 online kernels
(streaming/stateful.beacon_scores, net_hops) against brute-force
Python references on random event sets with RANDOM microbatch splits.
Both kernels process in global (us, event_id) order when batches are
time-ordered (the documented contract), so the RANDOM split points
(up to three microbatches) may land anywhere on the globally sorted
list — including inside a timestamp tie — and the online result must
still equal the batch prefix form.
"""

from __future__ import annotations

import uuid

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import drain_batches as _drain_batches
from kawa_spark.streaming.stateful import beacon_scores, net_hops

MIN_GAPS = 3
CV2_NUM, CV2_DEN = 1, 4
S = 1_000_000
HOP_W = 10 * S


def _beacon_ref(rows):
    """event_id → (n_gaps, period_s, is_beacon) for events past the
    threshold, from the prefix gap power sums in (us, eid) order."""
    out = {}
    by_key: dict[tuple, list] = {}
    for eid, u, typ, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_key.setdefault((u, typ), []).append((eid, us))
    for evs in by_key.values():
        last, n, sd, sd2 = None, 0, 0, 0
        for eid, us in evs:
            if last is not None:
                d = (us - last) // S
                n += 1
                sd += d
                sd2 += d * d
                if n >= MIN_GAPS:
                    flag = CV2_DEN * (n * sd2 - sd * sd) <= CV2_NUM * sd * sd
                    out[eid] = (n, sd / n, flag)
            last = us
    return out


def _hops_ref(rows):
    """event_id → (from_net, to_net, gap_us) for net changes within
    the window, in (us, eid) order per user."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, u, net, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((eid, net, us))
    for evs in by_user.values():
        last_net, last_us = None, None
        for eid, net, us in evs:
            if (
                last_us is not None
                and net != last_net
                and us - last_us <= HOP_W
            ):
                out[eid] = (last_net, net, us - last_us)
            last_net, last_us = net, us
    return out


@st.composite
def beacon_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 2))):
        for typ in ["a", "b"][: draw(st.integers(1, 2))]:
            n = draw(st.integers(1, 12))
            # pre-epoch starts pin that initialization does not ride
            # on a timestamp sentinel (code-review fix)
            t = draw(st.sampled_from([0, -4000 * S]))
            for _ in range(n):
                # regular 300 s cadence, jittered cadence, ragged
                # gaps, sub-second gaps that floor to 0
                t += draw(
                    st.sampled_from(
                        [300 * S, 300 * S + 7, 290 * S, 40 * S, 999_999, 0]
                    )
                )
                rows.append((eid, u, typ, t))
                eid += 1
    rows.sort(key=lambda r: (r[3], r[0]))
    cuts = sorted(
        [draw(st.integers(0, len(rows))), draw(st.integers(0, len(rows)))]
    )
    return rows, cuts


@st.composite
def hop_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 15))
        t = draw(st.sampled_from([0, -100 * HOP_W]))
        for _ in range(n):
            t += draw(
                st.sampled_from([0, 1, HOP_W // 2, HOP_W, HOP_W + 1, 5 * HOP_W])
            )
            rows.append(
                (eid, u, draw(st.sampled_from(["na", "nb", "nc"])), t)
            )
            eid += 1
    rows.sort(key=lambda r: (r[3], r[0]))
    cuts = sorted(
        [draw(st.integers(0, len(rows))), draw(st.integers(0, len(rows)))]
    )
    return rows, cuts


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=beacon_batches())
def test_beacon_scores_matches_bruteforce(spark, case, tmp_path_factory):
    rows, (c1, c2) = case
    src = tmp_path_factory.mktemp("bs_src")
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    batches = [
        pd.DataFrame(
            [(e, u, ty, pd.Timestamp(t, unit="us")) for e, u, ty, t in b],
            columns=["event_id", "user_id", "event_type", "ts"],
        )
        for b in (rows[:c1], rows[c1:c2], rows[c2:])
        if b
    ]
    got = {
        r["event_id"]: (r["n_gaps"], r["period_s"], r["is_beacon"])
        for r in _drain_batches(
            spark,
            src,
            schema,
            batches,
            lambda s: beacon_scores(s, MIN_GAPS, CV2_NUM, CV2_DEN),
            f"bsp_{uuid.uuid4().hex[:8]}",
        )
    }
    assert got == _beacon_ref(rows), (rows, c1, c2)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=hop_batches())
def test_net_hops_matches_bruteforce(spark, case, tmp_path_factory):
    rows, (c1, c2) = case
    src = tmp_path_factory.mktemp("nh_src")
    schema = "event_id long, user_id long, net string, us long"
    batches = [
        pd.DataFrame(b, columns=["event_id", "user_id", "net", "us"])
        for b in (rows[:c1], rows[c1:c2], rows[c2:])
        if b
    ]
    got = {
        r["event_id"]: (r["from_net"], r["to_net"], r["gap_us"])
        for r in _drain_batches(
            spark,
            src,
            schema,
            batches,
            lambda s: net_hops(s, HOP_W),
            f"nhp_{uuid.uuid4().hex[:8]}",
        )
    }
    assert got == _hops_ref(rows), (rows, c1, c2)


# ---------------------------------------------------------------------------
# session_transitions (the online sessionizer behind
# stream_exec_session_rarity)
# ---------------------------------------------------------------------------

SESS_GAP = 100 * S


def _transitions_ref(rows):
    """Sorted transition list (user, session_idx, from, to) from the
    batch definition: cumulative new-session sum in (us, eid) order,
    transition per consecutive in-session pair."""
    out = []
    by_user: dict[int, list] = {}
    for eid, u, typ, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((typ, us))
    for u, evs in by_user.items():
        idx, last_us, last_typ = 0, None, None
        for typ, us in evs:
            if last_us is None or us - last_us > SESS_GAP:
                idx += 1
            else:
                out.append((u, idx, last_typ, typ))
            last_us, last_typ = us, typ
    return sorted(out)


@st.composite
def session_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 15))
        # pre-epoch starts pin that initialization does not ride on a
        # timestamp sentinel
        t = draw(st.sampled_from([0, -50 * SESS_GAP]))
        for _ in range(n):
            # 0-gaps (ties), sub-gap continuations, the exact gap
            # boundary (> is the break test, so == continues), and
            # clear session breaks
            t += draw(
                st.sampled_from(
                    [0, 1, SESS_GAP // 2, SESS_GAP, SESS_GAP + 1, 5 * SESS_GAP]
                )
            )
            rows.append(
                (eid, u, draw(st.sampled_from(["a", "b", "c"])), t)
            )
            eid += 1
    rows.sort(key=lambda r: (r[3], r[0]))
    cuts = sorted(
        [draw(st.integers(0, len(rows))), draw(st.integers(0, len(rows)))]
    )
    return rows, cuts


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=session_batches())
def test_session_transitions_matches_bruteforce(spark, case, tmp_path_factory):
    from kawa_spark.streaming.stateful import session_transitions

    rows, (c1, c2) = case
    src = tmp_path_factory.mktemp("st_src")
    schema = "event_id long, user_id long, event_type string, us long"
    batches = [
        pd.DataFrame(b, columns=["event_id", "user_id", "event_type", "us"])
        for b in (rows[:c1], rows[c1:c2], rows[c2:])
        if b
    ]
    got = sorted(
        (r["user_id"], r["session_idx"], r["from_type"], r["to_type"])
        for r in _drain_batches(
            spark,
            src,
            schema,
            batches,
            lambda s: session_transitions(s, SESS_GAP),
            f"stp_{uuid.uuid4().hex[:8]}",
        )
    )
    assert got == _transitions_ref(rows), (rows, c1, c2)


# ---------------------------------------------------------------------------
# funnel_states (the online funnel behind stream_exec_funnel)
# ---------------------------------------------------------------------------


def _funnel_ref(rows):
    """user -> final (t_view, t_click, t_purchase, stage) from the
    batch definition (MIN chain with strict inequalities)."""
    by_user: dict[int, list] = {}
    for eid, u, typ, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((typ, us))
    out = {}
    for u, evs in by_user.items():
        tv = min((t for ty, t in evs if ty == "view"), default=None)
        tc = (
            min(
                (t for ty, t in evs if ty == "click" and t > tv),
                default=None,
            )
            if tv is not None
            else None
        )
        tp = (
            min(
                (t for ty, t in evs if ty == "purchase" and t > tc),
                default=None,
            )
            if tc is not None
            else None
        )
        if tv is not None:
            out[u] = (
                tv,
                tc,
                tp,
                1 + (tc is not None) + (tp is not None),
            )
    return out


@st.composite
def funnel_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 12))
        t = draw(st.sampled_from([0, -1000 * S]))
        for _ in range(n):
            # 0-gaps create the tie case the strict > excludes
            t += draw(st.sampled_from([0, 1, S, 50 * S]))
            rows.append(
                (
                    eid,
                    u,
                    draw(st.sampled_from(["view", "click", "purchase"])),
                    t,
                )
            )
            eid += 1
    rows.sort(key=lambda r: (r[3], r[0]))
    cuts = sorted(
        [draw(st.integers(0, len(rows))), draw(st.integers(0, len(rows)))]
    )
    return rows, cuts


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=funnel_batches())
def test_funnel_states_matches_bruteforce(spark, case, tmp_path_factory):
    from kawa_spark.streaming.stateful import funnel_states

    rows, (c1, c2) = case
    src = tmp_path_factory.mktemp("fn_src")
    schema = "event_id long, user_id long, event_type string, us long"
    batches = [
        pd.DataFrame(b, columns=["event_id", "user_id", "event_type", "us"])
        for b in (rows[:c1], rows[c1:c2], rows[c2:])
        if b
    ]
    emitted = _drain_batches(
        spark,
        src,
        schema,
        batches,
        funnel_states,
        f"fnp_{uuid.uuid4().hex[:8]}",
    )
    # last emission per user = max stage (slots are write-once)
    got = {}
    for r in emitted:
        cur = got.get(r["user_id"])
        row = (r["t_view"], r["t_click"], r["t_purchase"], r["stage"])
        if cur is None or row[3] > cur[3]:
            got[r["user_id"]] = row
    assert got == _funnel_ref(rows), (rows, c1, c2)
