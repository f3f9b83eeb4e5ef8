"""Property-based cross-check of the events_funnel stage logic
against a brute-force Python reference on random event streams —
ordered-sequence semantics (a click before any view must not count)
are exactly the kind of boundary a window/groupBy rewrite can get
subtly wrong.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_funnel(events: list[tuple[int, str, int]]) -> dict:
    """user → (t_view, t_click, t_purchase, stage), Python reference."""
    out = {}
    by_user: dict[int, list] = {}
    for u, typ, us in events:
        by_user.setdefault(u, []).append((typ, us))
    for u, evs in by_user.items():
        views = sorted(us for t, us in evs if t == "view")
        if not views:
            continue
        t_view = views[0]
        clicks = sorted(us for t, us in evs if t == "click" and us > t_view)
        t_click = clicks[0] if clicks else None
        t_purchase = None
        if t_click is not None:
            purchases = sorted(
                us for t, us in evs if t == "purchase" and us > t_click
            )
            t_purchase = purchases[0] if purchases else None
        stage = 1 + (t_click is not None) + (t_purchase is not None)
        out[u] = (t_view, t_click, t_purchase, stage)
    return out


def _spark_funnel(spark, events):
    """The REAL operator core (events.funnel_stages), bound to a
    synthetic frame (the registered key binds to the events table)."""
    from kawa_spark.queries.events import funnel_stages

    ev = spark.createDataFrame(
        events, "user_id long, event_type string, us long"
    )
    return funnel_stages(ev)


@st.composite
def event_streams(draw):
    n = draw(st.integers(1, 40))
    out = []
    for _ in range(n):
        out.append(
            (
                draw(st.integers(0, 3)),
                draw(st.sampled_from(["view", "click", "purchase", "error"])),
                draw(st.integers(0, 20)),  # tight range → ties and
                # out-of-order sequences on purpose
            )
        )
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=event_streams())
def test_funnel_matches_bruteforce(spark, events):
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"], r["stage"])
        for r in _spark_funnel(spark, events).collect()
    }
    assert got == _ref_funnel(events), events
