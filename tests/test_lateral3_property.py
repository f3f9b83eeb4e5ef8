"""Property-based cross-check of the 3-hop lateral-movement core
(queries/security.lateral_chains3) against a brute-force Python
length-3 chain miner on random per-user net walks — including
off-window drifts (chain breakers at either junction), drift-back
sequences, tie boundaries, and pre-epoch starts — plus the plant
pins and the single-exchange plan shape.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.security import lateral_chains3

S = 1_000_000
HOP_W = 10 * S
CHAIN3_W = 3 * HOP_W
NETS = ["na", "nb", "nc", "nd", "ne"]


def _chains3_ref(rows):
    """(net_a, net_b, net_c, net_d) -> [(user, span)] from the batch
    definition: hops = consecutive-event net changes within HOP_W; a
    3-hop chain is three CONSECUTIVE hops h1,h2,h3 of one user with
    h1.to == h2.from, h2.to == h3.from, h3.end - h1.start <= CHAIN3_W."""
    by_user: dict[int, list] = {}
    for eid, u, net, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((eid, net, us))
    out: dict[tuple, list] = {}
    for u, evs in by_user.items():
        hops = []  # (from, to, start, end)
        last_net, last_us = None, None
        for eid, net, us in evs:
            if (
                last_us is not None
                and net != last_net
                and us - last_us <= HOP_W
            ):
                hops.append((last_net, net, last_us, us))
            last_net, last_us = net, us
        for i in range(2, len(hops)):
            h1, h2, h3 = hops[i - 2], hops[i - 1], hops[i]
            if (
                h1[1] == h2[0]
                and h2[1] == h3[0]
                and h3[3] - h1[2] <= CHAIN3_W
            ):
                out.setdefault((h1[0], h2[0], h3[0], h3[1]), []).append(
                    (u, h3[3] - h1[2])
                )
    return {
        k: (
            len(v),
            len({u for u, _ in v}),
            min(s for _, s in v),
            k[0] == k[3],
        )
        for k, v in out.items()
    }


@st.composite
def walk_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 20))
        t = draw(st.sampled_from([0, -100 * HOP_W]))
        for _ in range(n):
            t += draw(
                st.sampled_from(
                    [0, 1, HOP_W // 2, HOP_W, HOP_W + 1, 3 * HOP_W]
                )
            )
            rows.append((eid, u, draw(st.sampled_from(NETS)), t))
            eid += 1
    return rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=walk_batches())
def test_chain3_core_matches_bruteforce(spark, rows):
    df = spark.createDataFrame(
        [(u, e, t, n) for e, u, n, t in rows],
        "user_id long, event_id long, ts_us long, net string",
    )
    got = {
        (r["net_a"], r["net_b"], r["net_c"], r["net_d"]): (
            r["n_chains"],
            r["n_users"],
            r["min_span_us"],
            r["is_roundtrip"],
        )
        for r in lateral_chains3(df, HOP_W, CHAIN3_W).collect()
    }
    assert got == _chains3_ref(rows), rows


def test_lm3_plants_land(spark):
    """Non-vacuity: the two planted 4-net traversals give the
    (quarantine, dc1, west, guest) cell, the return walk gives a
    roundtrip cell — both flag classes present at the smallest SF."""
    from kawa_spark import registry
    from kawa_spark.queries.security import LM3_PLANT_WALKS

    registry.load_all()
    rows = registry.QUERIES["events_lateral_movement_3hop"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    cells = {
        (r["net_a"], r["net_b"], r["net_c"], r["net_d"]): r for r in rows
    }
    walk = tuple(LM3_PLANT_WALKS[0])
    assert cells[walk]["n_chains"] >= 2
    assert cells[walk]["n_users"] >= 2
    assert not cells[walk]["is_roundtrip"]
    ret = tuple(LM3_PLANT_WALKS[2])
    assert cells[ret]["is_roundtrip"]


def test_lateral3_single_user_exchange(spark):
    """Same plan skeleton as the 2-hop pin: broadcast LPM (no
    SortMergeJoin, no event_id exchange), ONE user_id exchange
    serving both lag windows."""
    import re

    from kawa_spark import registry
    from kawa_spark.plans.audit import audit_plan

    registry.load_all()
    df = registry.QUERIES["events_lateral_movement_3hop"](
        spark, "/root/testdata/sf0.001"
    )
    assert audit_plan(df) == []
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert keys
    for k in keys:
        assert "event_id" not in k, keys
    user_exchanges = [k for k in keys if k.startswith("user_id")]
    assert len(user_exchanges) == 1, keys
