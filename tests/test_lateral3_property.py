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


def _chains3_events_ref(rows):
    """event_id -> (net_a, net_b, net_c, net_d, span) for every chain,
    keyed by the event that completes the third hop."""
    by_user: dict[int, list] = {}
    for eid, u, net, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((eid, net, us))
    out = {}
    for evs in by_user.values():
        hops = []  # (from, to, start, end, eid_end)
        last_net, last_us = None, None
        for eid, net, us in evs:
            if (
                last_us is not None
                and net != last_net
                and us - last_us <= HOP_W
            ):
                hops.append((last_net, net, last_us, us, eid))
            last_net, last_us = net, us
        for i in range(2, len(hops)):
            h1, h2, h3 = hops[i - 2], hops[i - 1], hops[i]
            if (
                h1[1] == h2[0]
                and h2[1] == h3[0]
                and h3[3] - h1[2] <= CHAIN3_W
            ):
                out[h3[4]] = (h1[0], h2[0], h3[0], h3[1], h3[3] - h1[2])
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=walk_batches(), data=st.data())
def test_chain3_kernel_matches_bruteforce(
    spark, rows, data, tmp_path_factory
):
    """The online kernel under RANDOM microbatch splits must emit
    exactly the brute-force chain set — two hop slots carried across
    batch boundaries, continuity checked at both junctions."""
    import uuid

    import pandas as pd

    from tests.conftest import drain_batches
    from kawa_spark.streaming.stateful import net_hop_chains3

    ordered = sorted(rows, key=lambda r: (r[3], r[0]))
    c1 = data.draw(st.integers(0, len(ordered)))
    c2 = data.draw(st.integers(c1, len(ordered)))
    src = tmp_path_factory.mktemp("lc3_src")
    schema = "event_id long, user_id long, net string, us long"
    batches = [
        pd.DataFrame(b, columns=["event_id", "user_id", "net", "us"])
        for b in (ordered[:c1], ordered[c1:c2], ordered[c2:])
        if b
    ]
    got = {
        r["event_id"]: (
            r["net_a"],
            r["net_b"],
            r["net_c"],
            r["net_d"],
            r["span_us"],
        )
        for r in drain_batches(
            spark,
            src,
            schema,
            batches,
            lambda s: net_hop_chains3(s, HOP_W, CHAIN3_W),
            f"lc3_{uuid.uuid4().hex[:8]}",
        )
    }
    assert got == _chains3_events_ref(ordered), (ordered, c1, c2)


def test_lm3_online_twin_equals_batch(spark):
    """The eighteenth online/offline twin: the kernel's drained chain
    rows rolled up must reproduce the batch inventory exactly, with
    the late counter at 0."""
    from kawa_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    batch = {
        tuple(r)
        for r in registry.QUERIES["events_lateral_movement_3hop"](
            spark, sf
        ).collect()
    }
    online_rows = registry.QUERIES["stream_exec_lateral_movement_3hop"](
        spark, sf
    ).collect()
    assert all(r["late_count"] == 0 for r in online_rows)
    online = {
        tuple(r)[:-1] for r in online_rows  # drop trailing late_count
    }
    assert batch == online and batch


def test_chain3_kernel_late_rows_counted(spark, tmp_path):
    """A late row between batches is skipped without corrupting the
    hop slots, and the next emitted chain carries the counter."""
    import uuid

    import pandas as pd

    from kawa_spark.streaming.stateful import net_hop_chains3

    S = 1_000_000
    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id long, user_id long, net string, us long"
    rows1 = [
        (1, 7, "na", 0),
        (2, 7, "nb", 5 * S),
        (3, 7, "nc", 10 * S),
        (4, 7, "nd", 15 * S),
    ]
    # batch 2: eid 5 is LATE; eid 6 completes another chain in-order
    rows2 = [(5, 7, "ne", 2 * S), (6, 7, "ne", 20 * S)]
    for rows in [rows1, rows2]:
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_id", "user_id", "net", "us"]),
            schema,
        ).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"lc3l_{uuid.uuid4().hex[:8]}"
    q = (
        net_hop_chains3(stream, HOP_W, CHAIN3_W)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (
            r["net_a"],
            r["net_b"],
            r["net_c"],
            r["net_d"],
            r["span_us"],
            r["late_count"],
        )
        for r in spark.table(name).collect()
    }
    # chain at eid 4 (na->nb->nc->nd) pre-violation; chain at eid 6
    # (nb->nc->nd->ne, span 20-5=15s) carries late=1
    assert got == {
        4: ("na", "nb", "nc", "nd", 15 * S, 0),
        6: ("nb", "nc", "nd", "ne", 15 * S, 1),
    }
