"""Property-based cross-checks of the lateral-movement pair: the
batch chain core (queries/security.lateral_chains) and the online
kernel (streaming/stateful.net_hop_chains) against ONE brute-force
Python chain miner, on random per-user net walks with RANDOM
microbatch splits — including tie cuts, pre-epoch starts, off-window
drifts (which must break chain continuity), and drift-back sequences
(which must NOT: continuity compares the remembered hop's landing
net, not the path taken since).
"""

from __future__ import annotations

import uuid

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import drain_batches as _drain_batches
from kawa_spark.queries.security import lateral_chains
from kawa_spark.streaming.stateful import net_hop_chains

S = 1_000_000
HOP_W = 10 * S
CHAIN_W = 2 * HOP_W
NETS = ["na", "nb", "nc", "nd"]


def _chains_ref(rows):
    """event_id -> (net_a, net_b, net_c, span) for every emitted
    chain, from the batch definition: hops = consecutive-event net
    changes within HOP_W; a chain is two consecutive hops with
    prev.to == cur.from and cur.end - prev.start <= CHAIN_W."""
    by_user: dict[int, list] = {}
    for eid, u, net, us in sorted(rows, key=lambda r: (r[3], r[0])):
        by_user.setdefault(u, []).append((eid, net, us))
    out = {}
    for evs in by_user.values():
        last_net, last_us = None, None
        prev_hop = None  # (from, to, start, end)
        for eid, net, us in evs:
            if (
                last_us is not None
                and net != last_net
                and us - last_us <= HOP_W
            ):
                hop = (last_net, net, last_us, us)
                if (
                    prev_hop is not None
                    and prev_hop[1] == hop[0]
                    and hop[3] - prev_hop[2] <= CHAIN_W
                ):
                    out[eid] = (
                        prev_hop[0],
                        hop[0],
                        hop[1],
                        hop[3] - prev_hop[2],
                    )
                prev_hop = hop
            last_net, last_us = net, us
    return out


@st.composite
def walk_batches(draw):
    rows = []
    eid = 0
    for u in range(draw(st.integers(1, 3))):
        n = draw(st.integers(1, 16))
        t = draw(st.sampled_from([0, -100 * HOP_W]))
        for _ in range(n):
            # in-window steps, the exact hop boundary, off-window
            # drifts (net may still change — continuity breakers),
            # and long gaps
            t += draw(
                st.sampled_from(
                    [0, 1, HOP_W // 2, HOP_W, HOP_W + 1, 3 * HOP_W]
                )
            )
            rows.append((eid, u, draw(st.sampled_from(NETS)), t))
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
@given(case=walk_batches())
def test_batch_chain_core_matches_bruteforce(spark, case):
    rows, _ = case
    ref = _chains_ref(rows)
    # aggregate the per-chain reference into the core's inventory
    want: dict[tuple, list] = {}
    user_of = {eid: u for eid, u, _, _ in rows}
    for eid, (a, b, c, span) in ref.items():
        want.setdefault((a, b, c), []).append((user_of[eid], span))
    want_cells = {
        k: (
            len(v),
            len({u for u, _ in v}),
            min(s for _, s in v),
            k[0] == k[2],
        )
        for k, v in want.items()
    }
    df = spark.createDataFrame(
        [(u, e, t, n) for e, u, n, t in rows],
        "user_id long, event_id long, ts_us long, net string",
    )
    got = {
        (r["net_a"], r["net_b"], r["net_c"]): (
            r["n_chains"],
            r["n_users"],
            r["min_span_us"],
            r["is_roundtrip"],
        )
        for r in lateral_chains(df, HOP_W, CHAIN_W).collect()
    }
    assert got == want_cells, rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=walk_batches())
def test_chain_kernel_matches_bruteforce(spark, case, tmp_path_factory):
    rows, (c1, c2) = case
    src = tmp_path_factory.mktemp("lc_src")
    schema = "event_id long, user_id long, net string, us long"
    batches = [
        pd.DataFrame(b, columns=["event_id", "user_id", "net", "us"])
        for b in (rows[:c1], rows[c1:c2], rows[c2:])
        if b
    ]
    got = {
        r["event_id"]: (r["net_a"], r["net_b"], r["net_c"], r["span_us"])
        for r in _drain_batches(
            spark,
            src,
            schema,
            batches,
            lambda s: net_hop_chains(s, HOP_W, CHAIN_W),
            f"lcp_{uuid.uuid4().hex[:8]}",
        )
    }
    assert got == _chains_ref(rows), (rows, c1, c2)


def test_lm_plants_land_and_twin_equals_batch(spark):
    """Non-vacuity + twin equality (the spray discipline): the two
    planted walks give the (quarantine, corp-east-dc1, corp-guest)
    cell n_chains=2/n_users=2, the bounce gives a roundtrip cell, and
    the online form reproduces the batch inventory exactly."""
    from kawa_spark import registry
    from kawa_spark.queries.security import LM_PLANT_WALKS

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["events_lateral_movement"](spark, sf).collect()
    cells = {(r["net_a"], r["net_b"], r["net_c"]): r for r in rows}
    walk = tuple(LM_PLANT_WALKS[0])
    assert cells[walk]["n_chains"] >= 2
    assert cells[walk]["n_users"] >= 2
    assert not cells[walk]["is_roundtrip"]
    bounce = ("quarantine", "corp-east-dc1", "quarantine")
    assert cells[bounce]["is_roundtrip"]
    batch = {tuple(r) for r in rows}
    online = {
        tuple(r)[:-1]  # drop the trailing late_count
        for r in (
            registry.QUERIES["stream_exec_lateral_movement"](spark, sf)
            .select(
                "net_a",
                "net_b",
                "net_c",
                "n_chains",
                "n_users",
                "min_span_us",
                "is_roundtrip",
                "late_count",
            )
            .collect()
        )
    }
    assert batch == online and batch


def test_chain_kernel_late_rows_counted(spark, tmp_path):
    """Out-of-contract late rows are skipped AND surfaced: a late row
    between two batches must not corrupt the hop slots, and the next
    emitted chain carries the cumulative counter."""
    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id long, user_id long, net string, us long"
    rows1 = [(1, 7, "na", 0), (2, 7, "nb", 5 * S), (3, 7, "nc", 10 * S)]
    # batch 2: eid 4 is LATE; eid 5 completes another chain in-order
    rows2 = [(4, 7, "nd", 2 * S), (5, 7, "nd", 15 * S)]
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
    name = f"lcl_{uuid.uuid4().hex[:8]}"
    q = (
        net_hop_chains(stream, HOP_W, CHAIN_W)
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
            r["span_us"],
            r["late_count"],
        )
        for r in spark.table(name).collect()
    }
    # chain at eid 3 (na->nb->nc) pre-violation; chain at eid 5
    # (nb->nc->nd, span 15-5=10s) carries late=1
    assert got == {
        3: ("na", "nb", "nc", 10 * S, 0),
        5: ("nb", "nc", "nd", 10 * S, 1),
    }
