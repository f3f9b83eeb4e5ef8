"""Property-based cross-check of the streaming rate limiter
(streaming/stateful.rate_limited) against a brute-force Python
reference on random event sets with RANDOM microbatch splits — the
bisect counting, tied-timestamp peer semantics, and cross-batch state
carry are each easy to get subtly wrong.
"""

from __future__ import annotations

import uuid

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.streaming.stateful import rate_limited

W = 10_000_000  # 10 s window
LIMIT = 2


def _ref(events):
    """event_id → (count, limited): count = events of the same user
    with us in [t - W, t] — INCLUDING ties later in arrival order
    (RANGE-frame peer semantics)."""
    out = {}
    by_user: dict[int, list[int]] = {}
    for _eid, u, us in events:
        by_user.setdefault(u, []).append(us)
    for eid, u, us in events:
        n = sum(1 for t in by_user[u] if us - W <= t <= us)
        out[eid] = (n, n > LIMIT)
    return out


@st.composite
def event_batches(draw):
    n_users = draw(st.integers(1, 3))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 20))
        t = 0
        for _ in range(n):
            # gaps straddling the window boundary, plus 0-gaps so
            # tied timestamps occur
            t += draw(
                st.sampled_from([0, 1, W // 2, W - 1, W, W + 1, 3 * W])
            )
            rows.append((eid, u, t))
            eid += 1
    # random time-ordered split point → two microbatches (state must
    # carry whatever the split leaves behind). The cut is advanced off
    # tied timestamps: an ONLINE limiter cannot count a same-instant
    # peer that arrives in a later batch (the one inherent divergence
    # from the batch RANGE frame, which sees all peers) — within a
    # batch ties DO see each other, which the reference asserts.
    rows.sort(key=lambda r: (r[2], r[0]))
    cut = draw(st.integers(0, len(rows)))
    while 0 < cut < len(rows) and rows[cut - 1][2] == rows[cut][2]:
        cut += 1
    return rows, cut


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=event_batches())
def test_rate_limited_matches_bruteforce(spark, case, tmp_path_factory):
    rows, cut = case
    src = tmp_path_factory.mktemp("rl_src")
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    batches = [b for b in (rows[:cut], rows[cut:]) if b]
    for b in batches:
        pdf = pd.DataFrame(
            [(e, u, "x", pd.Timestamp(t, unit="us")) for e, u, t in b],
            columns=["event_id", "user_id", "event_type", "ts"],
        )
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = f"rlp_{uuid.uuid4().hex[:8]}"
    q = (
        rate_limited(stream, W, LIMIT)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        r["event_id"]: (r["n_in_window"], r["is_limited"])
        for r in spark.table(name).collect()
    }
    assert got == _ref(rows), (rows, cut)
