"""Property-based invariants for the r2 corpus/session operators —
checked against brute-force pandas recomputation on random inputs.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.events import SESSION_GAP_US


@st.composite
def event_times(draw):
    n_users = draw(st.integers(1, 4))
    out = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 30))
        t = 0
        for _ in range(n):
            # gaps straddling the session boundary on purpose
            t += draw(
                st.one_of(
                    st.integers(0, SESSION_GAP_US // 2),
                    st.integers(SESSION_GAP_US - 2, SESSION_GAP_US + 2),
                    st.integers(SESSION_GAP_US * 2, SESSION_GAP_US * 3),
                )
            )
            out.append((u, eid, t))
            eid += 1
    return pd.DataFrame(out, columns=["user_id", "event_id", "ts_us"])


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=event_times())
def test_sessionize_invariants(spark, case):
    df = spark.createDataFrame(case)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # same logic as events_sessionize_batch, applied to the synthetic
    # frame (the registered query is bound to the events table schema)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = df.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn(
            "session_idx",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .toPandas()
        .sort_values(["user_id", "ts_us", "event_id"])
    )

    # invariant 1: sessions partition each user's events contiguously
    for (_u, _s), grp in sessions.groupby(["user_id", "session_idx"]):
        gaps = grp["ts_us"].diff().dropna()
        assert (gaps <= SESSION_GAP_US).all(), "intra-session gap too large"
    # invariant 2: consecutive sessions are separated by > gap
    for _u, grp in sessions.groupby("user_id"):
        starts = grp.groupby("session_idx")["ts_us"].min()
        ends = grp.groupby("session_idx")["ts_us"].max()
        for s in range(1, len(starts)):
            assert starts.iloc[s] - ends.iloc[s - 1] > SESSION_GAP_US
    # invariant 3: every event belongs to exactly one session
    assert sessions["session_idx"].notna().all()


def test_mixture_quota_bounds(spark):
    from kawa_spark import registry

    registry.load_all()
    from kawa_spark.queries.llm_corpus import MIX_TOTAL

    out = registry.QUERIES["corpus_mixture_sample"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    per_src = out.groupby("source")
    # quota respected per domain, and availability/rank consistency
    assert (out["rn"] <= out["quota"]).all()
    assert (per_src["doc_id"].count() == per_src["quota"].first()).all()
    # weights bounded and total draw ≤ MIX_TOTAL (floor allocation)
    assert out["wt"].between(1, 3).all()
    assert per_src["quota"].first().sum() <= MIX_TOTAL
