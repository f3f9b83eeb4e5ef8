"""Property-based check: operators/asof.py vs pandas.merge_asof on
random inputs (hypothesis). Catches boundary semantics (equal
timestamps, empty sides, tolerance) that fixture data never hits."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.operators.asof import asof_join

ts_strategy = st.integers(min_value=0, max_value=50)
key_strategy = st.integers(min_value=0, max_value=2)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(key_strategy, ts_strategy), min_size=1, max_size=12)
    )
    right = draw(
        st.lists(st.tuples(key_strategy, ts_strategy), min_size=0, max_size=12)
    )
    # unique (key, ts) per side keeps expected output well-defined
    left = list({(k, t) for k, t in left})
    right = list({(k, t) for k, t in right})
    return left, right


def test_asof_tolerance(spark):
    """Matches older than the tolerance window are nulled out."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00")],
        "k bigint, ts_s string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "monotonically_increasing_id() AS lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 7.0)], "k bigint, ts_s string, payload double"
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts", "payload")
    got = {
        r["ts"].hour: r["payload"]
        for r in asof_join(
            left, right, on="k", right_payload=["payload"],
            tolerance_seconds=3600,
        ).collect()
    }
    assert got[10] == 7.0       # 30 min old: within tolerance
    assert got[12] is None      # 2.5 h old: tolerance exceeded


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_case())
def test_asof_matches_pandas(spark, case):
    left_rows, right_rows = case
    left_pd = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": pd.to_datetime([t for _, t in left_rows], unit="s"),
            "lid": range(len(left_rows)),
        }
    ).sort_values("ts")
    right_pd = (
        pd.DataFrame(
            {
                "k": pd.array([k for k, _ in right_rows], dtype="int64"),
                "ts": pd.to_datetime([t for _, t in right_rows], unit="s"),
                "payload": pd.array(
                    [float(t) for _, t in right_rows], dtype="float64"
                ),
            }
        )
        .sort_values("ts")
    )

    want = pd.merge_asof(
        left_pd, right_pd, on="ts", by="k", direction="backward"
    )

    left_df = spark.createDataFrame(left_pd)
    right_df = (
        spark.createDataFrame(right_pd)
        if len(right_pd)
        else spark.createDataFrame([], "k bigint, ts timestamp, payload double")
    )
    got = asof_join(
        left_df, right_df, on="k", right_payload=["payload"]
    ).toPandas()

    got_map = {int(r.lid): r.payload for r in got.itertuples()}
    want_map = {int(r.lid): r.payload for r in want.itertuples()}
    assert set(got_map) == set(want_map)
    for lid in want_map:
        a, b = got_map[lid], want_map[lid]
        assert (pd.isna(a) and pd.isna(b)) or a == b, (lid, a, b, case)
