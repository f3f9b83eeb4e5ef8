"""Property-based cross-check of the median/MAD anomaly core
(queries/events.mad_scores) against a brute-force Python reference on
random count tables. The construction-mirroring DuckDB oracle cannot
catch a shared misunderstanding of quantile_disc semantics; this
reference computes the discrete median independently
(sorted[(n-1)//2])."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.events import mad_scores


def _ref(rows):
    by_type: dict[str, list] = {}
    for typ, day, n in rows:
        by_type.setdefault(typ, []).append((day, n))
    out = {}
    for typ, pairs in by_type.items():
        ns = sorted(n for _, n in pairs)
        med = ns[(len(ns) - 1) // 2]
        devs = sorted(abs(n - med) for _, n in pairs)
        mad = devs[(len(devs) - 1) // 2]
        for day, n in pairs:
            dev = abs(n - med)
            out[(typ, day)] = (n, med, dev, mad, (n - med) > 3 * mad)
    return out


@st.composite
def count_tables(draw):
    rows = []
    for ti in range(draw(st.integers(1, 3))):
        days = draw(st.integers(1, 12))
        for d in range(days):
            # flat baselines, zeros, and occasional huge bursts so
            # both spike outcomes occur; duplicate count values
            # exercise median ties
            rows.append(
                (
                    f"t{ti}",
                    d,
                    draw(st.sampled_from([0, 5, 5, 7, 100, 10_000])),
                )
            )
    return rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=count_tables())
def test_mad_scores_matches_bruteforce(spark, rows):
    daily = spark.createDataFrame(
        rows, "event_type string, day long, n long"
    )
    got = {
        (r["event_type"], r["day"]): (
            r["n"],
            r["med"],
            r["dev"],
            r["mad"],
            r["is_spike"],
        )
        for r in mad_scores(daily).collect()
    }
    assert got == _ref(rows), rows
