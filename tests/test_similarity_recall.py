"""similarity_recall: the measurement layer cross-checked against
python-set intersections of the two registered result sets, plus
structural and non-vacuity pins.

The underlying methods (similarity_topk / ivf_kmeans / lsh_ann) carry
their own oracles and plan pins; what's new here is the hit counting,
so the independent reference recomputes exactly that — |exact ∩
approx| per query — from the queries' own outputs, bypassing the
join/aggregate the key uses.
"""

from __future__ import annotations

from kawa_spark import registry
from kawa_spark.queries.llm_similarity import N_QUERIES, TOP_K

registry.load_all()

SF = "/root/testdata/sf0.001"

METHOD_KEYS = {
    "ivf_kmeans": "similarity_ivf_kmeans",
    "lsh_ann": "similarity_lsh_ann",
    "lsh_multiprobe": "similarity_lsh_multiprobe",
}


def test_recall_matches_set_intersection(spark):
    exact = {
        (r["q_id"], r["n_id"])
        for r in registry.QUERIES["similarity_topk"](spark, SF).collect()
    }
    got = registry.QUERIES["similarity_recall"](spark, SF).collect()
    by_method = {}
    for method, key in METHOD_KEYS.items():
        approx = {
            (r["q_id"], r["n_id"])
            for r in registry.QUERIES[key](spark, SF).collect()
        }
        inter = exact & approx
        by_method[method] = {
            q: len([1 for qq, _ in inter if qq == q])
            for q in range(N_QUERIES)
        }
    assert len(got) == len(METHOD_KEYS) * N_QUERIES
    for r in got:
        want = by_method[r["method"]][r["q_id"]]
        assert r["n_hits"] == want, (r["method"], r["q_id"], want)
        assert r["n_exact"] == TOP_K
        assert r["method_total"] == N_QUERIES * TOP_K
        assert abs(r["recall_q"] - r["n_hits"] / TOP_K) <= 1e-15
        assert (
            abs(r["method_recall"] - r["method_hits"] / r["method_total"])
            <= 1e-15
        )
    for method in METHOD_KEYS:
        rows = [r for r in got if r["method"] == method]
        assert rows[0]["method_hits"] == sum(
            by_method[method].values()
        ), method


def test_recall_has_both_hit_and_miss_classes(spark):
    """The measurement must be non-vacuous: the trained IVF finds
    SOME true neighbours and misses some (0 < hits < total) — a
    recall of exactly 0 or 1 for every method would mean the key
    verifies nothing about approximation quality."""
    got = registry.QUERIES["similarity_recall"](spark, SF).collect()
    for method in METHOD_KEYS:
        rows = [r for r in got if r["method"] == method]
        total = rows[0]["method_total"]
        hits = rows[0]["method_hits"]
        assert 0 < hits < total or method == "lsh_ann", (method, hits)
        assert hits < total, (method, hits)
    ivf = [r for r in got if r["method"] == "ivf_kmeans"]
    assert ivf[0]["method_hits"] > 0
    # multiprobe's candidate set is a superset of the single bucket,
    # so its recall is structurally monotone — pin the ordering
    hits = {
        m: [r for r in got if r["method"] == m][0]["method_hits"]
        for m in METHOD_KEYS
    }
    assert hits["lsh_multiprobe"] >= hits["lsh_ann"], hits
