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
from kawa_spark.queries.llm_similarity import (
    ANN_PLANES,
    IVF_WIDE_NPROBE,
    N_QUERIES,
    TOP_K,
    _ivf_kmeans_sql,
    _multiprobe_sql,
    _probe_masks,
    similarity_pq_adc,
)

registry.load_all()

SF = "/root/testdata/sf0.001"

METHOD_KEYS = {
    "ivf_kmeans": "similarity_ivf_kmeans",
    "lsh_ann": "similarity_lsh_ann",
    "lsh_multiprobe": "similarity_lsh_multiprobe",
    # registered at the r13 rotation (built r12)
    "lsh_multiprobe_wide": "similarity_lsh_multiprobe_wide",
    "ivf_kmeans_wide": "similarity_ivf_kmeans_wide",
}
# pq_adc is a core, not (yet) a registered key — banked for the r14
# rotation; its recall row IS driver-checked via similarity_recall
METHOD_FNS = {
    "pq_adc": similarity_pq_adc,
}
ALL_METHODS = list(METHOD_KEYS) + list(METHOD_FNS)


def _method_pairs(spark, method):
    if method in METHOD_KEYS:
        df = registry.QUERIES[METHOD_KEYS[method]](spark, SF)
    else:
        df = METHOD_FNS[method](spark, SF)
    return {(r["q_id"], r["n_id"]) for r in df.collect()}


def test_radius1_masks_and_oracle_are_the_r10_form():
    """The probe-radius parameterization must leave the DEFERRED
    registered key byte-identical: radius-1 masks are exactly the
    single-bit flips in plane order, and the generated oracle equals
    the r10 string construction verbatim."""
    assert _probe_masks(1) == [1 << k for k in range(ANN_PLANES)]
    old_probes = ", ".join(
        f"xor(q.q_sig, {1 << k})" for k in range(ANN_PLANES)
    )
    assert old_probes in _multiprobe_sql(1)
    assert registry.ORACLES["similarity_lsh_multiprobe"] == _multiprobe_sql(1)
    # radius 2 = the 8 single flips then the 28 lexicographic pairs
    m2 = _probe_masks(2)
    assert m2[:ANN_PLANES] == _probe_masks(1)
    assert len(m2) == ANN_PLANES + ANN_PLANES * (ANN_PLANES - 1) // 2
    assert len(set(m2)) == len(m2)


def test_nprobe2_oracle_is_the_registered_form():
    """The nprobe parameterization must leave the registered
    similarity_ivf_kmeans byte-identical: its oracle equals
    _ivf_kmeans_sql(2), the wide core widens only the probe cut, and
    the FULL string is pinned by an md5 of the r11 committed form
    (code review r12: without an independent pin, a future edit to
    the shared CTE chain — mirrored in _ivf_kmeans_frame so the hash
    check still agrees — would pass the tautological equality while
    silently changing the registered key; editing this literal is the
    conscious act that must put the key in-window)."""
    import hashlib

    assert registry.ORACLES["similarity_ivf_kmeans"] == _ivf_kmeans_sql(2)
    assert (
        hashlib.md5(_ivf_kmeans_sql(2).encode()).hexdigest()
        == "0185e6f870e5478c470a50a4ed9b1ee9"
    )
    assert IVF_WIDE_NPROBE > 2
    assert _ivf_kmeans_sql(IVF_WIDE_NPROBE).replace(
        f"rn <= {IVF_WIDE_NPROBE}", "rn <= 2"
    ) == _ivf_kmeans_sql(2)


def test_recall_matches_set_intersection(spark):
    exact = {
        (r["q_id"], r["n_id"])
        for r in registry.QUERIES["similarity_topk"](spark, SF).collect()
    }
    got = registry.QUERIES["similarity_recall"](spark, SF).collect()
    by_method = {}
    for method in ALL_METHODS:
        inter = exact & _method_pairs(spark, method)
        by_method[method] = {
            q: len([1 for qq, _ in inter if qq == q])
            for q in range(N_QUERIES)
        }
    assert len(got) == len(ALL_METHODS) * N_QUERIES
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
    for method in ALL_METHODS:
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
    for method in ALL_METHODS:
        rows = [r for r in got if r["method"] == method]
        total = rows[0]["method_total"]
        hits = rows[0]["method_hits"]
        assert 0 < hits < total or method == "lsh_ann", (method, hits)
        assert hits < total, (method, hits)
    ivf = [r for r in got if r["method"] == "ivf_kmeans"]
    assert ivf[0]["method_hits"] > 0
    # each probe expansion's candidate set is a superset of the
    # previous tier's, so recall is structurally monotone — pin the
    # ordering, and pin the r12 wide variant STRICTLY above plain
    # multiprobe (VERDICT r11 item 4's done criterion: the wider
    # probes demonstrably improve the measured recall — 14/50 vs
    # 5/50 at sf0.001, 16/50 vs 3/50 at sf0.01)
    hits = {
        m: [r for r in got if r["method"] == m][0]["method_hits"]
        for m in ALL_METHODS
    }
    assert hits["lsh_multiprobe"] >= hits["lsh_ann"], hits
    assert hits["lsh_multiprobe_wide"] > hits["lsh_multiprobe"], hits
    # the wide IVF probes a superset of nprobe=2's cells (same
    # trained centroids, same per-query cell ordering), so ≥ is
    # structural; strict > is the measured r12 improvement
    assert hits["ivf_kmeans_wide"] > hits["ivf_kmeans"], hits
