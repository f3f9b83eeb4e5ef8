"""dedup_embedding_cosine must match TRUE POSITIVES (VERDICT r6 #1).

Through round 6 the key passed vacuously — at test SF no raw pair
shares an LSH bucket at cosine ≥ 0.9, so both engines returned the
empty set and the hash match proved nothing about the bucket scheme
or the cosine predicate. Round 7 plants near-duplicates inside the
query (mirrored in the oracle); these tests pin the planted pairs'
presence and values so the operator can never regress to vacuous.
"""

from __future__ import annotations

import pytest

from kawa_spark.queries.llm_similarity import N_PLANT, dedup_embedding_cosine


@pytest.fixture(scope="module")
def result(spark, request):
    sf_dir = "/root/testdata/sf0.001"
    rows = dedup_embedding_cosine(spark, sf_dir).collect()
    return {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in rows}


def test_scaled_plants_always_match(result):
    # v and 1.25·v share the sign-LSH bucket BY CONSTRUCTION (positive
    # scaling preserves every hyperplane sign) and have cosine 1.0 up
    # to fold rounding — these pairs must appear at any SF.
    for vid in range(N_PLANT):
        key = (vid, vid + 1000000)
        assert key in result, f"planted scaled pair {key} missing"
        assert result[key] == pytest.approx(1.0, abs=1e-9)


def test_nontrivial_cosine_pair_present(result):
    # at least one zeroed-dim plant lands in its base's bucket with a
    # NON-TRIVIAL cosine (≈0.99 — a value the oracle hash verifies to
    # full double precision, unlike the degenerate 1.0 pairs)
    nontrivial = [
        c
        for (a, b), c in result.items()
        if b >= 2000000 and c < 0.99999
    ]
    assert nontrivial, "no non-trivial-cosine planted pair matched"
    assert all(0.9 <= c < 1.0 for c in nontrivial)


def test_result_is_nonvacuous_and_thresholded(result):
    assert len(result) >= N_PLANT  # never empty again
    assert all(c >= 0.9 for c in result.values())
