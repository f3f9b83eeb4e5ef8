"""Hypothesis property test for the r13-registered cross-snapshot
embedding matcher (llm_similarity.incremental_embedding_matches): the
Spark plan must equal the pure-Python sign-LSH + left-fold-cosine
reference (tests/test_embedding_dedup.py::_inc_emb_ref) on GENERATED
snapshot pairs — not just the one fixed-seed case the example test
pins. The strategy deliberately straddles every structural edge:

- exact scaled re-embeds (guaranteed bucket hit, cosine ~1.0),
- sign-flipped vectors (guaranteed DIFFERENT bucket — never a pair),
- duplicated vectors crowding one bucket toward/past EMB_BUCKET_CAP
  (the combined-population eviction edge),
- empty prior / empty new side (degenerate snapshots),
- novel random vectors (the absent class).
"""

from __future__ import annotations

import math
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.llm_similarity import (
    DIM,
    incremental_embedding_matches,
)
from tests.test_embedding_dedup import _inc_emb_ref


@st.composite
def snapshots(draw):
    rng = random.Random(draw(st.integers(0, 2**32 - 1)))
    n_prior = draw(st.integers(0, 10))
    prior = [
        (d, [rng.gauss(0, 1) for _ in range(DIM)]) for d in range(n_prior)
    ]
    newb = []
    nid = 1000
    for d, v in prior:
        kind = draw(st.sampled_from(["scaled", "flipped", "skip", "noisy"]))
        if kind == "scaled":  # same signature by construction
            newb.append((nid, [x * 1.5 for x in v]))
        elif kind == "flipped":  # every hyperplane sign flips
            newb.append((nid, [-x for x in v]))
        elif kind == "noisy":  # straddles the cosine 0.9 bar
            newb.append((nid, [x + rng.gauss(0, 0.2) for x in v]))
        nid += 1
    # novel vectors (absent class)
    for _ in range(draw(st.integers(0, 4))):
        newb.append((nid, [rng.gauss(0, 1) for _ in range(DIM)]))
        nid += 1
    # bucket-crowding clones of prior[0] on BOTH sides — pushes one
    # signature bucket toward/past the combined-population cap
    if prior and draw(st.booleans()):
        base = prior[0][1]
        n_clones = draw(st.integers(1, 40))
        for j in range(n_clones):
            if j % 2 == 0:
                prior.append((100 + j, [x * (1 + 0.01 * j) for x in base]))
            else:
                newb.append((nid, [x * (1 + 0.01 * j) for x in base]))
                nid += 1
    return prior, newb


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snap=snapshots())
def test_incremental_embedding_matches_reference_generated(spark, snap):
    prior, newb = snap
    got = {
        (r["vec_id"], r["prior_id"]): r["cos_sim"]
        for r in incremental_embedding_matches(
            spark.createDataFrame(
                prior, "vec_id long, embedding array<double>"
            ),
            spark.createDataFrame(
                newb, "vec_id long, embedding array<double>"
            ),
        ).collect()
    }
    want = _inc_emb_ref(prior, newb)
    assert set(got) == set(want), sorted(set(got) ^ set(want))
    for k, cos in want.items():
        assert math.isfinite(got[k]) and abs(got[k] - cos) <= 1e-12, k
