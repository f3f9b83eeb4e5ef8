"""Property-based cross-check of the posting-list jaccard core
(llm_dedup.ngram_jaccard_pairs) against a brute-force Python
reference on random tiny corpora — the independent-implementation
safety net for round 7's candidate-semantics rewrite.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kawa_spark.queries.llm_dedup import ngram_jaccard_pairs

WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]


def _ref_shingles(text: str) -> set[str]:
    """Pure-Python mirror of llm_dedup._shingles: distinct 3-word
    shingles of the lowercased whitespace-split text; for docs under
    3 words, one shingle of whatever is there."""
    ws = re.split(r"\s+", text.lower())
    n = len(ws)
    return {" ".join(ws[i : i + 3]) for i in range(max(n - 2, 1))}


def _ref_pairs(docs: list[tuple[int, str]], threshold: float) -> dict:
    out = {}
    sh = {i: _ref_shingles(t) for i, t in docs}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if not inter:
                continue  # posting join can't see disjoint pairs
            j = inter / len(sh[a] | sh[b])
            if j >= threshold:
                out[(a, b)] = j
    return out


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(2, 7))
    docs = []
    for i in range(n_docs):
        n_words = draw(st.integers(1, 12))
        text = " ".join(
            draw(st.sampled_from(WORDS)) for _ in range(n_words)
        )
        docs.append((i, text))
    return docs


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora())
def test_posting_jaccard_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.15).collect()
    }
    want = _ref_pairs(docs, 0.15)
    assert got.keys() == want.keys(), (docs, got, want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])


def test_df_cap_parameter_prunes(spark):
    """cap below a shingle's df removes it from the universe — the
    parameterized form tests can rely on."""
    docs = [(i, "ant bee cat") for i in range(5)] + [
        (10, "dog elk fox gnu"),
        (11, "dog elk fox hen"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, cap=4, threshold=0.15).collect()
    }
    # the 5-way "ant bee cat" shingle (df=5 > 4) is evicted entirely;
    # the rare-shingle pair survives
    assert got == {(10, 11)}
