"""dedup_lsh_recall: independent Python ground truth for the audit
(posting-dict exact jaccard over the plant-extended universe) and the
found/missed marking recomputed from the registered minhash pipeline's
own output, plus the deterministic plant-class pins.
"""

from __future__ import annotations

import re

import duckdb

from kawa_spark import registry
from kawa_spark.queries.llm_dedup import (
    GT_JACCARD,
    LSH_RECALL_PLANTS,
    minhash_pairs,
)

registry.load_all()


def _shingle_set(text: str) -> frozenset:
    ws = re.split(r"\s+", text.lower())
    n = max(len(ws) - 2, 1)
    return frozenset(" ".join(ws[i : i + 3]) for i in range(n))


def _gt_ref(docs):
    """Exact near-dup pair set via a posting dict — only pairs
    sharing at least one shingle are examined (the posting-join
    shape), jaccard over distinct shingle sets."""
    sets = {d: _shingle_set(t) for d, t in docs}
    posts: dict[str, list] = {}
    for d, sh in sets.items():
        for s in sh:
            posts.setdefault(s, []).append(d)
    cand = set()
    for members in posts.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    out = {}
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        jac = inter / len(sets[a] | sets[b])
        if jac >= GT_JACCARD:
            out[(a, b)] = jac
    return out


def test_lsh_recall_matches_python_ground_truth(spark, sf_dir):
    """The registered key's gt pair set and jaccards must equal the
    posting-dict reference over documents+plants at sf0.001, and its
    found marks must equal membership in the registered minhash
    pipeline's own pair output."""
    con = duckdb.connect()
    nat = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    docs = [(int(d), t) for d, t in nat] + LSH_RECALL_PLANTS
    want = _gt_ref(docs)

    universe = spark.createDataFrame(docs, "doc_id long, text string")
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_pairs(universe).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in registry.QUERIES["dedup_lsh_recall"](spark, sf_dir).collect()
    }
    assert set(got) == set(want), sorted(set(got) ^ set(want))
    for k, jac in want.items():
        assert abs(got[k]["jaccard"] - jac) <= 1e-12, k
        assert got[k]["found"] == (k in mh), k
    n_found = sum(1 for k in want if k in mh)
    row = next(iter(got.values()))
    assert row["gt_pairs"] == len(want)
    assert row["found_pairs"] == n_found
    assert abs(row["recall"] - n_found / len(want)) <= 1e-15


def test_lsh_recall_plant_classes(spark, sf_dir):
    """The 0.90 plant pair is found, the 0.23 plant pair is in the
    ground truth but MISSED (the deterministic band-miss class), and
    recall sits strictly between 0 and 1."""
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in registry.QUERIES["dedup_lsh_recall"](spark, sf_dir).collect()
    }
    hi = (LSH_RECALL_PLANTS[1][0], LSH_RECALL_PLANTS[0][0])
    lo = (LSH_RECALL_PLANTS[3][0], LSH_RECALL_PLANTS[2][0])
    assert rows[hi]["found"] is True
    assert abs(rows[hi]["jaccard"] - 37 / 41) <= 1e-12
    assert rows[lo]["found"] is False
    assert abs(rows[lo]["jaccard"] - 18 / 78) <= 1e-12
    r = next(iter(rows.values()))
    assert 0 < r["recall"] < 1
