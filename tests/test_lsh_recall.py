"""dedup_lsh_recall: independent Python ground truth for the audit
(posting-dict exact jaccard over the plant-extended universe) and the
found/missed marking recomputed from the registered minhash pipeline's
own output, plus the deterministic plant-class pins. Since r12 the
registered key audits a deterministic md5-rank HASH SAMPLE of the
corpus (relative modulus S = max(1, |docs| // AUDIT_SAMPLE_TARGET)) —
the reference here applies the identical predicate, and the UNCAPPED
full-universe posting ground truth is kept as the superset the
sampled audit must restrict (test_sampled_gt_is_restriction_of_uncapped).
"""

from __future__ import annotations

import hashlib
import re

import duckdb

from kawa_spark import registry
from kawa_spark.queries.llm_dedup import (
    AUDIT_SAMPLE_TARGET,
    GT_JACCARD,
    LSH_RECALL_PLANTS,
    minhash_pairs,
)

registry.load_all()


def _in_sample(doc_id: int, s_mod: int) -> bool:
    """Python twin of the md5-rank sample predicate (stats.md5_long
    % S == 0) applied to NATURAL docs; plants join post-filter."""
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    return u % s_mod == 0


def _sampled(nat: list, plants: list) -> list:
    s_mod = max(1, len(nat) // AUDIT_SAMPLE_TARGET)
    return [(d, t) for d, t in nat if _in_sample(d, s_mod)] + plants


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
    posting-dict reference over the SAMPLED documents+plants at
    sf0.001, and its found marks must equal membership in the
    registered minhash pipeline's own pair output over the same
    sampled universe."""
    con = duckdb.connect()
    nat = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    docs = _sampled([(int(d), t) for d, t in nat], LSH_RECALL_PLANTS)
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


def test_sampled_gt_is_restriction_of_uncapped(spark, sf_dir):
    """The sampled audit is a RESTRICTION of the uncapped
    full-universe ground truth, never different semantics: every gt
    pair the registered key emits must appear, with the identical
    jaccard, in the UNCAPPED posting ground truth over the full
    plant-extended corpus (the property test's ground-truth form the
    r11 verdict asked to keep), and the sample must actually bind at
    this SF (S > 1 → strictly fewer docs than the full universe)."""
    con = duckdb.connect()
    nat = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    nat = [(int(d), t) for d, t in nat]
    full_want = _gt_ref(nat + LSH_RECALL_PLANTS)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in registry.QUERIES["dedup_lsh_recall"](spark, sf_dir).collect()
    }
    assert set(got) <= set(full_want), sorted(set(got) - set(full_want))
    for k, jac in got.items():
        assert abs(full_want[k] - jac) <= 1e-12, k
    s_mod = max(1, len(nat) // AUDIT_SAMPLE_TARGET)
    assert s_mod > 1, "sample must bind at the gate SF"
    assert len(_sampled(nat, [])) < len(nat)


def _self_matches_ref(docs):
    """Pure-hashlib reference of the SELF-JOIN minhash pipeline
    (band buckets, combined-population cap, a<b pairing,
    SIG_MIN_MATCH prefilter, exact jaccard ≥ 0.2) — the single-side
    analog of test_incremental_minhash._matches_ref."""
    from kawa_spark.queries.llm_dedup import (
        BUCKET_CAP,
        N_BANDS,
        N_PERM,
        SIG_MIN_MATCH,
    )
    from tests.test_incremental_minhash import _sig_ref

    rows_per_band = N_PERM // N_BANDS
    sigs = {}
    buckets: dict[tuple, list] = {}
    for d, t in docs:
        vh, mhs = _sig_ref(t)
        sigs[d] = (vh, mhs)
        for b in range(N_BANDS):
            key = (
                b,
                "|".join(
                    str(mhs[b * rows_per_band + r])
                    for r in range(rows_per_band)
                ),
            )
            buckets.setdefault(key, []).append(d)
    out = set()
    for key, members in buckets.items():
        if len(members) > BUCKET_CAP:
            continue
        for i, da in enumerate(members):
            for db in members[i + 1 :]:
                a, b = min(da, db), max(da, db)
                if (a, b) in out:
                    continue
                vh_a, mh_a = sigs[a]
                vh_b, mh_b = sigs[b]
                if sum(x == y for x, y in zip(mh_a, mh_b)) < SIG_MIN_MATCH:
                    continue
                if len(vh_a & vh_b) / len(vh_a | vh_b) >= 0.2:
                    out.add((a, b))
    return out


def test_lsh_recall_core_matches_hashlib_reference(spark):
    """The whole audit chain (ground-truth posting join, minhash
    found marks, recall arithmetic) driven over RANDOM
    graded-similarity corpora against pure-Python references — the
    fixed-corpus test above can't catch errors that happen to cancel
    on the sf0.001 shape."""
    import random

    from kawa_spark.queries.llm_dedup import lsh_recall_report

    rng = random.Random(0x12A5)
    vocab = [f"v{i}" for i in range(50)]
    any_found = False
    for trial in range(3):
        docs = []
        for d in range(14):
            words = [rng.choice(vocab) for _ in range(30)]
            docs.append((d, " ".join(words)))
            if d % 3 == 0:
                mutated = list(words)
                for k in range(d // 3 + 1):  # graded similarity
                    mutated[2 * k] = rng.choice(vocab)
                docs.append((100 + d, " ".join(mutated)))
        # the registered key's LOW plant pair rides every trial: its
        # fixed texts deterministically band-miss at jaccard 18/78,
        # so the found=False / recall<1 branch — the class the audit
        # exists to measure — is exercised EVERY trial, not by luck
        # (code review r12: the random corpus alone can't guarantee
        # a missed pair)
        lo = (-9002, LSH_RECALL_PLANTS[2][1]), (-9001, LSH_RECALL_PLANTS[3][1])
        docs += list(lo)
        got = {
            (r["doc_a"], r["doc_b"]): r
            for r in lsh_recall_report(
                spark.createDataFrame(docs, "doc_id long, text string")
            ).collect()
        }
        want_gt = _gt_ref(docs)
        found_ref = _self_matches_ref(docs)
        assert want_gt, trial  # non-degenerate before any arithmetic
        assert set(got) == set(want_gt), (trial, set(got) ^ set(want_gt))
        n_found = 0
        for k, jac in want_gt.items():
            assert abs(got[k]["jaccard"] - jac) <= 1e-12, (trial, k)
            assert got[k]["found"] == (k in found_ref), (trial, k)
            n_found += k in found_ref
        row = next(iter(got.values()))
        assert row["gt_pairs"] == len(want_gt)
        assert row["found_pairs"] == n_found
        assert abs(row["recall"] - n_found / len(want_gt)) <= 1e-15
        # both classes every trial: the plant pair is missed...
        assert got[(-9002, -9001)]["found"] is False, trial
        assert row["recall"] < 1
        any_found = any_found or n_found > 0
    # ...and the found class shows up across the trials
    assert any_found


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
