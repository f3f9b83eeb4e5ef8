"""Incremental (cross-snapshot) dedup: brute-force property check of
the core classifier, the plant pins, the snapshot-composition path
(prior digest index persisted + read back), and the plan shape.

Why the brute force exists: the hash oracle mirrors the construction
(same digest + keeper algebra in both engines), so a shared logic
error — keeper policy applied before the prior check, dup_of pointing
at the wrong side — would hash-match anyway.
"""

from __future__ import annotations

import random
import re

from kawa_spark import registry
from kawa_spark.queries.llm_dedup import (
    INC_PLANTS_NEW,
    INC_PLANTS_PRIOR,
    incremental_dedup,
    prior_digest_index,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t).strip().lower()


def _ref(new_batch, prior):
    """Brute-force classification with plain dicts."""
    prior_min: dict[str, int] = {}
    for d, t in prior:
        h = _norm(t)
        prior_min[h] = min(prior_min.get(h, d), d)
    keeper: dict[str, int] = {}
    for d, t in new_batch:
        h = _norm(t)
        keeper[h] = min(keeper.get(h, d), d)
    out = {}
    for d, t in new_batch:
        h = _norm(t)
        if h in prior_min:
            out[d] = ("dup_prior", prior_min[h])
        elif d != keeper[h]:
            out[d] = ("dup_batch", keeper[h])
        else:
            out[d] = ("kept", None)
    return out


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_core_matches_bruteforce(spark):
    """Random corpora with heavy norm-equal aliasing (few distinct
    texts, random casing/whitespace), docs present in both snapshots,
    singleton novels — the Spark classifier must agree with the
    dict-based reference on every status and dup_of."""
    rng = random.Random(0x1DED)
    texts = [f"text body number {i} for aliasing" for i in range(12)]

    def mangle(t: str) -> str:
        if rng.random() < 0.5:
            t = t.upper()
        if rng.random() < 0.5:
            t = "  " + t.replace(" ", "   ")
        return t

    # prior draws from the first 8 texts only — texts 8..11 exist
    # solely in the new batch, so their aliases become dup_batch
    prior = [(i, mangle(rng.choice(texts[:8]))) for i in range(40)]
    newb = [(100 + i, mangle(rng.choice(texts))) for i in range(40)]
    newb += [(200, "a genuinely novel document"), (201, "another novel one")]
    got = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in incremental_dedup(
            _mk(spark, newb), prior_digest_index(_mk(spark, prior))
        ).collect()
    }
    want = _ref(newb, prior)
    assert got == want
    statuses = {s for s, _ in want.values()}
    assert statuses == {"dup_prior", "dup_batch", "kept"}, statuses


def test_incremental_plants_pin(spark):
    """The four planted new docs land in their designed classes, with
    dup_of pointing at the designed keepers."""
    rows = {
        r["doc_id"]: (r["status"], r["dup_of"])
        for r in registry.QUERIES["dedup_incremental"](spark, SF).collect()
        if r["doc_id"] < 0
    }
    prior_id = INC_PLANTS_PRIOR[0][0]
    assert rows[-32_000_101] == ("dup_prior", prior_id)
    assert rows[-32_000_102] == ("dup_batch", -32_000_103)
    assert rows[-32_000_103] == ("kept", None)
    assert rows[-32_000_104] == ("kept", None)
    assert set(rows) == {p[0] for p in INC_PLANTS_NEW}


def test_incremental_snapshot_composition(spark, tmp_path):
    """The production shape: the prior kept-set digest index is
    PERSISTED (parquet snapshot) and the next run's batch joins the
    read-back index — must be row-identical to the in-query
    construction the oracle checks."""
    from pyspark.sql import functions as F

    from kawa_spark.io import table
    from kawa_spark.queries.llm_dedup import INC_PRIOR_MOD

    d = table(spark, SF, "documents").select("doc_id", "text")
    prior = d.filter(
        F.pmod(F.col("doc_id"), F.lit(10)) < INC_PRIOR_MOD
    ).unionByName(_mk(spark, INC_PLANTS_PRIOR))
    newb = d.filter(
        F.pmod(F.col("doc_id"), F.lit(10)) >= INC_PRIOR_MOD
    ).unionByName(_mk(spark, INC_PLANTS_NEW))

    snap = str(tmp_path / "prior_digest_index")
    prior_digest_index(prior).write.mode("overwrite").parquet(snap)
    via_snapshot = {
        tuple(r)
        for r in incremental_dedup(newb, spark.read.parquet(snap)).collect()
    }
    direct = {
        tuple(r)
        for r in registry.QUERIES["dedup_incremental"](spark, SF).collect()
    }
    assert via_snapshot == direct and direct


def test_bloom_has_no_false_negatives_and_sane_fp(spark):
    """functions/bloom.py: every built key must test present (the
    no-false-negative guarantee the prefilter's correctness rests
    on), and non-members must mostly test absent at the default
    sizing (fp well under the loose 15% bound; expected ~2.4% at 8
    bits/key, K_HASH=4)."""
    from pyspark.sql import functions as F

    from kawa_spark.functions.bloom import (
        BITS_PER_KEY,
        bloom_build,
        bloom_might_contain,
    )

    rng = random.Random(0xB100)
    members = [f"k{rng.randrange(10**9)}" for _ in range(2000)]
    others = [f"x{rng.randrange(10**9)}" for _ in range(2000)]
    m_bits = BITS_PER_KEY * len(members)
    idx = spark.createDataFrame([(m,) for m in members], "h string")
    bloom = bloom_build(idx, "h", m_bits)

    def probe(keys):
        df = (
            spark.createDataFrame([(k,) for k in keys], "h string")
            .crossJoin(F.broadcast(bloom))
            .select(bloom_might_contain(F.col("h"), m_bits).alias("mc"))
        )
        return [r["mc"] for r in df.collect()]

    assert all(probe(members)), "false negative — bloom is broken"
    fp = sum(probe(others)) / len(others)
    assert fp < 0.15, fp


def test_prefilter_is_invariant(spark):
    """incremental_dedup(prefilter_bits=...) must classify IDENTICALLY
    to the broadcast-join form on random two-snapshot corpora — the
    kmv_distinct(prefilter=) discipline. Exercised with cross-split
    dups (the bloom-pass path), novel docs (the bloom-skip path), and
    a deliberately TINY filter (high fp rate: false positives must
    resolve in the exact join, never misclassify)."""
    rng = random.Random(0xB101)
    vocab = [f"w{i}" for i in range(40)]
    prior, newb = [], []
    for d in range(25):
        t = " ".join(rng.choice(vocab) for _ in range(12))
        prior.append((d, t))
        if d % 4 == 0:
            newb.append((100 + d, t.upper()))  # norm-equal re-crawl
    for d in range(30):
        newb.append((200 + d, " ".join(rng.choice(vocab) for _ in range(12))))
    newb.append((300, newb[-1][1]))  # within-batch dup
    idx = prior_digest_index(_mk(spark, prior))
    base = {tuple(r) for r in incremental_dedup(_mk(spark, newb), idx).collect()}
    for bits in (8 * len(prior), 64):  # default sizing + tiny/high-fp
        pre = {
            tuple(r)
            for r in incremental_dedup(
                _mk(spark, newb), idx, prefilter_bits=bits
            ).collect()
        }
        assert pre == base and base, bits
    # both prefilter paths genuinely exercised at the default sizing
    assert any(s == "dup_prior" for _, s, _ in base)
    assert any(s == "kept" for _, s, _ in base)


def test_incremental_plan_shape(spark):
    """Only the snapshots shuffle on the digest (prior index build +
    new-batch keeper window = ≤2 exchanges); the probe join itself is
    BROADCAST — the new batch is never sort-merge-joined."""
    from kawa_spark.plans.audit import shuffle_count

    df = registry.QUERIES["dedup_incremental"](spark, SF)
    assert shuffle_count(df) <= 2, shuffle_count(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_online_twin_equals_batch(spark):
    """The seventeenth online/offline twin: the stream-static
    enrichment leg + complete-mode MIN keeper leg, classified by the
    shared projection, must reproduce the batch key exactly (MIN is
    order-insensitive — exact under any batch order)."""
    batch = {
        tuple(r)
        for r in registry.QUERIES["dedup_incremental"](spark, SF).collect()
    }
    online = {
        tuple(r)
        for r in registry.QUERIES["stream_exec_dedup_incremental"](
            spark, SF
        ).collect()
    }
    assert batch == online and batch
