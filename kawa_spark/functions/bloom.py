"""Expression-level Bloom filter: a broadcastable membership
pre-prune for join probes against a large persisted index.

The motivating shape (dedup_incremental's docstring promise, made
code in r12): the prior kept-set digest index can exceed the
broadcast cap, at which point the classify join co-locates against
the BUCKETED persisted index — but most of a day's crawl is novel,
so most probe rows shuffle to the index only to match nothing. A
Bloom filter over the index keys is small (~1 byte/key), broadcasts,
and lets the novel majority skip the join entirely; false positives
just take the exact-join path and resolve there, so the composed
result is IDENTICAL (pinned by
tests/test_incremental_dedup.py::test_prefilter_is_invariant — the
kmv_distinct(prefilter=) discipline from r8).

Construction is pure DataFrame expressions in both halves:

* build — each key sets K_HASH bit positions ``pmod(xxhash64(key,
  seed), m_bits)``; positions roll up to 64-bit words via
  ``bit_or(shiftleft(1, pos % 64))`` grouped on ``pos div 64`` (one
  tiny shuffle on m/64 word ids), and the words collect into ONE
  array row — at ~1 byte/key a 10⁸-key index is a ~100 MB row, the
  broadcast-budget class; beyond that a deployment shards the
  filter by key range exactly like the index it summarizes.
* probe — a broadcast crossJoin of that row plus a ``forall`` over
  the K_HASH positions testing bits in the array. Map-side, no
  shuffle, whole-stage-codegen friendly.

No false negatives BY CONSTRUCTION (every build bit of a present
key is set; the property test exercises it adversarially anyway);
the false-positive rate is the standard (1 - e^(-kn/m))^k — with
the default 8 bits/key and K_HASH=4, ~2.4%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K_HASH = 4  # hash functions per key
BITS_PER_KEY = 8  # default sizing → ~2.4% false-positive rate


def _positions(key: Column, m_bits: int) -> list[Column]:
    """The K_HASH bit positions of a key — ONE definition shared by
    build and probe (a drift here would silently break the
    no-false-negative guarantee). Validates m_bits HERE so a
    day-zero caller sizing the filter as bits_per_key·0 gets a clean
    ValueError at plan-build time instead of an executor-side pmod
    DIVIDE_BY_ZERO at action time (code review r12)."""
    if m_bits <= 0:
        raise ValueError(f"bloom filter width must be positive, got {m_bits}")
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(K_HASH)
    ]


def _bit(pos: Column) -> Column:
    """``1L << (pos % 64)`` — the in-word bit of a position, shared by
    build and probe. call_function because the python shiftleft
    wrapper only takes a literal shift amount."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_build(index: DataFrame, key: str, m_bits: int) -> DataFrame:
    """(index keys) → ONE row ``(words array<long>)`` of m_bits/64
    words (zero words materialized via a sequence scaffold so probe
    indexing never sees a hole)."""
    n_words = (m_bits + 63) // 64
    pos = index.select(
        F.explode(F.array(*_positions(F.col(key), m_bits))).alias("pos")
    )
    set_words = pos.groupBy(
        (F.col("pos") / 64).cast("long").alias("w")
    ).agg(F.bit_or(_bit(F.col("pos"))).alias("bits"))
    scaffold = index.sparkSession.range(n_words).select(
        F.col("id").alias("w")
    )
    words = (
        scaffold.join(set_words, "w", "left")
        .select("w", F.coalesce(F.col("bits"), F.lit(0).cast("long")).alias("bits"))
    )
    return words.agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("w"), F.col("bits")))
            ),
            lambda s: s.getField("bits"),
        ).alias("words")
    )


def bloom_might_contain(key: Column, m_bits: int) -> Column:
    """Membership test against the broadcast ``words`` column (attach
    the bloom_build row via ``crossJoin(F.broadcast(...))`` first).
    True ⇔ every one of the key's K_HASH bits is set — never false
    for a key that was in the build input."""
    return F.forall(
        F.array(*_positions(key, m_bits)),
        lambda p: (
            F.element_at(F.col("words"), (p / 64).cast("long").cast("int") + 1)
            .bitwiseAND(_bit(p))
            != 0
        ),
    )
