"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in kawa_spark.session) handles
moderate skew automatically; these operators are the explicit form
for the pathological cases AQE can't fix — a groupBy where one key
holds 30% of 100 TB, or a join where the hot key's rows exceed a
single executor.

Both are deterministic: the salt is a hash of row content, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation through a salted intermediate key.

    Phase 1 groups by (keys…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the per-salt partials.
    ``aggs`` are the phase-1 partials; ``final_aggs`` merge them (e.g.
    phase 1 ``sum(x) as s`` → phase 2 ``sum(s) as s``). Algebraic
    aggregates only — exactly the ones that scale anyway.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def replicated_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_replicas: int = 8,
) -> DataFrame:
    """Skew-proof join: replicate the SMALL side n_replicas× with a
    salt column; each skewed-side row picks one replica by content
    hash. The hot key's rows land on n_replicas different partitions
    instead of one. (With a truly broadcastable small side, plain
    F.broadcast is better — this is for the mid-size build side that
    must shuffle.)

    The salt is a content hash over ALL of the skewed row's columns —
    deterministic under task retry/recomputation (unlike
    monotonically_increasing_id, whose value depends on partition
    layout). Fully identical duplicate rows share a salt and land on
    one replica; hot keys whose rows differ in any column spread.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_replicas)
    )
    left = skewed.withColumn("__salt", salt)
    replicas = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_replicas - 1)))
    )
    return left.join(replicas, [key, "__salt"]).drop("__salt")
