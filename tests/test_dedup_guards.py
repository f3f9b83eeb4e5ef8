"""Skew guards for the dedup self-joins (VERDICT r01 task 3).

At test SF no real block/bucket exceeds its cap, so the oracle
parity tests exercise the guards only in their no-op regime. These
tests drive the guard helpers directly on synthetic oversized
blocks, pinning the 100 TB behavior: bounded sub-block sizes,
deterministic salting, degenerate-bucket eviction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.queries.llm_dedup import _cap_buckets, _salt_blocks


def _block_df(spark, n_rows: int, lang: str = "en"):
    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.lit(lang).alias("lang"),
        F.lit(0).cast("long").alias("len_bucket"),
    )


def test_salt_blocks_bounds_subblock_size(spark):
    d = _salt_blocks(_block_df(spark, 2500), cap=1000)
    sizes = (
        d.groupBy("lang", "len_bucket", "sub_id")
        .count()
        .select("count")
        .collect()
    )
    # 2500 rows / cap 1000 → 3 sub-blocks of ≤ ceil(2500/3) each
    assert len(sizes) == 3
    assert all(r["count"] <= 1000 for r in sizes)


def test_salt_blocks_noop_below_cap(spark):
    d = _salt_blocks(_block_df(spark, 50), cap=1000)
    assert d.select("sub_id").distinct().collect() == [(0,)]


def test_salt_blocks_deterministic(spark):
    a = {(r["doc_id"], r["sub_id"]) for r in _salt_blocks(_block_df(spark, 2500)).collect()}
    b = {(r["doc_id"], r["sub_id"]) for r in _salt_blocks(_block_df(spark, 2500)).collect()}
    assert a == b  # content hash, not rand()/monotonic id


def test_cap_buckets_drops_degenerate_bucket(spark):
    # bucket "big" holds 300 rows (> cap 200), bucket "ok" holds 5
    df = spark.range(305).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_id"),
        F.when(F.col("id") < 300, F.lit("big")).otherwise(F.lit("ok")).alias(
            "band_hash"
        ),
    )
    out = _cap_buckets(df, cap=200)
    rows = out.groupBy("band_hash").count().collect()
    assert {r["band_hash"]: r["count"] for r in rows} == {"ok": 5}
