"""Skew guards for the dedup self-joins (VERDICT r01 task 3; posting
guard rewritten round 7 with the posting-list jaccard).

At test SF no real bucket/shingle exceeds its cap, so the oracle
parity tests exercise the guards only in their no-op regime. These
tests drive the guard helpers directly on synthetic degenerate
inputs, pinning the 100 TB behavior: boilerplate-posting eviction,
degenerate-bucket eviction, determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.queries.llm_dedup import _cap_buckets, _cap_postings


def _postings_df(spark):
    """300 docs sharing a boilerplate shingle (df=300) plus 4 docs
    sharing a rare shingle (df=4)."""
    boiler = spark.range(300).select(
        F.col("id").alias("doc_id"), F.lit(111).cast("long").alias("s")
    )
    rare = spark.range(4).select(
        F.col("id").alias("doc_id"), F.lit(222).cast("long").alias("s")
    )
    return boiler.unionAll(rare)


def test_cap_postings_drops_boilerplate_shingle(spark):
    out = _cap_postings(_postings_df(spark), cap=200)
    rows = out.groupBy("s").count().collect()
    assert {r["s"]: r["count"] for r in rows} == {222: 4}


def test_cap_postings_noop_below_cap(spark):
    df = _postings_df(spark)
    out = _cap_postings(df, cap=1000)
    assert out.count() == df.count()


def test_cap_postings_bounds_join_output(spark):
    # with the boilerplate shingle evicted, the posting self-join
    # yields only the C(4,2)=6 rare-shingle pairs — not 300·299/2
    pf = _cap_postings(_postings_df(spark), cap=200)
    a, b = pf.alias("a"), pf.alias("b")
    pairs = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert pairs.count() == 6


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


def test_ngram_jaccard_survives_boilerplate_corpus(spark, tmp_path):
    """End-to-end adaptive-df-cap behavior on a degenerate corpus:
    1500 identical boilerplate docs (shingle df=1500 > the adaptive
    cap max(100, 1502/1000)=100, would otherwise enumerate ~1.1M
    pairs) are evicted wholesale, while a planted near-dup pair built
    from rare shingles is still found with its exact jaccard."""
    from pyspark.sql import Row

    from kawa_spark.queries.llm_dedup import dedup_ngram_jaccard

    boiler = "the same header text repeated on every page of the crawl"
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        Row(doc_id=i, text=boiler, lang="en", source="src0",
            n_chars=len(boiler))
        for i in range(1500)
    ] + [
        Row(doc_id=100_000, text=a, lang="en", source="src0", n_chars=len(a)),
        Row(doc_id=100_001, text=b, lang="en", source="src0", n_chars=len(b)),
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    res = dedup_ngram_jaccard(spark, str(tmp_path)).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in res}
    # ONLY the planted pair — zero boilerplate pairs out of ~1.1M
    assert set(got) == {(100_000, 100_001)}
    # both docs have 8 distinct 3-shingles, 7 shared → 7/9
    assert abs(got[(100_000, 100_001)] - 7 / 9) < 1e-12
