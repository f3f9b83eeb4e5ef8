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


def test_span_fraction_matches_bruteforce(spark, tmp_path):
    """dedup_span_fraction vs an independent Python span miner on an
    adversarial mini-corpus: shared prefixes, a doc repeating a
    shared span WITHIN itself (positional counting — each occurrence
    is a contaminated position), docs shorter than SPAN_N (no
    windows, absent from output), and a unique doc (false class).
    The oracle mirrors the construction, so only an independent
    reference catches a shared windowing/off-by-one error."""
    from kawa_spark.queries.llm_dedup import SPAN_N, dedup_span_fraction

    shared = "a b c d e f g h i j"  # 10 words: 3 windows at SPAN_N=8
    corpus = {
        1: shared + " unique1 tail1 words1 here1",
        2: shared + " other2 tail2 words2 here2",
        3: shared + " mid filler " + shared,  # repeats the shared span
        4: "totally unique words nothing shared with anyone else at all",
        5: "short doc",  # < SPAN_N words: no windows
    }

    def ref(corpus):
        per_doc: dict[int, list[str]] = {}
        for d, text in corpus.items():
            ws = text.lower().split()
            per_doc[d] = [
                " ".join(ws[i : i + SPAN_N])
                for i in range(len(ws) - SPAN_N + 1)
            ]
        docs_of: dict[str, set] = {}
        for d, wins in per_doc.items():
            for w in set(wins):
                docs_of.setdefault(w, set()).add(d)
        out = {}
        for d, wins in per_doc.items():
            if not wins:
                continue
            dup = sum(1 for w in wins if len(docs_of[w]) >= 2)
            out[d] = (len(wins), dup, dup / len(wins), 2 * dup >= len(wins))
        return out

    # drive the REAL registered query via a scratch documents table
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(d, t, "en", "test", len(t)) for d, t in corpus.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    rows = dedup_span_fraction(spark, str(sf)).collect()
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["dup_windows"],
            r["dup_fraction"],
            r["is_contaminated"],
        )
        for r in rows
        if r["doc_id"] >= 0  # drop the registered plants
    }
    assert got == ref(corpus)
    # sanity on the mini-corpus shape the test is arguing about:
    assert 5 not in got  # no windows
    assert got[4][1] == 0 and not got[4][3]  # clean doc
    assert got[3][0] > got[1][0]  # repeated-span doc has more windows
