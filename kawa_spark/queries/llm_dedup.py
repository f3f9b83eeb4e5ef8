"""Deduplication operators for training-data pipelines.

Five tiers, all shared-nothing / shuffle-on-key designs that survive
100 TB:

* exact        — hash-groupBy on a content digest (1 shuffle on md5).
* exact_norm   — same after whitespace/case normalization.
* minhash LSH  — shingle → minhash signature → band → bucket self-join
                 → exact-jaccard verify on candidates only. Never
                 all-pairs: the bucket join's output is the candidate
                 set, and buckets are tiny for non-dup corpora.
* simhash      — 64-bit weighted fingerprint, banded hamming join.
* ngram block  — blocked exact jaccard (lang × length bucket).

Embedding-cosine near-dup lives in llm_similarity.py (same LSH
machinery). minhash/ngram are md5-based so DuckDB can replay them —
the LSH pipelines are hash-exact, giving full value-hash oracles, not
just rows-only checks. simhash needs bit ops on xxhash64 (no DuckDB
twin) → rows-only.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kawa_spark.io import table
from kawa_spark.registry import register

N_PERM = 16  # minhash permutations
N_BANDS = 4  # → 4 rows/band; P(candidate) = 1-(1-j^4)^4


@register(
    "dedup_exact",
    oracle="""
    SELECT
      md5(text) AS content_hash,
      MIN(doc_id) AS keeper_id,
      COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: digest → groupBy. The digest (not the text) is the
    shuffle key, so 100 TB of text shuffles as 32-char hashes. Keeper
    policy = min(doc_id) for determinism."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "dedup_exact_norm",
    oracle="""
    SELECT
      md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS norm_hash,
      MIN(doc_id) AS keeper_id,
      COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        d.groupBy(F.md5(norm).alias("norm_hash"))
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingles(text_col: F.Column) -> F.Column:
    """Distinct 3-word shingles of the lowercased text."""
    words = F.split(F.lower(text_col), r"\s+")
    n = F.size(words)
    raw = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
    )
    return F.array_distinct(raw)


_SHINGLES_SQL = """
    list_distinct(list_transform(
      generate_series(1, greatest(len(string_split_regex(lower(text), '\\s+')) - 2, 1)),
      i -> array_to_string(string_split_regex(lower(text), '\\s+')[i:i+2], ' ')))
"""


_MH_PRIME = 1_000_000_007


def _minhash_oracle() -> str:
    # one md5 per shingle; permutation i = (h1 + i·h2) mod P over the
    # two 60-bit halves of the digest (classic a+b·i minhash family)
    hs = (
        "list_transform(list_transform(shingles, s -> md5(s)), x -> "
        f"{{'h1': ('0x' || substring(x, 1, 15))::BIGINT % {_MH_PRIME}, "
        f"'h2': ('0x' || substring(x, 17, 15))::BIGINT % {_MH_PRIME}}})"
    )
    sig = ", ".join(
        f"list_min(list_transform(hs, t -> (t.h1 + {i} * t.h2) % {_MH_PRIME}))"
        f" AS mh{i}"
        for i in range(N_PERM)
    )
    rows_per_band = N_PERM // N_BANDS
    bands = ", ".join(
        " || '|' || ".join(
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        + f" AS band{b}"
        for b in range(N_BANDS)
    )
    band_unnest = " UNION ALL ".join(
        f"SELECT doc_id, shingles, {b} AS band_id, band{b} AS band_hash FROM banded"
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM documents
    ), hashed AS (
      SELECT doc_id, shingles, {hs} AS hs FROM sh
    ), sigs AS (
      SELECT doc_id, shingles, {sig} FROM hashed
    ), banded AS (
      SELECT doc_id, shingles, {bands} FROM sigs
    ), bandrows AS (
      {band_unnest}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.shingles AS sh_a, b.shingles AS sh_b
      FROM bandrows a JOIN bandrows b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
      CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
        / len(list_distinct(list_concat(sh_a, sh_b))) AS jaccard
    FROM cand
    WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
        / len(list_distinct(list_concat(sh_a, sh_b))) >= 0.2
    """


@register("dedup_minhash", oracle=_minhash_oracle())
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection, md5-based so the oracle can
    replay it exactly.

    Plan shape (the 100 TB story): one scan computes signatures; the
    band explode is ×4; the self-join shuffles only
    (band_id, band_hash, doc_id, shingles); exact jaccard runs on
    candidates only. For a mostly-unique corpus candidates ≈ true
    near-dups, so the verify stage is tiny. Skew guard: a degenerate
    band bucket (e.g. empty docs) would quadratically explode — AQE
    skew-join handles moderate cases; a production run would cap
    bucket sizes first.
    """
    # Small single-file inputs arrive as ONE partition; the signature
    # stage is CPU-bound (16·|shingles| md5 per doc), so spread it
    # across cores first. At real scale the file splits already
    # provide this and AQE coalesces the excess.
    par = spark.sparkContext.defaultParallelism
    d = (
        table(spark, sf_dir, "documents")
        .repartition(par, "doc_id")
        .select("doc_id", _shingles(F.col("text")).alias("shingles"))
    )
    # ONE md5 per shingle; the 16 permutations are (h1 + i·h2) mod P
    # over the digest's two 60-bit halves — 16× less hashing than
    # per-permutation md5, and all inside a single expression chain so
    # the shingle array is built once per row (a per-permutation
    # column layout let CollapseProject rebuild it 16×; measured).
    P = _MH_PRIME

    def _half(x, start):
        return F.conv(F.substring(x, start, 15), 16, 10).cast("long") % P

    hs = F.transform(
        F.transform(F.col("shingles"), F.md5),
        lambda x: F.struct(_half(x, 1).alias("h1"), _half(x, 17).alias("h2")),
    )
    mhs = F.transform(
        F.sequence(F.lit(0), F.lit(N_PERM - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("hs"),
                lambda t: (t.getField("h1") + i * t.getField("h2")) % P,
            )
        ),
    )
    sig = (
        d.withColumn("hs", hs)
        .withColumn("mhs", mhs)
        .select("doc_id", "shingles", "mhs")
    )
    rows_per_band = N_PERM // N_BANDS
    banded = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.element_at(
                                    F.col("mhs"), b * rows_per_band + r + 1
                                ).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "shingles", "band.band_id", "band.band_hash")

    # the self-join would otherwise recompute the whole signature
    # pipeline for BOTH sides — persist materializes it once. At
    # cluster scale this is the standard cache-before-self-join; the
    # persisted set is (doc_id, shingles, band) — small relative to
    # the corpus text.
    banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .distinct()
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b")))
    jaccard = (inter / union).alias("jaccard")
    return cand.select("doc_a", "doc_b", jaccard).filter(F.col("jaccard") >= 0.2)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, lang, n_chars // 100 AS len_bucket,
             {_SHINGLES_SQL} AS shingles
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket
     AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.15
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact n-gram jaccard: candidate pairs restricted to the
    same (lang, length-bucket) block — the classic pre-LSH blocking
    scheme. The join shuffles on the block key; block sizes bound the
    quadratic term."""
    d = (
        table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") / F.lit(100)).cast("long").alias("len_bucket"),
            _shingles(F.col("text")).alias("shingles"),
        )
    )
    d = d.persist()  # self-join below — avoid rebuilding shingles twice
    a = d.alias("a")
    b = d.alias("b")
    inter = F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
    union = F.size(F.array_distinct(F.concat("a.shingles", "b.shingles")))
    jaccard = (inter / union).alias("jaccard")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jaccard,
        )
        .filter(F.col("jaccard") >= 0.15)
    )


@register("dedup_clusters")  # rows-only: iterative label propagation
def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive duplicate CLUSTERS with one keeper
    each (operators/components.py label propagation). Pairwise dedup
    alone under-merges: A~B and B~C must collapse to one cluster even
    when A~C wasn't a candidate pair."""
    from kawa_spark.operators.components import dedup_clusters

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    return dedup_clusters(pairs, "doc_a", "doc_b")


@register("dedup_simhash")  # rows-only: xxhash64 has no DuckDB twin
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit weighted fingerprint per doc, banded
    hamming-distance candidate join (4 × 16-bit bands), verify with
    bit_count(xor) <= 3.

    All column expressions: term hashing via xxhash64, the 64 bit
    sums via HOFs over the per-doc term list (bounded by distinct
    terms per doc, not corpus size).
    """
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    terms = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("doc_id", F.xxhash64("term").alias("h"), "cnt")
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("h", "cnt")).alias("terms"))
    )
    # bit b of the simhash = sign of sum over terms of ±cnt.
    # b is unrolled as a Python int (shift amounts must be literals).
    def bit_sum(b: int):
        return F.aggregate(
            F.col("terms"),
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + F.when(
                F.shiftright(t.getField("h"), b).bitwiseAND(F.lit(1)) == 1,
                t.getField("cnt"),
            ).otherwise(-t.getField("cnt")),
        )

    bit_weight = [F.lit(1 << b).cast("long") for b in range(63)] + [
        F.lit(-(1 << 63)).cast("long")  # sign bit: avoid long overflow
    ]
    simhash = reduce(
        add,
        [
            F.when(F.element_at(F.col("bitsums"), b + 1) > 0, bit_weight[b]).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(64)
        ],
    )
    sh = terms.select(
        "doc_id", F.array(*[bit_sum(b) for b in range(64)]).alias("bitsums")
    ).select("doc_id", simhash.alias("simhash"))
    # band into 4 × 16 bits; candidates share ≥1 band
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    banded = banded.persist()  # self-join: materialize simhashes once
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )
