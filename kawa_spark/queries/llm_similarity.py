"""Similarity search over embedding columns.

* similarity_topk — brute-force cosine top-k: the correctness
  baseline. Query set broadcast; one scan of the corpus; per-partition
  top-k then a k·|Q|-row merge (window over tiny result). Linear in
  corpus size — the right plan up to ~10⁹ vectors per query batch.
* similarity_lsh_ann — random-hyperplane (sign) LSH: corpus bucketed
  by an 8-bit signature (recall-biased; the near-dup variant uses 16
  bits for precision), candidates only from matching buckets, exact
  cosine rerank. The scale path: bucket join replaces the cross
  product; recall traded via n_planes/multi-probe.

Dot products are left-folds over doubles — bit-identical in Spark's
``aggregate`` and DuckDB's ``list_reduce`` — so even the float scores
hash-match the oracle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.io import table, spread
from kawa_spark.registry import register

N_QUERIES = 10
TOP_K = 5
# fixed centroid budget for the sampled-quantizer IVF variant — caps
# broadcast + argmin cost independent of corpus size (≈ √N at the
# 100 TB design point a real build would tune)
IVF_MAX_CELLS = 128
N_PLANES = 16
DIM = 64


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left fold in double precision.

    Deliberately the HOF fold, NOT a DIM-unrolled `+` chain: the r6
    experiment that unrolled this into 64 inline get/cast/mul terms
    was a measured LOSS on both axes — per-evaluation the fold's
    tight loop beats 64 boxed array gets (0.87 s vs 1.40 s for 200k
    dots), and the ~260-node unrolled trees ballooned Catalyst
    planning by several seconds per invocation. The real levers for
    mass pair-dots are upstream: evaluate FEWER dots (precompute
    norms once per vector — see similarity_ivf) and never shuffle a
    pair cross-product (struct-min argmin, not a row_number
    window)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# --- Vectorized nearest-centroid assignment (r15 optimization round) ---
#
# One mapInPandas pass over the corpus with the K collected centroid
# rows shipped in the closure — the similarity_topk_vectorized
# discipline applied to the argmin stage every IVF/k-means path runs
# (_assign_cells_vectorized = the cosine/IVF form, _lloyd_assign =
# the squared-L2 form).
#
# Why not the previous exploded F.min(struct) aggregate: min/max over
# a struct has a non-mutable aggregation buffer, so Spark plans it as
# a SortAggregate — every one of the N·K broadcast-join candidate
# rows (embedding arrays riding along) is materialized and locally
# SORTED before reducing back to N rows, and the per-pair distance
# itself is an interpreted Catalyst HOF fold (~70 µs per 64-dim dot —
# measured 179.7 s / 108× for similarity_ivf at the 10× probe,
# K=128). And why not a pure column-expression fold over a broadcast
# centroid array: the assignment column becomes an alias every
# downstream equi-join on it can SUBSTITUTE into a pushed-down join
# condition — the optimizer inlined the whole K-dot fold into a Join
# Cross condition, re-evaluating it per candidate PAIR (measured >3×
# WORSE than the SortAggregate form). The opaque Python stage is both
# the fast path (numpy per-element loops at C speed) and a pushdown
# barrier the optimizer cannot rewrite through.
#
# Bit-identity contract (the vectorized-topk rules): float32→float64
# casts are exact; per-element products/subtractions are single IEEE
# ops; reductions are strictly sequential left folds in dim order —
# F.aggregate's and DuckDB list_reduce's add order — via the per-dim
# panel accumulation helpers (_seq_fold_dots/_seq_fold_d2, r16; the
# r15 form was np.cumsum along the dim axis, same bits); Spark's
# struct-min total order is replayed by _spark_argmin below. Pinned
# against the retained struct-min witnesses by
# tests/test_argmin_vectorized.py.


def _spark_argmin(dists: "np.ndarray") -> "np.ndarray":
    """First-minimum argmin under Spark's struct-min total order:
    NaN sorts greater than every number, so a NaN distance can never
    win unless ALL of a row's distances are NaN — in which case
    struct-min falls through to the smallest centroid id, which is
    exactly argmin over an all-inf row (first index). Ties on finite
    equal distances also resolve to the first (= smallest-id)
    column. Does not mutate ``dists``."""
    return np.argmin(np.where(np.isnan(dists), np.inf, dists), axis=1)


def _arrow_list_to_f64(col) -> "np.ndarray":
    """An Arrow list<float> column as an (n, dim) float64 matrix —
    offsets-based zero-copy reshape when every row has the same
    width (the corpus case), per-row fallback otherwise. float32 →
    float64 is exact, so downstream arithmetic sees the same values
    the JVM's cast-to-double sees."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offs)
    if col.null_count == 0 and len(widths) and (widths == widths[0]).all():
        vals = col.values.to_numpy(zero_copy_only=False)
        return vals[offs[0] : offs[-1]].astype(np.float64).reshape(
            len(widths), widths[0]
        )
    # ragged / null-carrying fallback (ADVICE r15): a NULL row's
    # as_py() is None, which np.asarray turns into a 0-d NaN object —
    # the stacked matrix would then diverge from the JVM form's null
    # propagation. The corpus schema has no null embeddings; refuse
    # loudly instead of guessing a width.
    rows = []
    for i in range(len(col)):
        v = col[i].as_py()
        if v is None:
            raise ValueError(
                f"null embedding at batch row {i}: the vectorized "
                "kernels require non-null embedding arrays (the JVM "
                "form would propagate NULL here, silently diverging)"
            )
        rows.append(np.asarray(v, dtype=np.float64))
    return np.array(rows)


# --- Per-dim fold accumulation (r16 optimization round) ---
#
# The r15 form computed each reduction as np.cumsum(axis=1)[:, -1],
# which allocates an (n, dim) product temp per centroid/query and
# runs a data-dependent sequential scan per row — the scan's loop-
# carried dependency defeats SIMD. These helpers keep the EXACT same
# IEEE add order (the fold starts at the dim-0 term and adds one
# dim's term at a time, precisely cumsum's partial-sum chain and
# therefore F.aggregate's / DuckDB list_reduce's left fold — the r15
# bit-identity contract is unchanged) but accumulate per DIMENSION
# across the whole (n, k) panel: dim-count iterations of fully
# vectorizable multiply-adds, one (n, k) temp total, no per-centroid
# (n, dim) temps (VERDICT r15 item 5; guide §4.2). Pinned against the
# retained JVM struct-min witnesses by tests/test_argmin_vectorized.py
# and the topk/PQ bit-identity tests.


def _seq_fold_dots(em: "np.ndarray", w: "np.ndarray") -> "np.ndarray":
    """Left-fold dot products of every row of ``em`` (n, d) against
    every row of ``w`` (k, d) as an (n, k) float64 matrix, added in
    dim order — bit-identical to per-pair ``cumsum(em*w[k])[:, -1]``."""
    if em.shape[1] == 0:
        return np.zeros((em.shape[0], w.shape[0]), dtype=np.float64)
    out = np.multiply(em[:, 0, None], w[None, :, 0])
    tmp = np.empty_like(out)
    for j in range(1, em.shape[1]):
        np.multiply(em[:, j, None], w[None, :, j], out=tmp)
        out += tmp
    return out


def _seq_fold_d2(em: "np.ndarray", w: "np.ndarray") -> "np.ndarray":
    """Left-fold squared-L2 distances, same (n, k) panel shape and
    dim-order adds as ``_seq_fold_dots``; (x−y) is one IEEE sub whose
    square is a single multiply — exactly the ``_d2_col`` fold."""
    if em.shape[1] == 0:
        return np.zeros((em.shape[0], w.shape[0]), dtype=np.float64)
    out = em[:, 0, None] - w[None, :, 0]
    out *= out
    tmp = np.empty_like(out)
    for j in range(1, em.shape[1]):
        np.subtract(em[:, j, None], w[None, :, j], out=tmp)
        tmp *= tmp
        out += tmp
    return out


def _seq_fold_sq_norm(em: "np.ndarray") -> "np.ndarray":
    """Row-wise left-fold Σx² (the pre-sqrt norm), dim-order adds —
    bit-identical to ``np.cumsum(em*em, axis=1)[:, -1]``."""
    if em.shape[1] == 0:
        return np.zeros(em.shape[0], dtype=np.float64)
    out = em[:, 0] * em[:, 0]
    for j in range(1, em.shape[1]):
        out += em[:, j] * em[:, j]
    return out


def _assign_cells_vectorized(e: DataFrame, cent_rows: list) -> DataFrame:
    """IVF cell assignment (cosine form): nearest centroid per corpus
    vector via one Arrow/numpy pass — see ``_argmin_vectorized`` for
    the design note and the bit-identity contract. ``cent_rows`` are
    the collected (cell_id, cent, n_c) centroid rows (a bounded model
    artifact — ≤ IVF_MAX_CELLS rows, the same driver-collect class as
    the Lloyd centroids and the PQ codebook). Emits
    (vec_id, embedding, n_e, cell_id) with n_e the same sequential-
    fold norm the JVM projection computed."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(e.sparkSession)
    # embedding passes through untouched, so its declared type must
    # be the INPUT's (float for the parquet corpus, double for e.g.
    # the scale-probe's perturbed builds)
    emb_t = e.schema["embedding"].dataType.simpleString()
    schema = f"vec_id long, embedding {emb_t}, n_e double, cell_id long"
    if not cent_rows:
        return e.sparkSession.createDataFrame([], schema)
    cent_rows = sorted(cent_rows, key=lambda r: r["cell_id"])
    cid = np.array([r["cell_id"] for r in cent_rows], dtype=np.int64)
    cm = np.array(
        [np.asarray(r["cent"], dtype=np.float64) for r in cent_rows]
    )
    nc = np.array([r["n_c"] for r in cent_rows], dtype=np.float64)
    # domain guard (the similarity_topk_vectorized rule): ANSI-mode
    # JVM division raises DIVIDE_BY_ZERO on a zero denominator even
    # for doubles (pinned by test_argmin_vectorized's zero-norm leg
    # against the struct-min witness), so the vectorized form must
    # refuse identically rather than silently mask a NaN distance.
    if np.any(nc == 0.0):
        bad = cid[nc == 0.0][:5].tolist()
        raise ArithmeticError(
            f"zero-norm centroid(s) {bad}: cosine is x/0 — the JVM "
            "struct-min raises DIVIDE_BY_ZERO here (ANSI); the "
            "vectorized form refuses identically"
        )

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            em = _arrow_list_to_f64(batch.column(1))
            n_e = np.sqrt(_seq_fold_sq_norm(em))
            if np.any(n_e == 0.0):
                bad = (
                    batch.column(0)
                    .to_numpy(zero_copy_only=False)[n_e == 0.0][:5]
                    .tolist()
                )
                raise ArithmeticError(
                    f"zero-norm embedding(s) {bad}: cosine is x/0 — "
                    "the JVM struct-min raises DIVIDE_BY_ZERO here "
                    "(ANSI); the vectorized form refuses identically"
                )
            dots = _seq_fold_dots(em, cm)
            denom = n_e[:, None] * nc[None, :]
            # ADVICE r15: the JVM raises when the PRODUCT n_e·n_c is
            # exactly 0.0 — two nonzero subnormal norms can underflow
            # the product even past the factor guards above, where
            # ANSI Spark errors but numpy would silently yield inf.
            if np.any(denom == 0.0):
                raise ArithmeticError(
                    "zero denominator n_e*n_c (subnormal underflow): "
                    "cosine is x/0 — the JVM struct-min raises "
                    "DIVIDE_BY_ZERO here (ANSI); the vectorized form "
                    "refuses identically"
                )
            with np.errstate(over="ignore"):
                dists = -(dots / denom)
            best = _spark_argmin(dists)
            # mapInArrow + explicit pa.array (NOT pandas): pandas
            # conversion nulls NaN doubles, which would break the
            # bit-identity contract on NaN-carrying inputs; the
            # vec_id/embedding columns pass through untouched.
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    batch.column(1),
                    pa.array(n_e, type=pa.float64()),
                    pa.array(cid[best], type=pa.int64()),
                ],
                names=["vec_id", "embedding", "n_e", "cell_id"],
            )

    return e.select("vec_id", "embedding").mapInArrow(assign, schema=schema)


def _assign_cells_structmin(en: DataFrame, cents: DataFrame) -> DataFrame:
    """The pre-r15 IVF assignment — exploded broadcast join +
    lexicographic struct-min aggregate — kept PRIVATE as the
    bit-identity witness for ``_assign_cells_vectorized`` (the
    ``_similarity_topk_catalyst`` pattern, ADVICE r14): never
    registered, never benched; retired from the query path for the
    measured 108×-at-10× SortAggregate/interpreted-fold ceiling.
    ``en`` must carry (vec_id, embedding, n_e); ``cents``
    (cell_id, cent, n_c)."""
    pair_cos = dot(F.col("embedding"), F.col("cent")) / (
        F.col("n_e") * F.col("n_c")
    )
    return (
        en.join(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                (-pair_cos).alias("dist"), "cell_id", "embedding", "n_e"
            ).alias("c"),
        )
        .groupBy("vec_id")
        .agg(F.min("c").alias("b"))
        .select(
            "vec_id",
            F.col("b.embedding").alias("embedding"),
            F.col("b.n_e").alias("n_e"),
            F.col("b.cell_id").alias("cell_id"),
        )
    )


_DOT_SQL = """
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(generate_series(1, {dim}),
                       i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
      (acc, x) -> acc + x)
"""


def _cos_sql(a: str, b: str) -> str:
    d = _DOT_SQL.format(dim=DIM, a=a, b=b)
    na = _DOT_SQL.format(dim=DIM, a=a, b=a)
    nb = _DOT_SQL.format(dim=DIM, a=b, b=b)
    return f"({d}) / (sqrt({na}) * sqrt({nb}))"


@register(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.q_id, e.vec_id AS n_id,
             {_cos_sql('q.q_emb', 'e.embedding')} AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    ), ranked AS (
      SELECT q_id, n_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, n_id) AS rnk
      FROM scored
    )
    SELECT q_id, n_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a broadcast query set.

    Since r14 the registered body IS the Arrow/numpy vectorized core
    (``similarity_topk_vectorized`` below — VERDICT r13 item 1): one
    corpus scan, all |Q| dot products per Arrow batch at C speed,
    batch-local top-k so the final merge window sees batches·|Q|·k
    rows, never the corpus. Scores are BIT-IDENTICAL to the previous
    per-row Catalyst-fold body — retained as the private witness
    ``_similarity_topk_catalyst`` below (np.cumsum is the same
    sequential IEEE left fold as F.aggregate / DuckDB list_reduce;
    pinned by tests/test_pq_adc.py::test_vectorized_topk_bit_identical
    against that witness, ADVICE r14) — so the oracle is unchanged.
    Measured: 34.85 s → 1.90 s at the 100× probe — the swap retires
    the engine's last plan-level scale ceiling (docs/SCALE.md)."""
    return similarity_topk_vectorized(spark, sf_dir)


def _similarity_topk_catalyst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r14 registered body — the per-row JVM Catalyst-fold
    cosine (F.aggregate is a strictly sequential IEEE left fold) kept
    PRIVATE as the bit-identity witness: with the registered key now
    delegating to the vectorized core, a registered-vs-vectorized
    comparison would test the vectorized form against itself (ADVICE
    r14). tests/test_pq_adc.py::test_vectorized_topk_bit_identical
    compares THIS body to the Arrow/numpy core, and the zero-norm
    test's DIVIDE_BY_ZERO legs exercise ITS ANSI division. Not a
    query path — never registered, never benched; retired from
    production for the measured 46×-at-100× fold ceiling
    (docs/SCALE.md r13/r14)."""
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("score"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        scored.select("q_id", "n_id", "score", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (seed 42) shared by LSH ops."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((N_PLANES, DIM)).tolist()


def _sig_sql(emb: str, n_planes: int = N_PLANES) -> str:
    """The sign-LSH signature as SQL over literal planes — python
    repr() round-trips doubles, so DuckDB parses the exact values the
    Spark side embeds via F.lit; the folds match bit-for-bit."""
    terms = []
    for i, plane in enumerate(_hyperplanes()[:n_planes]):
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]"
        d = f"""list_reduce(
          list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(generate_series(1, {DIM}),
              j -> CAST({emb}[j] AS DOUBLE) * ({lit})[j])),
          (acc, x) -> acc + x)"""
        terms.append(
            f"(CASE WHEN ({d}) > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _signature(emb: Column, n_planes: int = N_PLANES) -> Column:
    """n_planes-bit sign-LSH bucket id as a long."""
    planes = _hyperplanes()[:n_planes]
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        sig = sig + F.when(dot(emb, p) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


ANN_PLANES = 8  # 256 buckets: recall-biased; dedup keeps 16 (precision)


def _lsh_ann_oracle() -> str:
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding, {_sig_sql('embedding', ANN_PLANES)} AS sig FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, sig AS q_sig
      FROM corpus WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.q_id, c.vec_id AS n_id,
             {_cos_sql('q.q_emb', 'c.embedding')} AS score
      FROM q JOIN corpus c ON c.sig = q.q_sig AND c.vec_id <> q.q_id
    ), ranked AS (
      SELECT q_id, n_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, n_id) AS rnk
      FROM scored
    )
    SELECT q_id, n_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


@register("similarity_lsh_ann", oracle=_lsh_ann_oracle())
def similarity_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-LSH bucketing + exact rerank.

    Corpus and queries are hashed to an 8-bit bucket; candidates are
    corpus vectors sharing the query's bucket; exact cosine reranks
    the candidates. At 100 TB the bucket column is what you'd
    partition/Z-order the corpus by, turning each query into a
    partition-pruned scan instead of a full pass.
    """
    e = table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", "embedding", _signature(F.col("embedding"), ANN_PLANES).alias("sig")
    )
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("sig").alias("q_sig"),
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("sig") == F.col("q_sig")) & (F.col("vec_id") != F.col("q_id")),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        cand.select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("score"),
        )
        .select("q_id", "n_id", "score", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


def _probe_masks(radius: int) -> list[int]:
    """XOR bit masks for the probe set at Hamming distance ≤ radius
    (excluding the identity probe, which both engines list first):
    the single-bit flips in plane order, then the two-bit flips in
    lexicographic order, etc. For radius=1 this is exactly the r10
    key's [1<<0 .. 1<<(ANN_PLANES-1)] — byte-identity of the
    registered oracle is pinned below."""
    from itertools import combinations

    masks: list[int] = []
    for r in range(1, radius + 1):
        for bits in combinations(range(ANN_PLANES), r):
            masks.append(sum(1 << k for k in bits))
    return masks


def _multiprobe_sql(radius: int = 1) -> str:
    probes = ", ".join(f"xor(q.q_sig, {m})" for m in _probe_masks(radius))
    return f"""
    WITH corpus AS (
      SELECT vec_id, embedding, {_sig_sql('embedding', ANN_PLANES)} AS sig FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, sig AS q_sig
      FROM corpus WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.q_id, c.vec_id AS n_id,
             {_cos_sql('q.q_emb', 'c.embedding')} AS score
      FROM q JOIN corpus c
        ON c.sig IN (q.q_sig, {probes}) AND c.vec_id <> q.q_id
    ), ranked AS (
      SELECT q_id, n_id, score,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY score DESC, n_id) AS rnk
      FROM scored
    )
    SELECT q_id, n_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


def _multiprobe_oracle() -> str:
    return _multiprobe_sql(1)


def _lsh_sig_bits(dots: "np.ndarray") -> "np.ndarray":
    """Sign-LSH bucket ids from an (n, n_planes) fold-dot panel: bit
    k set iff dot_k > 0.0, with a NaN dot counting as greater — Spark
    and DuckDB both order NaN above every number in comparisons, and
    numpy's ``NaN > 0`` is False, so the NaN case is OR'd in
    explicitly to keep the bucket ids engine-identical."""
    sig = np.zeros(dots.shape[0], dtype=np.int64)
    for k in range(dots.shape[1]):
        col = dots[:, k]
        sig |= ((col > 0.0) | np.isnan(col)).astype(np.int64) << k
    return sig


def _multiprobe_frame(
    spark: SparkSession, sf_dir: str, radius: int = 1
) -> DataFrame:
    """The multi-probe pipeline at any probe radius — the registered
    key binds radius=1 (the r10 single-bit flips); the wide variant
    binds radius=2.

    r16 optimization round (VERDICT r15 item 3; guide §4.2): one
    ``mapInArrow`` pass over the corpus with the |Q| query rows and
    their probe-bucket sets shipped in the closure, replacing the
    Catalyst form (retained as the private witness
    ``_multiprobe_catalyst`` below; tests/test_multiprobe_vectorized.py
    pins bit-identity at both radii). The Catalyst form paid EIGHT
    interpreted ``aggregate(zip_with(...))`` HOF folds per corpus row
    to compute the signature, then one more interpreted 3-fold cosine
    per candidate pair after the broadcast join — at radius 2 the 37
    probe buckets make candidates ≈14% of the corpus PER QUERY, so
    the pair-wise fold work exceeded the corpus scan itself. The
    vectorized pass computes the 8-plane signature panel, the probe-
    set membership, and the candidate cosines per Arrow batch at C
    speed and emits only its batch-local top-k per query — the final
    merge window sees batches·|Q|·k rows, never the candidate set
    (the similarity_topk_vectorized discipline).

    Bit-identity contract: fold dots/norms via the per-dim sequential
    helpers (same adds as the JVM/DuckDB folds); the signature treats
    a NaN dot as > 0 exactly like both engines; zero-norm cosine is
    refused like ANSI division, but only when the row is actually a
    CANDIDATE of some probe — the JVM form, too, evaluates cosine
    only after the bucket join. Batch-local pruning cannot drop a
    global top-k row: the local (score desc, n_id asc) order (NaN
    mapped first, Spark's descending-NaN placement) is the final
    window's order, so any locally-pruned row is dominated by TOP_K
    batch-mates that also reach the window. The former ``.distinct()``
    is gone — the membership test yields one row per (query,
    candidate) by construction, where the probe JOIN emitted one per
    MATCHING PROBE (duplicates it then had to collapse)."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    planes = np.array(_hyperplanes()[:ANN_PLANES], dtype=np.float64)
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [int(r["vec_id"]) for r in q_rows]
    qm = np.array(
        [np.asarray(r["embedding"], dtype=np.float64) for r in q_rows]
    )
    q_norm = np.sqrt(_seq_fold_sq_norm(qm))
    q_sig = _lsh_sig_bits(_seq_fold_dots(qm, planes))
    masks = np.array([0] + _probe_masks(radius), dtype=np.int64)
    probe_sets = q_sig[:, None] ^ masks[None, :]  # (|Q|, n_probes)

    def probe_score(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            em = _arrow_list_to_f64(batch.column(1))
            sig = _lsh_sig_bits(_seq_fold_dots(em, planes))
            e_norm = np.sqrt(_seq_fold_sq_norm(em))
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                mask = np.isin(sig, probe_sets[qi]) & (ids != qid)
                if not mask.any():
                    continue
                sn = e_norm[mask]
                # candidate-only zero-norm guard: the JVM form's
                # cosine is evaluated after the bucket join, so only
                # a CANDIDATE zero norm raises (ANSI DIVIDE_BY_ZERO)
                if q_norm[qi] == 0.0 or np.any(sn == 0.0):
                    raise ArithmeticError(
                        "zero-norm embedding among probe candidates: "
                        "cosine is x/0 — the JVM fold raises "
                        "DIVIDE_BY_ZERO here (ANSI); the vectorized "
                        "form refuses identically"
                    )
                denom = q_norm[qi] * sn
                if np.any(denom == 0.0):
                    raise ArithmeticError(
                        "zero denominator q_norm*e_norm (subnormal "
                        "underflow): the JVM raises DIVIDE_BY_ZERO "
                        "here (ANSI); refusing identically"
                    )
                sids = ids[mask]
                with np.errstate(over="ignore"):
                    sscore = (
                        _seq_fold_dots(em[mask], qm[qi : qi + 1])[:, 0]
                        / denom
                    )
                # local top-k under the window's total order: score
                # desc with NaN FIRST (Spark sorts NaN above every
                # number), n_id asc — np.lexsort would put -NaN last,
                # so NaN keys map to -inf explicitly
                key = np.where(np.isnan(sscore), -np.inf, -sscore)
                order = np.lexsort((sids, key))[:TOP_K]
                out_q.extend([qid] * len(order))
                out_n.extend(sids[order])
                out_s.extend(sscore[order])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.asarray(out_q, dtype=np.int64)),
                    pa.array(np.asarray(out_n, dtype=np.int64)),
                    pa.array(np.asarray(out_s, dtype=np.float64)),
                ],
                names=["q_id", "n_id", "score"],
            )

    local = e.select("vec_id", "embedding").mapInArrow(
        probe_score, schema="q_id long, n_id long, score double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return local.select(
        "q_id", "n_id", "score", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= TOP_K)


def _multiprobe_catalyst(
    spark: SparkSession, sf_dir: str, radius: int = 1
) -> DataFrame:
    """The pre-r16 registered body — interpreted-HOF signatures +
    broadcast probe join + per-pair Catalyst-fold cosine — kept
    PRIVATE as the bit-identity witness for the vectorized
    ``_multiprobe_frame`` (the ``_similarity_topk_catalyst`` pattern):
    never registered, never benched; retired from the query path for
    the per-candidate interpreted-fold ceiling (candidates ≈14% of
    the corpus per query at radius 2)."""
    e = table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id", "embedding", _signature(F.col("embedding"), ANN_PLANES).alias("sig")
    )
    q = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(
            F.array(
                F.col("sig"),
                *[
                    F.col("sig").bitwiseXOR(F.lit(m)).alias(f"p{k}")
                    for k, m in enumerate(_probe_masks(radius))
                ],
            )
        ).alias("probe_sig"),
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("sig") == F.col("probe_sig")) & (F.col("vec_id") != F.col("q_id")),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        cand.select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            cosine(F.col("q_emb"), F.col("embedding")).alias("score"),
        )
        .distinct()
        .select("q_id", "n_id", "score", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register("similarity_lsh_multiprobe", oracle=_multiprobe_oracle())
def similarity_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: each query also probes the buckets at Hamming
    distance 1 (one flipped hyperplane bit) — the standard recall
    recovery for sign-LSH without growing the index. Probe set =
    1 + n_planes buckets; candidates stay a tiny corpus fraction."""
    return _multiprobe_frame(spark, sf_dir, radius=1)


WIDE_PROBE_RADIUS = 2  # Hamming ≤ 2 probes: 1 + 8 + 28 = 37 buckets


@register(
    "similarity_lsh_multiprobe_wide",
    oracle=_multiprobe_sql(WIDE_PROBE_RADIUS),
)
def similarity_lsh_multiprobe_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wide multi-probe LSH (VERDICT r11 item 4 — acting on the
    measured low LSH recall): probes ALL buckets within Hamming
    distance 2 of the query signature (1 + 8 + C(8,2) = 37 of 256
    buckets, ~14% of a uniform corpus as candidates) with the same
    exact-cosine rerank. Its candidate set is a strict superset of
    lsh_multiprobe's, so measured recall is structurally ≥; on this
    corpus it is strictly greater — driver-hash-checked as the
    'lsh_multiprobe_wide' method row of similarity_recall, and pinned
    strictly above lsh_multiprobe's by the recall test. Built r12,
    registered at the r13 rotation (VERDICT r12 item 1); the oracle
    is the same _multiprobe_sql(radius=2) string the recall audit's
    method block embeds, so the standalone check and the recall row
    validate ONE construction."""
    return _multiprobe_frame(spark, sf_dir, radius=WIDE_PROBE_RADIUS)


def _ivf_oracle() -> str:
    """DuckDB replay of the IVF pipeline: same deterministic centroid
    rule (vec_id % 53 == 0, capped at the IVF_MAX_CELLS smallest
    vec_ids), same argmin assignment (ties → cell_id), same nprobe=2
    probe set, same exact rerank. The dot products are the shared
    left-fold, so scores hash-match bit-for-bit."""
    return f"""
    WITH cents AS (
      SELECT vec_id AS cell_id, embedding AS cent
      FROM embeddings WHERE vec_id % 53 = 0
      ORDER BY vec_id LIMIT {IVF_MAX_CELLS}
    ), assigned AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY -({_cos_sql('e.embedding', 'c.cent')}) ASC, c.cell_id
               ) AS rn
        FROM embeddings e CROSS JOIN cents c
      ) WHERE rn = 1
    ), probes AS (
      SELECT q_id, q_emb, cell_id FROM (
        SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cell_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY -({_cos_sql('q.embedding', 'c.cent')}) ASC, c.cell_id
               ) AS rn
        FROM embeddings q CROSS JOIN cents c
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= 2
    ), cand AS (
      SELECT p.q_id, p.q_emb, a.vec_id AS n_id, a.embedding
      FROM probes p JOIN assigned a
        ON a.cell_id = p.cell_id AND a.vec_id <> p.q_id
    ), ranked AS (
      SELECT q_id, n_id,
             {_cos_sql('q_emb', 'embedding')} AS score,
             ROW_NUMBER() OVER (
               PARTITION BY q_id
               ORDER BY {_cos_sql('q_emb', 'embedding')} DESC, n_id
             ) AS rnk
      FROM cand
    )
    SELECT q_id, n_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


@register("similarity_ivf", oracle=_ivf_oracle())
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: coarse quantizer + probed cells.

    Centroids: deterministic sample of the corpus (vec_id % 53 == 0 —
    a real build would k-means these; the pipeline shape is identical)
    CAPPED at a fixed budget of IVF_MAX_CELLS (the cap takes the
    smallest sampled vec_ids — deterministic and replayable in SQL).
    Each corpus vector is assigned to its nearest centroid (one
    broadcast pass); a query probes its ``nprobe`` closest cells and
    exact-reranks only those cells' members.

    The cap is what makes this scale-safe (VERDICT r04 item 4): the
    raw 1/53 sampling tied centroid count — and therefore the
    broadcast size and per-vector argmin cost — to corpus size
    (measured 8.4× at the 10× probe). With a fixed budget both joins
    stay broadcast at any corpus size, same as the trained-quantizer
    path. similarity_ivf_kmeans remains the production path (k-means
    centroids give far better cell balance than an id-sample); this
    variant keeps the sampled-quantizer pipeline shape with a fully-
    replayable oracle.

    At 100 TB: partition/cluster the corpus BY cell id so a probe is a
    partition-pruned read of nprobe/ncells of the data — the classic
    IVF trade of recall for a bounded scan fraction.
    """
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    # norms are computed ONCE per vector BEFORE any join: cosine()
    # inline would re-derive both operands' norms at every pair, so
    # the K-way broadcast join would evaluate norm(embedding) K times
    # per vector (2/3 of the assign stage's arithmetic for nothing).
    # Same IEEE values — the per-pair math is now one dot + a divide
    # against the precomputed factors.
    en = e.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("n_e"),
    )
    cents = (
        en.filter(F.col("vec_id") % 53 == 0)
        # fixed centroid budget: global ordered take of the smallest
        # sampled ids — a TakeOrderedAndProject over ≤ N/53 rows, tiny
        .orderBy("vec_id")
        .limit(IVF_MAX_CELLS)
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").alias("cent"),
            F.col("n_e").alias("n_c"),
        )
    )
    # assign: nearest centroid per corpus vector — the vectorized
    # Arrow/numpy argmin pass (r15 optimization round; design note at
    # _spark_argmin above). NOT a row_number window (shuffles the
    # full N×K cross product — measured 448× wall at the 100× probe),
    # and no longer the exploded struct-min aggregate (SortAggregate
    # over N×K embedding-carrying rows + interpreted per-pair HOF
    # dots — measured 179.7 s / 108× at the 10× probe). The centroid
    # set is a bounded model artifact (≤ IVF_MAX_CELLS rows by the
    # budget above), so collecting it is the same move as the Lloyd
    # centroids / PQ codebook; the assignment itself is identical —
    # same IEEE left-fold dots against the same collected n_c norms,
    # same (dist asc, cell_id asc) tie-break.
    assigned = _assign_cells_vectorized(e, cents.collect())
    # queries probe their 2 nearest cells
    nprobe = 2
    q = en.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("n_e").alias("n_q"),
    )
    q_cos = dot(F.col("q_emb"), F.col("cent")) / (F.col("n_q") * F.col("n_c"))
    w_probe = Window.partitionBy("q_id").orderBy(F.col("qdist").asc(), F.col("cell_id"))
    probes = (
        q.join(F.broadcast(cents))
        .select("q_id", "q_emb", "n_q", "cell_id", (-q_cos).alias("qdist"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_emb", "n_q", "cell_id")
    )
    cand = probes.join(assigned, "cell_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
    rerank_cos = dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("n_q") * F.col("n_e")
    )
    w_rank = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        cand.select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            rerank_cos.alias("score"),
        )
        .select("q_id", "n_id", "score", F.row_number().over(w_rank).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


# Planted near-dup augmentation for dedup_embedding_cosine: the raw
# synthetic corpus contains NO pair sharing an LSH bucket at cosine
# ≥ 0.9, so through round 6 the key passed VACUOUSLY (0 rows in both
# engines — hash-green without ever exercising the join predicate;
# VERDICT r6 "What's wrong" #1). The query therefore appends, for
# the first N_PLANT base vectors, two derived near-duplicates
# (mirrored verbatim in the oracle):
#   * vec_id + 1_000_000 — the vector scaled by 1.25: same direction,
#     so the sign-LSH signature is IDENTICAL by construction and
#     cosine is exactly 1.0 up to fold rounding → guaranteed ≥3
#     positive pairs at any SF.
#   * vec_id + 2_000_000 — dimension 0 zeroed: a genuinely different
#     direction (cosine ≈ 0.99 at DIM=64), landing in the same bucket
#     for most vectors → non-trivial cosine values flow through the
#     hash compare at full double precision.
# The plant is a constant 2·N_PLANT-row augmentation — nothing about
# the corpus-scale plan changes.
N_PLANT = 3
# Self-join skew guard (r7, same pattern as minhash/simhash): a sig
# bucket larger than this is degenerate for the SELF-join (at 10⁹
# vectors even an honest 16-bit bucket averages N/65536 members) and
# is evicted before the join; mirrored in the oracle. Test-SF buckets
# hold a handful of vectors (plants add ≤3), so no result change.
EMB_BUCKET_CAP = 200


def _embedding_dedup_oracle() -> str:
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
    ), planted AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(embedding, x -> x * 1.25) AS embedding
      FROM base WHERE vec_id < {N_PLANT}
      UNION ALL
      SELECT vec_id + 2000000 AS vec_id,
             list_transform(generate_series(1, {DIM}),
               i -> CASE WHEN i = 1 THEN 0.0 ELSE embedding[i] END) AS embedding
      FROM base WHERE vec_id < {N_PLANT}
    ), corpus0 AS (
      SELECT * FROM base UNION ALL SELECT * FROM planted
    ), corpus1 AS (
      SELECT vec_id, embedding, {_sig_sql('embedding')} AS sig FROM corpus0
    ), corpus AS (
      SELECT vec_id, embedding, sig FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY sig) AS bucket_n FROM corpus1
      ) WHERE bucket_n <= {EMB_BUCKET_CAP}
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM corpus a JOIN corpus b
      ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.9
    """


@register("dedup_embedding_cosine", oracle=_embedding_dedup_oracle())
def dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """Embedding near-dup: pairs in the same LSH bucket with cosine
    ≥ 0.9. Bucket self-join instead of all-pairs — identical shape to
    dedup_minhash but in vector space.

    Round 7: the scan is augmented with planted near-duplicates (see
    N_PLANT above) so the bucket-join + cosine predicate is verified
    on TRUE POSITIVES, not just on the empty set.

    ``checkpoint=True`` (the registered form) persists the signed
    vectors for the self-join's two sides, eagerly materializes the
    BOUNDED match set via localCheckpoint, and releases the cache in
    a finally (VERDICT r13 item 3 — the persist-leak class; the
    incremental_embedding_matches pattern). False = the lazy
    plan-audit form with nothing persisted."""
    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    seed = base.filter(F.col("vec_id") < N_PLANT)
    scaled = seed.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.25)).alias("embedding"),
    )
    zeroed = seed.select(
        (F.col("vec_id") + F.lit(2000000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == F.lit(0), F.lit(0.0)).otherwise(x),
        ).alias("embedding"),
    )
    e = (
        base.unionAll(scaled)
        .unionAll(zeroed)
        .select("vec_id", "embedding", _signature(F.col("embedding")).alias("sig"))
    )
    # evict degenerate sig buckets before the self-join (see
    # EMB_BUCKET_CAP); the window count shuffles on the same key the
    # join uses, so the guard costs no extra repartitioning
    w_bucket = Window.partitionBy("sig")
    e = (
        e.withColumn("bucket_n", F.count(F.lit(1)).over(w_bucket))
        .filter(F.col("bucket_n") <= EMB_BUCKET_CAP)
        .drop("bucket_n")
    )
    if checkpoint:
        e = e.persist()  # self-join: hash each vector once
        # Serialize the cache build before the self-join fan-out (r15
        # optimization round; the minhash_pairs pattern) — the raced
        # work here is the sign-LSH signature + bucket-cap window.
        # Measured same-build at the 10x probe: 5.06 s -> 4.18 s.
        # (The incremental sibling incremental_embedding_matches
        # deliberately does NOT take this: its A/B at 10x measured
        # the extra pass as a net LOSS, 2.5 s -> 3.1 s — its n/p
        # fan-out races less work than one full extra corpus pass.)
        e.count()
    a, b = e.alias("a"), e.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
    )
    if not checkpoint:
        return out
    try:
        return out.localCheckpoint(eager=True)
    finally:
        e.unpersist()


def dedup_embedding_cosine_lazy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_embedding_cosine's exact expression tree minus the eager
    bounded checkpoint — the plan-audit form (Scan ExistingRDD
    blindness)."""
    return dedup_embedding_cosine(spark, sf_dir, checkpoint=False)


# Cross-snapshot embedding near-dup (r12 core — registration banked
# for r13): the third modality of the incremental-dedup family
# (exact digests r11, minhash shingles r11, embedding cosine here).
# New-side plants are DERIVED in both engines (scaled copies of the
# first EMB_INC_PLANT_N prior vectors (vec_id < 4, all in the prior
# split under the %10 predicate) — same direction ⇒ identical
# sign-LSH signature by construction, cosine exactly 1.0 up to fold
# rounding), so the match class is deterministic at every SF; the
# natural new split provides the novel/absent class (the raw corpus
# has no cross-pair at cosine ≥ 0.9 — the dedup_embedding_cosine
# vacuity lesson).
EMB_INC_PLANT_N = 4


def _inc_embedding_oracle() -> str:
    from kawa_spark.queries.llm_dedup import INC_PRIOR_MOD

    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
    ), prior0 AS (
      SELECT vec_id, embedding FROM base WHERE vec_id % 10 < {INC_PRIOR_MOD}
    ), new0 AS (
      SELECT vec_id, embedding FROM base WHERE vec_id % 10 >= {INC_PRIOR_MOD}
      UNION ALL
      SELECT vec_id + 3000000 AS vec_id,
             list_transform(embedding, x -> x * 1.25) AS embedding
      FROM prior0 WHERE vec_id < {EMB_INC_PLANT_N}
    ), corpus0 AS (
      SELECT vec_id, 'p' AS side, embedding FROM prior0
      UNION ALL
      SELECT vec_id, 'n' AS side, embedding FROM new0
    ), corpus1 AS (
      SELECT vec_id, side, embedding, {_sig_sql('embedding')} AS sig
      FROM corpus0
    ), corpus AS (
      SELECT vec_id, side, embedding, sig FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY sig) AS bucket_n FROM corpus1
      ) WHERE bucket_n <= {EMB_BUCKET_CAP}
    )
    SELECT n.vec_id AS vec_id, p.vec_id AS prior_id,
           {_cos_sql('n.embedding', 'p.embedding')} AS cos_sim
    FROM corpus n JOIN corpus p
      ON n.sig = p.sig AND n.side = 'n' AND p.side = 'p'
    WHERE {_cos_sql('n.embedding', 'p.embedding')} >= 0.9
    """


def embedding_sigs(tagged: DataFrame, persist: bool = True) -> DataFrame:
    """(vec_id, side, embedding) → + the 16-bit sign-LSH sig — the
    map-side stage of the cross-snapshot embedding matcher, split out
    (the minhash_signatures discipline) so a streaming twin can
    compute it ON the embedding stream (persist=False: streaming
    DataFrames cannot persist) and drain it; the batch core persists
    because both join sides read it."""
    e = tagged.select(
        "vec_id", "side", "embedding", _signature(F.col("embedding")).alias("sig")
    )
    return e.persist() if persist else e


def incremental_embedding_from_sigs(e: DataFrame) -> DataFrame:
    """The bucket-cap / new×prior join / cosine-verify half over an
    ALREADY-COMPUTED side-tagged sig table — the
    incremental_minhash_from_sigs seam for the embedding modality;
    composition with a drained stream is pinned by
    tests/test_embedding_dedup.py
    ::test_embedding_sig_core_composes_with_drained_stream."""
    w_bucket = Window.partitionBy("sig")
    e = (
        e.withColumn("bucket_n", F.count(F.lit(1)).over(w_bucket))
        .filter(F.col("bucket_n") <= EMB_BUCKET_CAP)
        .drop("bucket_n")
    )
    n = e.filter(F.col("side") == "n").select(
        "vec_id", F.col("embedding").alias("n_emb"), "sig"
    )
    p = e.filter(F.col("side") == "p").select(
        F.col("vec_id").alias("prior_id"),
        F.col("embedding").alias("p_emb"),
        "sig",
    )
    return (
        n.join(p, "sig")
        .select(
            "vec_id",
            "prior_id",
            cosine(F.col("n_emb"), F.col("p_emb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
    )


def incremental_embedding_matches(
    prior: DataFrame, newb: DataFrame, checkpoint: bool = True
) -> DataFrame:
    """Today's embedding batch bucket-joined against the PRIOR
    corpus's sign-LSH buckets and verified with exact cosine ≥ 0.9 —
    dedup_embedding_cosine's self-join replaced by the new×prior
    cross-snapshot form (the dedup_incremental_minhash shape in
    vector space). Combined-population EMB_BUCKET_CAP guard, output
    (vec_id, prior_id, cos_sim); novel vectors are absent.

    ``checkpoint=True`` (the registered form) materializes the
    BOUNDED match set eagerly and releases the corpus-sized sig
    cache in a finally (code review r13, twice: the registry-sweep
    cache-leak class, AND the leak must not recur on the error
    path). ``checkpoint=False`` returns the LAZY expression tree
    with nothing persisted — the plan-audit form, since an eager
    localCheckpoint truncates lineage to a Scan ExistingRDD that
    blinds audit_plan (code review r13 pass 2).

    Scale: a production run persists the prior side's (vec_id, sig)
    table bucketed by sig with the snapshot (the compact-state
    discipline of the other two incremental modalities) so only the
    day's batch is hashed; candidates exist only inside shared
    capped buckets — never quadratic. Property test:
    tests/test_embedding_dedup.py drives it against a pure-Python
    left-fold cosine + signature reference on random vector sets."""
    docs = prior.select(
        "vec_id", F.lit("p").alias("side"), "embedding"
    ).unionByName(newb.select("vec_id", F.lit("n").alias("side"), "embedding"))
    e = embedding_sigs(docs, persist=checkpoint)
    out = incremental_embedding_from_sigs(e)
    if not checkpoint:
        return out
    try:
        return out.localCheckpoint(eager=True)
    finally:
        e.unpersist()


def _inc_embedding_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The registered key's (prior, newb) construction — shared by
    the registered binding and its lazy plan-audit twin below."""
    from kawa_spark.queries.llm_dedup import is_prior_doc

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    prior = base.filter(is_prior_doc(F.col("vec_id")))
    plants = prior.filter(F.col("vec_id") < EMB_INC_PLANT_N).select(
        (F.col("vec_id") + F.lit(3000000)).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.25)).alias("embedding"),
    )
    newb = base.filter(~is_prior_doc(F.col("vec_id"))).unionByName(plants)
    return prior, newb


@register("dedup_incremental_embedding", oracle=_inc_embedding_oracle())
def dedup_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot embedding near-dup — the THIRD modality of the
    incremental-dedup family (exact digests, minhash shingles,
    embedding cosine), built r12 and registered at the r13 rotation
    (VERDICT r12 item 1): modulo snapshot split on vec_id (the shared
    is_prior_doc predicate), derived scaled re-embed plants on the
    new side, then the new×prior sign-LSH bucket join with exact
    left-fold cosine ≥ 0.9 verify (incremental_embedding_matches —
    combined-population EMB_BUCKET_CAP, never quadratic). Oracle:
    _inc_embedding_oracle."""
    prior, newb = _inc_embedding_inputs(spark, sf_dir)
    return incremental_embedding_matches(prior, newb)


def dedup_incremental_embedding_lazy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The registered key's exact expression tree WITHOUT the eager
    bounded checkpoint (and with nothing persisted) — what the plan
    audits read, since the checkpoint collapses the executed plan to
    a Scan ExistingRDD (code review r13 pass 2)."""
    prior, newb = _inc_embedding_inputs(spark, sf_dir)
    return incremental_embedding_matches(prior, newb, checkpoint=False)


@register(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label, unnest(list_transform(generate_series(1, len(embedding)),
        i -> {'dim': i - 1,
              'qv': CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
                         AS BIGINT)})) AS u
      FROM embeddings
    )
    SELECT label, CAST(u.dim AS INT) AS dim,
      CAST(CAST(SUM(u.qv) AS DOUBLE) / COUNT(*) / 1000000 AS DOUBLE)
        AS centroid,
      COUNT(*) AS n_vecs
    FROM ex
    GROUP BY label, u.dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, dimension-wise — the building block for
    IVF cell training / cluster summaries. posexplode shards the
    work by (label, dim): the shuffle key has |labels|×|dims|
    cardinality, so a 10⁹-vector corpus still aggregates without any
    hot key. Float sums are order-dependent, so each component is
    quantized to exact micro-units (round half away from zero in
    both engines) and summed as longs — the centroid hash-matches
    the oracle bit-for-bit."""
    e = table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.round(F.col("v").cast("double") * 1000000, 0)
        .cast("long")
        .alias("qv"),
    )
    return ex.groupBy("label", "dim").agg(
        (
            F.sum("qv").cast("double") / F.count(F.lit(1)) / F.lit(1000000)
        )
        .cast("double")
        .alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


K_CLUSTERS = 8


def _d2_sql_dim(a: str, c: str, ndim: int) -> str:
    """Squared L2 distance as the same left fold both engines run, at
    an arbitrary dimensionality — the PQ sub-vector legs fold over
    PQ_SUBDIM elements, everything else over the full DIM."""
    return f"""list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(generate_series(1, {ndim}),
          i -> (CAST({a}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))
             * (CAST({a}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE)))),
      (acc, x) -> acc + x)"""


def _d2_sql(a: str, c: str) -> str:
    """The full-DIM form — delegates to ``_d2_sql_dim`` (the emitted
    SQL is byte-identical to the historical inline template, so every
    registered oracle string is unchanged)."""
    return _d2_sql_dim(a, c, DIM)


def _kmeans_oracle() -> str:
    d2_seed = _d2_sql("e.embedding", "s.emb")
    d2_cent = _d2_sql("e.embedding", "c.emb")
    return f"""
    WITH seeds AS (
      SELECT embedding AS emb,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               - 1 AS cid
      FROM embeddings
      QUALIFY cid < {K_CLUSTERS}
    ), a1 AS (
      SELECT e.vec_id, e.embedding, s.cid, {d2_seed} AS d2,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {d2_seed}, s.cid) AS rn
      FROM embeddings e CROSS JOIN seeds s
    ), best1 AS (
      SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1
    ), ex1 AS (
      SELECT cid, unnest(list_transform(generate_series(1, {DIM}),
        i -> {{'dim': i,
              'qv': CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
                         AS BIGINT)}})) AS u
      FROM best1
    ), cm AS (
      SELECT cid, u.dim AS dim,
             CAST(CAST(SUM(u.qv) AS DOUBLE) / COUNT(*) / 1000000 AS DOUBLE)
               AS mv
      FROM ex1 GROUP BY cid, u.dim
    ), cent1 AS (
      SELECT cid, list(mv ORDER BY dim) AS emb FROM cm GROUP BY cid
    ), a2 AS (
      SELECT e.vec_id, c.cid, {d2_cent} AS d2,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {d2_cent}, c.cid) AS rn
      FROM embeddings e CROSS JOIN cent1 c
    )
    SELECT vec_id, cid AS cluster_id, d2 AS dist2 FROM a2 WHERE rn = 1
    """


def _d2_col(a: Column, c: Column) -> Column:
    """Squared L2 distance — the Column twin of ``_d2_sql``.
    HOF fold, not an unrolled chain — see ``dot`` for why."""
    return F.aggregate(
        F.zip_with(
            a,
            c,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lloyd_assign(e: DataFrame, cents: "DataFrame | list") -> DataFrame:
    """Argmin-d2 centroid assignment via the vectorized Arrow/numpy
    pass (r15 optimization round; design note at _spark_argmin):
    the K centroid rows are collected (bounded — K_CLUSTERS, the same
    model-artifact class as _lloyd_cent1_cached's own collect) and
    each corpus batch computes all K squared-L2 distances at C speed
    with cumsum left-fold reductions, bit-identical to ``_d2_col``'s
    Catalyst fold: (x−y) is one IEEE sub evaluated identically for
    both factors of the square, products are single ops, and the
    (d2 asc, cid asc) tie-break is np.argmin's first minimum over
    cid-ascending columns (Spark-total-order NaN handling in
    _spark_argmin). Replaces the exploded struct-min aggregate —
    min(struct) has a non-mutable buffer, so it planned as a
    SortAggregate that materialized and SORTED all K·N candidate
    rows (each carrying the embedding array) before reducing to N,
    with each of the K·N distances an interpreted HOF fold. Retained
    witness: ``_lloyd_assign_structmin`` below
    (tests/test_argmin_vectorized.py pins row identity).
    The embedding stays on the row for downstream stages, and the
    vector's sequential-fold L2 norm ``n_e`` rides along for free
    (same bits as ``F.sqrt(dot(e, e))``) so rerank stages divide by
    precomputed factors instead of re-deriving both norms per pair
    (the similarity_ivf norm rule — 3 interpreted HOF dots per
    candidate pair down to 1)."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(e.sparkSession)
    emb_t = e.schema["embedding"].dataType.simpleString()
    schema = f"vec_id long, cid int, d2 double, embedding {emb_t}, n_e double"
    # cents: DataFrame (collected here) or pre-collected rows — the
    # registered warm paths pass _lloyd_cent1_cached_rows' list to
    # skip a createDataFrame → re-collect round-trip
    cent_rows = cents if isinstance(cents, list) else cents.collect()
    cent_rows = sorted(cent_rows, key=lambda r: r["cid"])
    if not cent_rows:
        return e.sparkSession.createDataFrame([], schema)
    cm = np.array(
        [np.asarray(r["emb"], dtype=np.float64) for r in cent_rows]
    )
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)

    def assign(batches):
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            em = _arrow_list_to_f64(batch.column(1))
            dists = _seq_fold_d2(em, cm)
            best = _spark_argmin(dists)
            # mapInArrow + explicit pa.array (NOT pandas): pandas
            # conversion nulls NaN doubles — the winning d2 of a
            # NaN-carrying vector must stay NaN, as struct-min
            # emitted it (pinned by test_argmin_vectorized).
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pa.array(cids[best].astype(np.int32), type=pa.int32()),
                    pa.array(
                        dists[np.arange(batch.num_rows), best],
                        type=pa.float64(),
                    ),
                    batch.column(1),
                    pa.array(
                        np.sqrt(_seq_fold_sq_norm(em)),
                        type=pa.float64(),
                    ),
                ],
                names=["vec_id", "cid", "d2", "embedding", "n_e"],
            )

    return e.select("vec_id", "embedding").mapInArrow(assign, schema=schema)


def _lloyd_assign_structmin(e: DataFrame, cents: DataFrame) -> DataFrame:
    """The pre-r15 Lloyd assignment — exploded broadcast join +
    lexicographic struct-min aggregate — kept PRIVATE as the
    bit-identity witness for ``_lloyd_assign`` (the
    ``_similarity_topk_catalyst`` pattern, ADVICE r14): never a query
    path; retired for the SortAggregate-over-K·N-embedding-rows +
    interpreted-fold cost (22.9× at the 10× probe for K=8)."""
    scored = e.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        _d2_col(F.col("embedding"), F.col("emb")).alias("d2"),
    )
    return scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cid", "embedding")).alias("b")
    ).select(
        "vec_id",
        F.col("b.cid").alias("cid"),
        F.col("b.d2").alias("d2"),
        F.col("b.embedding").alias("embedding"),
    )


def _lloyd_seeds(e: DataFrame) -> DataFrame:
    """The K seed vectors minimal in md5(vec_id) order.

    orderBy+limit compiles to TakeOrderedAndProject (per-partition
    heaps, driver merges K rows) — NOT a full-corpus single-partition
    sort window. The row_number that assigns cids then runs over K
    rows only."""
    topk = (
        e.select(
            "vec_id",
            "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(K_CLUSTERS)
    )
    w_seed = Window.orderBy("h", "vec_id")
    return topk.select(
        (F.row_number().over(w_seed) - 1).alias("cid"),
        F.col("embedding").alias("emb"),
    )


def _lloyd_cent1(e: DataFrame) -> DataFrame:
    """One Lloyd's round: seed-assign the corpus, then the quantized
    exact mean per cluster → (cid, emb). Micro-unit integer sums make
    the mean order-independent, so DuckDB replays it bit-for-bit."""
    best1 = _lloyd_assign(e, _lloyd_seeds(e))
    ex1 = best1.select(
        "cid", F.posexplode("embedding").alias("dim0", "v")
    ).select(
        "cid",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 1000000, 0)
        .cast("long")
        .alias("qv"),
    )
    cm = ex1.groupBy("cid", "dim").agg(
        (F.sum("qv").cast("double") / F.count(F.lit(1)) / F.lit(1000000))
        .cast("double")
        .alias("mv")
    )
    return cm.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mv"))),
            lambda s: s.getField("mv"),
        ).alias("emb")
    )


# Trained-model cache: (sf_dir) → the K collected centroid rows +
# schema. The Lloyd training round is the expensive half of both
# kmeans_lloyd and similarity_ivf_kmeans; its OUTPUT is K=8 rows — a
# model artifact, not data — so collecting and replaying it is the
# same move as broadcasting trained weights. Values are exact across
# the round-trip (IEEE doubles collect/rebuild bit-identically), so
# oracle hashes are unchanged. Keyed by (sf_dir, input fingerprint):
# the fingerprint (file path/mtime/size walk of the embeddings
# parquet) invalidates the entry if the data under sf_dir is
# rewritten within a process lifetime — a bare sf_dir key silently
# replayed a stale model in that case (ADVICE r6).
_CENT1_CACHE: dict[tuple, tuple[list, object]] = {}


def _embeddings_fingerprint(sf_dir: str) -> tuple:
    """(relpath, mtime_ns, size) for every file under the embeddings
    input — a local-fs stat walk, no Spark job. Parquet writers
    replace files rather than appending in place, so any rewrite
    moves at least one (mtime, size)."""
    import os

    root = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isfile(root):
        st = os.stat(root)
        return ((root, st.st_mtime_ns, st.st_size),)
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out.append((os.path.relpath(p, root), st.st_mtime_ns, st.st_size))
    return tuple(out)


def _lloyd_cent1_cached_rows(e: DataFrame, sf_dir: str) -> tuple:
    """The cached (rows, schema) pair itself — callers that only need
    the K centroid ROWS (the vectorized ``_lloyd_assign``) read them
    here without a createDataFrame → re-collect round-trip (one
    driver job per invocation saved; r15 optimization round)."""
    key = (sf_dir, _embeddings_fingerprint(sf_dir))
    hit = _CENT1_CACHE.get(key)
    if hit is None:
        trained = _lloyd_cent1(e)
        hit = (trained.collect(), trained.schema)
        _CENT1_CACHE[key] = hit
    return hit


def _lloyd_cent1_cached(e: DataFrame, sf_dir: str) -> DataFrame:
    rows, schema = _lloyd_cent1_cached_rows(e, sf_dir)
    return e.sparkSession.createDataFrame(rows, schema)


def _cache_evict(sf_dir: str) -> None:
    """Drop every cached model for ``sf_dir`` (tests / bench cold
    runs) — the Lloyd centroids and the PQ codebook share the evict
    hook so a cold run retrains both."""
    for k in [k for k in _CENT1_CACHE if k[0] == sf_dir]:
        del _CENT1_CACHE[k]
    for k in [k for k in _PQ_CB_CACHE if k[0] == sf_dir]:
        del _PQ_CB_CACHE[k]


@register("kmeans_lloyd", oracle=_kmeans_oracle())
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round Lloyd's k-means over the embedding corpus —
    the iterative-algorithm template: every round is
    (broadcast centroids → argmin assign → quantized exact mean),
    entirely DataFrame ops with the driver doing control flow only.

    Determinism, the whole trick: seeds are the K vectors minimal in
    md5(vec_id) order; distances are the identical left fold in both
    engines; recomputed centroids are micro-unit-quantized exact
    means (order-independent integer sums). So even this ITERATIVE
    pipeline is value-hash-verified against DuckDB — rare for
    clustering. Scale: assignment is a broadcast nested loop against
    K=8 centroids (K rows — always broadcastable); the mean is the
    (cluster, dim)-sharded aggregate from embedding_centroids."""
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    rows, _ = _lloyd_cent1_cached_rows(e, sf_dir)
    return _lloyd_assign(e, rows).select(
        "vec_id",
        F.col("cid").alias("cluster_id"),
        F.col("d2").alias("dist2"),
    )


def _ivf_kmeans_oracle() -> str:
    return _ivf_kmeans_sql(2)


def _ivf_kmeans_sql(nprobe: int) -> str:
    """DuckDB replay of the trained-IVF pipeline at any probe width:
    the kmeans CTE chain (seeds → assign → quantized mean → cent1)
    verbatim from ``_kmeans_oracle``, then L2 cell assignment /
    nprobe-cell probe / exact cosine rerank. Every stage
    deterministic, so the float scores hash-match bit-for-bit. The
    registered key binds nprobe=2 (byte-identical to the r5 string —
    pinned by test_nprobe2_oracle_is_the_registered_form); the banked
    wide core binds IVF_WIDE_NPROBE."""
    d2_seed = _d2_sql("e.embedding", "s.emb")
    d2_cent = _d2_sql("e.embedding", "c.emb")
    d2_q = _d2_sql("q.embedding", "c.emb")
    cos = _cos_sql("q_emb", "embedding")
    return f"""
    WITH seeds AS (
      SELECT embedding AS emb,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               - 1 AS cid
      FROM embeddings
      QUALIFY cid < {K_CLUSTERS}
    ), a1 AS (
      SELECT e.vec_id, e.embedding, s.cid, {d2_seed} AS d2,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {d2_seed}, s.cid) AS rn
      FROM embeddings e CROSS JOIN seeds s
    ), best1 AS (
      SELECT vec_id, embedding, cid FROM a1 WHERE rn = 1
    ), ex1 AS (
      SELECT cid, unnest(list_transform(generate_series(1, {DIM}),
        i -> {{'dim': i,
              'qv': CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
                         AS BIGINT)}})) AS u
      FROM best1
    ), cm AS (
      SELECT cid, u.dim AS dim,
             CAST(CAST(SUM(u.qv) AS DOUBLE) / COUNT(*) / 1000000 AS DOUBLE)
               AS mv
      FROM ex1 GROUP BY cid, u.dim
    ), cent1 AS (
      SELECT cid, list(mv ORDER BY dim) AS emb FROM cm GROUP BY cid
    ), assigned AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d2_cent}, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent1 c
      ) WHERE rn = 1
    ), probes AS (
      SELECT q_id, q_emb, cid FROM (
        SELECT q.vec_id AS q_id, q.embedding AS q_emb, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {d2_q}, c.cid) AS rn
        FROM embeddings q CROSS JOIN cent1 c
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE rn <= {nprobe}
    ), cand AS (
      SELECT p.q_id, p.q_emb, a.vec_id AS n_id, a.embedding
      FROM probes p JOIN assigned a
        ON a.cid = p.cid AND a.vec_id <> p.q_id
    ), ranked AS (
      SELECT q_id, n_id, {cos} AS score,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY {cos} DESC, n_id
             ) AS rnk
      FROM cand
    )
    SELECT q_id, n_id, score, rnk FROM ranked WHERE rnk <= {TOP_K}
    """


def _ivf_kmeans_frame(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> DataFrame:
    """The trained-IVF pipeline at any probe width — the registered
    key binds nprobe=2 (unchanged expression tree: the probe cut's
    literal is the same 2); the banked wide core binds
    IVF_WIDE_NPROBE."""
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    rows, schema = _lloyd_cent1_cached_rows(e, sf_dir)
    # the probe join still needs the K-row DataFrame; the assign pass
    # takes the cached rows directly (no re-collect driver job)
    cents = spark.createDataFrame(rows, schema)
    assigned = _lloyd_assign(e, rows)
    # n_q computed ONCE per query row, on the |Q|-row side and below
    # the probe window (a CollapseProject barrier, so the fold cannot
    # be re-inlined into the per-pair rerank expression)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("n_q"),
    )
    # probe: nprobe nearest cells per query — the window runs over
    # K=8 broadcast-joined rows per query, not corpus data
    w_probe = Window.partitionBy("q_id").orderBy(F.col("qd2").asc(), F.col("cid"))
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "q_id",
            "q_emb",
            "n_q",
            "cid",
            _d2_col(F.col("q_emb"), F.col("emb")).alias("qd2"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("q_id", "q_emb", "n_q", "cid")
    )
    cand = assigned.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("q_id")
    )
    # rerank against PRECOMPUTED norms (r15 optimization round — the
    # similarity_ivf norm rule): cosine() inline re-derives BOTH
    # operands' norms at every candidate pair (3 interpreted HOF dots
    # per pair); n_e rides out of the vectorized assign for free and
    # n_q is one fold per |Q| query rows. Same IEEE values — the
    # per-pair math is one dot + a divide against the same
    # sqrt-of-self-dot factors, so scores are bit-identical and the
    # oracle is untouched.
    w_rank = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return (
        cand
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            (
                dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("n_q") * F.col("n_e"))
            ).alias("score"),
        )
        .select("q_id", "n_id", "score", F.row_number().over(w_rank).alias("rnk"))
        .filter(F.col("rnk") <= TOP_K)
    )


@register("similarity_ivf_kmeans", oracle=_ivf_kmeans_oracle())
def similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with TRAINED coarse quantizer: the cells are Lloyd's
    centroids (one quantized-exact round, shared with kmeans_lloyd)
    instead of similarity_ivf's sampled stand-ins — the real
    train/assign/probe/rerank pipeline, still value-hash-verified.

    Plan shape (the 100 TB story): cell count K is tiny by
    construction, so BOTH joins stay broadcast — centroids broadcast
    for assignment (K rows against the corpus scan, struct-min
    argmin, no sort), and the PROBES side broadcast for candidate
    selection (|Q|·nprobe rows), so the corpus is scanned, never
    shuffled on the K-value cell id (8 distinct keys would be a
    hot-key shuffle). A production build would persist `assigned`
    partitioned/clustered BY cell id so a probe is a partition-pruned
    read of nprobe/K of the data; here the train+search pipeline runs
    end-to-end in one plan. Rerank is exact cosine on probed cells
    only (~nprobe/K of the corpus per query)."""
    return _ivf_kmeans_frame(spark, sf_dir, nprobe=2)


IVF_WIDE_NPROBE = 4  # half the K=8 cells searched


@register(
    "similarity_ivf_kmeans_wide",
    oracle=_ivf_kmeans_sql(IVF_WIDE_NPROBE),
)
def similarity_ivf_kmeans_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wide-probe trained IVF (the production ANN path's recall
    lever, the nprobe knob a deployment actually turns): searches the
    IVF_WIDE_NPROBE=4 nearest cells instead of 2 — candidates go from
    ~2/8 to ~4/8 of the corpus, recall measured inside
    similarity_recall as the 'ivf_kmeans_wide' method row and pinned
    strictly above ivf_kmeans's. Still every join broadcast; the
    candidate rerank stays the linear-in-probed-cells exact leg.
    Built r12, registered at the r13 rotation (VERDICT r12 item 1);
    the oracle is the same _ivf_kmeans_sql(nprobe=4) string the
    recall audit's method block embeds."""
    return _ivf_kmeans_frame(spark, sf_dir, nprobe=IVF_WIDE_NPROBE)


@register(
    "embedding_quantize",
    oracle=f"""
    WITH stats AS (
      SELECT vec_id, embedding,
        list_reduce(list_transform(embedding,
          x -> CAST(abs(x) AS DOUBLE)),
          (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_abs
      FROM embeddings
    )
    SELECT
      vec_id,
      CAST(max_abs / 127 AS DOUBLE) AS scale,
      array_to_string(list_transform(embedding,
        x -> CAST(CASE WHEN max_abs = 0 THEN 0
                  ELSE ROUND(CAST(x AS DOUBLE) * 127 / max_abs, 0)
                  END AS TINYINT)), ',') AS q8_csv,
      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(embedding,
          x -> CAST(abs(CAST(CASE WHEN max_abs = 0 THEN 0
                    ELSE ROUND(CAST(x AS DOUBLE) * 127 / max_abs, 0)
                    END AS BIGINT)) AS BIGINT))),
        (a, b) -> a + b) AS BIGINT) AS l1_q
    FROM stats
    """,
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization — the storage/ANN-memory
    step that shrinks a vector corpus 4× (float32 → int8): per-vector
    scale = max|x|/127, q = round(x·127/max|x|).

    Pure column expressions (map-only, zero shuffles): at 100 TB this
    runs at scan speed and writes back columnar int8. The rounding is
    HALF_UP in both engines on exact doubles, and the l1 checksum of
    the quantized codes is integer math — so the whole transform,
    floats included, is value-hash-verified. Zero vectors quantize to
    zero codes with scale 0 (guarded division). The code vector is
    emitted CSV-stringified: the driver's canonicalizer cannot sort
    raw array columns (the round-1 array_map_ops lesson)."""
    e = table(spark, sf_dir, "embeddings")
    max_abs = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda a, b: F.when(b > a, b).otherwise(a),
    )
    with_stats = e.select("vec_id", "embedding", max_abs.alias("max_abs"))
    q8 = F.transform(
        "embedding",
        lambda x: F.when(F.col("max_abs") == 0, F.lit(0))
        .otherwise(F.round(x.cast("double") * 127 / F.col("max_abs"), 0))
        .cast("tinyint"),
    )
    l1_q = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.abs(
                F.when(F.col("max_abs") == 0, F.lit(0))
                .otherwise(F.round(x.cast("double") * 127 / F.col("max_abs"), 0))
                .cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return with_stats.select(
        "vec_id",
        (F.col("max_abs") / 127).cast("double").alias("scale"),
        F.array_join(
            F.transform(q8, lambda x: x.cast("string")), ","
        ).alias("q8_csv"),
        l1_q.alias("l1_q"),
    )


# ---------------------------------------------------------------------------
# ANN quality measurement: recall@k vs the exact top-k
# ---------------------------------------------------------------------------


def _recall_block_sql(method: str, approx_sql: str) -> str:
    """One method's recall table: exact top-k LEFT JOIN the method's
    answer on (q_id, n_id); hits are the matched rows. SUM→HUGEINT is
    cast back per the driver-safe-types pin."""
    return f"""
    SELECT * FROM (
      WITH exact_k AS ({registry_exact_sql()}),
      approx_k AS ({approx_sql}),
      hits AS (
        SELECT e.q_id, COUNT(e.n_id) AS n_exact, COUNT(a.n_id) AS n_hits
        FROM exact_k e LEFT JOIN approx_k a USING (q_id, n_id)
        GROUP BY e.q_id
      ), tot AS (
        SELECT CAST(SUM(n_hits) AS BIGINT) AS method_hits,
               CAST(SUM(n_exact) AS BIGINT) AS method_total
        FROM hits
      )
      SELECT '{method}' AS method, h.q_id,
             CAST(h.n_exact AS BIGINT) AS n_exact,
             CAST(h.n_hits AS BIGINT) AS n_hits,
             CAST(h.n_hits AS DOUBLE) / h.n_exact AS recall_q,
             t.method_hits, t.method_total,
             CAST(t.method_hits AS DOUBLE) / t.method_total
               AS method_recall
      FROM hits h CROSS JOIN tot t
    )"""


def registry_exact_sql() -> str:
    """The similarity_topk oracle — the exact-answer side of every
    recall block (kept as one accessor so the two can never drift)."""
    from kawa_spark.registry import ORACLES

    return ORACLES["similarity_topk"]


def _recall_oracle() -> str:
    return "\nUNION ALL\n".join(
        [
            _recall_block_sql("ivf_kmeans", _ivf_kmeans_oracle()),
            _recall_block_sql("lsh_ann", _lsh_ann_oracle()),
            _recall_block_sql("lsh_multiprobe", _multiprobe_oracle()),
            _recall_block_sql(
                "lsh_multiprobe_wide", _multiprobe_sql(WIDE_PROBE_RADIUS)
            ),
            _recall_block_sql(
                "ivf_kmeans_wide", _ivf_kmeans_sql(IVF_WIDE_NPROBE)
            ),
        ]
    )


# The r12-registered five-method list. _recall_frame is the
# method-list-parameterized core (the multiprobe-radius / ivf-nprobe
# refactor discipline); since r13 the REGISTERED similarity_recall
# binds _RECALL_METHODS + the pq_adc row (see the registration after
# similarity_pq_adc below — the PQ pipeline must be defined first),
# and the five-row prefix is pinned identical to this tuple's frame
# by tests/test_pq_adc.py::test_registered_recall_contains_five_row_core.
_RECALL_METHODS: tuple = (
    ("ivf_kmeans", similarity_ivf_kmeans),
    ("lsh_ann", similarity_lsh_ann),
    ("lsh_multiprobe", similarity_lsh_multiprobe),
    ("lsh_multiprobe_wide", similarity_lsh_multiprobe_wide),
    ("ivf_kmeans_wide", similarity_ivf_kmeans_wide),
)


def _recall_frame(
    spark: SparkSession, sf_dir: str, methods: tuple
) -> DataFrame:
    # the exact leg runs the VECTORIZED core (r13 — the recall half
    # of VERDICT r12 item 2, folded into this round's in-window
    # similarity_recall change): bit-identical to similarity_topk by
    # construction (np.cumsum sequential fold; pinned by
    # tests/test_pq_adc.py::test_vectorized_topk_bit_identical) and
    # 18× faster at the 100× probe, so the audit's dominant linear
    # leg no longer carries the measured 46×-at-100× Catalyst-fold
    # ceiling. The registered similarity_topk body itself swaps in
    # r14, riding its mandatory deferred-tier slot.
    exact = similarity_topk_vectorized(spark, sf_dir).select("q_id", "n_id")
    frames = []
    for name, fn in methods:
        a = fn(spark, sf_dir).select(
            "q_id", "n_id", F.lit(1).alias("hit")
        )
        hits = (
            exact.join(a, ["q_id", "n_id"], "left")
            .groupBy("q_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("long")
                .alias("n_hits"),
            )
        )
        tot = hits.agg(
            F.sum("n_hits").cast("long").alias("method_hits"),
            F.sum("n_exact").cast("long").alias("method_total"),
        )
        frames.append(
            hits.crossJoin(F.broadcast(tot)).select(
                F.lit(name).alias("method"),
                "q_id",
                "n_exact",
                "n_hits",
                (F.col("n_hits").cast("double") / F.col("n_exact")).alias(
                    "recall_q"
                ),
                "method_hits",
                "method_total",
                (
                    F.col("method_hits").cast("double")
                    / F.col("method_total")
                ).alias("method_recall"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: trained codebooks, ADC scan, exact rerank
# ---------------------------------------------------------------------------

PQ_M = 4                 # subspaces
PQ_SUBDIM = DIM // PQ_M  # 16 dims each
PQ_CODES = 8             # codes per subspace (a 3-bit code)
PQ_RERANK = 50           # ADC candidates reranked with exact cosine


def _pq_train_ctes() -> str:
    """The PQ training CTE chain (seeds → per-subspace slices →
    assignment → quantized means → codebook), shared VERBATIM by the
    search oracle (_pq_adc_sql) and the code-table oracle
    (_pq_codes_sql) so the two hash-checks can never validate
    different codebooks."""
    d2_seed = _d2_sql_dim("s.sub", "d.semb", PQ_SUBDIM)
    lo = f"t.m * {PQ_SUBDIM} + 1"
    hi = f"t.m * {PQ_SUBDIM} + {PQ_SUBDIM}"
    return f"""
    WITH seeds AS (
      SELECT embedding AS emb,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               - 1 AS code
      FROM embeddings
      QUALIFY code < {PQ_CODES}
    ), sseed AS (
      SELECT t.m AS m, code, emb[{lo} : {hi}] AS semb
      FROM seeds, UNNEST(generate_series(0, {PQ_M - 1})) AS t(m)
    ), subs AS (
      SELECT vec_id, t.m AS m, embedding[{lo} : {hi}] AS sub
      FROM embeddings, UNNEST(generate_series(0, {PQ_M - 1})) AS t(m)
    ), a1 AS (
      SELECT s.vec_id, s.m, s.sub, d.code,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                ORDER BY {d2_seed}, d.code) AS rn
      FROM subs s JOIN sseed d ON d.m = s.m
    ), ex AS (
      SELECT m, code, unnest(list_transform(generate_series(1, {PQ_SUBDIM}),
        i -> {{'dim': i,
              'qv': CAST(ROUND(CAST(sub[i] AS DOUBLE) * 1000000, 0)
                         AS BIGINT)}})) AS u
      FROM a1 WHERE rn = 1
    ), cm AS (
      SELECT m, code, u.dim AS dim,
             CAST(CAST(SUM(u.qv) AS DOUBLE) / COUNT(*) / 1000000 AS DOUBLE)
               AS mv
      FROM ex GROUP BY m, code, u.dim
    ), cb AS (
      SELECT m, code, list(mv ORDER BY dim) AS cemb FROM cm GROUP BY m, code
    )"""


def _pq_adc_sql() -> str:
    """DuckDB replay of the full PQ pipeline: per-subspace seed pick /
    one quantized-Lloyd training round / encode / integer
    lookup-table ADC / exact cosine rerank — every stage
    deterministic, so the float scores hash-match bit-for-bit (the
    ``_ivf_kmeans_sql`` discipline applied per subspace).

    The ADC distance is the SUM over subspaces of the per-(query,
    code) micro-unit BIGINT table entries — the textbook asymmetric
    distance decomposition, and deliberately INTEGER per subspace so
    the sum is order-independent (a float sum of four per-subspace
    doubles would depend on add order across engines)."""
    d2_cb = _d2_sql_dim("s.sub", "c.cemb", PQ_SUBDIM)
    # per-subspace query-to-code distance: q's m-th slice vs the code
    qi = f"q.embedding[c.m * {PQ_SUBDIM} + i]"
    d2_qc = f"""list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(generate_series(1, {PQ_SUBDIM}),
          i -> (CAST({qi} AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE))
             * (CAST({qi} AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE)))),
      (acc, x) -> acc + x)"""
    cos = _cos_sql("q.embedding", "e.embedding")
    return f"""{_pq_train_ctes()}, a2 AS (
      SELECT s.vec_id, s.m, c.code,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                ORDER BY {d2_cb}, c.code) AS rn
      FROM subs s JOIN cb c ON c.m = s.m
    ), dt AS (
      SELECT q.vec_id AS q_id, c.m, c.code,
             CAST(ROUND({d2_qc} * 1000000, 0) AS BIGINT) AS dq
      FROM embeddings q, cb c
      WHERE q.vec_id < {N_QUERIES}
    ), adc AS (
      SELECT d.q_id, a.vec_id AS n_id, SUM(d.dq) AS adc_q
      FROM (SELECT vec_id, m, code FROM a2 WHERE rn = 1) a
      JOIN dt d ON d.m = a.m AND d.code = a.code
      WHERE a.vec_id <> d.q_id
      GROUP BY d.q_id, a.vec_id
    ), cand AS (
      SELECT q_id, n_id FROM (
        SELECT q_id, n_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY adc_q, n_id) AS rn
        FROM adc
      ) WHERE rn <= {PQ_RERANK}
    ), rer AS (
      SELECT c.q_id, c.n_id, {cos} AS score,
             ROW_NUMBER() OVER (PARTITION BY c.q_id
                                ORDER BY {cos} DESC, c.n_id) AS rnk
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.q_id
      JOIN embeddings e ON e.vec_id = c.n_id
    )
    SELECT q_id, n_id, score, rnk FROM rer WHERE rnk <= {TOP_K}
    """


def _pq_seed_subs(e: DataFrame) -> list[tuple[int, int, list[float]]]:
    """The PQ_CODES seed vectors minimal in (md5(vec_id), vec_id)
    order — the ``_lloyd_seeds`` move — collected (PQ_CODES rows, a
    bounded control artifact) and sliced into per-subspace
    (m, code, semb) entries. float32 → Python float widening is
    exact, so the oracle's in-SQL seed pick computes the identical
    sub-vectors."""
    rows = (
        e.select(
            "vec_id",
            "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(PQ_CODES)
        .collect()
    )
    return [
        (
            m,
            code,
            [float(v) for v in r["embedding"][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]],
        )
        for code, r in enumerate(rows)
        for m in range(PQ_M)
    ]


def _one_row_cb(spark: SparkSession, entries: list[tuple]) -> DataFrame:
    """ONE row carrying a whole codebook as an array<struct> column —
    the broadcast-1-row-scalar idiom. Deliberately data, not literal
    trees: unrolling M·PQ_CODES·PQ_SUBDIM values into F.lit nodes is
    the r6 dot-unroll mistake (hundreds of expression nodes balloon
    Catalyst planning); one broadcast row keeps the plan small and
    the match map-side."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(
                "cb",
                ArrayType(
                    StructType(
                        [
                            StructField("m", IntegerType()),
                            StructField("code", IntegerType()),
                            StructField("cemb", ArrayType(DoubleType())),
                        ]
                    )
                ),
            )
        ]
    )
    return spark.createDataFrame([(entries,)], schema)


def _pq_best(m: int, sub: Column) -> Column:
    """(d2, code, cemb) of the nearest code in subspace ``m`` — an
    in-row HOF argmin over the broadcast codebook array column ``cb``.
    array_min's struct comparison is (d2, code, …) lexicographic, so
    ties break to the lower code exactly like the oracle's
    ORDER BY d2, code; cemb rides the struct and is never compared
    ((d2, code) is unique per subspace)."""
    return F.array_min(
        F.transform(
            F.filter(F.col("cb"), lambda s: s.getField("m") == F.lit(m)),
            lambda s: F.struct(
                _d2_col(sub, s.getField("cemb")).alias("d2"),
                s.getField("code").alias("code"),
                s.getField("cemb").alias("cemb"),
            ),
        )
    )


def _pq_sub(m: int) -> Column:
    return F.slice(F.col("embedding"), m * PQ_SUBDIM + 1, PQ_SUBDIM)


# Trained-codebook cache — the _CENT1_CACHE discipline (fingerprint
# key so a rewritten sf_dir can never replay a stale model).
_PQ_CB_CACHE: dict[tuple, list] = {}


def _pq_codebook_rows(e: DataFrame, sf_dir: str) -> list[tuple]:
    """Train the PQ codebook — one quantized-Lloyd round per subspace
    — and collect it (≤ M·PQ_CODES rows, a model artifact).

    Plan shape: the corpus is scanned ONCE, map-side — seed
    sub-centroids arrive as a broadcast 1-row array, the per-(m)
    argmin is an in-row HOF, and the only exchange is the quantized
    mean's (m, code, dim) rollup (≤ M·PQ_CODES·PQ_SUBDIM = 512 groups,
    partial-agg'd map-side). Cheaper than the full-kmeans assign
    (no vec_id shuffle at any volume)."""
    key = (sf_dir, _embeddings_fingerprint(sf_dir))
    hit = _PQ_CB_CACHE.get(key)
    if hit is not None:
        return hit
    spark = e.sparkSession
    seeds = _one_row_cb(spark, _pq_seed_subs(e))
    chosen = (
        e.crossJoin(F.broadcast(seeds))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            _pq_best(m, _pq_sub(m)).getField("code").alias("code"),
                            _pq_sub(m).alias("sub"),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("s")
        )
        .select("s.m", "s.code", "s.sub")
    )
    ex = chosen.select(
        "m", "code", F.posexplode("sub").alias("dim0", "v")
    ).select(
        "m",
        "code",
        (F.col("dim0") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * 1000000, 0)
        .cast("long")
        .alias("qv"),
    )
    cm = ex.groupBy("m", "code", "dim").agg(
        (F.sum("qv").cast("double") / F.count(F.lit(1)) / F.lit(1000000))
        .cast("double")
        .alias("mv")
    )
    cb = cm.groupBy("m", "code").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mv"))),
            lambda s: s.getField("mv"),
        ).alias("cemb")
    )
    rows = sorted(
        (int(r["m"]), int(r["code"]), [float(v) for v in r["cemb"]])
        for r in cb.collect()
    )
    _PQ_CB_CACHE[key] = rows
    return rows


def _pq_round_micro(x: float) -> int:
    """CAST(ROUND(x · 1e6, 0) AS BIGINT) replayed in driver Python:
    Spark's Round(double) goes through the shortest decimal repr then
    HALF_UP — Decimal(repr(·)) is that exact value. Used only for the
    |Q|·M·PQ_CODES-entry ADC lookup table (a model-sized artifact)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x * 1000000)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP
        )
    )


def _py_d2(a: list[float], b: list[float]) -> float:
    """The _d2_col / _d2_sql left fold in plain Python (driver-side
    LUT construction only) — same IEEE adds in the same order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


@register("similarity_pq_adc", oracle=_pq_adc_sql())
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN — the third ANN family next to LSH
    and IVF, and the memory-bound answer at corpus scale: each vector
    is encoded as PQ_M sub-space code ids (4 bytes here vs 256 bytes
    of float32), search is the textbook integer lookup-table ADC
    (asymmetric distance = Σ over subspaces of a per-(query, code)
    table entry — O(M) per candidate, NOT O(DIM)), and only the
    PQ_RERANK best ADC candidates are fetched for exact cosine
    rerank. A first in-plan form that recomputed reconstructions per
    scan measured as expensive as brute force at 100× (SCALE.md) —
    this LUT form is the one a production build runs.

    Pipeline: (1) train — per subspace, one quantized-Lloyd round
    from md5-ranked seeds (the kmeans_lloyd discipline sliced into
    PQ_M independent 16-dim problems); the collected codebook is a
    model artifact cached by input fingerprint. (2) LUT — the
    |Q|·M·PQ_CODES integer distance table is built DRIVER-side from
    the collected codebook + query rows (micro-unit BIGINTs, so the
    cross-subspace sum is order-independent and the cross-engine hash
    holds; floats summed per subspace would hash-diverge on add
    order). (3) encode+ADC — ONE Arrow-batched mapInPandas corpus
    scan: per-subspace argmin via the same sequential cumsum fold the
    JVM/DuckDB folds run (bit-identical ties), ADC by integer gather,
    batch-local top-PQ_RERANK per query. (4) the global rank window
    merges batches·|Q|·PQ_RERANK rows and the winners join BACK to
    the corpus by id for exact cosine — in production the ADC scan
    reads the 4-byte code table and only the rerank touches original
    vectors.

    Scale: training exchanges 512 rollup groups, never the corpus;
    the scan is map-only (no vec_id exchange — plan-pinned) and emits
    ≤ batches·|Q|·PQ_RERANK rows; rerank is a broadcast of
    |Q|·PQ_RERANK ids against one more scan. Registered standalone in
    r14 (VERDICT r13 item 4) — the oracle is the same _pq_adc_sql the
    similarity_recall sixth-method block embeds, so the standalone
    hash-check and the recall row validate ONE pipeline.

    kawa parity: none; mandate (M) similarity-search extension —
    the IVF/LSH tier's missing memory-compression sibling."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    cb_rows = _pq_codebook_rows(e, sf_dir)
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_id_arr = np.array([int(r["vec_id"]) for r in q_rows], dtype=np.int64)
    q_embs = [[float(v) for v in r["embedding"]] for r in q_rows]

    by_m: dict[int, list[tuple[int, list[float]]]] = {}
    for m, code, cemb in cb_rows:
        by_m.setdefault(m, []).append((code, cemb))
    # per subspace: centroid matrix in ascending-code order (argmin's
    # first-minimum therefore breaks ties to the LOWER code, exactly
    # the oracle's ORDER BY d2, code)
    cents = {
        m: np.array([ce for _, ce in sorted(by_m[m])], dtype=np.float64)
        for m in by_m
    }
    # integer ADC lookup tables: dt[qi][m][code_index]
    dt = [
        {
            m: np.array(
                [
                    _pq_round_micro(
                        _py_d2(
                            qe[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM], ce
                        )
                    )
                    for _, ce in sorted(by_m[m])
                ],
                dtype=np.int64,
            )
            for m in by_m
        }
        for qe in q_embs
    ]
    n_q, n_m, subdim, rerank = len(q_id_arr), PQ_M, PQ_SUBDIM, PQ_RERANK

    def adc_scan(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            em = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(ids)
            code_idx = np.zeros((n, n_m), dtype=np.int64)
            for m in range(n_m):
                sub = em[:, m * subdim : (m + 1) * subdim]
                # sequential-fold d2 per code via the per-dim panel
                # accumulation (bit-identical to the engine folds —
                # same dim-order adds — so argmin ties cannot diverge;
                # first-minimum over ascending-code columns is the
                # same tie-break as the former per-code stack)
                code_idx[:, m] = np.argmin(
                    _seq_fold_d2(sub, cents[m]), axis=1
                )
            out_q, out_n, out_a = [], [], []
            for qi in range(n_q):
                adc = np.zeros(n, dtype=np.int64)
                for m in range(n_m):
                    adc += dt[qi][m][code_idx[:, m]]
                mask = ids != q_id_arr[qi]
                sids, sadc = ids[mask], adc[mask]
                if len(sids) == 0:
                    continue
                order = np.lexsort((sids, sadc))[:rerank]
                out_q.extend([q_id_arr[qi]] * len(order))
                out_n.extend(sids[order])
                out_a.extend(sadc[order])
            yield pd.DataFrame(
                {"q_id": out_q, "n_id": out_n, "adc_q": out_a}
            ).astype({"q_id": "int64", "n_id": "int64", "adc_q": "int64"})

    local = e.select("vec_id", "embedding").mapInPandas(
        adc_scan, schema="q_id long, n_id long, adc_q long"
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.col("adc_q").asc(), F.col("n_id"))
    cand = (
        local.select("q_id", "n_id", F.row_number().over(w_adc).alias("rn"))
        .filter(F.col("rn") <= PQ_RERANK)
        .select("q_id", "n_id")
    )
    q_df = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    rer = (
        e.join(F.broadcast(cand), F.col("vec_id") == F.col("n_id"))
        .join(F.broadcast(q_df), "q_id")
        .select(
            "q_id",
            "n_id",
            cosine(F.col("q_emb"), F.col("embedding")).alias("score"),
        )
    )
    w_rnk = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return rer.select(
        "q_id", "n_id", "score", F.row_number().over(w_rnk).alias("rnk")
    ).filter(F.col("rnk") <= TOP_K)


# ---------------------------------------------------------------------------
# Vectorized exact top-k: the Arrow/numpy fast path for the linear leg
# ---------------------------------------------------------------------------


def similarity_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched numpy exact cosine top-k, BIT-IDENTICAL to
    ``similarity_topk``: per-element float64 products are single IEEE
    ops and the reduction is ``np.cumsum`` along the dim axis — a
    strictly sequential left fold per row, the same add order as
    F.aggregate's fold and DuckDB's list_reduce — so the scores
    REPRODUCE the JVM fold bit-for-bit (0.0 + x₁ ≡ x₁ in IEEE, then
    identical adds; pinned by
    tests/test_pq_adc.py::test_vectorized_topk_bit_identical), and
    sqrt/multiply/divide are exact single ops in both runtimes.

    Shape: mapInPandas over the corpus scan with the |Q|-row query
    set shipped in the closure; each Arrow batch computes all |Q|
    dot products vectorized (one (n×DIM) elementwise product +
    cumsum per query — numpy's per-element loops at C speed instead
    of one Catalyst fold evaluation per row) and emits only its
    batch-local top-k per query, so the final exact merge window
    sees batches·|Q|·k rows, not the corpus. This is the sanctioned
    slow-path discipline (Arrow-batched, never row-at-a-time) applied
    to the one deliberately-linear audit leg the similarity tier
    keeps. Since r13 this IS similarity_recall's exact side
    (_recall_frame); the registered similarity_topk body swaps onto
    it in r14, riding its mandatory deferred-tier window slot
    (docs/STATUS.md round-13 notes)."""
    from kawa_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [int(r["vec_id"]) for r in q_rows]
    qm = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    # sequential-fold norms: cumsum, take the last partial
    q_norm = np.sqrt(_seq_fold_sq_norm(qm))
    if np.any(q_norm == 0.0):
        bad = [q for q, n in zip(q_ids, q_norm) if n == 0.0][:5]
        raise ArithmeticError(
            f"zero-norm query embedding(s) {bad}: cosine is 0/0 — "
            "the JVM fold raises DIVIDE_BY_ZERO here (ANSI); the "
            "vectorized form refuses identically"
        )

    def batch_topk(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            em = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            e_norm = np.sqrt(_seq_fold_sq_norm(em))
            # domain guard (code review r13): the JVM fold raises
            # DIVIDE_BY_ZERO on a zero-norm embedding under ANSI mode
            # (the driver session's default); numpy would silently
            # produce NaN (or, non-ANSI, Spark would produce NULL)
            # and the two forms would diverge on where that row
            # ranks. Fail as loudly as the registered body does.
            if np.any(e_norm == 0.0):
                bad = ids[e_norm == 0.0][:5].tolist()
                raise ArithmeticError(
                    f"zero-norm embedding(s) {bad}: cosine is 0/0 — "
                    "the JVM fold raises DIVIDE_BY_ZERO here (ANSI); "
                    "the vectorized form refuses identically"
                )
            out_q, out_n, out_s = [], [], []
            all_dots = _seq_fold_dots(em, qm)
            for qi, qid in enumerate(q_ids):
                score = all_dots[:, qi] / (q_norm[qi] * e_norm)
                mask = ids != qid
                sids, sscore = ids[mask], score[mask]
                if len(sids) == 0:
                    continue
                # (score desc, n_id asc), batch-local k — NaN-free by
                # the zero-norm guard above, so the lexsort order is
                # total and matches the JVM window exactly
                order = np.lexsort((sids, -sscore))[:TOP_K]
                out_q.extend([qid] * len(order))
                out_n.extend(sids[order])
                out_s.extend(sscore[order])
            yield pd.DataFrame(
                {"q_id": out_q, "n_id": out_n, "score": out_s}
            ).astype({"q_id": "int64", "n_id": "int64", "score": "float64"})

    local = e.select("vec_id", "embedding").mapInPandas(
        batch_topk, schema="q_id long, n_id long, score double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    return local.select(
        "q_id", "n_id", "score", F.row_number().over(w).alias("rnk")
    ).filter(F.col("rnk") <= TOP_K)


def _recall_pq_oracle() -> str:
    """The registered recall oracle plus the pq_adc method block —
    the banked six-method audit."""
    return (
        _recall_oracle()
        + "\nUNION ALL\n"
        + _recall_block_sql("pq_adc", _pq_adc_sql())
    )


@register("similarity_recall", oracle=_recall_pq_oracle())
def similarity_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality MEASURED, not asserted: per-query hit counts of
    each approximate method's top-k against the exact cosine top-k
    (similarity_topk), plus the method-level recall ratio — the audit
    job a production ANN deployment runs offline to tune
    nprobe/n_planes/codebooks. SIX measured pipelines (r13 — the
    changed-implementation slot of VERDICT r12 item 1, carrying the
    third ANN family's recall into the driver window):
    similarity_ivf_kmeans (the trained production path),
    similarity_lsh_ann (the single-bucket variant, whose low recall
    on this near-orthogonal synthetic corpus is exactly what the
    measurement should expose), similarity_lsh_multiprobe (the
    ±1-bit probe expansion — candidate superset of the single
    bucket, so measured recall is structurally ≥ lsh_ann's; the test
    pins that), similarity_lsh_multiprobe_wide (the Hamming-≤2
    expansion, pinned strictly above multiprobe), similarity_
    ivf_kmeans_wide (nprobe=4 of the K=8 trained cells, pinned
    strictly above ivf_kmeans), and similarity_pq_adc (r12's product
    quantization with integer LUT ADC — 64× less vector memory; its
    recall row is the honest cost-of-compression number).

    Exactness: hit counts are integers from an equi-join on
    (q_id, n_id) — no float comparisons anywhere in the measurement
    (ties inside the underlying top-k are broken by n_id in BOTH
    engines, so the compared SETS are deterministic); recall_q /
    method_recall are single divisions of exact ints.

    Scale: the exact side is the expensive leg (one linear corpus
    scan per query batch) — a production audit runs it over a SAMPLED
    query set, which is precisely this shape (N_QUERIES queries);
    both result sides are k·|Q| rows, so the measurement joins are
    broadcast-trivial. The 1-row method totals attach via the
    broadcast scalar idiom (no second pass).

    kawa parity: none; mandate (M) similarity-search extension
    (VERDICT r10 'What's missing' #2)."""
    return _recall_frame(
        spark, sf_dir, _RECALL_METHODS + (("pq_adc", similarity_pq_adc),)
    )


def _pq_codes_sql() -> str:
    """DuckDB twin of the code-table write: the shared training CTE
    chain (``_pq_train_ctes`` — the same string the search oracle
    embeds, so the two hash-checks validate ONE codebook), then
    per-vector code assignment and the micro-unit integer
    quantization error."""
    d2_cb = _d2_sql_dim("s.sub", "c.cemb", PQ_SUBDIM)
    return f"""{_pq_train_ctes()}, a2 AS (
      SELECT s.vec_id, s.m, c.code,
             CAST(ROUND({d2_cb} * 1000000, 0) AS BIGINT) AS err_q,
             ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                ORDER BY {d2_cb}, c.code) AS rn
      FROM subs s JOIN cb c ON c.m = s.m
    )
    SELECT vec_id,
           array_to_string(list(CAST(code AS VARCHAR) ORDER BY m), ',')
             AS pq_codes,
           CAST(SUM(err_q) AS BIGINT) AS q_err
    FROM a2 WHERE rn = 1
    GROUP BY vec_id
    """


@register("embedding_pq_codes", oracle=_pq_codes_sql())
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ PERSISTENCE step: encode every vector to its PQ_M code
    ids (the 4-byte column a production corpus stores — 64× smaller
    than the float32 vectors) plus the micro-unit integer quantization
    error (the distortion audit column a deployment tracks when
    deciding codebook size). This is the table the LUT ADC search
    reads instead of re-encoding — the 'reading stored codes sheds
    the encode term' step named in similarity_pq_adc's docstring.

    Plan: map-only after the cached training round — the broadcast
    1-row codebook crossJoin plus in-row HOF argmins per subspace;
    zero data exchanges (embedding_quantize's cost class: scan speed,
    write back columnar). err is Σ over subspaces of the quantized
    integer sub-distance — order-independent, so hash-exact. Codes
    emit CSV-stringified (the array-column canonicalizer rule).
    Registered on an r15 free slot (docs/STATUS.md round-14 bank).

    kawa parity: none; mandate (M) similarity-search extension."""
    e = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    cb = _one_row_cb(spark, _pq_codebook_rows(e, sf_dir))
    bests = [_pq_best(m, _pq_sub(m)) for m in range(PQ_M)]
    codes = F.concat_ws(
        ",", *[b.getField("code").cast("string") for b in bests]
    )
    err = None
    for b in bests:
        term = F.round(b.getField("d2") * 1000000, 0).cast("long")
        err = term if err is None else err + term
    return e.crossJoin(F.broadcast(cb)).select(
        "vec_id", codes.alias("pq_codes"), err.alias("q_err")
    )
