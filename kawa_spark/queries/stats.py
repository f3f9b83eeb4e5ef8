"""Statistical aggregates, pivot, percentiles, deterministic sampling.

Float discipline for second-moment statistics: stddev/variance/corr
are computed from EXACT decimal power sums (Σx, Σx², Σxy — decimal
addition is order-independent) with the final formula evaluated in
identical IEEE double arithmetic in both engines, instead of trusting
engine-native accumulators that differ in summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kawa_spark.functions.exact import dec
from kawa_spark.io import table
from kawa_spark.registry import register


@register(
    "agg_stats_moments",
    oracle="""
    WITH s AS (
      SELECT
        l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                 * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      n,
      sx / n AS mean_qty,
      (sxx - sx * sx / n) / (n - 1) AS var_qty,
      sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
      (sxy - sx * sy / n) / (n - 1) AS cov_qty_price
    FROM s
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev/covariance from exact power sums — one scan,
    partial-aggregable, hash-exact across engines."""
    l = table(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sxx, sy, sxy = (F.col(c) for c in ["n", "sx", "sxx", "sy", "sxy"])
    return g.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("cov_qty_price"),
    )


@register(
    "pivot_wide",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
      COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
      COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an EXPLICIT value list — at scale the implicit form
    adds a distinct-values pass over the fact table; always enumerate
    the pivot domain when it's known."""
    o = table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "percentile_cont",
    oracle="""
    SELECT
      l_returnflag,
      quantile_cont(l_quantity, 0.5) AS median_qty,
      quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles. l_quantity is integral-valued so
    the linear interpolation is exact in both engines. At 100 TB the
    exact form requires a per-group sort — approx_percentile (t-digest
    sketch, see percentile_approx below) is the scale path."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@register(
    "percentile_disc",
    oracle="""
    SELECT
      l_returnflag,
      quantile_disc(l_quantity, 0.5) AS p50_disc,
      quantile_disc(l_quantity, 0.9) AS p90_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (actual data values, no interpolation):
    the value at sorted 0-based index floor((n-1)·q) — matching
    DuckDB's quantile_disc. Implemented rank-based (one shuffle+sort,
    no per-group arrays), so it scales like any window query."""
    from pyspark.sql.window import Window

    l = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wg = Window.partitionBy("l_returnflag")
    ranked = l.select(
        "l_returnflag",
        "l_quantity",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    pos = lambda q: F.floor((F.col("n") - 1) * q) + 1
    return ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("rn") == pos(0.5), F.col("l_quantity"))).alias(
            "p50_disc"
        ),
        F.max(F.when(F.col("rn") == pos(0.9), F.col("l_quantity"))).alias(
            "p90_disc"
        ),
    )


@register(
    "percentile_approx",
    # Sketch values are engine-specific, so the driver-checkable contract
    # is: (a) the exact discrete median (deterministic, cross-engine) and
    # (b) a boolean asserting Spark's own approx landed within rank
    # tolerance of its own data. The oracle recomputes (a) and expects
    # (b) true — the sketch is verified without hashing sketch internals.
    oracle="""
    SELECT
      l_returnflag,
      quantile_disc(l_extendedprice, 0.5) AS median_price_exact,
      true AS approx_within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (GK sketch, accuracy=1000 ⇒ rank error
    ≤ n/1000). Verification: the fraction of values ≤ the approx median
    must sit in [0.49, 0.51] — a 10× margin over the sketch's guarantee,
    robust to ties. The exact median rides along rank-based (same
    machinery as percentile_disc, which matches DuckDB quantile_disc).

    Scale shape: sketch agg + rank window + one broadcast join of the
    5-row approx table back onto lineitem — no all-pairs, no collect."""
    from pyspark.sql.window import Window

    l = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wg = Window.partitionBy("l_returnflag")
    ranked = l.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    exact = ranked.groupBy("l_returnflag").agg(
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") - 1) * 0.5) + 1,
                F.col("l_extendedprice"),
            )
        ).alias("median_price_exact")
    )
    ap = l.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    )
    frac = (
        l.join(F.broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.col("approx"), 1
                    ).otherwise(0)
                )
                / F.first("n")
            ).alias("frac_le")
        )
    )
    return exact.join(frac, "l_returnflag").select(
        "l_returnflag",
        "median_price_exact",
        ((F.col("frac_le") >= 0.49) & (F.col("frac_le") <= 0.51)).alias(
            "approx_within_tol"
        ),
    )


@register(
    "histogram_width_bucket",
    oracle="""
    SELECT
      CAST(LEAST(GREATEST(floor(o_totalprice / 50000.0), -1), 12) + 1 AS BIGINT)
        AS bucket,
      COUNT(*) AS n_orders,
      MIN(o_totalprice) AS lo,
      MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the single-pass
    distribution sketch (vs percentile's per-group sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
                        CAST(l_linenumber AS VARCHAR)), 1, 1) = '0'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample via content hashing — reproducible
    across engines, runs, and partitionings (unlike TABLESAMPLE /
    rand(seed), which are engine- and plan-dependent). This is the
    right sampling primitive for training-data pipelines: the sample
    is a pure function of the key."""
    l = table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("#"),
            F.col("l_linenumber").cast("string"),
        )
    )
    return l.filter(F.substring(h, 1, 1) == "0").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


KMV_K = 64
# u = first 15 hex chars of md5 → integer < 16^15, normalized to
# (0, 1]; 16^15 = 2^60 fits a long exactly, and 15 hex chars keep the
# conv() result positive in both engines
_KMV_DENOM = float(1 << 60)


def md5_long(col: F.Column) -> F.Column:
    """First 15 md5 hex chars of a column (stringified) as a POSITIVE
    long (< 2^60) — the ONE md5→integer rank expression shared by the
    KMV family (via ``_kmv_u`` below) and the hash-sampled audit
    universe in llm_dedup.dedup_lsh_recall. Must stay bit-identical
    to ``md5_long_sql``."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("long")


def md5_long_sql(col: str) -> str:
    """DuckDB twin of ``md5_long`` for oracle interpolation."""
    return f"('0x' || substring(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"


def _kmv_u(col: str = "user_id"):
    """The normalized KMV hash u in (0, 1] — the ONE Spark-side copy
    (code review: three verbatim copies of the most drift-sensitive
    expression in the family). Must stay bit-identical to
    ``_kmv_u_sql``; both read the first 15 md5 hex chars as an
    integer over 2^60 (the shared ``md5_long`` rank expression)."""
    return md5_long(F.col(col)).cast("double") / F.lit(_KMV_DENOM)


def _kmv_u_sql(col: str = "user_id") -> str:
    """DuckDB twin of ``_kmv_u`` for oracle interpolation."""
    return f"CAST({md5_long_sql(col)} AS DOUBLE) / {_KMV_DENOM}"


# Shared verbatim by the batch key below and the online twin's
# oracle (streaming_mode.py::stream_exec_kmv_distinct) — the
# FIRST_SEEN_SQL convention, so the two can never drift.
KMV_DISTINCT_SQL = f"""
    WITH dv AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), hashed AS (
      SELECT event_type, user_id,
             {_kmv_u_sql()} AS u
      FROM dv
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY u, user_id) AS rn
      FROM hashed
    ), sketch AS (
      SELECT event_type,
             COUNT(*) AS k_seen,
             MAX(u) AS u_k
      FROM ranked WHERE rn <= {KMV_K}
      GROUP BY event_type
    ), exact AS (
      SELECT event_type, COUNT(*) AS n_exact FROM dv GROUP BY event_type
    )
    SELECT s.event_type,
           e.n_exact,
           CAST(s.k_seen AS BIGINT) AS k_seen,
           CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                ELSE ({KMV_K} - 1) / s.u_k END AS kmv_estimate,
           abs(CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                    ELSE ({KMV_K} - 1) / s.u_k END - e.n_exact)
             / e.n_exact <= 0.5 AS within_tol
    FROM sketch s JOIN exact e ON s.event_type = e.event_type
    """


@register("agg_kmv_distinct", oracle=KMV_DISTINCT_SQL)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch — the mergeable cardinality
    sketch family (Bar-Yossef et al. 2002) built from DataFrame ops:
    keep the K smallest normalized hashes of the distinct values per
    group; estimate = (K-1)/u_K (the K-th minimum). Unlike
    approx_count_distinct's HLL (engine-internal, only testable via
    tolerance), every number here is a DETERMINISTIC function of the
    data through md5 — both engines produce bit-identical estimates,
    so the sketch itself is value-hash-verified, and the within_tol
    column additionally documents the estimate's accuracy contract
    against the exact count.

    Scale: one distinct (shuffle on the pair), one group-keyed top-K.
    The top-K here is a rank window (fine while per-group distinct
    cardinality sorts in memory per task); the production form at
    10⁹+ distincts/group is ``kmv_distinct(..., prefilter=True)``,
    which keeps only u < c·K/N̂ (coarse N̂ from approx_count_distinct)
    so ~c·K rows per group reach the sort — estimate-invariant, see
    kmv_distinct's docstring and tests/test_kmv_property.py. The
    registered key runs the unfiltered form (its plan is the one the
    oracle mirrors). Exact counts ride along for the contract column;
    a deployment computes them only in audits."""
    return kmv_distinct(
        table(spark, sf_dir, "events").select("event_type", "user_id"),
        "event_type",
        "user_id",
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    prefilter: bool = False,
    prefilter_c: float = 4.0,
) -> DataFrame:
    """Core KMV sketch over any (group, value) frame —
    agg_kmv_distinct binds it to events; the property test
    (tests/test_kmv_property.py) drives it on random groups against a
    brute-force Python replica of the estimator.

    ``prefilter=True`` is the big-group production path (VERDICT r7
    item 7): the rank window sorts each group's full distinct set in
    one task, which breaks down around 10⁹ distincts/group. The
    prefilter keeps only hashes u < c·K/N̂ (N̂ a coarse per-group
    approx_count_distinct, broadcast back), so ~c·K rows per group
    reach the sort. The sketch's answer is UNCHANGED: the estimate
    reads only the K minima, and P(u_K > c·K/N) ≤ exp(-K(c-1-ln c))
    — at K=64, c=4 that is e^-103, zero for any physical dataset,
    and HLL's ±2% N̂ error only perturbs the exponent. Groups with
    N̂ ≤ c·K get threshold ≥ 1 (no filtering), so small groups are
    exactly untouched. tests/test_kmv_property.py proves
    estimate-invariance on random frames."""
    dv = (
        df.select(
            F.col(group_col).alias("event_type"),
            F.col(value_col).alias("user_id"),
        )
        .distinct()
        # feeds the sketch AND the exact-count branch (and the coarse
        # N-hat in prefilter mode): shared via runtime AQE exchange
        # reuse, NOT persist() — a registry-sweep-long cache leak was
        # the ADVICE r8 class fixed for cooccurrence_lift
    )
    u = _kmv_u()
    from pyspark.sql.window import Window

    hashed = dv.select("event_type", "user_id", u.alias("u"))
    if prefilter:
        coarse = dv.groupBy("event_type").agg(
            F.approx_count_distinct("user_id").alias("n_hat")
        )
        hashed = (
            hashed.join(F.broadcast(coarse), "event_type")
            .filter(
                F.col("u")
                < F.lit(float(prefilter_c) * KMV_K) / F.col("n_hat")
            )
            .drop("n_hat")
        )
    w = Window.partitionBy("event_type").orderBy("u", "user_id")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("k_seen"), F.max("u").alias("u_k"))
    )
    exact = dv.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return kmv_scores(sketch, exact)


def kmv_scores(sketch: DataFrame, exact: DataFrame) -> DataFrame:
    """Estimator + audit projection over a (event_type, k_seen, u_k)
    sketch frame and an (event_type, n_exact) audit frame — the ONE
    place the (K-1)/u_K estimator and its within_tol contract live
    (code review r10: the online twin had grown a verbatim copy —
    the same drift class the _kmv_u consolidation closed). Shared by
    kmv_distinct (batch) and stream_exec_kmv_distinct (online)."""
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / F.col("u_k"))
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.col("k_seen").cast("long").alias("k_seen"),
            est.alias("kmv_estimate"),
            (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.5).alias(
                "within_tol"
            ),
        )
    )


@register(
    "agg_kmv_union",
    oracle=f"""
    WITH dv AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), hashed AS (
      SELECT event_type, user_id,
             {_kmv_u_sql()} AS u
      FROM dv
    ), per_group AS (
      SELECT event_type, user_id, u, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY u, user_id) AS rn
      FROM hashed
    ), sketch_rows AS (
      SELECT event_type, user_id, u FROM per_group WHERE rn <= {KMV_K}
    ), merged AS (
      SELECT user_id, u, ROW_NUMBER() OVER (
               ORDER BY u, user_id) AS rn
      FROM (SELECT DISTINCT user_id, u FROM sketch_rows)
    ), union_sketch AS (
      SELECT COUNT(*) AS k_seen, MAX(u) AS u_k
      FROM merged WHERE rn <= {KMV_K}
    ), exact AS (
      SELECT COUNT(DISTINCT user_id) AS n_exact FROM events
    )
    SELECT CAST(s.k_seen AS BIGINT) AS k_seen,
           e.n_exact,
           CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                ELSE ({KMV_K} - 1) / s.u_k END AS kmv_estimate,
           abs(CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                    ELSE ({KMV_K} - 1) / s.u_k END - e.n_exact)
             / e.n_exact <= 0.5 AS within_tol
    FROM union_sketch s, exact e
    """,
)
def agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch MERGEABILITY — the property that makes distinct
    sketches distributed-friendly (Bar-Yossef et al. 2002): the union
    of per-group sketches (keep the K smallest of the combined
    minima) IS the sketch of the union, so per-partition / per-day /
    per-type sketches roll up without rescanning raw data. Here the
    per-event_type sketches built exactly as agg_kmv_distinct's are
    merged into ONE corpus-wide distinct-users estimate and verified
    against the exact global count. Deterministic md5 hashing means
    the merged estimate is bit-identical across engines — the merge
    path itself is value-hash-verified, which no engine-internal HLL
    union can offer.

    Scale: this is the cheap side of the sketch contract — the merge
    input is ≤ |groups|·K rows (bytes, not data); a deployment keeps
    the per-group sketch rows as a tiny table and answers any
    group-combination cardinality from it. The exact count here is
    the audit column, same posture as agg_kmv_distinct."""
    dv = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        # sketch + exact branches share the distinct via AQE exchange
        # reuse (no persist — the ADVICE r8 cache-leak class)
    )
    u = _kmv_u()
    from pyspark.sql.window import Window

    hashed = dv.select("event_type", "user_id", u.alias("u"))
    w_grp = Window.partitionBy("event_type").orderBy("u", "user_id")
    sketch_rows = (
        hashed.withColumn("rn", F.row_number().over(w_grp))
        .filter(F.col("rn") <= KMV_K)
        .select("user_id", "u")
        .distinct()
    )
    # the merge: K smallest over the union of sketch rows. The input
    # is ≤ |groups|·K rows, so the single-partition sort is sorting a
    # few KB — the whole point of merging sketches instead of data.
    w_all = Window.orderBy("u", "user_id")
    merged = (
        sketch_rows.withColumn("rn", F.row_number().over(w_all))
        .filter(F.col("rn") <= KMV_K)
        .agg(F.count(F.lit(1)).alias("k_seen"), F.max("u").alias("u_k"))
    )
    exact = dv.agg(F.countDistinct("user_id").alias("n_exact"))
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / F.col("u_k"))
    return (
        merged.crossJoin(F.broadcast(exact))
        .select(
            F.col("k_seen").cast("long").alias("k_seen"),
            "n_exact",
            est.alias("kmv_estimate"),
            (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.5).alias(
                "within_tol"
            ),
        )
    )


@register(
    "agg_kmv_sliding_window",
    oracle=f"""
    WITH dv AS (
      SELECT DISTINCT epoch_us(ts) // {86_400 * 1_000_000} AS day, user_id
      FROM events
    ), hashed AS (
      SELECT day, user_id,
             {_kmv_u_sql()} AS u
      FROM dv
    ), per_day AS (
      SELECT day, user_id, u, ROW_NUMBER() OVER (
               PARTITION BY day ORDER BY u, user_id) AS rn
      FROM hashed
    ), sketch_rows AS (
      SELECT day, user_id, u FROM per_day WHERE rn <= {KMV_K}
    ), days AS (
      SELECT DISTINCT day FROM dv
    ), fanout AS (
      SELECT DISTINCT s.day + t.i AS day, s.user_id, s.u
      FROM sketch_rows s CROSS JOIN range(7) t(i)
    ), ranked AS (
      SELECT f.day, f.user_id, f.u, ROW_NUMBER() OVER (
               PARTITION BY f.day ORDER BY f.u, f.user_id) AS rn
      FROM fanout f JOIN days d ON f.day = d.day
    ), union_sketch AS (
      SELECT day, COUNT(*) AS k_seen, MAX(u) AS u_k
      FROM ranked WHERE rn <= {KMV_K} GROUP BY day
    ), exact AS (
      SELECT x.day, COUNT(DISTINCT x.user_id) AS n_exact
      FROM (SELECT DISTINCT v.day + t.i AS day, v.user_id
            FROM dv v CROSS JOIN range(7) t(i)) x
      JOIN days d ON x.day = d.day
      GROUP BY 1
    )
    SELECT s.day, e.n_exact, CAST(s.k_seen AS BIGINT) AS k_seen,
           CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                ELSE ({KMV_K} - 1) / s.u_k END AS kmv_estimate,
           abs(CASE WHEN s.k_seen < {KMV_K} THEN CAST(s.k_seen AS DOUBLE)
                    ELSE ({KMV_K} - 1) / s.u_k END - e.n_exact)
             / e.n_exact <= 0.5 AS within_tol
    FROM union_sketch s JOIN exact e ON s.day = e.day
    """,
)
def agg_kmv_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window sketch rollup — the weekly-active-users query
    answered from per-day sketches instead of raw data: for each
    observed day, the KMV sketches of the trailing 7 days are merged
    (K smallest of the combined minima = sketch of the union, the
    agg_kmv_union identity) into a distinct-users estimate for that
    window. THE production pattern for windowed COUNT DISTINCT at
    scale: exact sliding distinct must re-touch every event in every
    window it falls into, while the sketch path attributes each event
    to one day's sketch and the 7-day merge reads |days|*K sketch
    rows. Deterministic md5 hashing keeps the merged estimates
    bit-identical across engines — hash-verified, not tolerance-
    checked.

    Exactness: day buckets are exact floor-division of epoch-micros;
    the fan-out day+i (i in 0..6) is integer; u is an exact
    long/2^60 double in both engines; ties break on (u, user_id).

    Scale: ONE full-stream shuffle (the (day, user) distinct —
    reused by the sketch and audit branches via AQE exchange reuse,
    no persist; ADVICE r8 discipline). The per-day top-K window
    sorts each day's distinct users (the kmv_distinct prefilter is
    the 10^9-distincts/day path); everything downstream of
    sketch_rows is KB-scale (<= |days|*7*K rows). The exact trailing
    count is the AUDIT column — its |pairs|*7 fan-out is what the
    sketch path exists to avoid, same posture as the other KMV keys."""
    from kawa_spark.functions.exact import floordiv
    from kawa_spark.queries.events import DAY_US

    dv = (
        table(spark, sf_dir, "events")
        .select(
            floordiv(F.unix_micros("ts"), DAY_US).alias("day"), "user_id"
        )
        .distinct()
    )
    return kmv_sliding(dv, width=7)


def kmv_sliding(dv: DataFrame, width: int) -> DataFrame:
    """Core sliding sketch-union over any DISTINCT (day, user_id)
    frame — agg_kmv_sliding_window binds it to events with width=7;
    the property test (tests/test_kmv_property.py) drives it on
    random pair sets against an independent Python KMV computed
    directly over each window's user set (catching fan-out or
    dedup errors the construction-mirroring oracle cannot)."""
    from pyspark.sql.window import Window

    u = _kmv_u()
    days = dv.select("day").distinct()
    w_day = Window.partitionBy("day").orderBy("u", "user_id")
    sketch_rows = (
        dv.select("day", "user_id", u.alias("u"))
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    week = F.explode(
        F.sequence(F.col("day"), F.col("day") + F.lit(width - 1))
    )
    fanout = (
        sketch_rows.withColumn("target", week)
        .select(F.col("target").alias("day"), "user_id", "u")
        .distinct()
        .join(F.broadcast(days), "day")
    )
    w_t = Window.partitionBy("day").orderBy("u", "user_id")
    union_sketch = (
        fanout.withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("k_seen"), F.max("u").alias("u_k"))
    )
    exact = (
        dv.withColumn("target", week)
        .select(F.col("target").alias("day"), "user_id")
        .join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("k_seen").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) / F.col("u_k"))
    return union_sketch.join(exact, "day").select(
        "day",
        "n_exact",
        F.col("k_seen").cast("long").alias("k_seen"),
        est.alias("kmv_estimate"),
        (F.abs(est - F.col("n_exact")) / F.col("n_exact") <= 0.5).alias(
            "within_tol"
        ),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (bounded-memory frequency estimation)
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_MIN_W = 4
# The registered key's width is RELATIVE — w = max(4, |keys| // 2),
# resolved in-plan from a 1-row broadcast (the r7.2 relative-cap
# convention, oracle twin = scalar subquery) — so the sketch is
# guaranteed collision-dense (avg 2 keys/bucket) at EVERY scale
# factor: both is_over classes stay non-vacuous at sf0.001 AND the
# driver's sf0.01 (a fixed tiny w goes all-over at 10x keys; a fixed
# wide w goes all-exact at 0.1x — both vacuous-complement traps). A
# production deployment fixes w = ceil(e/eps) instead (bounded d*w
# state); the core takes either form.


def _cms_buckets(key_col: str, w_col, d: int):
    """The d row-buckets of a key as ONE array — md5-based so the
    oracle can replay it exactly (the _kmv_u convention; ONE
    Spark-side copy). A single md5 per row supplies all d hashes:
    row i reads the 8 hex chars at positions [1+8i, 8+8i] (1-based,
    inclusive) → int in [0, 2^32) → mod w
    (d ≤ 4 — md5 has 32 hex chars). One digest instead of d is the
    difference between 4x and 1x hashing CPU on the map side — the
    10x probe of the first cut read 3.7x on exactly that cost."""
    if d > 4:  # a stripped assert (python -O) would silently yield
        # NULL buckets past row 3 and drop those rows in the join
        raise ValueError(f"md5 supplies at most 4 8-hex-char rows, got d={d}")
    h = F.md5(F.col(key_col).cast("string"))
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % w_col
            for i in range(d)
        ]
    )


def _cms_bucket_sql_w(i: str, key: str, w: str = "w") -> str:
    """DuckDB twin of ``_cms_buckets`` for oracle interpolation; ``i``
    names the in-scope row index and ``w`` the width column."""
    return (
        f"('0x' || substring(md5(CAST({key} AS VARCHAR)), "
        f"1 + 8*{i}, 8))::BIGINT % {w}"
    )


CMS_FREQ_SQL = f"""
    WITH ev AS (
      SELECT user_id FROM events
    ), wsel AS (
      SELECT GREATEST({CMS_MIN_W},
                      COUNT(DISTINCT user_id) // 2) AS w
      FROM ev
    ), pairs AS (
      SELECT user_id, i,
             {_cms_bucket_sql_w("i", "user_id")} AS bucket
      FROM ev CROSS JOIN range({CMS_D}) t(i) CROSS JOIN wsel
    ), cms AS (
      SELECT i, bucket, COUNT(*) AS c FROM pairs GROUP BY 1, 2
    ), exact AS (
      SELECT user_id, COUNT(*) AS n_exact FROM ev GROUP BY 1
    ), km AS (
      SELECT DISTINCT user_id, i, bucket FROM pairs
    ), est AS (
      SELECT k.user_id, MIN(c.c) AS n_cms
      FROM km k JOIN cms c ON k.i = c.i AND k.bucket = c.bucket
      GROUP BY 1
    )
    SELECT e.user_id, e.n_exact,
           CAST(est.n_cms AS BIGINT) AS n_cms,
           est.n_cms > e.n_exact AS is_over
    FROM exact e JOIN est ON e.user_id = est.user_id
    """


@register("agg_cms_freq", oracle=CMS_FREQ_SQL)
def agg_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation — the THIRD sketch
    family (after KMV cardinality and its union/sliding forms): the
    bounded-memory answer to "how often does each key occur" when the
    key domain is too large for an exact groupBy to be cheap. d hash
    rows × w buckets of counters; a key's estimate is the MIN over
    its d row counters — always ≥ the true count (counters only ever
    absorb collisions), within εN with probability 1−δ for
    w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan 2005).

    The output carries BOTH the exact count and the sketch estimate
    (the exact-value + approx pattern the KMV keys use), so the hash
    check verifies the estimator itself, not just a tolerance. The
    registered width is RELATIVE — w = max(4, |keys| // 2), resolved
    in-plan (see cms_frequencies) — keeping the sketch collision-
    dense (avg 2 keys/bucket) at every scale factor, so is_over
    verifies BOTH classes at sf0.001 and sf0.01 alike (pinned
    non-vacuous in tests); any fixed w goes vacuous at some sf.

    Scale: the sketch build is ONE aggregate whose group domain is
    d×w cells — the full-stream exchange carries at most d×w rows
    per map partition after map-side combine, NOT one row per input;
    with the production FIXED width (w = ⌈e/ε⌉, the core's int form)
    that bound is a constant independent of the key domain, which is
    the entire point of the sketch at 10⁹-key domains (the relative
    width used HERE trades that constant bound for verification
    density — d×w still ≪ |keys| rows, 4×75 cells vs 150 keys at
    sf0.01). Per-key estimates then come from broadcasting the cell
    table back onto the (already aggregated) key frame — map-side.
    The per-row digest is computed ONCE (all d row-buckets read
    disjoint substrings of a single md5 — the 100× probe read 39.8×
    on the d-digests-per-row first cut, 17.0× shipped). The exact
    count here exists for verification; a production user keeps only
    the sketch. Sketches are mergeable cell-wise (the agg_kmv_union
    story applies verbatim).

    kawa parity: none; mandate (M) sketch tier extension."""
    e = table(spark, sf_dir, "events").select("user_id")
    return cms_frequencies(e, "user_id", CMS_D, None)


def cms_frequencies(
    e: DataFrame, key: str, d: int, w: int | None
) -> DataFrame:
    """Core estimator over any single-column frame — agg_cms_freq
    binds it to events.user_id; the property test
    (tests/test_cms_property.py) drives it on random multisets
    against an independent hashlib-based Python CMS. ``w`` is either
    a fixed int (the production form) or None, which resolves the
    RELATIVE width max(CMS_MIN_W, |keys| // 2) in-plan via a 1-row
    broadcast (the relative-cap convention)."""
    if w is None:
        wsel = e.agg(
            F.greatest(
                F.lit(CMS_MIN_W),
                F.floor(F.countDistinct(key) / 2).cast("long"),
            ).alias("_w")
        )
        e = e.join(F.broadcast(wsel))
    else:
        e = e.withColumn("_w", F.lit(w))
    pairs = e.select(
        F.col(key),
        F.posexplode(_cms_buckets(key, F.col("_w"), d)).alias(
            "i", "bucket"
        ),
    )
    cms = pairs.groupBy("i", "bucket").agg(F.count(F.lit(1)).alias("c"))
    exact = e.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_exact"), F.min("_w").alias("_w")
    )
    km = exact.select(
        F.col(key),
        "n_exact",
        F.posexplode(_cms_buckets(key, F.col("_w"), d)).alias(
            "i", "bucket"
        ),
    )
    est = (
        km.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy(key, "n_exact")
        .agg(F.min("c").alias("n_cms"))
    )
    return est.select(
        key,
        "n_exact",
        "n_cms",
        (F.col("n_cms") > F.col("n_exact")).alias("is_over"),
    )


# ---------------------------------------------------------------------------
# mergeable quantile sketch (bottom-K rank sample)
# ---------------------------------------------------------------------------

QSK_K = 256  # sample size per group
# rank-error acceptance band for the audit flags: |rank(est) - q| <= 1/10.
# Expected sampling error is ~sqrt(q(1-q)/K) ≈ 0.031 at K=256, so the
# band holds with large margin on any group that saturates the sample
# — and the flag is hash-checked either way (deterministic data).
_QSK_TOL_NUM, _QSK_TOL_DEN = 1, 10
# Second, deliberately TIGHT band (1/100): at K=256 the expected rank
# error ~0.031 straddles it, so across real groups SOME land inside
# and SOME outside — the class-splitting flag pair (a 1/10-band flag
# alone is single-class at every SF: the vacuous-flag pattern the CMS
# relative-width redesign exists to avoid; code review r10).
_QSK_TIGHT_NUM, _QSK_TIGHT_DEN = 1, 100

# Shared verbatim by the batch key below and the online twin's oracle
# (streaming_mode.py::stream_exec_quantile_sketch) — the
# FIRST_SEEN_SQL convention, so the two can never drift.
QUANTILE_SKETCH_SQL = f"""
    WITH h AS (
      SELECT event_type, event_id, value,
             {_kmv_u_sql("event_id")} AS u
      FROM events
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY u, event_id) AS rn
      FROM h
    ), s AS (
      SELECT event_type, value, event_id FROM r WHERE rn <= {QSK_K}
    ), sr AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS vrn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM s
    ), est AS (
      SELECT event_type,
             CAST(MAX(m) AS BIGINT) AS k_used,
             MAX(CASE WHEN vrn = FLOOR((m-1) * 0.5) + 1
                      THEN value END) AS p50_est,
             MAX(CASE WHEN vrn = FLOOR((m-1) * 0.9) + 1
                      THEN value END) AS p90_est
      FROM sr GROUP BY 1
    )
    SELECT ev.event_type,
           COUNT(*) AS n,
           e.k_used, e.p50_est, e.p90_est,
           CAST(SUM(CASE WHEN ev.value <= e.p50_est THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS p50_rank,
           CAST(SUM(CASE WHEN ev.value <= e.p90_est THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS p90_rank,
           abs({_QSK_TOL_DEN} * 2
                 * SUM(CASE WHEN ev.value <= e.p50_est THEN 1 ELSE 0 END)
               - {_QSK_TOL_DEN} * COUNT(*))
             <= {_QSK_TOL_NUM} * 2 * COUNT(*) AS p50_ok,
           abs({_QSK_TOL_DEN} * 10
                 * SUM(CASE WHEN ev.value <= e.p90_est THEN 1 ELSE 0 END)
               - {_QSK_TOL_DEN} * 9 * COUNT(*))
             <= {_QSK_TOL_NUM} * 10 * COUNT(*) AS p90_ok,
           abs({_QSK_TIGHT_DEN} * 2
                 * SUM(CASE WHEN ev.value <= e.p50_est THEN 1 ELSE 0 END)
               - {_QSK_TIGHT_DEN} * COUNT(*))
             <= {_QSK_TIGHT_NUM} * 2 * COUNT(*) AS p50_tight,
           abs({_QSK_TIGHT_DEN} * 10
                 * SUM(CASE WHEN ev.value <= e.p90_est THEN 1 ELSE 0 END)
               - {_QSK_TIGHT_DEN} * 9 * COUNT(*))
             <= {_QSK_TIGHT_NUM} * 10 * COUNT(*) AS p90_tight
    FROM events ev JOIN est e USING (event_type)
    GROUP BY 1, 3, 4, 5
    """


@register("agg_quantile_sketch", oracle=QUANTILE_SKETCH_SQL)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the fourth sketch family (after
    KMV distinct, KMV union/sliding, CMS frequency): per group, keep
    the K rows whose md5-derived rank u is smallest (a deterministic
    uniform sample — the KMV bottom-K machinery pointed at VALUES
    instead of distinct counting) and answer p50/p90 as DISCRETE
    quantiles of the sample. Mergeable for free: the union of
    per-partition (or per-day, per-shard) bottom-K sets bottom-K'd
    again IS the global sample — the same identity the KMV family
    proves — so a 1000-executor cluster ships K rows per group per
    partial, never the data.

    The ESTIMATES are hash-verified (the agg_kmv_distinct
    discipline): both engines replay the identical md5 rank and the
    identical discrete-quantile pick, so p50_est/p90_est match
    bit-for-bit. The pick is the LOWER disc convention — the value at
    0-based sorted index floor((m−1)·q), this repo's percentile_disc
    machinery — written as explicit ROW_NUMBER math in the oracle:
    DuckDB's quantile_disc implements the SQL-standard ceil(q·m)
    index, one position higher whenever q·(m−1) and q·m straddle an
    integer (invisible on tie-heavy columns like l_quantity, real on
    continuous values). The audit half recomputes each estimate's TRUE rank
    over the full group (one broadcast join of |types| rows + one
    map-side-combined aggregate) and flags |rank − q| ≤ 1/10 as the
    integer cross-multiplied inequality. TWO bands: the 1/10
    guarantee band (p50_ok/p90_ok — at K=256 the ~3% expected rank
    error clears it with margin, so all-true IS the assertion, the
    percentile_approx contract form) and the 1/100 TIGHT band
    (p50_tight/p90_tight), which the expected error STRADDLES — real
    groups land on both sides at the driver gate's sf0.01 (1 true /
    4 false) and at sf0.1, so the boolean surface carries both
    classes where it is hash-checked and a broken audit cannot hide
    behind an always-true band (the CMS non-vacuity discipline; code
    review r10). At sf0.001 the sample SATURATES (every group has
    n < K, so the "estimate" is exact and every tight flag is
    legitimately true) — expected, pinned by
    test_tight_flags_split_classes_at_gate_sf. Property-tested against an independent hashlib reference
    (tests/test_quantile_sketch_property.py).

    Scale: the bottom-K window's rn ≤ K filter plans as
    WindowGroupLimit on BOTH shuffle sides (the events_heavy_hitters
    recognition, plan-pinned) — map tasks forward only their local
    bottom-K per group, so the full stream is never shuffled; the
    audit aggregate map-side combines onto |types| rows. Everything
    downstream of the two scans is |types|·K-bounded.

    kawa parity: none; mandate (M) — the mergeable-sketch story
    applied to rank statistics (the public KMV/bottom-k sketch
    literature; Bar-Yossef et al. 2002 for the sampling identity)."""
    e = table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("u", "event_id")
    sample = (
        e.withColumn("u", _kmv_u("event_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QSK_K)
    )
    return quantile_sketch_scores(sample, e)


def quantile_sketch_scores(sample: DataFrame, full: DataFrame) -> DataFrame:
    """Estimate + audit core over any bottom-K sample frame
    (event_type, value, event_id) and the full (event_type, value)
    population — agg_quantile_sketch binds it to the in-plan window
    sample; the online twin feeds it the kernel-maintained sample
    snapshot. Shared VERBATIM so the two keys can never drift (the
    score_transitions convention)."""
    ws = Window.partitionBy("event_type").orderBy("value", "event_id")
    wg = Window.partitionBy("event_type")
    ranked = sample.select(
        "event_type",
        "value",
        F.row_number().over(ws).alias("srn"),
        F.count(F.lit(1)).over(wg).alias("m"),
    )

    def pos(q: float):
        return F.floor((F.col("m") - 1) * q) + 1

    est = ranked.groupBy("event_type").agg(
        F.max("m").cast("long").alias("k_used"),
        F.max(F.when(F.col("srn") == pos(0.5), F.col("value"))).alias(
            "p50_est"
        ),
        F.max(F.when(F.col("srn") == pos(0.9), F.col("value"))).alias(
            "p90_est"
        ),
    )
    le = lambda c: F.sum(
        F.when(F.col("value") <= F.col(c), 1).otherwise(0)
    )
    audit = (
        full.join(F.broadcast(est), "event_type")
        .groupBy("event_type", "k_used", "p50_est", "p90_est")
        .agg(
            F.count(F.lit(1)).alias("n"),
            le("p50_est").alias("le50"),
            le("p90_est").alias("le90"),
        )
    )
    tn, td = _QSK_TOL_NUM, _QSK_TOL_DEN
    gn, gd = _QSK_TIGHT_NUM, _QSK_TIGHT_DEN
    return audit.select(
        "event_type",
        "n",
        "k_used",
        "p50_est",
        "p90_est",
        (F.col("le50").cast("double") / F.col("n")).alias("p50_rank"),
        (F.col("le90").cast("double") / F.col("n")).alias("p90_rank"),
        (
            F.abs(F.lit(td) * 2 * F.col("le50") - F.lit(td) * F.col("n"))
            <= F.lit(tn) * 2 * F.col("n")
        ).alias("p50_ok"),
        (
            F.abs(
                F.lit(td) * 10 * F.col("le90")
                - F.lit(td) * 9 * F.col("n")
            )
            <= F.lit(tn) * 10 * F.col("n")
        ).alias("p90_ok"),
        (
            F.abs(F.lit(gd) * 2 * F.col("le50") - F.lit(gd) * F.col("n"))
            <= F.lit(gn) * 2 * F.col("n")
        ).alias("p50_tight"),
        (
            F.abs(
                F.lit(gd) * 10 * F.col("le90")
                - F.lit(gd) * 9 * F.col("n")
            )
            <= F.lit(gn) * 10 * F.col("n")
        ).alias("p90_tight"),
    )
