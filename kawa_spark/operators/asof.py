"""As-of (point-in-time) join — an operator Spark lacks natively.

Composition strategy (no UDF, single shuffle): tag left/right, union
on a common schema, one window pass per key ordered by
(ts, side, tiebreak) carrying the last-seen right payload forward,
keep left rows. Cost = one shuffle on the key + one sort — the same
price as a regular join of the two inputs; never a range cross
product.

At 100 TB: partition count follows the key cardinality; skewed keys
are ordinary window skew (AQE doesn't split windows — for a hot key,
pre-bucket by coarse time and run the window within (key, bucket),
seeding each bucket with the previous bucket's last value).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts on the same key (DuckDB/pandas ASOF LEFT JOIN
    semantics). Optional tolerance drops matches older than
    ``tolerance_seconds``.

    Determinism requires (key, ts) to be unique on the RIGHT side —
    the same precondition DuckDB's ASOF JOIN has; with duplicate
    right timestamps the carried payload among the duplicates is
    plan-order dependent (dedupe the right side first).
    """
    payload_cols = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    r_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload_cols]
    )
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__rpay"),
    )
    l_cols = [c for c in left.columns]
    l_aligned = l_tag.select(
        F.col(on),
        "__ts",
        "__side",
        F.lit(None).cast(r_tag.schema["__rpay"].dataType).alias("__rpay"),
        *[F.col(c).alias(f"__l_{c}") for c in l_cols],
    )
    r_aligned = r_tag.select(
        F.col(on),
        "__ts",
        "__side",
        "__rpay",
        *[F.lit(None).cast(dict(l_tag.dtypes)[c]).alias(f"__l_{c}") for c in l_cols],
    )
    unioned = l_aligned.unionByName(r_aligned)
    # right rows sort before left rows at equal ts → inclusive (<=)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__last_r", F.last("__rpay", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # cast via TIMESTAMP so NTZ inputs work (NTZ → double directly
        # is an invalid cast)
        in_tol = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__last_r.__rts").cast("timestamp").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.withColumn(
            "__last_r", F.when(in_tol, F.col("__last_r"))
        )
    out_cols: list[Column] = [
        F.col(f"__l_{c}").alias(c) for c in l_cols
    ] + [F.col("__last_r.__rts").alias(f"{right_ts}{suffix}")] + [
        F.col(f"__last_r.{c}").alias(
            f"{c}{suffix}" if c in l_cols else c
        )
        for c in payload_cols
    ]
    return carried.select(*out_cols)
