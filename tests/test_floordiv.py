"""exact.floordiv must equal Python/DuckDB floor division over the
ENTIRE int64 range — including beyond 2^53, where a double-routed
division rounds (code review r8), and within n of the long minimum,
where a plain long subtraction overflows under ANSI mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from kawa_spark.functions.exact import floordiv

VALS = [
    0, 1, -1, 6, 7, 8, -6, -7, -8,
    2**53, 2**53 + 1, -(2**53) - 1,
    2**62, -(2**62), 2**63 - 1, -(2**63),
    123_456_789_012_345_678, -123_456_789_012_345_678,
]
NS = [7, 3_600_000_000, 86_400_000_000]


def test_floordiv_exact_full_int64_range(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "v long")
    for n in NS:
        got = [r[0] for r in df.select(floordiv(F.col("v"), n)).collect()]
        assert got == [v // n for v in VALS], n
