"""Handler combinators (kawa Handler/HandlerFunc parity).

Reference: Handle(ctx, Message[T1]) ([]Message[T2], error) — one
message in, 0..N out (/root/reference/types.go:122-135). In Spark a
handler is simply ``DataFrame → DataFrame``; the 0/1/N cardinalities
map to filter / select / explode, all fused by Catalyst into one
pipeline stage (no per-message dispatch).

Handlers compose with ``chain`` (kawa composes by nesting handlers in
Go code); every combinator works identically on batch and streaming
DataFrames — the duality the engine guarantees.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Handler = Callable[[DataFrame], DataFrame]


def pipe() -> Handler:
    """Identity handler (/root/reference/types.go:137-145)."""
    return lambda df: df


def map_rows(*cols: Column | str) -> Handler:
    """1→1 transform: project/compute columns."""
    return lambda df: df.select(*cols)


def with_column(name: str, col: Column) -> Handler:
    return lambda df: df.withColumn(name, col)


def filter_rows(predicate: Column) -> Handler:
    """1→{0,1}: kawa models filtering as a handler returning an empty
    slice (/root/reference/processor.go:107-112)."""
    return lambda df: df.filter(predicate)


def flat_map(col: Column, alias: str = "value", keep: Sequence[str] = ()) -> Handler:
    """1→N: explode an array-producing expression."""
    return lambda df: df.select(*keep, F.explode(col).alias(alias))


def deser_json(schema, value_col: str = "value") -> Handler:
    """TransformUnmarshalJSON parity (/root/reference/types.go:163-167)."""
    return lambda df: df.withColumn(value_col, F.from_json(F.col(value_col), schema))


def chain(*handlers: Handler) -> Handler:
    """Compose handlers left-to-right."""

    def run(df: DataFrame) -> DataFrame:
        for h in handlers:
            df = h(df)
        return df

    return run
