"""Higher-order-function helpers.

``bind`` is a let-binding for Column expressions consumed inside HOF
lambdas. Catalyst does not common-subexpression-eliminate across a
lambda boundary: a lambda body that references an outer expression
(e.g. ``split(lower(text))``) re-evaluates that expression at EVERY
element of the collection being transformed. For per-position lambdas
over the same array this turns an O(n) pass into O(n²) per row —
measured 3.5 s → 0.8 s on the sf0.1 shingle scan, the CPU floor of
the dedup/decontamination tier at 100 TB.

``bind(col, body)`` evaluates ``col`` exactly once per row by wrapping
it in a single-element array and handing it to ``body`` as a lambda
variable (lambda variables are row-local VALUES, not expressions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row; ``body`` receives it as a bound
    lambda variable safe to reference any number of times (including
    inside nested HOF lambdas) without re-evaluation."""
    return F.get(F.transform(F.array(col), body), 0)


def bigrams(words: Column) -> Column:
    """Adjacent-pair shingles of a word array, safely EMPTY for 0/1-word
    inputs. The unguarded form — ``sequence(1, size-1)`` — crashes on
    short docs: Spark's ``sequence(1, 0)`` infers step -1 and yields
    ``[1, 0]``, so ``slice(ws, 0, 2)`` throws
    INVALID_PARAMETER_VALUE.START at runtime, while DuckDB's
    ``generate_series(1, 0)`` is empty. The ``when(size >= 2, ...)``
    guard matches the oracle's empty-series semantics exactly
    (``explode`` of ``[]`` produces zero rows, same as an empty
    UNNEST)."""
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
