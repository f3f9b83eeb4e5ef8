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
