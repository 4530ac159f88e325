"""Expression-level let-binding.

Spark SQL has no ``LET``: referencing a Column twice duplicates its
whole expression tree, and inside higher-order-function lambdas each
array element re-evaluates every captured subtree (no common-
subexpression elimination on the interpreted path).  For an expression
like ``tokens(text)`` captured by a per-shingle lambda that turns an
O(k) shingle build into O(k) *re-tokenizations* per row — measured
20× slower on the documents table — and for the median's cumulative-
distribution array it produced multi-MiB codegen trees.

``let(value, body)`` evaluates ``value`` exactly once per row by
wrapping it in a 1-element array and handing it to ``body`` as a
``transform`` lambda variable (lambda variables are materialized
values, not expressions).  Nest for multiple bindings, or bind a
struct and pull fields — struct-field access on a lambda variable is
free.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let x = value in body(x)`` — ``value`` is evaluated once per
    row, however many times ``body`` references its argument."""
    return F.get(F.transform(F.array(value), body), 0)
