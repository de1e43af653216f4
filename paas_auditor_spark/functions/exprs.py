"""Expression-level utilities shared by the column-function modules."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` to a name evaluated once per row inside ``body``.

    Spark evaluates an outer expression referenced inside a higher-order
    function's lambda once per *array element* (there is no loop-invariant
    hoisting through HOF lambdas), so e.g. a tokenizer feeding a per-shingle
    ``transform`` re-runs its regex split for every shingle.  Wrapping the
    expression as the single element of an array and passing it through
    ``transform`` makes it the lambda argument — evaluated exactly once per
    row — at the cost of one 1-element array allocation.
    """
    return F.transform(F.array(value), body)[0]
