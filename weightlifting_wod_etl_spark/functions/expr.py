"""Expression-level utilities shared by operators.

``let`` exists because Catalyst's CollapseProject inlines deterministic
projection aliases into every downstream reference and performs no
common-subexpression elimination across them: an alias referenced K times
is COMPUTED K times. For cheap expressions that's free; for a regex chain
or an array pipeline it multiplies the hot path (measured ~10× on the
MinHash shingle pipeline, ~6× on slug date extraction, both at sf0.1).

``let(value, body)`` wraps ``value`` in a 1-element array and applies
``body`` via ``transform`` — higher-order-function lambda variables are
evaluated once per row, giving real let-binding semantics inside a single
whole-stage-codegen'd expression. Works for any value type incl. structs
(bind several subexpressions at once as one struct).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; pass it to ``body`` as a lambda var."""
    return F.element_at(F.transform(F.array(value), body), 1)
