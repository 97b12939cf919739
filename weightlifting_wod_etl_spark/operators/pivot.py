"""Ordered group-concat + pivot-to-wide — OP14 of the reference.

Reference: ``sessions_to_json_records_by_day`` (``transforms.py:250-259``)
builds ``{segment_key: ' '.join(lines)}`` per day. The Spark translation has
one famous trap (SURVEY.md §2.3-6): ``collect_list`` ordering is undefined
under shuffle. We make the concat deterministic by collecting
``struct(order, value)`` and ``array_sort``-ing before joining — the sort
happens inside the aggregation buffer per group, no extra shuffle.

Pivot always takes an EXPLICIT values list: the implicit form plans a second
job just to enumerate keys, which at 100 TB is a full extra scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_concat_expr(order_col: str, value_col: str, sep: str = " ") -> Column:
    """Aggregate expression: values joined by ``sep`` in ``order_col`` order.

    The sort key is ``struct(order IS NULL, order, value)``: the leading
    null flag pins NULL order keys LAST (struct array_sort alone treats a
    null field as SMALLEST, while SQL ``string_agg(... ORDER BY o)``
    defaults to NULLS LAST — the engine's recurring asc-null divergence
    class), and the trailing value makes ties on the order key
    deterministic rather than shuffle-order-dependent.

    All-NULL-value groups return NULL, matching SQL ``string_agg``
    (review r15, confirmed against DuckDB): ``array_join`` over an array
    of null elements yields ``''`` while ``string_agg`` over only NULLs
    yields NULL — unreachable from the current call sites (split/explode
    never emit NULL elements) but a silent '' vs NULL seam for any
    future caller aggregating a nullable column. NULL values WITHIN a
    mixed group are skipped by both engines (array_join skips null
    elements; string_agg skips NULL inputs)."""
    pairs = F.collect_list(
        F.struct(
            F.col(order_col).isNull().alias("z"),
            F.col(order_col).alias("o"),
            F.col(value_col).alias("v"),
        )
    )
    joined = F.array_join(
        F.transform(F.array_sort(pairs), lambda s: s.getField("v")), sep
    )
    return F.when(F.count(F.col(value_col)) > 0, joined)


def ordered_group_concat(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "joined",
    sep: str = " ",
) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        ordered_concat_expr(order_col, value_col, sep).alias(out_col)
    )


def pivot_wide(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    values: list[str],
    agg_expr: Column,
) -> DataFrame:
    """Pivot ``key_col`` into one column per value with explicit values.

    Reference analog: one record per day with one column per segment key
    (``transforms.py:250-259``).
    """
    return df.groupBy(*group_cols).pivot(key_col, values).agg(agg_expr)
