"""Shared operator plumbing."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def require_free_columns(
    op_name: str, reserved: Iterable[str], *dfs: DataFrame
) -> None:
    """Loud clash guard for dunder working columns.

    ``withColumn`` silently REPLACES a caller column of the same name,
    and the operator's final drop/select then deletes or corrupts it —
    so every operator that mints working columns must refuse colliding
    input up front. ONE shared definition (review r12): skew, bloomjoin,
    rangejoin, and percentile each hand-rolled a copy of this check (or,
    for percentile, had none), and independent copies drift.
    """
    reserved = set(reserved)
    clash = sorted({c for df in dfs for c in df.columns if c in reserved})
    if clash:
        raise ValueError(
            f"input columns {clash} collide with {op_name}'s working "
            "columns — rename them before calling"
        )
