"""Incremental aggregate-view maintenance — merge an increment's partial
aggregates into a materialized rollup without rescanning the base table.

The 100 TB pattern: a daily increment against a petabyte-scale rollup must
cost O(increment + |affected groups|), never O(base). That requires every
measure to be MERGEABLE — expressible as a commutative monoid so that
``agg(base ∪ incr) == merge(agg(base), agg(incr))``:

  - count     → sum of partial counts
  - sum       → sum of partial sums (integer fixed-point for money —
                functions/money.py — so the merge is order-free and exact)
  - min / max → min / max of partials
  - avg       → derived at READ time from (sum, count); never stored
  - count-distinct → an HLL sketch column (``hll_sketch_agg`` /
                ``hll_union_agg``): sketch-of-union == union-of-sketches,
                so re-aggregation stays exact w.r.t. the sketch at any
                merge depth. The exact distinct is NOT mergeable — that is
                the whole reason sketches exist at scale.

Non-mergeable measures (median, mode, top-k) need either a mergeable
sketch twin (t-digest — operators/tdigest.py) or a rebuild of affected
groups only (the partition-scoped path ``sinks.kv_upsert_parquet`` uses).

The merge itself is one shuffle keyed on the rollup's group key over
|existing groups touched| + |increment groups| rows — partial-aggregated
map-side, so the wire carries group-level rows, never raw data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Measure:
    """A mergeable measure: ``kind`` ∈ {count, sum, min, max, hll}."""

    name: str
    kind: str
    source: str | None = None  # unused for count

    def build_expr(self) -> Column:
        if self.kind != "count" and not self.source:
            # F.sum(None) otherwise dies deep in pyspark column coercion
            # with an opaque TypeError instead of naming the mistake
            # (review r11; '' is rejected here too, not coerced to None)
            raise ValueError(
                f"{self.kind!r} measure {self.name!r} requires a source "
                "column (only 'count' is source-less)"
            )
        src = F.col(self.source) if self.source else None
        if self.kind == "count":
            return F.count(F.lit(1)).alias(self.name)
        if self.kind == "sum":
            return F.sum(src).alias(self.name)
        if self.kind == "min":
            return F.min(src).alias(self.name)
        if self.kind == "max":
            return F.max(src).alias(self.name)
        if self.kind == "hll":
            return F.hll_sketch_agg(src).alias(self.name)
        raise ValueError(f"not a mergeable measure kind: {self.kind}")

    def merge_expr(self) -> Column:
        col = F.col(self.name)
        if self.kind in ("count", "sum"):
            return F.sum(col).alias(self.name)
        if self.kind == "min":
            return F.min(col).alias(self.name)
        if self.kind == "max":
            return F.max(col).alias(self.name)
        if self.kind == "hll":
            return F.hll_union_agg(col).alias(self.name)
        raise ValueError(f"not a mergeable measure kind: {self.kind}")


def build_rollup(df: DataFrame, keys: list[str], measures: list[Measure]) -> DataFrame:
    """Aggregate raw rows into the rollup's group-level representation."""
    return df.groupBy(*keys).agg(*[m.build_expr() for m in measures])


def merge_rollup(
    existing: DataFrame, increment: DataFrame, keys: list[str], measures: list[Measure]
) -> DataFrame:
    """Merge two rollups (e.g. the materialized view and a freshly built
    increment rollup) into one: union then re-aggregate with each
    measure's MERGE form. Associative — chain daily increments forever
    and the result equals a full rebuild."""
    return (
        existing.unionByName(increment)
        .groupBy(*keys)
        .agg(*[m.merge_expr() for m in measures])
    )
