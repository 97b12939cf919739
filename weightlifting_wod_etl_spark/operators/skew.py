"""Skew mitigation — salted aggregation and replicated-salted joins.

Why this exists even though AQE has skew handling: AQE's skew-join split
only rescues *sort-merge* joins whose skewed partitions are detected at
runtime, and it does nothing for a hash aggregation whose single hot key
funnels into one reducer. At 100 TB a zipfian key (one user with 1% of all
events = 1 TB on one task) needs the classic remedies:

  - **two-phase salted aggregation**: append a salt in [0, B) derived from
    a high-cardinality column, pre-aggregate on (key, salt) — the hot key's
    rows land on B reducers instead of 1 — then merge the partials on the
    bare key. Algebraic aggregates (sum/count/min/max) merge losslessly;
    avg is carried as (sum, count).
  - **replicated-salted join**: the big side salts each row; the small side
    is exploded ×B so every (key, salt) pair exists; the equi-join on
    (key, salt) then spreads the hot key over B tasks. Output is
    row-identical to the unsalted join (verified by the q_skew_* oracles).

The salt must be DETERMINISTIC under task retry (Spark may recompute a
partition after a fetch failure): derive it from data (hash of a unique
column) — never ``rand()``, which silently duplicates/loses rows on retry
with non-idempotent downstream sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partials
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    # count(col) — null-skipping, like the direct groupBy's F.count(col).
    # count(*) here silently over-counted groups with nulls in the named
    # column, contradicting the (column, fn, alias) signature.
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def _check_salt_clash(*dfs: DataFrame) -> None:
    """withColumn would silently REPLACE a caller column named __salt and
    the final drop would delete it from the output (review r11; shared
    guard since r12 — see operators/util.require_free_columns)."""
    from .util import require_free_columns

    require_free_columns("the salting operator", {"__salt"}, *dfs)


def deterministic_salt(unique_col: str | Column, buckets: int) -> Column:
    """Salt in [0, buckets) stable across task retries (data-derived)."""
    return F.pmod(F.xxhash64(unique_col), F.lit(buckets)).cast("int")


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_on: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: (column, fn, alias) with fn in sum|count|min|max. Phase 1
    reduces on (keys + salt) — map-side combine still applies — phase 2
    merges partials on the bare keys. Result equals the direct groupBy.
    """
    _check_salt_clash(df)
    bad = [fn for _, fn, _ in aggs if fn not in _PARTIAL]
    if bad:
        # a bare KeyError named neither the supported set nor the
        # avg = (sum, count)/count decomposition the docstring advertises
        raise ValueError(
            f"unsupported salted aggregate fn(s) {bad}: supported are "
            f"{sorted(_PARTIAL)} — express avg as separate sum and count "
            "partials and divide after the merge"
        )
    salted = df.withColumn("__salt", deterministic_salt(salt_on, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_PARTIAL[fn](col).alias(alias) for col, fn, alias in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](alias).alias(alias) for _, fn, alias in aggs]
    )


def replicated_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side ×B.

    Use when the big side's join key is zipfian and the small side is too
    large to broadcast outright but small enough to replicate B-fold
    (cost: B× shuffle volume of the small side — still tiny next to one
    straggler task holding the hot key's entire partition).

    ``how`` is restricted to joins that preserve row-identity under
    small-side replication (inner / left / left_semi / left_anti /
    cross): a right or full outer join would emit ``buckets`` null-padded
    copies of every unmatched small-side row — silently wrong counts.
    """
    # normalize the way Spark's own JoinType parser does (lowercase,
    # underscores stripped), so every canonical alias of a row-identity-
    # safe join is accepted — 'leftsemi', 'semi', 'leftanti', 'anti',
    # 'leftouter' were wrongly refused before with a message blaming
    # outer-join replication semantics (review r12)
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi",
                    "leftanti", "anti", "cross"):
        raise ValueError(
            f"how={how!r} unsupported: small-side replication emits "
            f"{buckets} copies of each unmatched small row under "
            "right/full outer — use the unsalted join (AQE skew split) there"
        )
    _check_salt_clash(big, small)
    b = big.withColumn("__salt", deterministic_salt(salt_on, buckets))
    s = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(buckets)]))
    )
    cond = (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"])
    return b.join(s, cond, how).drop("__salt")
