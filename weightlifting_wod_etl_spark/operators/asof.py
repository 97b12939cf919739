"""As-of join — for each left row, the most recent right row at-or-before it.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive encodings both
fail at 100 TB:
  - inequality join ``l.ts >= r.ts`` + argmax: Catalyst plans a broadcast
    nested-loop or cartesian — quadratic candidate blowup before the argmax
    prunes it;
  - per-key collect + Python bisect: driver-side state.

This implementation is the union-sort trick, a single shuffle on the join
key and zero row amplification:

  1. union left and right into one frame with a ``side`` marker and the
     right payload nulled on left rows;
  2. one window partitioned by key, ordered by (ts, side, tiebreak) with
     right rows sorting BEFORE left rows at equal ts (at-or-before includes
     ties) and duplicate right rows at the same (key, ts) sorted so the
     tie-break winner comes last;
  3. ``last(payload, ignorenulls=True)`` over rows unboundedPreceding →
     currentRow carries the latest right payload forward — which, by the
     sort order, is also the last-writer-wins winner among (key, ts) dups,
     so no separate dedup pass (and no second Exchange) is needed;
  4. keep left rows.

Cost: ONE Exchange on ``key`` + one in-partition sort — the same price as
a plain sort-merge join, independent of how many right rows precede each
left row (verified by plan-shape test: no Join node, one hashpartitioning
Exchange). Skewed keys behave like any skewed window (AQE cannot split a
window partition; pre-salt by coarse time bucket if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``right_ts <= left_ts`` per
    ``key``. Right payload columns come back prefixed; left rows with no
    prior right row keep nulls (left-outer semantics).

    ``tiebreak``: right column ordering duplicates within (key, right_ts);
    the max row wins (last-writer-wins, OP18 semantics). Without it,
    duplicate right timestamps make the carried payload nondeterministic.

    SQL ASOF semantics for NULLs: a right row with NULL key or NULL
    ``right_ts`` matches nothing (``c.ts >= p.ts`` is NULL-false in any
    SQL oracle) — without the filter below, a NULL right_ts sorted FIRST
    in its partition and its payload was carried into every left row with
    no earlier real match, and NULL keys matched each other through the
    window partition. Left rows with a NULL key simply never match
    (left-outer NULL payload), which the filtered union gives for free.
    """
    out_names = {f"{prefix}{c}" for c in right_payload}
    clash = [c for c in left.columns if c in out_names]
    if clash:
        # the final select would otherwise emit silent DUPLICATE column
        # names — ambiguous downstream, or positionally wrong (review r11:
        # a second asof pass over already-enriched rows hits this)
        raise ValueError(
            f"left columns {clash} collide with the prefixed payload "
            "output — pass a different prefix or rename them"
        )
    def _c(name: str):
        # backtick-quoted reference (review r12): a column NAME containing
        # a dot is legal in Spark, and both F.col(name) and df[name] parse
        # it as a nested field path; quoting forces exact-name resolution
        # (embedded backticks escape by doubling, Spark's own rule)
        return F.col("`" + name.replace("`", "``") + "`")

    tie = _c(tiebreak) if tiebreak is not None else F.lit(0)
    right = right.filter(_c(key).isNotNull() & _c(right_ts).isNotNull())
    payload = F.struct(*[_c(c) for c in right_payload])
    r_side = right.select(
        _c(key).alias("__key"),
        _c(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        payload.alias("__payload"),
    )
    l_side = left.select(
        _c(key).alias("__key"),
        _c(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        # left rows never affect the carry; any value of the right type works
        F.lit(None).cast(r_side.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r_side.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[_c(c) for c in left.columns]).alias("__row"),
    )
    r_side = r_side.withColumn("__row", F.lit(None).cast(l_side.schema["__row"].dataType))

    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r_side.unionByName(l_side).withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    # getField, not F.col("__row.c") string paths (review r12): a column
    # whose NAME contains a dot (legal in Spark) would be parsed as a
    # nested field path and fail resolution
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col("__row").getField(c).alias(c) for c in left.columns],
        *[
            F.col("__carried").getField(c).alias(f"{prefix}{c}")
            for c in right_payload
        ],
    )
    return out
