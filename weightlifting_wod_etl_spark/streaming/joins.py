"""Stream-stream event-time interval join — the streaming flavor of the
band range join (operators/rangejoin.py).

Why: correlating two live streams ("purchase within an hour of the
click") cannot buffer either side whole. Structured Streaming's
stream-stream join keys both sides' state by the equi-join key and uses
watermarks + the time-range predicate to bound how long a row waits for
a partner: a left row is dropped from state once the right watermark
passes ``left_ts + max_delay`` — state size is O(rows inside the
watermark horizon), never O(stream).

Scale notes: state is hash-partitioned by the join key across executors
(same layout as the batch shuffle join); the time-range condition is what
lets Spark evict — an interval join WITHOUT the range bound keeps state
forever. Inner joins emit a pair the moment both sides arrive; outer
variants additionally emit the unmatched row when the watermark proves no
partner can come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where ``right_ts`` lands within
    ``[left_ts, left_ts + max_delay]``.

    Works identically on batch and streaming frames (the batch plan simply
    ignores watermarks) — tests cross-check the streamed result against
    the batch join on the same data. Column names other than ``key`` must
    be disjoint between the two sides; the right key column is dropped
    from the output (coalesced into ``key`` first, so right/full outer
    rows keep their key instead of emitting NULL with the value dropped)."""
    from ..operators.util import require_free_columns

    rkey = f"__r_{key}"
    # loud clash guard (review r12, the repo's dunder-column rule): a
    # side already carrying __r_<key> would make the rename mint a
    # DUPLICATE column name — the join condition and the final
    # coalesce/drop then become ambiguous or silently drop both
    require_free_columns("interval_join", {rkey}, left, right)
    l_ = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    r_ = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r_ = r_.withColumnRenamed(key, rkey)
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    out = l_.join(r_, cond, how)
    if how.replace("_", "").lower() in ("leftsemi", "semi", "leftanti", "anti"):
        # semi/anti output carries LEFT columns only — the rkey coalesce
        # below would raise UNRESOLVED_COLUMN
        return out
    # under right/full outer an unmatched right row has key = NULL (left's
    # column) and rkey holding the only copy of its key — keep it
    out = out.withColumn(key, F.coalesce(F.col(key), F.col(rkey)))
    return out.drop(rkey)
