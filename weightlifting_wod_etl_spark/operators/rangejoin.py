"""Pure range join (no equi key) via bin bucketing.

``points JOIN intervals ON start <= ts < end`` with no equality conjunct
gives Catalyst nothing to hash on — it plans BroadcastNestedLoopJoin
(fine only while intervals fit in one broadcast) or a cartesian product.
At 100 TB neither survives.

Bin bucketing manufactures the missing equi key: split the time axis into
fixed-width bins, tag each point with its bin, emit each interval once per
bin it overlaps, equi-join on the bin, then re-check the exact predicate.
The join becomes an ordinary shuffled hash/sort-merge join keyed on a
uniformly distributed integer:

  - shuffle volume: points once, intervals × ceil(width/bin + 1) — choose
    ``bin_width`` ≈ the typical interval width so the replication factor
    stays ~2;
  - each (point, interval) pair meets in EXACTLY ONE bin (the point's own),
    so no post-join distinct is needed;
  - skew: a hot time range is spread over many bins; AQE's skew-join
    split handles a residual hot bin.

This is the standard trick behind interval-join engines (GenomicsDB /
Databricks range-join hints use the same binning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bin_of(ts: Column, bin_width_s: int) -> Column:
    # unix_micros keeps the timestamp integral; the double division below is
    # safe because epoch-us / (1e6 * width) ≈ 1e6-1e7, where one double ulp
    # is far smaller than the 1-us gap to the next bin boundary.
    # cast("timestamp") tolerates TIMESTAMP_NTZ inputs (session TZ is pinned
    # UTC, so the reinterpretation is deterministic); it is a no-op on
    # TIMESTAMP — same pattern as sessionize.py.
    us = F.unix_micros(ts.cast("timestamp"))
    return F.floor(us / F.lit(1_000_000 * bin_width_s)).cast("bigint")


def band_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: int,
    max_bins_per_interval: int | None = 100_000,
) -> DataFrame:
    """Inner-join ``points`` to ``intervals`` on
    ``start_ts <= point_ts < end_ts`` (half-open), shuffling on time bins
    of ``bin_width_s`` seconds instead of a nested loop.

    Column names must be disjoint between the two frames (select/alias
    before calling); the result carries all columns from both.

    ``max_bins_per_interval`` is the dirty-data guard: one interval row
    with a corrupt far-future ``end_ts`` would otherwise materialize a
    multi-billion-element bin array (array-size abort / OOM) and take the
    whole job with it. Intervals spanning more bins are EXCLUDED from the
    join — at the default (100k bins), that is an interval longer than
    100k × bin_width, data-error territory; size ``bin_width_s`` so real
    intervals span a handful of bins, or pass ``None`` to disable.
    REVERSED intervals (``end_ts < start_ts``) are always excluded: their
    bin difference is hugely NEGATIVE — it passed the ``< max_bins``
    check, and ``F.sequence(hi, lo)`` auto-steps -1 and would materialize
    the same multi-million-element array the guard exists to prevent
    (review r11); a reversed interval also matches no point under the
    exact ``start <= p < end`` filter, so dropping it is semantics-free.
    """
    from .util import require_free_columns

    require_free_columns(
        "band_range_join", {"__bin", "__bins"}, points, intervals
    )
    p = points.withColumn("__bin", _bin_of(F.col(point_ts), bin_width_s))
    iv = intervals.filter(F.col(end_ts) >= F.col(start_ts))
    if max_bins_per_interval is not None:
        iv = iv.filter(
            _bin_of(F.col(end_ts), bin_width_s)
            - _bin_of(F.col(start_ts), bin_width_s)
            < F.lit(max_bins_per_interval)
        )
    iv = iv.withColumn(
        "__bins",
        F.sequence(
            _bin_of(F.col(start_ts), bin_width_s),
            # end is exclusive: the last overlapped bin is bin(end - 1us),
            # but a cheap upper bound bin(end) only over-replicates by one
            # row per interval and the exact filter removes false hits.
            _bin_of(F.col(end_ts), bin_width_s),
        ),
    ).select("*", F.explode("__bins").alias("__bin")).drop("__bins")

    joined = p.join(iv, "__bin").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bin")
