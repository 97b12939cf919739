"""Sessionization operators — the semantic heart of the reference.

The reference sub-divides an ordered list of text lines into groups opened by
regex-matching "marker" lines (reference ``transforms.py:10-39,115-208``:
``partition_by`` + ``get_pairwise_series_indexes`` + ``get_groups``), and the
same boundary-detection idea applies to time-gap sessionization of event
streams.

Spark-native design: instead of materializing pairwise index ranges and
slicing lists (a driver-side O(n) loop in the reference), we express the
boundary detection as window functions over a long/exploded frame:

    marker      = line rlike pattern                      (OP6)
    group_id    = running sum of marker over order        (OP7+OP8 fused)
    groups      = groupBy(partition, group_id)

This shuffles once on the partition key, streams within the window, and
never collects to the driver — it scales to any number of posts/users
because the window partitions by the entity key, not the whole dataset.

Correctness traps preserved (SURVEY.md §2.3):
  - a marker line belongs to the group it OPENS (running sum increments at
    the marker row itself);
  - content before the first marker is DROPPED (group_id = 0 filtered out);
  - the final group extends to end-of-input (no explicit close needed —
    running sum naturally covers the tail);
  - a partition with EXACTLY ONE marker yields NO groups: the reference
    builds groups from pairwise(marker_indexes) and only appends the
    tail range when at least one pair exists (transforms.py:119-127), so
    a single marker produces an empty index list — verified by executing
    the reference. Every row of such a partition keeps group id 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame,
    text_col: str = "text",
    id_cols: list[str] | None = None,
    sep: str = "\n",
    line_col: str = "line",
    idx_col: str = "line_idx",
) -> DataFrame:
    """OP5 — split text into ordered lines, long form.

    Reference: ``transforms.py:156`` (``post_text_str.split('\\n')``).
    ``posexplode`` keeps the ordinal, which every downstream sessionization
    step orders by — no row order assumptions survive a shuffle otherwise.

    A NULL ``text_col`` row emits ZERO lines (inner posexplode) — the
    entity vanishes from everything downstream. DELIBERATE: the oracle
    mirrors (unnest over string_split) drop the row identically, and the
    reference raises per-record on None text, which a distributed job
    cannot do row-by-row; use ``posexplode_outer`` upstream if an empty
    record must survive.
    """
    id_cols = id_cols or []
    # \Q..\E: F.split treats the separator as a Java regex — sep='.' would
    # otherwise split at EVERY character boundary (quoting is a no-op for
    # the default '\n')
    return df.select(
        *id_cols,
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E")).alias(
            idx_col, line_col
        ),
    )


def mark_boundaries(
    df: DataFrame,
    marker: Column,
    partition_cols: list[str],
    order_col: str,
    group_col: str = "group_id",
    drop_preamble: bool = True,
) -> DataFrame:
    """OP6+OP7+OP8 fused — assign a group id to every row from boundary markers.

    ``marker`` is any boolean Column (typically ``col('line').rlike(pat)``).
    Running ``sum(marker)`` over (partition, order) assigns each row the id of
    the most recent marker at-or-before it — the window-function equivalent of
    the reference's pairwise index ranges (``transforms.py:19-30``) + slice
    gather (``transforms.py:33-39``), with the tail group closed for free.

    ``drop_preamble=True`` reproduces the reference semantics where content
    before the first marker is never emitted.

    Both windows share one partitioning, so the whole-partition marker
    count adds no exchange — just a second frame over the same sort.
    """
    # asc_nulls_last: callers today pass non-null posexplode ordinals,
    # but an unpinned nullable order would put NULL rows in group 0 on
    # Spark and the tail group on a NULLS-LAST engine (the repo's
    # recurring asc-null divergence class — review r11)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(order_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*partition_cols)
    running = F.sum(marker.cast("int")).over(w)
    n_markers = F.sum(marker.cast("int")).over(w_all)
    # reference pairwise rule: < 2 markers -> no groups (all rows id 0)
    out = df.withColumn(
        group_col, F.when(n_markers >= 2, running).otherwise(F.lit(0).cast("bigint"))
    )
    if drop_preamble:
        out = out.filter(F.col(group_col) > 0)
    return out


def sessionize_by_marker(
    df: DataFrame,
    pattern: str,
    partition_cols: list[str],
    order_col: str = "line_idx",
    line_col: str = "line",
    group_col: str = "group_id",
    drop_preamble: bool = True,
) -> DataFrame:
    """OP9 — composite sessionizer: regex marker → per-row group id.

    Reference: ``group_source_by(regex, source)`` at ``transforms.py:115-128``.
    Returns the input rows + ``group_col``; aggregate/pivot downstream.
    ``drop_preamble`` forwards to :func:`mark_boundaries` so the
    segment-level pass no longer needs to bypass this composite
    (review r11).
    """
    return mark_boundaries(
        df,
        marker=F.col(line_col).rlike(pattern),
        partition_cols=partition_cols,
        order_col=order_col,
        group_col=group_col,
        drop_preamble=drop_preamble,
    )


def gap_sessionize(
    df: DataFrame,
    ts_col: str,
    partition_cols: list[str],
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Time-gap sessionization — OP9's pattern on time instead of text.

    A row opens a new session when it is the first for its key or arrives
    more than ``gap_seconds`` after the previous row. Same
    marker→running-sum shape as :func:`mark_boundaries`, so it costs one
    shuffle on the entity key and scales with key cardinality.

    ``tiebreak_cols`` make the window order total when timestamps can
    collide — required for deterministic output under parallelism.
    Gap comparison happens at microsecond precision (``unix_micros``) so the
    result is independent of the source file's physical timestamp unit.
    NULL placement is pinned LAST: Spark's ascending default is NULLS
    FIRST while DuckDB/Postgres sort NULLS LAST, so an unpinned order
    diverges the moment a timestamp is missing (a NULL-ts row opens a
    phantom leading session on one engine only).

    NULL-timestamp rows (sorted last) JOIN the final session: they are
    neither the partition's first row nor provably gap-late, so under
    the documented rule they never open one. (The previous formulation
    tested ``lag(ts) IS NULL`` for 'first row', which also fired for the
    row AFTER a NULL-ts row — the second and every later trailing NULL
    each opened a phantom singleton session, review r11.) The window
    orders by the SAME microsecond expression the gap math uses, so a
    string or epoch-integer ``ts_col`` can never sort lexicographically
    while the deltas compare temporally.
    """
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order_cols = [
        ts_us.asc_nulls_last(),
        *[F.col(c).asc_nulls_last() for c in (tiebreak_cols or [])],
    ]
    w_order = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    prev_us = F.lag(ts_us).over(w_order)
    is_new = (F.row_number().over(w_order) == 1) | F.coalesce(
        ts_us - prev_us > F.lit(gap_seconds * 1_000_000), F.lit(False)
    )
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new.cast("int")).over(w_run))
