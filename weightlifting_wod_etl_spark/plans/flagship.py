"""Flagship query — gap sessionization of the events stream (SURVEY.md §7.2).

The reference's semantic heart is boundary-detection sessionization
(``transforms.py:115-208``); this is the same operator applied to time
instead of text: scan → window (lag + running sum) → group-by aggregate.
One shuffle on ``user_id``; aggregation is partial/final (map-side combine)
courtesy of Catalyst — the plan survives a 100× scale-up because state per
key is O(sessions), never O(rows), and no driver collection happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import sum_fixed
from ..io import load_table
from ..operators.sessionize import gap_sessionize

GAP_SECONDS = 30 * 60


def sessionize_events(spark: SparkSession, sf_dir: str, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Per-user sessions with start/end/count/value rollups.

    Timestamps are compared at microsecond precision (``unix_micros``, in
    gap_sessionize) so results are identical across engines regardless of
    the parquet file's ns/us physical precision; the oracle mirrors with
    ``epoch_us``.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    sessions = gap_sessionize(
        events,
        ts_col="ts",
        partition_cols=["user_id"],
        gap_seconds=gap_seconds,
        tiebreak_cols=["event_id"],
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            # fixed-point cents (functions/money.py): a raw double sum
            # accumulates in partial-merge order and can flip the 2nd
            # decimal at a half-cent boundary between engines
            F.round(sum_fixed("value"), 2).alias("sum_value"),
        )
    )
    # no final orderBy: the harness sorts rows itself, and a global
    # range-sort exchange on the flagship would be pure presentation cost
    # (the wod_pipeline codifies the same rule)
