"""Streaming sessionization — the reference's micro-batch trigger (OP21)
and idempotency state (OP3) mapped to Structured Streaming.

Reference context: EventBridge fires the pipeline every 10 minutes
(``serverless/resources.yml:97``) and a DynamoDB TTL ledger dedups replays
(``services/idempotency_service.py:75-106``). In Spark those are the
trigger cadence and checkpointed state respectively; the session operator
itself is the same boundary-detection idea as the batch gap sessionizer,
expressed two ways:

  - ``session_window_agg``: the built-in gap-merged session window with a
    watermark — at scale, state per key is O(open sessions), late data
    beyond the watermark is dropped (the streaming analog of the
    reference's TTL'd idempotency skips).
  - ``stateful_gap_sessionize``: applyInPandasWithState with explicit
    per-user state — the shape to extend when session logic outgrows the
    built-in (e.g. per-session feature accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"
DEFAULT_WATERMARK = "2 hours"


def session_window_agg(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Gap-merged session windows per user: start/end/count/value rollup.

    Works identically on a batch or streaming DataFrame — the streaming
    flavor just needs the watermark to bound state.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


STATE_SCHEMA = "start_us long, last_us long, n long, total double"
OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)


def stateful_gap_sessionize(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Custom stateful sessionizer: applyInPandasWithState keyed by user.

    Emits a session row whenever a gap closes it; the open session lives in
    group state (and would emit on event-time timeout in production). The
    closure is SELF-CONTAINED — Python workers cannot import this package.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        ts_list = []
        val_list = []
        for pdf in pdf_iter:
            ts_list.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
            val_list.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0
        out = []
        for i in order:
            t, v = ts_list[i], val_list[i]
            if last_us is not None and t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n, total))
                start_us, n, total = t, 0, 0.0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
            total += v
        state.update((start_us, last_us, n, total))
        if out:
            df = pd.DataFrame(
                out, columns=["user_id", "s", "e", "n_events", "sum_value"]
            )
            yield pd.DataFrame(
                {
                    "user_id": df.user_id,
                    "session_start": pd.to_datetime(df.s, unit="us"),
                    "session_end": pd.to_datetime(df.e, unit="us"),
                    "n_events": df.n_events,
                    "sum_value": df.sum_value.round(2),
                }
            )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
