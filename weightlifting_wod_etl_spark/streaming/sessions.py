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
            if last_us is None:
                start_us, last_us, n, total = t, t, 1, v
            elif t > last_us + gap_us:
                out.append((user_id, start_us, last_us, n, total))
                start_us, last_us, n, total = t, t, 1, v
            elif t < start_us - gap_us:
                # very-late event (inside the watermark, before the open
                # session's reach): its own session is already gone, and
                # single-session state cannot retro-merge — emit it as a
                # singleton session rather than silently regressing the
                # open session's bounds (which produced end < start rows)
                out.append((user_id, t, t, 1, v))
            else:
                # in or adjacent to the open session, possibly out of
                # order within the watermark: extend bounds, NEVER regress
                start_us = min(start_us, t)
                last_us = max(last_us, t)
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


def make_gap_session_processor(gap_seconds: int = 1800):
    """Build the ``StatefulProcessor`` behind :func:`tws_gap_sessionize`.

    Factored out so its session logic is unit-testable against fake
    handles/state even where the transformWithState RUNTIME is absent
    (the API's driver worker imports ``google.protobuf``, which this
    container does not ship — the end-to-end streaming test skips there;
    see test_streaming.py). The class is defined inside the factory so
    cloudpickle ships it by value: Python workers cannot import this
    package."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    class GapSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState(
                "open_session", "start_us long, last_us long, n long, total double"
            )

        def _emit(self, user_id, s):
            import pandas as pd

            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.to_datetime(s[0], unit="us")],
                    "session_end": [pd.to_datetime(s[1], unit="us")],
                    "n_events": [s[2]],
                    "sum_value": [round(s[3], 2)],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            ts, vals = [], []
            for pdf in rows:
                ts.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
                vals.extend(float(v) for v in pdf["value"])
            order = sorted(range(len(ts)), key=lambda i: ts[i])
            cur = self._state.get() if self._state.exists() else None
            if cur is not None:
                start_us, last_us, n, total = cur
            else:
                start_us = last_us = None
                n, total = 0, 0.0
            for i in order:
                t, v = ts[i], vals[i]
                if last_us is None:
                    start_us, last_us, n, total = t, t, 1, v
                elif t > last_us + gap_us:
                    yield self._emit(user_id, (start_us, last_us, n, total))
                    start_us, last_us, n, total = t, t, 1, v
                elif t < start_us - gap_us:
                    # very-late event before the open session's reach:
                    # emit as a singleton (same rationale as the
                    # applyInPandasWithState variant above)
                    yield self._emit(user_id, (t, t, 1, v))
                else:
                    # out-of-order within the watermark: extend, never
                    # regress — a regressed last_us would also re-arm the
                    # close timer at an earlier horizon and flush the open
                    # session prematurely
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
                    n += 1
                    total += v
            self._state.update((start_us, last_us, n, total))
            # (re-)arm the close timer: fires once the watermark passes the
            # open session's gap horizon
            self._handle.registerTimer(last_us // 1000 + gap_seconds * 1000)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if self._state.exists():
                s = self._state.get()
                # the timer may be stale (session extended since armed):
                # only close if the gap horizon has truly passed
                if (
                    expiredTimerInfo.getExpiryTimeInMs()
                    >= s[1] // 1000 + gap_seconds * 1000
                ):
                    yield self._emit(user_id, s)
                    self._state.clear()

        def close(self) -> None:
            pass

    return GapSessionProcessor()


def tws_gap_sessionize(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Gap sessionizer on the Spark 4 ``transformWithStateInPandas`` API —
    the successor to applyInPandasWithState, and the variant that closes
    the old API's semantic gap: an EVENT-TIME TIMER fires when the
    watermark passes (last_event + gap), so an idle user's final session
    is EMITTED instead of parked forever in state.

    State layout: one ValueState row per user (open session aggregate).
    Scale: state is O(open sessions) in the RocksDB store (required by
    this API — incremental checkpoints, spill-to-disk, so state size is
    bounded by disk not heap); each micro-batch touches only keys with
    input rows or expiring timers.

    Runtime requirement: the transformWithState driver worker imports
    ``google.protobuf`` — on environments without it (this container),
    use :func:`stateful_gap_sessionize`; the processor logic itself is
    shared-tested via :func:`make_gap_session_processor`."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").transformWithStateInPandas(
        make_gap_session_processor(gap_seconds),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
