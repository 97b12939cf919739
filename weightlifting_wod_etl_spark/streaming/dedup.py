"""Streaming deduplication — the reference's idempotency ledger (OP3/OP18,
`services/idempotency_service.py:49-106`) as a stateful streaming operator.

The reference dedups replayed records against a DynamoDB ledger with a 24 h
TTL. Structured Streaming's ``dropDuplicatesWithinWatermark`` is the same
contract: keys seen within the watermark horizon are suppressed, state is
evicted once the watermark passes (the TTL), and the checkpoint makes the
suppression exactly-once across restarts.

Scale notes: state size is O(distinct keys per watermark window), not
O(stream history) — plain ``dropDuplicates`` on a stream never evicts and
OOMs eventually; the watermark variant is the only shape that runs forever.
The key should be the content hash (idempotency key), not an auto-id, so
replays with new ids still dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

DEFAULT_WATERMARK = "2 hours"


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """First-writer-wins by ``keys`` within the watermark horizon.

    Works on batch frames too so the same pipeline definition backfills
    and streams. The batch fallback is DETERMINISTIC: earliest ``ts_col``
    wins, remaining columns break exact ties (a plain ``dropDuplicates``
    keeps a partition-order-dependent survivor — the nondeterminism
    operators/dedup.py exists to prevent — so two identical backfills
    could disagree on payload for replayed keys)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        from ..operators.dedup import exact_dedup, orderable_order_cols

        # shared orderable tiebreaks (r12): the bare per-column version
        # crashed the whole backfill plan on any MapType-bearing column
        # (INVALID_ORDERING_TYPE) — the exact defect cdc_apply fixed r11,
        # now one definition in operators/dedup.py
        tiebreak = orderable_order_cols(events, set(keys) | {ts_col})
        return exact_dedup(
            events,
            key_cols=list(keys),
            order_cols=[F.col(ts_col).asc_nulls_last(), *tiebreak],
        )
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
