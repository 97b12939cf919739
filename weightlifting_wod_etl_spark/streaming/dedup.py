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

    Works on batch frames too (plain dropDuplicates) so the same pipeline
    definition backfills and streams.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(keys))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
