"""foreachBatch twin sink — the streaming flavor of OP20 + OP3.

The reference's Parallel state persists the same records to DynamoDB and S3
concurrently (SemiStructureInvictusPost_stateMachine.yml:59-110), guarded by
the idempotency ledger. In Structured Streaming the analog is a
``foreachBatch`` writer: one micro-batch, cached once, fanned to two sinks,
with exactly-once semantics built from two independent mechanisms:

1. each sink writes ``mode=overwrite`` into a ``batch_id=N`` subdirectory —
   a replayed micro-batch (failure between the two writes, checkpoint
   rollback) overwrites its own partial output instead of appending dupes;
2. a completion marker per batch id short-circuits fully-committed replays
   (the OP3 ledger, keyed by batch id instead of content hash).

Scale notes: the batch DataFrame is persisted before the fan-out so the
upstream plan (shuffles included) runs ONCE, not once per sink; the marker
store here is a local dir — on a cluster it would be the same object store
as the sinks (rename-commit), but the protocol is identical.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def make_twin_sink(
    parquet_dir: str, jsonl_dir: str, ledger_dir: str
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function writing each batch to parquet AND
    JSONL, idempotent under micro-batch replay."""
    os.makedirs(ledger_dir, exist_ok=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return  # fully committed on a previous attempt — elide all work
        batch_df.persist()
        try:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(parquet_dir, f"batch_id={batch_id}")
            )
            batch_df.write.mode("overwrite").json(
                os.path.join(jsonl_dir, f"batch_id={batch_id}")
            )
        finally:
            batch_df.unpersist()
        with open(marker, "w"):
            pass

    return write_batch
