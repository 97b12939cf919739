"""CDC apply — a change stream materialized into a queryable table via
MERGE per micro-batch.

The canonical change-data-capture consumer: each micro-batch carries
upserts and deletes (an ``op`` column: 'U'/'I' vs 'D') with a sequence
column establishing order. The batch is first collapsed to one winning
change per key (last by sequence — a batch may contain several changes
to the same key), then deletes and upserts apply through
``operators/merge.py``'s atomic versioned commits.

Replay safety: applying the same collapsed batch twice is a no-op by
construction (an upsert overwrites with identical rows; a delete of an
absent key deletes nothing), so Spark's at-least-once ``foreachBatch``
delivery converges without a ledger. Cross-batch ordering is the
source's responsibility (sequence numbers monotone per key), the same
contract Debezium/Kafka-connect sinks carry.

Scale: the merge joins are keyed on the CDC key and the change batch is
small relative to the table — broadcast-friendly; the table rewrite is
the documented parquet-level cost (Delta MERGE rewrites only matched
files; the commit protocol and join plan are identical).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..operators.merge import merge_into


def make_cdc_apply(
    target_path: str,
    on: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function applying a change stream to
    ``target_path``. Rows keep every column except ``op_col``/``seq_col``
    when written."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # TOTAL order for the in-batch collapse: seq first, then every
        # remaining column as tie-breakers. Ordering by seq alone would
        # pick a partition-order-dependent winner when a producer emits
        # two changes at the same sequence value — the first application
        # and an at-least-once replay could then disagree, breaking the
        # replay-idempotence contract above.
        def orderable(dt) -> bool:
            # MapType (and anything containing one) is not orderable in
            # Spark — a Debezium-style map payload column in the ORDER BY
            # would reject the whole plan on the first micro-batch
            from pyspark.sql.types import ArrayType, MapType, StructType

            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(orderable(f.dataType) for f in dt.fields)
            return True

        tiebreak = [
            # unorderable columns still participate via their JSON text so
            # the order stays TOTAL (to_json is deterministic for the same
            # physical map data; a same-seq producer emitting logically
            # equal maps with different key order remains the caller's
            # cross-batch-contract problem, same as any same-seq tie)
            (F.col(c) if orderable(f.dataType) else F.to_json(F.col(c))).desc()
            for c, f in zip(batch_df.columns, batch_df.schema.fields)
            if c not in set(on) | {seq_col}
        ]
        latest = exact_dedup(
            batch_df, key_cols=list(on),
            order_cols=[F.col(seq_col).desc(), *tiebreak],
        )
        latest.persist()
        try:
            deletes = latest.filter(F.col(op_col) == delete_op).select(*on)
            # non-delete INCLUDING a null/unknown op is an upsert: a plain
            # != would evaluate NULL for a malformed row and silently drop
            # the change from both branches
            upserts = latest.filter(
                ~F.col(op_col).eqNullSafe(F.lit(delete_op))
            ).drop(op_col, seq_col)
            if deletes.limit(1).count():
                merge_into(
                    spark, target_path, deletes, on,
                    when_matched="delete", when_not_matched="ignore",
                )
            if upserts.limit(1).count():
                merge_into(spark, target_path, upserts, on)
        finally:
            latest.unpersist()

    return apply_batch
