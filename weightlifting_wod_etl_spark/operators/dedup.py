"""Deduplication operators — OP3 (idempotent-write guard) + M6 exact dedup.

Reference: ``IdempotencyService`` (``services/idempotency_service.py:27-106``)
skips work whose sha256("op:identifier") key exists in a ledger table. The
Spark-native form is a LEFT ANTI JOIN against the ledger — Catalyst
broadcasts the ledger when it is small, otherwise AQE picks a shuffled hash
join; either way it is one pass over the big side, no driver round-trips.

Exact dedup keeps ONE deterministic canonical row per key via row_number
over an explicit total order — never ``dropDuplicates``, whose survivor is
partition-order-dependent and breaks oracle comparison (and reproducibility
at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def idempotency_key(op: str, identifier: Column | str) -> Column:
    """sha256 hex of 'op:identifier' — reference keygen at
    services/idempotency_service.py:27-40.

    NULL identifier → NULL key (``concat`` null-propagates, matching SQL's
    ``sha256('op:' || id)``); ``concat_ws`` would instead collapse every
    null-identifier row onto the shared key sha256('op'), letting one
    ledger hit suppress ALL of them through the anti-join."""
    c = F.col(identifier) if isinstance(identifier, str) else identifier
    return F.sha2(F.concat(F.lit(op + ":"), c), 256)


def anti_join_ledger(df: DataFrame, ledger: DataFrame, key: str = "idem_key") -> DataFrame:
    """Rows of ``df`` whose key is NOT in the ledger (work not yet done)."""
    return df.join(ledger.select(key), on=key, how="left_anti")


def expire_ledger(ledger: DataFrame, ttl_col: str = "ttl") -> DataFrame:
    """Drop expired ledger entries (reference 24 h TTL,
    services/idempotency_service.py:75-106).

    NULL ttl means never-expires and is KEPT: a bare ``ttl > now`` filter
    would silently drop it (NULL comparison), evicting the key and
    re-admitting already-done work through the guard."""
    c = F.col(ttl_col)
    return ledger.filter(c.isNull() | (c > F.unix_timestamp()))


def exact_dedup(
    df: DataFrame, key_cols: list[str | Column], order_cols: list[Column]
) -> DataFrame:
    """One canonical row per key, survivor chosen by a TOTAL order."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    rn = "__rn"  # collision-proof: never clobber a caller's column
    while rn in df.columns:
        rn += "_"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def orderable_order_cols(
    df: DataFrame, exclude: set[str], ascending: bool = True
) -> list[Column]:
    """Every column of ``df`` outside ``exclude`` as a TOTAL-order sort
    key, with unorderable columns routed through their JSON text.

    MapType (and anything containing one) is not orderable in Spark — a
    Debezium-style map payload column in an ORDER BY rejects the whole
    plan. ``to_json`` is deterministic for the same physical map data, so
    the order stays total; logically-equal maps serialized with different
    key order remain the producer's cross-batch-contract problem, the
    same as any same-rank tie. ONE shared definition (review r12:
    cdc_apply fixed this inline in r11 and streaming/dedup's batch
    fallback — plus the JSONL sink's in-batch collapse — still carried
    the bare-column version that crashes on a map column)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(orderable(f.dataType) for f in dt.fields)
        return True

    cols = []
    for c, f in zip(df.columns, df.schema.fields):
        if c in exclude:
            continue
        base = F.col(c) if orderable(f.dataType) else F.to_json(F.col(c))
        cols.append(base.asc_nulls_last() if ascending else base.desc())
    return cols
