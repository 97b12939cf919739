"""MERGE INTO for parquet tables — Delta/Iceberg merge semantics on top
of the manifest-pointer commit protocol (operators/versioned.py).

One join-based rewrite implements the three clauses:

    MERGE INTO target USING source ON <keys>
    WHEN MATCHED THEN UPDATE | DELETE
    WHEN NOT MATCHED THEN INSERT

``sinks.kv_upsert_parquet`` is the update+insert special case with a
version column choosing the survivor; this operator is the general form,
including the matched-DELETE clause — the right-to-be-forgotten path a
training-data pipeline must run at 100 TB (delete every document of a
revoked source without rewriting unrelated data... which parquet cannot
do below file granularity: here the rewrite is table-scoped and commits
atomically; the deployment form is Delta ``MERGE``/``DELETE`` where only
files containing matches rewrite, with the same join plan underneath).

Plan shape: ONE left-outer (or anti) join of target against the source
keyed on ``on`` — the source is typically small (a day's increment, a
deletion list) so Catalyst broadcasts it; the target side streams through
without a shuffle in that case. The new version dir is written while the
live one stays readable; the pointer flip publishes it atomically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import begin_commit, finish_commit, resolve


def merge_into(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    on: list[str],
    when_matched: str = "update",
    when_not_matched: str = "insert",
) -> dict:
    """Merge ``source`` into the parquet table at ``target_path``.

    ``when_matched``: ``"update"`` (source row replaces target row),
    ``"delete"`` (matched target rows are removed), or ``"ignore"``
    (target row kept unchanged). ``when_not_matched``: ``"insert"`` or
    ``"ignore"`` (source-only rows added or dropped). Keys must be unique
    within ``source`` (enforced — ambiguous merges are rejected, the same
    error Delta raises for multi-match sources).

    Returns counts: ``{"matched": n, "inserted": n, "deleted": n}``.
    """
    if when_matched not in ("update", "delete", "ignore"):
        raise ValueError(f"when_matched={when_matched!r}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(f"when_not_matched={when_not_matched!r}")
    if when_matched == "ignore" and when_not_matched == "ignore":
        return {"matched": 0, "inserted": 0, "deleted": 0}  # nothing can change

    import os

    data_dir = resolve(target_path)
    target = (
        spark.read.parquet(data_dir)
        if os.path.exists(data_dir)
        else source.limit(0)
    )

    dup = source.groupBy(*on).count().filter(F.col("count") > 1)
    if dup.limit(1).count():
        raise ValueError(
            "source has duplicate merge keys — a target row would match "
            "more than one source row (non-deterministic merge)"
        )

    # distinct matched keys (target may hold several rows per key; an
    # update collapses them all to the one source row, like Delta with a
    # non-unique target). Materialized once — three consumers (two counts,
    # the clause joins) must not re-derive the target∩source join each.
    matched_keys = (
        target.select(*on)
        .distinct()
        .join(source.select(*on), on, "left_semi")
        .localCheckpoint(eager=False)
    )
    n_matched = target.join(F.broadcast(matched_keys), on, "left_semi").count()
    n_src_matched = source.join(F.broadcast(matched_keys), on, "left_semi").count()

    # survivors from the target side
    if when_matched == "ignore":
        keep_target = target
    else:  # update and delete both remove the matched target rows
        keep_target = target.join(F.broadcast(source.select(*on)), on, "left_anti")

    # rows contributed by the source side
    parts = []
    if when_matched == "update":
        parts.append(source.join(F.broadcast(matched_keys), on, "left_semi"))
    if when_not_matched == "insert":
        parts.append(source.join(F.broadcast(matched_keys), on, "left_anti"))

    out = keep_target
    for p in parts:
        out = out.unionByName(p, allowMissingColumns=True)

    n_inserted = 0
    if when_not_matched == "insert":
        n_inserted = source.count() - n_src_matched
    n_deleted = n_matched if when_matched == "delete" else 0

    staging, version = begin_commit(target_path)
    out.write.mode("overwrite").parquet(staging)
    finish_commit(target_path, version)
    return {"matched": n_matched, "inserted": n_inserted, "deleted": n_deleted}


def delete_keys(
    spark: SparkSession, target_path: str, keys: DataFrame, on: list[str]
) -> int:
    """Remove every target row whose key appears in ``keys`` — the
    right-to-be-forgotten primitive, as a matched-DELETE merge. Returns
    the number of rows deleted."""
    return merge_into(
        spark,
        target_path,
        keys.select(*on).distinct(),
        on,
        when_matched="delete",
        when_not_matched="ignore",
    )["deleted"]
