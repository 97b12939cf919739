"""Small-file compaction — the table-maintenance job every long-lived
parquet dataset needs.

Why: streaming sinks, frequent small upserts, and over-parallel writers
leave a table as thousands of KB-scale files. At 100 TB that kills scans
three ways — task-per-file scheduling overhead, footer/open costs per
file, and statistics too fine-grained to prune well. Periodic compaction
rewrites a directory into ~target-sized files.

How: file count is derived from the table's ACTUAL on-disk bytes (listing
the filesystem, not a row count — row width varies), then one
``repartition(n)`` round-robin shuffle balances the rewrite. An optional
``sort_by`` turns compaction into a clustering pass at the same cost
(pair with operators/zorder.py's key for multi-dimensional layouts).
The rewrite commits through operators/versioned.py's manifest-pointer
protocol — a crash at ANY point leaves the table readable (old version
until the atomic pointer flip, new version after), and a crashed prior
attempt's staging dir is reclaimed automatically — the engine-side
analog of a Delta/Iceberg ``OPTIMIZE``/``rewrite`` commit.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from .versioned import (
    abort_commit,
    begin_commit,
    finish_commit,
    resolve,
    verify_read_base,
)


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of the parquet files under ``path``.

    Delegates visibility to ``skipping.list_data_files`` — the one
    definition of "visible data file" (skips ``_``/``.``-prefixed
    entries, the same children Spark's listing ignores), so compaction
    sizing can never disagree with the commit protocol or the index
    completeness checks (review r12)."""
    from .skipping import list_data_files

    files = list_data_files(path)
    return len(files), sum(os.path.getsize(f) for f in files)


def _partition_keys(data_dir: str) -> list[str]:
    """Hive partition column names of ``data_dir`` (in directory order),
    [] for a flat layout — read from the first data file's relative path
    so a compaction can PRESERVE the layout instead of silently
    flattening it (review r11: the rewrite dropped date=*/ dirs, killing
    partition pruning and demoting the next partitioned upsert to a
    full-table migration)."""
    for root, dirs, files in os.walk(data_dir):
        dirs[:] = sorted(d for d in dirs if not d.startswith(("_", ".")))
        for fn in sorted(files):
            if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                rel = os.path.relpath(root, data_dir)
                if rel == ".":
                    return []
                return [
                    seg.split("=", 1)[0]
                    for seg in rel.split(os.sep)
                    if "=" in seg
                ]
    return []


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
    stats_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite ``path`` into ``ceil(bytes / target)`` files; returns
    (files_before, files_after). No-op (no rewrite at all) when the
    layout is already within one file of the achievable ideal AND
    nothing beyond file-count health was requested. Accepts both plain
    parquet dirs (first compaction migrates them to the versioned
    layout) and already-versioned tables; read results back with
    ``io.read_table`` / ``versioned.resolve``.

    ``stats_cols`` persists a footer-stats skipping index into the new
    version dir BEFORE the pointer flip — data and the index describing
    it are published in the same atomic commit, so ``io.read_pruned``
    never sees an index that disagrees with the files (defaults to
    ``sort_by``: the clustered columns are exactly the prunable ones)."""
    data_dir = resolve(path)
    before, total = dir_stats(data_dir)
    if before == 0:
        # empty table (review r14): there is nothing to rewrite, and
        # spark.read.parquet on a data-file-less dir fails schema
        # inference — so the old path raised instead of no-opping
        return 0, 0
    want = max(1, math.ceil(total / target_file_bytes))
    pkeys = _partition_keys(data_dir)
    # No-op rules (review r12 — the old `before <= want + 1` guard was
    # wrong three ways):
    #  * an explicit sort_by/stats_cols request must ALWAYS rewrite — the
    #    early return silently skipped a requested clustering pass and
    #    the promised index publication;
    #  * the bound is two-sided: before >> want is small-file debt, but
    #    before < want means files far OVER target that should split for
    #    scan parallelism (2 one-GB files vs want=16 used to no-op);
    #  * for a Hive layout WITHOUT sort_by, the rewrite hashes on the
    #    partition keys alone, so what it can actually ACHIEVE is one
    #    file per live partition dir — "ideal" must be exactly that
    #    (review r12, reproduced: max(want, n_parts) was unreachable
    #    whenever want > n_parts, so every maintenance run re-committed
    #    a full rewrite forever while file counts never changed; big
    #    partitions that need intra-partition splitting are the sort_by
    #    path's job, whose requests always rewrite anyway).
    if pkeys:
        from .skipping import list_data_files

        n_part_dirs = len({os.path.dirname(f) for f in list_data_files(data_dir)})
        ideal = n_part_dirs
        if want > n_part_dirs * 2 and not sort_by:
            # intra-partition splitting is out of scope for the default
            # hash-on-pkeys path, so oversized partition files can never
            # be split by plain maintenance — say so instead of silently
            # no-opping forever (r13 advice): the caller's remedy is the
            # sort_by path, whose range partitioning CAN split within a
            # partition. 2× threshold: one file modestly over target is
            # normal packing slack, not actionable debt.
            import sys

            print(
                f"compact_parquet: {data_dir} holds ~{total / 2**20:.0f} MiB "
                f"across {n_part_dirs} partition dirs (~{want} files at "
                f"target size) — the default partitioned compact cannot "
                "split within a partition; pass sort_by to split oversized "
                "partitions",
                file=sys.stderr,
            )
    else:
        ideal = want
    if ideal <= before <= ideal + 1 and not sort_by and not stats_cols:
        return before, before
    df = spark.read.parquet(data_dir)
    # Partitioned tables redistribute ON the partition keys (review r12):
    # a bare round-robin repartition(want) scatters every Hive
    # partition's rows across all `want` tasks, so the partitionBy write
    # fans out to ~want × n_partitions files — MORE small files than
    # before, and never converging. Hashing on pkeys lands each
    # partition value in one task (one file per partition dir); with
    # sort_by, range-partitioning partition-major keeps dirs contiguous
    # AND sorted within.
    if sort_by:
        cluster = [*pkeys, *sort_by]
        out = df.repartitionByRange(want, *cluster).sortWithinPartitions(*cluster)
    elif pkeys:
        out = df.repartition(want, *pkeys)
    else:
        out = df.repartition(want)
    staging, version = begin_commit(path)
    try:
        verify_read_base(path, data_dir)  # df reads data_dir (resolved above)
        writer = out.write.mode("overwrite")
        if pkeys:
            # preserve the Hive layout: partition pruning must survive a
            # maintenance compact (review r11)
            writer = writer.partitionBy(*pkeys)
        writer.parquet(staging)
        index_cols = stats_cols if stats_cols is not None else (sort_by or [])
        if index_cols:
            from .skipping import save_stats_index

            save_stats_index(staging, index_cols)
        else:
            # A maintenance compact with no explicit columns must not DROP
            # a previously persisted index (that silently degrades every
            # later merge to full rewrites and read_pruned to footer
            # scans). Rebuild it over the new files with the old index's
            # columns; no-op when the table never had one.
            from .skipping import refresh_stats_index

            refresh_stats_index(data_dir, staging)
        finish_commit(path, version)
    except BaseException:
        abort_commit(path, version)  # failed rewrite must not hold the lock
        raise
    after, _ = dir_stats(resolve(path))
    return before, after
