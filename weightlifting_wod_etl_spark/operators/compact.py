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
The rewrite goes through a staging directory then an atomic-as-possible
swap — the same non-transactional caveat as sinks.kv_upsert_parquet: on
a real deployment this job is a Delta/Iceberg ``OPTIMIZE``/``rewrite``.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) of the parquet files under ``path``."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, fn))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite ``path`` into ``ceil(bytes / target)`` files; returns
    (files_before, files_after). No-op (no rewrite at all) when the
    layout is already within one file of ideal."""
    before, total = dir_stats(path)
    want = max(1, math.ceil(total / target_file_bytes))
    if before <= want + 1:
        return before, before
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(want, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(want)
    tmp = path.rstrip("/") + "__compacting"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__precompact"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after, _ = dir_stats(path)
    return before, after
