"""File-level data skipping — a min/max statistics index over a parquet
directory, built from FOOTERS only (no data pages read).

This is the mechanism table formats (Delta/Iceberg/Hudi) persist in their
metadata layers, done directly: per file, per column, the min/max over
that file's row-group statistics. A selective predicate then reduces to
an interval-intersection test over the index — files whose [min, max]
cannot contain matches are never opened. Combined with a clustered
layout (operators/zorder.py) this is the difference between scanning a
100 TB table and scanning the handful of files a point query touches.

Scale notes: the index costs one footer read per file (KBs each) and is
itself a tiny DataFrame — persist it next to the table and maintain it
incrementally on write. Pruning correctness needs no layout at all
(stats are always true bounds); the LAYOUT decides whether pruning is
EFFECTIVE — test_skipping.py proves a Z-ordered table prunes on every
clustered dimension while a linearly-sorted one prunes on one.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq


def file_stats_index(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` from parquet footer statistics.

    Returns one dict per data file: ``{"file", "<col>_min", "<col>_max"}``.
    A file missing statistics for a column gets ``None`` bounds (treated
    as always-matching by :func:`prune_files` — skipping must never be
    unsound)."""
    index = []
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        if os.path.basename(f).startswith(("_", ".")):
            continue  # metadata artifacts (e.g. the persisted index itself)
        meta = pq.ParquetFile(f).metadata
        schema_names = {meta.row_group(0).column(i).path_in_schema: i
                        for i in range(meta.num_columns)} if meta.num_row_groups else {}
        entry: dict = {"file": f}
        for c in cols:
            lo = hi = None
            ci = schema_names.get(c)
            if ci is not None:
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            entry[f"{c}_min"], entry[f"{c}_max"] = lo, hi
        index.append(entry)
    return index


def prune_files(index: list[dict], col: str, lo, hi) -> list[str]:
    """Files whose [min, max] interval for ``col`` intersects [lo, hi].
    Files without stats are kept (sound, just not skipped)."""
    keep = []
    for e in index:
        fmin, fmax = e.get(f"{col}_min"), e.get(f"{col}_max")
        if fmin is None or fmax is None or (fmax >= lo and fmin <= hi):
            keep.append(e["file"])
    return keep


_INDEX_NAME = "_stats_index.parquet"


def save_stats_index(data_dir: str, cols: list[str]) -> str:
    """Build the footer-stats index for ``data_dir`` and persist it INSIDE
    the directory (underscore-prefixed → invisible to Spark data scans).

    Written into a version dir before the manifest-pointer flip
    (operators/versioned.py), the index is published atomically WITH the
    data it describes — the engine-side analog of the per-file stats
    Delta/Iceberg carry in their commit metadata. File paths are stored
    relative to ``data_dir`` so a version dir stays self-contained."""
    import pyarrow as pa

    index = file_stats_index(data_dir, cols)
    rel = [
        {**e, "file": os.path.relpath(e["file"], data_dir)} for e in index
    ]
    out = os.path.join(data_dir, _INDEX_NAME)
    pq.write_table(pa.Table.from_pylist(rel), out)
    return out


def load_stats_index(data_dir: str) -> list[dict] | None:
    """Persisted index for ``data_dir`` (absolute file paths restored), or
    ``None`` when absent — callers fall back to a live footer scan."""
    p = os.path.join(data_dir, _INDEX_NAME)
    if not os.path.exists(p):
        return None
    rows = pq.read_table(p).to_pylist()
    return [
        {**e, "file": os.path.join(data_dir, e["file"])} for e in rows
    ]
