"""Manifest-pointer commit protocol for parquet rewrite paths.

Why: a full-table rewrite done as staging-dir + ``os.rename`` swap has a
window where a crash loses the table (no data at ``path`` between the two
renames) and a leftover staging dir wedges the next run. The reference
leans on S3 PUT atomicity per object and DynamoDB conditional writes for
this; the engine-side equivalent — and what Delta/Iceberg do under the
hood — is versioned data directories plus one atomically-swapped pointer:

    table/
      _CURRENT        <- text file naming the live version dir
      _v000001/       <- immutable parquet snapshot
      _v000002/

A rewrite writes a NEW ``_v{n+1}`` directory (never touching the live
one) and then commits with a single atomic ``os.replace`` of ``_CURRENT``.
Crash before the flip: readers still resolve the old version, and the
next rewrite reclaims the orphaned staging dir. Crash after the flip:
readers see the new version. There is no intermediate state.

Version dirs are underscore-prefixed deliberately: Spark's file listing
ignores ``_``/``.``-prefixed children, so a naive ``spark.read.parquet``
of the table ROOT cannot accidentally union two versions — readers go
through :func:`resolve` (or ``io.read_table``), and explicit reads of a
version dir work normally (verified by tests/test_versioned.py).

Plain parquet directories remain first-class: ``resolve`` returns them
unchanged, so every reader in the engine handles both layouts. At 100 TB
on object storage the pointer flip maps to a single conditional PUT —
the same commit primitive Delta's ``_last_checkpoint``/Iceberg's
``version-hint`` use — and old versions double as time-travel snapshots
until GC'd (``keep_versions``).
"""

from __future__ import annotations

import os
import re
import shutil

CURRENT_POINTER = "_CURRENT"
_VDIR = re.compile(r"^_v(\d{6})$")


def resolve(path: str) -> str:
    """Directory readers should scan: the live version dir for versioned
    tables, ``path`` itself for plain parquet dirs."""
    ptr = os.path.join(path, CURRENT_POINTER)
    try:
        with open(ptr) as f:
            name = f.read().strip()
    except OSError:
        return path
    return os.path.join(path, name) if _VDIR.match(name) else path


def current_version(path: str) -> int:
    """Committed version number; 0 for plain/new tables."""
    m = _VDIR.match(os.path.basename(resolve(path)))
    return int(m.group(1)) if m else 0


def list_versions(path: str) -> list[int]:
    """Version numbers still on disk (time-travel targets), ascending.
    Bounded by ``keep_versions`` + 1 — old snapshots are GC'd at commit."""
    try:
        entries = os.listdir(path)
    except OSError:
        return []
    current = current_version(path)
    return sorted(
        int(m.group(1))
        for e in entries
        if (m := _VDIR.match(e)) and int(m.group(1)) <= current
    )


def version_dir(path: str, version: int) -> str:
    """Data directory of a specific retained version (time travel). Raises
    ``FileNotFoundError`` for GC'd or never-committed versions — asking
    for history that is gone must be loud, not an empty scan."""
    d = os.path.join(path, f"_v{version:06d}")
    if version > current_version(path) or not os.path.isdir(d):
        raise FileNotFoundError(
            f"version {version} of {path} is not on disk "
            f"(retained: {list_versions(path)})"
        )
    return d


def table_history(path: str) -> list[dict]:
    """Retained snapshots with their physical footprint, ascending — the
    ``DESCRIBE HISTORY`` analog for versioned tables. Each entry:
    ``{"version", "n_files", "bytes", "is_current"}``."""
    current = current_version(path)
    out = []
    for v in list_versions(path):
        d = os.path.join(path, f"_v{v:06d}")
        n = total = 0
        for root, dirs, files in os.walk(d):
            dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
            for fn in files:
                if fn.endswith(".parquet") and not fn.startswith(("_", ".")):
                    n += 1
                    total += os.path.getsize(os.path.join(root, fn))
        out.append(
            {"version": v, "n_files": n, "bytes": total, "is_current": v == current}
        )
    return out


def begin_commit(path: str) -> tuple[str, int]:
    """Allocate the next version's staging directory.

    Reclaims any orphan left by a crashed prior attempt at the same
    version (the dir exists but ``_CURRENT`` never flipped to it), so a
    failed rewrite never wedges the next one."""
    os.makedirs(path, exist_ok=True)
    version = current_version(path) + 1
    staging = os.path.join(path, f"_v{version:06d}")
    shutil.rmtree(staging, ignore_errors=True)
    return staging, version


def finish_commit(path: str, version: int, keep_versions: int = 1) -> None:
    """Atomically make ``version`` the live one, then GC.

    The flip is a single ``os.replace`` of the pointer file (atomic on
    POSIX); data dirs are immutable once committed. GC removes version
    dirs older than ``current - keep_versions`` (keeping one prior
    version lets an in-flight reader that resolved before the flip finish
    its scan) and, on the FIRST commit over a previously-plain table,
    the loose pre-versioning data files — both only after the pointer is
    durably flipped, so a crash during GC is harmless."""
    tmp = os.path.join(path, f".{CURRENT_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(f"_v{version:06d}")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, CURRENT_POINTER))

    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        m = _VDIR.match(entry)
        if m and int(m.group(1)) < version - keep_versions:
            shutil.rmtree(full, ignore_errors=True)
        elif (
            version - 1 == 0
            and os.path.isfile(full)
            and (entry.endswith(".parquet") or entry == "_SUCCESS")
        ):  # migrated from a plain dir: loose files are the old "version 0"
            try:
                os.remove(full)
            except OSError:
                pass
