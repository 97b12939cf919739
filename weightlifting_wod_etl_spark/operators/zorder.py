"""Z-order (Morton) clustering — multi-dimensional data layout for scan
pruning, the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Why it matters at 100 TB: parquet skips row groups (and Spark skips files)
by min/max column statistics. Sorting by ONE column makes its stats tight
but leaves every other column's min/max spanning the whole domain — a
filter on the second column prunes nothing. Interleaving the bits of K
columns into one Morton key and range-partition-sorting by it gives every
participating column locality: each file covers a small hyper-rectangle,
so per-file min/max stats are tight in ALL K dimensions and selective
filters on ANY of them skip most of the data.

Implementation is pure JVM expressions (bit ops unrolled at plan build —
no UDF): each column is first normalized to an unsigned ``bits``-wide
integer via a caller-chosen monotone mapping (modulo/bucket/rank) that
should FILL the ``bits`` range — a dimension occupying fewer effective
bits than its peers contributes nothing at the top of the key and barely
clusters (test_zorder.py demonstrates the failure and the fix). Then
bit ``i`` of column ``k`` lands at position ``i*K + k`` of the key. The
write is ``repartitionByRange`` on the key (one range shuffle — sampled
bounds, balanced output files) + ``sortWithinPartitions`` (cluster within
each file), the standard two-step layout job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative int) column
    into one Morton key; K·bits must fit a long (K·bits ≤ 63)."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int = 8,
    save_index: bool = True,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of ``cols``
    (columns must already be non-negative ints < 2^bits — normalize with
    a modulo/bucket expression first). One range shuffle; ``num_files``
    output files, each covering a tight hyper-rectangle of the key space.

    The footer-stats skipping index over the clustered columns is
    persisted beside the data by default — the layout exists to make
    pruning effective, so ``io.read_pruned`` should find its index ready
    rather than re-reading footers."""
    keyed = df.withColumn("__zkey", morton_key(cols, bits))
    (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    if save_index:
        from .skipping import save_stats_index

        save_stats_index(path, cols)
