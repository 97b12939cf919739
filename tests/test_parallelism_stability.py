"""Value-hash stability across parallelism (r18).

The correctness model's standing claim — "hashes stable under 32-way
parallelism" (README) — has always been exercised INDIRECTLY: parity
runs at shuffle_partitions=8 while bench runs at 32, and the design
rules (total orderings with tie-breakers, exact-rational rounding,
counts-first aggregation, sorted-run folds) are each pinned in their
own tests. This module tests the claim DIRECTLY: the most
order-sensitive query classes are executed twice in one session at
shuffle_partitions=8 and 64 and must produce IDENTICAL canonical row
sets. 64 > the 32 the bench uses, and crossing 8 -> 64 reshuffles
every exchange, re-orders every partial-aggregation merge, and
re-buckets every window partition — if any result depended on
arrival order (collect_list without sort, argmax on tied raw
doubles, double summation order at the rounding knife-edge), it
would flip here.

Query selection, one per order-sensitivity class:
- q_group_concat: ordered string aggregation (explicit sort inside);
- q_argmax_events: max_by over the packed tie-broken key;
- q_mode_per_group: ordered-struct-max tie-break;
- q_weighted_median: counts-first exact median (merge-order-free);
- q_trigram_entropy: per-row sorted-run fold feeding ln();
- q_sessionize_text: running-sum group ids over windows;
- q_corr_stats: co-moment merge order under 6-dp rounding;
- q_zscore_normalize: mean/stddev broadcast back over rows.
"""

from __future__ import annotations

import pytest

from weightlifting_wod_etl_spark.queries_registry import QUERIES

SENSITIVE = [
    "q_group_concat",
    "q_argmax_events",
    "q_mode_per_group",
    "q_weighted_median",
    "q_trigram_entropy",
    "q_sessionize_text",
    "q_corr_stats",
    "q_zscore_normalize",
]


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append("%.6f" % v)
            elif isinstance(v, list):
                row.append(str(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_identical_at_8_and_64_shuffle_partitions(
    spark, sf_dir, name
):
    fn = QUERIES[name]
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        at8 = _canon(fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        at64 = _canon(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert at8 == at64, (
        f"{name} is parallelism-sensitive: {len(at8)} vs {len(at64)} rows; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(at8, at64) if a != b) if len(at8) == len(at64) else 'row-count'}"
    )


def test_result_identical_with_aqe_disabled(spark, sf_dir):
    """AQE coalesces/splits shuffle partitions at runtime — one more
    way physical partitioning can differ run to run. Spot-check the
    three most order-sensitive classes with adaptive execution OFF
    against the fixture default (ON)."""
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    results = {}
    for name in ("q_group_concat", "q_argmax_events", "q_weighted_median"):
        fn = QUERIES[name]
        base = _canon(fn(spark, sf_dir))
        try:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            off = _canon(fn(spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prior)
        results[name] = (base == off, len(base), len(off))
        assert base == off, (name, results[name])
