"""Cross-engine array/list-function corner pins (r17 sweep, sibling of
test_strfn_corners.py).

Divergences found probing the live engines over the array primitives
shared by oracled paths:

1. **Element ORDER of set operations**: Spark's ``array_intersect`` /
   ``array_distinct`` preserve first-array/first-occurrence order;
   DuckDB's ``list_intersect`` / ``list_distinct`` return an
   UNSPECIFIED (hash-dependent) order. Unreachable today: every
   shipped use is wrapped in ``size(...)`` (jaccard counts, distinct
   counts) — a future rewrite that outputs the array itself must sort
   it on BOTH sides first.
2. **Descending sequence**: Spark ``sequence(a, b)`` counts DOWN when
   b < a ([3,2,1]); DuckDB ``generate_series(3, 1)`` is EMPTY. Every
   shipped sequence whose stop can fall below its start is guarded
   (bigram/shingle ``when(size >= k)``, trigram length filter,
   ``greatest(..., 1)`` in oracles) — the r12 finding class, now
   pinned as a standing divergence.
3. **Index 0 RAISES in Spark** — ``element_at(arr, 0)`` AND
   ``try_element_at(arr, 0)`` both throw INVALID_INDEX_OF_ZERO (the
   try form only tolerates out-of-BOUNDS, not zero), under ANSI and
   non-ANSI alike. One computed index reaching 0 kills a 100 TB job.
   Audited r17: every shipped computed index is provably >= 1 (zorder
   route ``div + 1``, shingle/bigram/run-length lambdas over
   ``sequence(1, ...)`` behind size guards, python-constant loops).

Agreements asserted (so an engine upgrade that moves them fails here):
array_sort/list_sort NULLS LAST, array_join/array_to_string skipping
NULLs, aligned sizes of intersect/distinct results.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def _spark_val(spark, expr: str):
    return spark.range(1).select(F.expr(expr).alias("o")).collect()[0].o


def _duck_val(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(f"SELECT {sql}").fetchone()[0]
    finally:
        con.close()


def test_sort_and_join_agree(spark):
    assert _spark_val(spark, "array_sort(array(3, null, 1))") == [1, 3, None]
    assert _duck_val("list_sort([3, NULL, 1])") == [1, 3, None]
    assert _spark_val(spark, "array_join(array('a', null, 'b'), ',')") == "a,b"
    assert _duck_val("array_to_string(['a', NULL, 'b'], ',')") == "a,b"


def test_set_op_sizes_agree_order_diverges(spark):
    """Sizes agree (what every shipped use consumes); ORDER is pinned
    AS divergent — DuckDB's is hash-dependent, so only inequality with
    Spark's documented first-occurrence order is asserted via the
    sorted-equality check."""
    si = _spark_val(spark, "array_intersect(array(3,1,2,3), array(2,3))")
    di = _duck_val("list_intersect([3,1,2,3], [2,3])")
    assert si == [3, 2]  # Spark: first-array order, documented
    assert sorted(si) == sorted(di) and len(si) == len(di)
    sd = _spark_val(spark, "array_distinct(array(3,1,3,2))")
    dd = _duck_val("list_distinct([3,1,3,2])")
    assert sd == [3, 1, 2]  # Spark: first-occurrence order, documented
    assert sorted(sd) == sorted(dd) and len(sd) == len(dd)


def test_descending_sequence_divergence(spark):
    """Spark sequences count DOWN past the stop; DuckDB's
    generate_series is empty — the r12 finding class behind every
    size-guard on shingle/bigram/run-length index minting."""
    assert _spark_val(spark, "sequence(3, 1)") == [3, 2, 1]
    assert _duck_val("generate_series(3, 1)") == []
    assert _spark_val(spark, "sequence(1, 0)") == [1, 0]


def test_element_at_zero_raises_even_try_form(spark):
    """The job-killer pin: BOTH element_at and try_element_at raise on
    index 0 (try_ only tolerates out-of-bounds). Every computed index
    must be provably >= 1 or guarded by a lazily-evaluated CASE arm."""
    for fn in ("element_at", "try_element_at"):
        with pytest.raises(Exception, match="INVALID_INDEX_OF_ZERO"):
            spark.range(1).select(
                F.expr(f"{fn}(array(1,2), 0)").alias("o")
            ).collect()
    # out-of-bounds IS tolerated by the try form (the difference)
    assert _spark_val(spark, "try_element_at(array(1,2), 5)") is None
    # and the CASE-arm guard pattern is genuinely lazy per row: the
    # untaken branch's index-0 access must NOT evaluate
    ok = _spark_val(
        spark,
        "CASE WHEN size(array(1)) >= 2 "
        "THEN element_at(array(1), 0) ELSE -1 END",
    )
    assert ok == -1


def test_map_duplicate_keys_last_win(spark):
    """r17 job-killer pin: Spark's DEFAULT mapKeyDedupPolicy=EXCEPTION
    aborts the job on ONE duplicate map key — at 100 TB that is a
    pipeline killer on hostile data. The engine session (and
    tune_for_session for driver-provided sessions) pins LAST_WIN, which
    is simultaneously the reference's dict-literal merge semantics
    (transforms.py:258 {"date": ..., **session}) and DuckDB's
    map_concat behavior — probed: map_concat(MAP {'a':1,'b':2},
    MAP {'a':9}) keeps a->9 in both engines under the pin."""
    got = (
        spark.range(1)
        .selectExpr("map_concat(map('a', 1, 'b', 2), map('a', 9)) AS m")
        .collect()[0]
        .m
    )
    assert got == {"a": 9, "b": 2}
    got2 = (
        spark.range(1).selectExpr("map('a', 1, 'a', 9) AS m").collect()[0].m
    )
    assert got2 == {"a": 9}
    duck = _duck_val("map_concat(MAP {'a': 1, 'b': 2}, MAP {'a': 9})")
    # duckdb's python API surfaces MAP as {'key': [...], 'value': [...]}
    assert dict(zip(duck["key"], duck["value"])) == {"a": 9, "b": 2}


def test_sort_array_vs_array_sort_null_placement(spark):
    """r18 addendum — a SPARK-INTERNAL trap with a cross-engine
    consequence: Spark ships TWO array sorters with OPPOSITE null
    placement — sort_array() puts NULLs FIRST ascending,
    array_sort() puts them LAST. Only array_sort mirrors DuckDB's
    list_sort (NULLS LAST, pinned above). Audited r18: no engine
    code calls sort_array (grep); any future array-sorting oracle
    must use array_sort <-> list_sort, never sort_array."""
    assert _spark_val(
        spark, "sort_array(array(3, null, 1))") == [None, 1, 3]
    assert _spark_val(
        spark, "array_sort(array(3, null, 1))") == [1, 3, None]
    assert _duck_val("list_sort([3, NULL, 1])") == [1, 3, None]
