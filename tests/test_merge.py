"""MERGE INTO semantics over the versioned commit layer: update, delete
(right-to-be-forgotten), insert-only, ambiguity rejection."""

from __future__ import annotations

import pytest

from weightlifting_wod_etl_spark.io import read_table
from weightlifting_wod_etl_spark.operators.merge import delete_keys, merge_into


def _rows(spark, path):
    return {
        r.k: (r.v, r.tag) for r in read_table(spark, path).collect()
    }


def _table(spark, path, data):
    df = spark.createDataFrame(data, "k long, v long, tag string")
    staging_free = path  # first write: plain dir is fine, merge migrates it
    df.write.mode("overwrite").parquet(staging_free)


def test_merge_update_and_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, [(1, 10, "old"), (2, 20, "old")])
    src = spark.createDataFrame(
        [(2, 99, "new"), (3, 30, "new")], "k long, v long, tag string"
    )
    stats = merge_into(spark, path, src, on=["k"])
    assert stats == {"matched": 1, "inserted": 1, "deleted": 0}
    assert _rows(spark, path) == {
        1: (10, "old"),
        2: (99, "new"),
        3: (30, "new"),
    }


def test_merge_matched_delete_is_right_to_be_forgotten(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, [(1, 10, "keep"), (2, 20, "drop"), (3, 30, "keep")])
    keys = spark.createDataFrame([(2,), (7,)], "k long")  # 7 matches nothing
    n = delete_keys(spark, path, keys, on=["k"])
    assert n == 1
    assert set(_rows(spark, path)) == {1, 3}


def test_merge_insert_only_ignores_matches(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, [(1, 10, "old")])
    src = spark.createDataFrame(
        [(1, 99, "new"), (2, 20, "new")], "k long, v long, tag string"
    )
    stats = merge_into(
        spark, path, src, on=["k"], when_matched="ignore"
    )
    assert stats == {"matched": 1, "inserted": 1, "deleted": 0}
    assert _rows(spark, path) == {1: (10, "old"), 2: (20, "new")}


def test_merge_rejects_ambiguous_source(spark, tmp_path):
    path = str(tmp_path / "t")
    _table(spark, path, [(1, 10, "old")])
    src = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k long, v long, tag string"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_into(spark, path, src, on=["k"])


def test_merge_creates_table_and_update_collapses_dup_target(spark, tmp_path):
    path = str(tmp_path / "fresh")
    src = spark.createDataFrame([(1, 10, "a")], "k long, v long, tag string")
    stats = merge_into(spark, path, src, on=["k"])
    assert stats == {"matched": 0, "inserted": 1, "deleted": 0}

    # target with two rows for k=1 (pre-merge table was not key-unique):
    # an update collapses them to the single source row
    dup = spark.createDataFrame(
        [(1, 11, "b"), (1, 12, "c")], "k long, v long, tag string"
    )
    dup.unionByName(read_table(spark, path)).write.mode("overwrite").parquet(
        str(tmp_path / "dup_src")
    )  # build a fresh non-unique table
    path2 = str(tmp_path / "t2")
    spark.read.parquet(str(tmp_path / "dup_src")).write.parquet(path2)
    upd = spark.createDataFrame([(1, 99, "z")], "k long, v long, tag string")
    stats = merge_into(spark, path2, upd, on=["k"])
    assert stats["matched"] == 3  # all three k=1 target rows consumed
    assert _rows(spark, path2) == {1: (99, "z")}
