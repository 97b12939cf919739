"""Sink delivery-guarantee tests: idempotent JSONL, kv upsert."""

from __future__ import annotations

from tests.conftest import SF_SMOKE

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from weightlifting_wod_etl_spark.io import read_table
from weightlifting_wod_etl_spark.operators.versioned import resolve


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="wod_sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_jsonl_idempotent_rerun_writes_zero(spark, tmp):
    from weightlifting_wod_etl_spark.operators.dedup import idempotency_key
    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    df = spark.range(10).select(
        F.col("id"), idempotency_key("put", F.col("id").cast("string")).alias("idem_key")
    )
    out, ledger = os.path.join(tmp, "out"), os.path.join(tmp, "ledger")
    assert write_jsonl_idempotent(df, out, ledger) == 10
    assert write_jsonl_idempotent(df, out, ledger) == 0  # replay skipped
    # partial overlap: 5 old + 5 new → only new written
    df2 = spark.range(5, 15).select(
        F.col("id"), idempotency_key("put", F.col("id").cast("string")).alias("idem_key")
    )
    assert write_jsonl_idempotent(df2, out, ledger) == 5
    assert spark.read.json(out).count() == 15


def test_jsonl_fail_open_on_corrupt_ledger(spark, tmp):
    from weightlifting_wod_etl_spark.operators.dedup import idempotency_key
    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    df = spark.range(3).select(
        F.col("id"), idempotency_key("put", F.col("id").cast("string")).alias("idem_key")
    )
    out, ledger = os.path.join(tmp, "out"), os.path.join(tmp, "ledger")
    os.makedirs(ledger)
    with open(os.path.join(ledger, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    # reference §2.3-7: infra failure must NOT block the write
    assert write_jsonl_idempotent(df, out, ledger, fail_open=True) == 3


def test_kv_upsert_last_writer_wins(spark, tmp):
    from weightlifting_wod_etl_spark.sinks import kv_upsert_parquet

    path = os.path.join(tmp, "kv")
    v1 = spark.createDataFrame(
        [("2021-01-01", "Mon", "old", 1), ("2021-01-02", "Tue", "keep", 1)],
        ["date", "session", "payload", "version"],
    )
    kv_upsert_parquet(v1, path, key_cols=["date", "session"], order_cols=["version"])
    v2 = spark.createDataFrame(
        [("2021-01-01", "Mon", "new", 2)], ["date", "session", "payload", "version"]
    )
    kv_upsert_parquet(v2, path, key_cols=["date", "session"], order_cols=["version"])
    rows = {(r.date, r.session): r.payload for r in read_table(spark, path).collect()}
    assert rows == {("2021-01-01", "Mon"): "new", ("2021-01-02", "Tue"): "keep"}


def test_weekly_rollup_path(spark, tmp):
    from weightlifting_wod_etl_spark.sinks import weekly_rollup_path

    df = spark.createDataFrame(
        [("2021-01-03",), ("2021-01-08",)], ["date"]
    )
    assert weekly_rollup_path(df, tmp).endswith("weekly/2021-01-03__2021-01-08--records.json")


def test_csv_round_trip_explicit_schema(spark, tmp):
    from weightlifting_wod_etl_spark.io import load_table, read_csv, write_csv

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = f"{tmp}/orders_csv"
    write_csv(orders, path)
    back = read_csv(spark, path, orders.schema)
    assert back.schema == orders.schema  # no inference drift
    a = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in orders.collect()}
    b = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in back.collect()}
    assert a == b


def test_orc_round_trip(spark, tmp):
    """ORC sink/source — second columnar format beside parquet, same
    predicate-pushdown path (native Spark, no extra packages)."""
    from weightlifting_wod_etl_spark.io import load_table

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = f"{tmp}/orders_orc"
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = {(r.o_orderkey, round(r.o_totalprice, 2)) for r in orders.collect()}
    b = {(r.o_orderkey, round(r.o_totalprice, 2)) for r in back.collect()}
    assert a == b
    # pushdown reaches the ORC reader too
    plan = (
        back.filter("o_totalprice > 100000")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]


def test_binary_file_source_feeds_multimodal(spark, tmp):
    """binaryFile source → multimodal feature extraction: the real media
    ingestion path (one row per file: path, length, binary content)."""
    import os

    from pyspark.sql import functions as F

    from weightlifting_wod_etl_spark.operators.multimodal import extract_features

    media_dir = f"{tmp}/media"
    os.makedirs(media_dir, exist_ok=True)
    blobs = {f"img_{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for name, payload in blobs.items():
        with open(os.path.join(media_dir, name), "wb") as f:
            f.write(payload)

    files = (
        spark.read.format("binaryFile")
        .load(media_dir)
        .select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.bin", 1)
            .cast("long")
            .alias("media_id"),
            F.col("content").alias("payload"),
            "length",
        )
    )
    feats = extract_features(files)
    rows = {r.media_id: r.n_bytes for r in feats.collect()}
    assert rows == {i: 100 + i for i in range(5)}


def test_kv_upsert_partitioned_rewrites_only_touched_partitions(spark, tmp):
    """Dynamic-partition upsert contract: an increment touching one date
    must leave every other date partition's files byte-identical on disk
    (same file set, same mtimes) while merging LWW winners in the touched
    one."""
    import os as _os

    from weightlifting_wod_etl_spark.sinks import kv_upsert_parquet

    path = _os.path.join(tmp, "kv_part")
    v1 = spark.createDataFrame(
        [
            ("2021-01-03", "am", 1, "a"),
            ("2021-01-04", "am", 1, "b"),
            ("2021-01-05", "am", 1, "c"),
        ],
        ["date", "session", "version", "payload"],
    )
    kv_upsert_parquet(
        v1, path, key_cols=["date", "session"], order_cols=["version"],
        partition_by=["date"],
    )

    def files(day):
        d = _os.path.join(resolve(path), f"date={day}")
        return sorted(
            (f, _os.path.getmtime(_os.path.join(d, f)))
            for f in _os.listdir(d)
            if f.endswith(".parquet")
        )

    before_04, before_05 = files("2021-01-04"), files("2021-01-05")
    v2 = spark.createDataFrame(
        [("2021-01-03", "am", 2, "a2"), ("2021-01-03", "pm", 1, "x")],
        ["date", "session", "version", "payload"],
    )
    kv_upsert_parquet(
        v2, path, key_cols=["date", "session"], order_cols=["version"],
        partition_by=["date"],
    )
    # untouched partitions: identical file sets and mtimes
    assert files("2021-01-04") == before_04
    assert files("2021-01-05") == before_05
    # touched partition merged last-writer-wins, new key appended
    got = {
        (str(r.date), r.session): (r.version, r.payload)  # partition col is
        for r in read_table(spark, path).collect()  # type-inferred to DATE
    }
    assert got == {
        ("2021-01-03", "am"): (2, "a2"),
        ("2021-01-03", "pm"): (1, "x"),
        ("2021-01-04", "am"): (1, "b"),
        ("2021-01-05", "am"): (1, "c"),
    }


def test_xml_round_trip_explicit_schema(spark, tmp):
    """XML source/sink (Spark 4 native) — the XML interchange path (RSS /
    WXR exports in the reference's WordPress world), explicit schema."""
    from weightlifting_wod_etl_spark.io import load_table, read_xml, write_xml

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = f"{tmp}/orders_xml"
    write_xml(orders, path, row_tag="order")
    back = read_xml(spark, path, orders.schema, row_tag="order")
    assert back.schema == orders.schema
    a = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in orders.collect()}
    b = {(r.o_orderkey, r.o_orderstatus, round(r.o_totalprice, 2)) for r in back.collect()}
    assert a == b


def test_jsonl_idempotent_in_batch_duplicates_and_null_keys(spark, tmp):
    """Review r11 + r12 advice: (a) the same key twice in ONE batch wrote
    twice (the anti-join only suppressed prior runs); (b) a NULL key never
    matched the equi anti-join, so every rerun re-appended the row
    forever; (c) the r11 treat-all-NULLs-as-one-key fix silently DROPPED
    distinct NULL-key payloads — data loss, not idempotency. Contract
    now: one write per key per batch; a NULL key falls back to a
    content-hash key, so DISTINCT payloads each write once and
    content-identical replays still suppress."""
    import os

    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    path = os.path.join(tmp, "nulldup_out")
    ledger = os.path.join(tmp, "nulldup_ledger")
    batch = spark.createDataFrame(
        [("k1", "a"), ("k1", "b"), (None, "n1"), (None, "n2"), (None, "n2")],
        "idem_key string, payload string",
    )
    n1 = write_jsonl_idempotent(batch, path, ledger)
    # k1 collapsed to one winner; NULL-key n1 and n2 are DISTINCT content
    # (each written once); the duplicate n2 collapses by content hash
    assert n1 == 3
    rows = {r.payload for r in spark.read.json(path).collect()}
    assert rows == {"a", "n1", "n2"}  # asc full-column order: min payload wins

    # replay: zero fresh rows, including every NULL-key one
    n2 = write_jsonl_idempotent(batch, path, ledger)
    assert n2 == 0
    assert spark.read.json(path).count() == 3
    # ledger holds exactly three entries (k1 + two content hashes)
    assert spark.read.parquet(ledger).count() == 3


def test_kv_upsert_default_preserves_existing_stats_index(spark, tmp):
    """Review r11: the full-rewrite branch silently DROPPED a persisted
    skipping index when stats_cols was not re-passed — read_pruned then
    degraded to live footer scans (compact.py already pinned this
    invariant; the sink's branch missed it)."""
    import os

    from weightlifting_wod_etl_spark.operators.skipping import load_stats_index
    from weightlifting_wod_etl_spark.operators.versioned import resolve
    from weightlifting_wod_etl_spark.sinks import kv_upsert_parquet

    path = os.path.join(tmp, "kvidx")
    base = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-02", "b")],
        "k long, date string, v string",
    )
    kv_upsert_parquet(base, path, key_cols=["k"], order_cols=["date"],
                      stats_cols=["k"])
    assert load_stats_index(resolve(path))  # index present

    upd = spark.createDataFrame([(1, "2024-01-03", "c")],
                                "k long, date string, v string")
    kv_upsert_parquet(upd, path, key_cols=["k"], order_cols=["date"])  # default
    idx = load_stats_index(resolve(path))
    assert idx, "default upsert dropped the persisted skipping index"


def test_weekly_rollup_path_empty_batch_raises(spark, tmp):
    """Review r11: an empty (or all-NULL-date) batch silently minted
    'weekly/None__None--records.json'."""
    import pytest

    from weightlifting_wod_etl_spark.sinks import weekly_rollup_path

    empty = spark.createDataFrame([], "date string, x long")
    with pytest.raises(ValueError, match="no non-NULL"):
        weekly_rollup_path(empty, tmp)


def test_jsonl_idempotent_preserves_existing_ledger_key_type(spark, tmp):
    """Review r12 (reproduced): the NULL-key content fallback cast every
    key to string, so one run against a pre-existing LONG-typed ledger
    appended string parquet files into the long dir — a mixed-schema
    ledger that crashed every later run outside fail_open's guard. The
    fallback's type now follows the ledger's stored type."""
    import os

    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    path = os.path.join(tmp, "ltype_out")
    ledger = os.path.join(tmp, "ltype_ledger")
    # seed a pre-r12-style LONG-typed ledger
    spark.createDataFrame([(12345,)], "idem_key long").write.parquet(ledger)

    batch = spark.createDataFrame(
        [(1, "a"), (None, "n1"), (None, "n2")],
        "idem_key long, payload string",
    )
    n1 = write_jsonl_idempotent(batch, path, ledger)
    assert n1 == 3  # key 1 + two distinct NULL-key payloads
    # replay must be suppressible — i.e. the ledger is still READABLE
    # as one schema and the content keys match deterministically
    n2 = write_jsonl_idempotent(batch, path, ledger)
    assert n2 == 0
    lt = spark.read.parquet(ledger)
    assert dict(lt.dtypes)["idem_key"] == "bigint"  # type never corrupted
    assert lt.count() == 4  # seed + 3 new keys


def test_jsonl_idempotent_casts_wider_keys_to_ledger_type(spark, tmp):
    """Review r13 advice: the integral fallback cast only the content
    hash to the ledger's stored type; a LONG-keyed batch against an
    INT-typed ledger still appended bigint parquet files into the int
    dir — the same mixed-schema wedge the r12 fix closed for strings.
    The whole coalesced key now casts to the ledger type; a real key
    that overflows the narrower type raises loudly instead of wrapping
    (a wrapped key silently changes identity)."""
    import os

    import pytest

    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    path = os.path.join(tmp, "itype_out")
    ledger = os.path.join(tmp, "itype_ledger")
    spark.createDataFrame([(7,)], "idem_key int").write.parquet(ledger)

    batch = spark.createDataFrame(
        [(1, "a"), (None, "n1")], "idem_key long, payload string"
    )
    assert write_jsonl_idempotent(batch, path, ledger) == 2
    assert write_jsonl_idempotent(batch, path, ledger) == 0  # replayable
    lt = spark.read.parquet(ledger)
    assert dict(lt.dtypes)["idem_key"] == "int"  # never widened on disk
    assert lt.count() == 3

    over = spark.createDataFrame(
        [(2**40, "big")], "idem_key long, payload string"
    )
    with pytest.raises(Exception, match="exceeds the existing ledger"):
        write_jsonl_idempotent(over, path, ledger)


def test_jsonl_idempotent_raises_on_unparseable_key_for_integral_ledger(spark, tmp):
    """Round-diff review r13: a string key that does not parse as the
    ledger's integral type became NULL under the ANSI-off cast — every
    such row collapsed onto one NULL ledger key and deduped to a single
    survivor (silent data loss). It must fail loudly instead; numeric
    strings still parse and write."""
    import os

    import pytest

    from weightlifting_wod_etl_spark.sinks import write_jsonl_idempotent

    path = os.path.join(tmp, "strkey_out")
    ledger = os.path.join(tmp, "strkey_ledger")
    spark.createDataFrame([(7,)], "idem_key long").write.parquet(ledger)

    ok = spark.createDataFrame(
        [("123", "a"), (None, "n1")], "idem_key string, payload string"
    )
    assert write_jsonl_idempotent(ok, path, ledger) == 2  # numeric parses

    bad = spark.createDataFrame(
        [("abc", "x"), ("def", "y")], "idem_key string, payload string"
    )
    with pytest.raises(Exception, match="does not parse"):
        write_jsonl_idempotent(bad, path, ledger)
