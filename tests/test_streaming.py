"""Streaming sessionization tests: file-source micro-batches → memory sink,
cross-checked against the batch plan on the same data."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dirs(spark):
    """Split sf0.001 events into two parquet files (two micro-batches)."""
    from weightlifting_wod_etl_spark.io import load_table

    # load_table normalizes whatever physical ts encoding the testdata
    # generation shipped (ns-as-bigint, NTZ micros, tz-aware micros).
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    tmp = tempfile.mkdtemp(prefix="wod_stream_")
    in_dir = os.path.join(tmp, "in")
    ckpt = os.path.join(tmp, "ckpt")
    half = src.count() // 2
    a = src.orderBy("ts").limit(half)
    b = src.orderBy("ts").subtract(a)
    a.coalesce(1).write.parquet(os.path.join(in_dir, "batch_a"))
    b.coalesce(1).write.parquet(os.path.join(in_dir, "batch_b"))
    yield src, in_dir, ckpt
    shutil.rmtree(tmp, ignore_errors=True)


def _run_stream(spark, df, ckpt, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def test_session_window_stream_matches_batch(spark, stream_dirs):
    from weightlifting_wod_etl_spark.streaming.sessions import session_window_agg

    src, in_dir, ckpt = stream_dirs
    schema = src.schema
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(in_dir)
    got = _run_stream(
        spark, session_window_agg(stream, watermark="1 minute"), ckpt + "_sw", "sw_out"
    ).collect()
    batch = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in session_window_agg(src).collect()
    }
    assert len(got) > 0, "stream emitted nothing — watermark never advanced"
    for r in got:  # every emitted session must be exactly a batch session
        key = (r.user_id, r.session_start, r.session_end)
        assert key in batch, f"streamed session {key} not in batch result"
        assert batch[key] == (r.n_events, r.sum_value)
    # availableNow leaves only post-watermark sessions unemitted
    assert len(got) >= len(batch) * 0.5


def test_stateful_sessionizer_stream(spark, stream_dirs):
    from weightlifting_wod_etl_spark.operators.sessionize import gap_sessionize
    from weightlifting_wod_etl_spark.streaming.sessions import stateful_gap_sessionize

    src, in_dir, ckpt = stream_dirs
    stream = spark.readStream.schema(src.schema).option("recursiveFileLookup", "true").parquet(in_dir)
    got = _run_stream(
        spark, stateful_gap_sessionize(stream), ckpt + "_state", "state_out"
    ).collect()
    # batch truth: gap sessions per user (closed ones only get emitted)
    batch_df = gap_sessionize(
        src.select("user_id", "ts", "value"),
        ts_col="ts",
        partition_cols=["user_id"],
        gap_seconds=1800,
        tiebreak_cols=["value"],
    )
    batch = {
        (r.user_id, r.session_start): (r.n_events, float(r.sum_value))
        for r in batch_df.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert len(got) > 0
    matched = 0
    for r in got:
        key = (r.user_id, r.session_start)
        if key in batch:
            assert batch[key][0] == r.n_events
            matched += 1
    assert matched >= len(got) * 0.9


def test_stream_dedup_within_watermark(spark, stream_dirs):
    """Replayed keys across micro-batches are suppressed exactly once."""
    import os

    from weightlifting_wod_etl_spark.streaming.dedup import dedup_stream

    src, in_dir, ckpt = stream_dirs
    # build a replayed input: batch_a ∪ (batch_a sample ∪ batch_b) — the
    # sample rows arrive twice, in different micro-batches
    tmp = ckpt + "_dedup_in"
    a = spark.read.parquet(os.path.join(in_dir, "batch_a"))
    b = spark.read.parquet(os.path.join(in_dir, "batch_b"))
    replay = a.orderBy("event_id").limit(50)
    a.coalesce(1).write.parquet(os.path.join(tmp, "m1"))
    replay.unionByName(b).coalesce(1).write.parquet(os.path.join(tmp, "m2"))

    stream = (
        spark.readStream.schema(src.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
    )
    got = _run_stream(
        spark, dedup_stream(stream, keys=["event_id"]), ckpt + "_dedup", "dedup_out"
    )
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == len(set(ids)), "stream emitted duplicate keys"
    assert set(ids) == {r.event_id for r in src.collect()}, "lost or invented keys"


def test_foreach_batch_twin_sink_exactly_once(spark, stream_dirs):
    """OP20 streaming flavor: one cached micro-batch fans to parquet + JSONL;
    a re-run over the same checkpoint produces zero duplicates."""
    import glob

    from weightlifting_wod_etl_spark.streaming.twin_sink import make_twin_sink

    src, in_dir, _ = stream_dirs
    tmp = tempfile.mkdtemp(prefix="wod_twin_")
    pq_dir = os.path.join(tmp, "pq")
    js_dir = os.path.join(tmp, "js")
    ledger = os.path.join(tmp, "ledger")
    ckpt = os.path.join(tmp, "ckpt")
    expected = src.count()

    def run():
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir + "/*")
            .select("event_id", "user_id", "event_type", "ts", "value")
        )
        q = (
            stream.writeStream.foreachBatch(
                make_twin_sink(pq_dir, js_dir, ledger)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()
    pq_rows = spark.read.parquet(pq_dir + "/batch_id=*").count()
    js_rows = spark.read.json(js_dir + "/batch_id=*").count()
    assert pq_rows == expected
    assert js_rows == expected
    assert len(glob.glob(os.path.join(ledger, "*.done"))) >= 2  # >=2 batches

    run()  # replay with the same checkpoint: availableNow sees nothing new
    assert spark.read.parquet(pq_dir + "/batch_id=*").count() == expected
    assert spark.read.json(js_dir + "/batch_id=*").count() == expected
    shutil.rmtree(tmp, ignore_errors=True)


def test_stateless_curation_ops_run_in_streaming_mode(spark):
    """The scan-local curation projections (PII redaction, repetition
    score) must be streamable unchanged: same plan on readStream, output
    equal to the batch run over the same files."""
    import pandas as pd  # noqa: F401  (parity of imports with module head)

    from weightlifting_wod_etl_spark.io import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    tmp = tempfile.mkdtemp(prefix="wod_curation_stream_")
    in_dir = os.path.join(tmp, "in")
    docs.coalesce(2).write.parquet(in_dir)

    def redact(df):
        t = F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"), F.lit("@example.com"),
        )
        red = F.regexp_replace(
            t, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
        )
        return df.select("doc_id", F.md5(red).alias("redacted_md5"))

    stream = spark.readStream.schema(docs.schema).parquet(in_dir)
    got = _run_stream(
        spark, redact(stream), os.path.join(tmp, "ckpt"), "curation_out"
    ).collect()
    want = {r.doc_id: r.redacted_md5 for r in redact(docs).collect()}
    assert len(got) == len(want)
    for r in got:
        assert want[r.doc_id] == r.redacted_md5
    shutil.rmtree(tmp, ignore_errors=True)


def test_completion_notification_listener(spark, stream_dirs):
    """OP22: the notification listener records started → progress →
    terminated for a pipeline run, with row counts covering the input."""
    import json as _json

    from weightlifting_wod_etl_spark.streaming.notify import notify_on_completion

    src, in_dir, ckpt = stream_dirs
    tmp = tempfile.mkdtemp(prefix="wod_notify_")
    log = os.path.join(tmp, "notifications.jsonl")
    listener = notify_on_completion(spark, log)
    try:
        stream = (
            spark.readStream.schema(src.schema)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
            .select("event_id")
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("notify_out")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        deadline = time.time() + 30
        events = []
        while time.time() < deadline:
            if os.path.exists(log):
                events = [_json.loads(l) for l in open(log)]
                if any(e["event"] == "terminated" for e in events):
                    break
            time.sleep(0.5)
        kinds = {e["event"] for e in events}
        assert {"started", "progress", "terminated"} <= kinds, kinds
        rows = sum(
            e.get("num_input_rows", 0) for e in events if e["event"] == "progress"
        )
        assert rows == src.count()
        terminated = [e for e in events if e["event"] == "terminated"]
        assert terminated[-1]["exception"] is None
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(tmp, ignore_errors=True)
