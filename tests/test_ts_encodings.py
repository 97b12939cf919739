"""The testdata's ``events.ts`` column has shipped under three different
physical parquet encodings across driver generations (TIMESTAMP(NANOS),
tz-naive micros, tz-aware micros). ``io.load_table`` is the engine's ONE
normalization point — these tests synthesize all three encodings and prove
each loads to the same session-TZ TIMESTAMP micros, so the next testdata
regeneration cannot silently break 100+ queries again.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TS = [
    dt.datetime(2024, 1, 1, 0, 0, 7, 179575),
    dt.datetime(2024, 1, 15, 23, 59, 59, 999999),
    dt.datetime(2024, 1, 30, 12, 30, 0, 0),
]


def _write_events(dirpath: str, arrow_type: pa.DataType) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array(TS, type=arrow_type),
        }
    )
    pq.write_table(
        table,
        os.path.join(dirpath, "events.parquet"),
        # version 2.6 keeps NANOS as NANOS instead of silently down-casting
        version="2.6",
    )


@pytest.mark.parametrize(
    "label,arrow_type",
    [
        ("nanos", pa.timestamp("ns")),
        ("micros_naive", pa.timestamp("us")),
        ("micros_utc", pa.timestamp("us", tz="UTC")),
    ],
)
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, label, arrow_type):
    from weightlifting_wod_etl_spark.io import load_table

    d = str(tmp_path / label)
    os.makedirs(d)
    _write_events(d, arrow_type)

    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{label}: wrong logical type"
    got = {r.event_id: r.ts for r in df.collect()}
    # session TZ is pinned UTC (session.py), so naive datetimes compare 1:1
    want = {i + 1: t for i, t in enumerate(TS)}
    assert got == want, f"{label}: values changed under normalization"
