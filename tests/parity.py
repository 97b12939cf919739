"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Normalizes both results the way an order-insensitive value-hash would:
columns sorted by name, rows sorted by all columns, values canonicalized
(floats rounded, ints widened, timestamps stringified). Used by
tests/test_oracle_parity.py to catch hash-mismatch bugs before the driver
does.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        # format ints like floats: a nullable BIGINT column arrives as
        # float64 on whichever side holds the NULL row, and an int-vs-
        # float format split would then flag EVERY row of the column,
        # drowning the one true diff in dtype noise
        return f"{float(v):.6f}" if abs(int(v)) < 10**15 else str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows, d_rows = canonicalize(spark_pdf), canonicalize(duck_pdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
