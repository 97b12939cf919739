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
    if isinstance(v, (list, tuple, np.ndarray)):
        items = v.tolist() if isinstance(v, np.ndarray) else v
        return "[" + ",".join(_canon_value(x) for x in items) + "]"
    # pd.isna covers None, float NaN, NaT, and pd.NA uniformly — a NULL
    # timestamp must canonicalize identically whether it arrives as None
    # (object dtype) or NaT (datetime64 dtype)
    try:
        if v is None or pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        # format ints like floats: a nullable BIGINT column arrives as
        # float64 on whichever side holds the NULL row, and an int-vs-
        # float format split would then flag EVERY row of the column,
        # drowning the one true diff in dtype noise. Above 1e15 (double
        # mantissa limit) both branches switch to exact-int form.
        iv = int(v)
        return f"{float(iv):.6f}" if abs(iv) < 10**15 else str(iv)
    if isinstance(v, float):
        if not math.isfinite(v):
            return str(v)  # 'inf' / '-inf' — don't crash int(v)
        if v == 0:
            return "0.000000"  # fold -0.0 into +0.0 (numerically equal)
        if abs(v) >= 1e15:
            # mirror the int branch's exact form for integral magnitudes
            return str(int(v)) if v == int(v) else f"{v:.6e}"
        return f"{v:.6f}"
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
