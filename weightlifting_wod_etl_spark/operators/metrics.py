"""Zero-cost pipeline metrics via ``Observation`` — audit counters
computed DURING an action, not by a second scan.

The reference logs per-stage record counts from its Lambda handlers
(`handler.py` prints batch sizes between stages). The naive Spark port
is a ``df.count()`` per stage — each one a full extra job, ruinous at
100 TB. ``df.observe(Observation, exprs...)`` instead attaches aggregate
expressions to the plan itself: they are computed incrementally by the
same tasks that run the real action (accumulator-backed, no extra scan,
no extra shuffle) and become available on the Observation handle once
the action finishes.

Constraint inherited from Spark: observed expressions must be
aggregates that tolerate incremental, per-task accumulation — counts,
conditional counts, sums, min/max. No distinct, no percentiles (use the
sketch family for those).
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

# Spark requires observation names UNIQUE per query: two default-named
# observe_quality calls composed into one plan died with AnalysisException
# at action time (review r11) — the default is now serial-numbered
_obs_seq = itertools.count(1)


def observe_quality(
    df: DataFrame,
    required: list[str],
    measure: str | None = None,
    name: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach standard audit counters to ``df``: total rows, per-column
    null counts for ``required``, and (optionally) sum/min/max of a
    numeric ``measure`` in integer fixed-point. Returns the observed
    frame (use it in place of ``df``) and the Observation handle —
    read ``obs.get`` AFTER the first action on the returned frame.
    ``name`` defaults to a per-process-unique 'quality_N'."""
    if name is None:
        name = f"quality_{next(_obs_seq)}"
    exprs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in required:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    if measure is not None:
        from ..functions.money import to_fixed

        cents = to_fixed(measure)
        exprs.append(F.sum(cents).alias(f"sum_{measure}_cents"))
        exprs.append(F.min(cents).alias(f"min_{measure}_cents"))
        exprs.append(F.max(cents).alias(f"max_{measure}_cents"))
    obs = Observation(name)
    return df.observe(obs, *exprs), obs
