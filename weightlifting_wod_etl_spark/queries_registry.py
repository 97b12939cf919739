"""Central declaration layer: named queries + their DuckDB oracle SQL.

Every operator from SURVEY.md §2 (plus the M6 large-scale extensions) gets a
named entry here; the driver runs the Spark callable and the oracle SQL
side-by-side at sf=0.01 and hash-compares the results.

Determinism rules applied to every query (SURVEY.md §7.4):
  - aggregate / computed columns are aliased identically in Spark and SQL;
  - float outputs are rounded before comparison;
  - any ordering relied upon is a TOTAL order (explicit tie-breakers);
  - timestamps compared at micro/millisecond precision via formatting, so
    parquet ns-vs-us physical precision cannot flip a hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable and its oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the driver
    then records a weaker rows-only check (SURVEY.md §7.3).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Pin timezone/AQE even when the driver session isn't ours —
            # date/timestamp rendering must not depend on host TZ.
            from .session import tune_for_session

            tune_for_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        # a silent overwrite would drop the earlier query from driver and
        # bench coverage — and could pair a stale oracle with a new
        # callable if the re-registration passes oracle=None
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import for registration side effects — each module registers its queries.
from .queries import (  # noqa: E402,F401
    aggregates,
    analytics_ext,
    core,
    curation_ext,
    dates_clean,
    events_analytics,
    functions_surface,
    joins_dedup,
    llm_ops,
    relational_ext,
    sampling,
    sketches,
    text_mining,
    text_sessionize,
    timeseries,
    tpch_ext,
    wod_e2e,
)

# Verification-window priority: the external correctness driver checks the
# FIRST 50 registrations (dict insertion order). Rounds 1-3 always presented
# the same first 50, so 27 queries — including the reference's semantic core
# (q_sessionize_text / q_group_concat / q_wod_pipeline) — never got an oracle
# row. Re-rank each round (tools/rotate_window.py) so (a) never-yet-verified
# queries, (b) the stalest last-green set, and (c) anything added/modified
# this round come first. Queries not named here keep registration order after
# the prioritized block, so nothing is ever dropped; names not registered yet
# are skipped harmlessly (lets the list name queries landing later in the
# round). _WINDOW_TAIL pins rows-only-by-design queries to the very end so no
# driver slot is burned on a query that cannot hash-match.
#
# Round-10 window (tools/rotate_window.py): fronts the r6 tranche — the
# remaining 50 overdue queries from the skipped r8 rotation (sessionize,
# wod_pipeline, date family, minhash/simhash/ngram, cosine_topk, fuzzy
# dedup, group_concat, explode_lines, 9 TPC-H heads, sketch family).
# After CORRECTNESS_r10 lands, the staleness histogram is {r8: 50, r9: 50,
# r10: 50} — nothing past the N-2 cutoff, test_driver_staleness_is_bounded
# green, the r8 debt fully repaid. Register NO new queries in r10 (they
# rank never-checked-first and would displace overdue ones). From r11 on,
# normal one-tranche-per-round rotation resumes.
# R11 REGISTRATION QUEUE (pre-built, tested, NOT yet registered):
# queries/cdc_interval.py holds q_cdc_apply and q_interval_join with
# oracle SQL + parity/plan-pin tests (test_cdc_interval_oracle.py) —
# in r11, import the module here with @register wrappers, head them in
# _WINDOW_PRIORITY, and add both to bench.py HEADLINE + COVERAGE.md.
# the external driver verifies only the FIRST this-many registered
# queries each round; the rotation tooling and the window-invariant
# tests all share this single constant
DRIVER_WINDOW_SIZE = 50

_WINDOW_PRIORITY = [
    "q_bigram_lm_score",  # last green r06
    "q_cms_estimate",  # last green r06
    "q_cosine_topk",  # last green r06
    "q_cumulative_distinct",  # last green r06
    "q_data_quality",  # last green r06
    "q_date_extract",  # last green r06
    "q_date_spine",  # last green r06
    "q_embed_centroid",  # last green r06
    "q_event_transitions",  # last green r06
    "q_ewma",  # last green r06
    "q_explode_lines",  # last green r06
    "q_fuzzy_dedup",  # last green r06
    "q_global_topn",  # last green r06
    "q_group_concat",  # last green r06
    "q_hll_bound",  # last green r06
    "q_hll_union",  # last green r06
    "q_json_fns",  # last green r06
    "q_lateral_topk",  # last green r06
    "q_mad_anomaly",  # last green r06
    "q_map_fns",  # last green r06
    "q_minhash_lsh",  # last green r06
    "q_ngram_jaccard",  # last green r06
    "q_pagerank",  # last green r06
    "q_quantile_bound",  # last green r06
    "q_resample_ffill",  # last green r06
    "q_rolling_range",  # last green r06
    "q_session_concurrency",  # last green r06
    "q_sessionize_events",  # last green r06
    "q_sessionize_text",  # last green r06
    "q_set_ops",  # last green r06
    "q_simhash",  # last green r06
    "q_sliding_window",  # last green r06
    "q_snapshot_diff",  # last green r06
    "q_string_fns",  # last green r06
    "q_tdigest_quantile",  # last green r06
    "q_tpch_q11",  # last green r06
    "q_tpch_q12",  # last green r06
    "q_tpch_q13",  # last green r06
    "q_tpch_q15",  # last green r06
    "q_tpch_q16",  # last green r06
    "q_tpch_q17",  # last green r06
    "q_tpch_q20",  # last green r06
    "q_tpch_q21",  # last green r06
    "q_tpch_q8",  # last green r06
    "q_tumbling_window",  # last green r06
    "q_weekly_rollup",  # last green r06
    "q_weighted_sample",  # last green r06
    "q_window_dedup",  # last green r06
    "q_wod_pipeline",  # last green r06
    "q_zscore_normalize",  # last green r06
]

# Rows-only by design (engine-specific sketches — SURVEY §7.3): keep these in
# the LAST registration slots so every driver window slot is oracle-bearing.
_WINDOW_TAIL = [
    "q_approx_distinct",
]


def _apply_window_priority() -> None:
    order = (
        [n for n in _WINDOW_PRIORITY if n in QUERIES]
        + [n for n in QUERIES if n not in _WINDOW_PRIORITY and n not in _WINDOW_TAIL]
        + [n for n in _WINDOW_TAIL if n in QUERIES]
    )
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in order if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)


_apply_window_priority()
