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
        # Late registration guard: if a query module is imported DIRECTLY
        # (e.g. a test importing queries.cdc_interval), that module is
        # mid-import when this registry's import block runs, so its
        # @register calls fire only AFTER _apply_window_priority() — and
        # the query would land at the END of QUERIES instead of its
        # _WINDOW_PRIORITY slot, silently reshaping the 50-query driver
        # window. Re-apply the ordering for any registration that arrives
        # after this module finished initializing (the globals() guard is
        # False for the normal registration pass inside the import block).
        if "_WINDOW_PRIORITY" in globals():
            _apply_window_priority()
        return fn

    return deco


# Import for registration side effects — each module registers its queries.
from .queries import (  # noqa: E402,F401
    aggregates,
    analytics_ext,
    cdc_interval,
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
# Round-15 window (tools/rotate_window.py): the 49-query r12 tranche —
# everything last driver-green in r12, now at the 2-round staleness
# cutoff (the exact set the r14 staleness-test failure message printed:
# q_pivot_wide, q_tpch_q1 ... q_canonical_rep) — plus q_bigram_lm_score
# (the alphabetically-first of the r13 tranche, stalest-first rule) in
# the 50th slot. This window also re-oracles q_rank_fns end-to-end after
# its r14 two-stage-window rewrite (ADVICE r14 #2). At 150 registered /
# 50-slot window the revisit cycle is exactly 3 rounds, which satisfies
# the 2-round staleness bound at steady state (everything OUTSIDE the
# window is at most 2 rounds old). CADENCE RULE (r10 verdict #2): the
# window always fronts never-checked then least-recently-green queries
# (stalest-first); the staleness test
# (test_driver_contract_process.py) enforces the bound. Net-new
# registrations stay ~0; if a new operator needs driver evidence, retire
# or merge an existing query in the same commit (r13 models: q_unpivot
# folded into q_unpivot_measures, q_window_rank retired as a duplicate
# WindowGroupLimit shape).
# the external driver verifies only the FIRST this-many registered
# queries each round; the rotation tooling and the window-invariant
# tests all share this single constant
DRIVER_WINDOW_SIZE = 50

_WINDOW_PRIORITY = [
    "q_argmax_events",  # last green r12
    "q_array_fns",  # last green r12
    "q_bigram_topk",  # last green r12
    "q_canonical_rep",  # last green r12
    "q_clean_normalize",  # last green r12
    "q_corr_stats",  # last green r12
    "q_cube",  # last green r12
    "q_dedup_antijoin",  # last green r12
    "q_dedup_exact",  # last green r12
    "q_event_gap_stats",  # last green r12
    "q_funnel_conversion",  # last green r12
    "q_grouping_sets",  # last green r12
    "q_histogram",  # last green r12
    "q_kv_upsert_dedup",  # last green r12
    "q_lang_id",  # last green r12
    "q_limit_offset",  # last green r12
    "q_min_cost_supplier",  # last green r12
    "q_multimodal_features",  # last green r12
    "q_ntile_bucket",  # last green r12
    "q_passage_dedup",  # last green r12
    "q_percentile",  # last green r12
    "q_pivot_wide",  # last green r12
    "q_quality_score",  # last green r12
    "q_rank_fns",  # last green r12; rewritten r14 -> re-oracle (ADVICE r14 #2)
    "q_regex_filter",  # last green r12
    "q_retention_cohort",  # last green r12
    "q_rollup",  # last green r12
    "q_scalar_subquery",  # last green r12
    "q_scan_project",  # last green r12
    "q_scd2_snapshot",  # last green r12
    "q_skew_agg",  # last green r12
    "q_skew_join",  # last green r12
    "q_text_stats",  # last green r12
    "q_tfidf_topk",  # last green r12
    "q_token_count",  # last green r12
    "q_tpch_q1",  # last green r12
    "q_tpch_q10",  # last green r12
    "q_tpch_q14",  # last green r12
    "q_tpch_q18",  # last green r12
    "q_tpch_q19",  # last green r12
    "q_tpch_q3",  # last green r12
    "q_tpch_q4",  # last green r12
    "q_tpch_q5",  # last green r12
    "q_tpch_q6",  # last green r12
    "q_tpch_q7",  # last green r12
    "q_tpch_q9",  # last green r12
    "q_trigram_entropy",  # last green r12
    "q_variant_json",  # last green r12
    "q_weighted_median",  # last green r12
    # spare slot: rewritten-this-round beats stalest-first (ADVICE r14
    # #2's rule), and among this round's rewrites the VALUE-CHANGING one
    # wins the slot: q_curation_pipeline's quality scores moved on
    # knife-edge docs when the composite switched to exact-rational
    # rounding (the sf0.1 parity find), and being r14-tranche it would
    # otherwise coast until r17 on a green for its OLD values.
    # q_quality_score (same rewrite) is already in-window above. The
    # value-identical r15 rewrites rotate in naturally at r16 with their
    # r13 tranche: q_ewma (two-stage lag extraction, same expressions
    # over materialized columns) and q_minhash_lsh / q_ngram_jaccard
    # (jaccard i64 swap, pinned by the 300-ratio Fraction property test
    # and the i64-vs-decimal identity test on their exact domain).
    "q_curation_pipeline",  # last green r14, exact-rational quality r15
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
