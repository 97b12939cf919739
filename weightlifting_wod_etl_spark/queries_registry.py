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
# Round-7 window (tools/rotate_window.py + in-round additions): the 16
# queries ADDED in round 7 lead (never-checked-first invariant,
# test_driver_contract_process.py), followed by all 34 r4-stale queries —
# the minhash/similarity tail, the curation family, asof/range joins,
# sampling, multimodal, and the fn-surface buffer the round-6 additions
# displaced. That fills the 50 slots exactly; the r5-green block below is
# this round's past-window buffer. After r7 no driver evidence is older
# than round 5 (bound N-2, test_driver_staleness_is_bounded). ROUND-8 NOTE:
# the 48 remaining r5-green queries hit the staleness cutoff then and must
# lead the r8 window (48 of 50 slots — at most 2 new queries can be added
# in round 8 without re-planning the rotation across two rounds).
_WINDOW_PRIORITY = [
    # NEW in round 7 (never driver-checked — must lead the window)
    "q_pruned_scan",
    "q_bloom_semi_join",
    "q_chi_square",
    "q_streaks",
    "q_mode_per_group",
    "q_linreg_trend",
    "q_rollup_time",
    "q_variant_json",
    "q_recursive_reachability",
    "q_unpivot_measures",
    "q_autocorr",
    "q_skyline",
    "q_nullsafe_join",
    "q_collation_group",
    "q_weighted_median",
    "q_gini",
    # stale: last driver evidence round 4 (34 queries — all of them)
    "q_ann_ivf",
    "q_ann_lsh_bucket",
    "q_anti_scalar_sub",
    "q_asof_join",
    "q_binary_meta",
    "q_chunk_bounds",
    "q_corpus_mixture",
    "q_count_distinct",
    "q_curation_pipeline",
    "q_dataset_split",
    "q_date_fns",
    "q_decimal_agg",
    "q_decontaminate",
    "q_doc_fingerprint",
    "q_domain_cap",
    "q_dup_clusters",
    "q_embed_neardup",
    "q_frame_sample",
    "q_full_outer",
    "q_hash_sample",
    "q_intradoc_repetition",
    "q_media_resize",
    "q_null_semantics",
    "q_outer_join_dist",
    "q_pii_redact",
    "q_range_join",
    "q_rolling_hash",
    "q_semi_join",
    "q_sequence_pack",
    "q_set_ops_all",
    "q_stratified_sample",
    "q_token_chunks",
    "q_token_topk",
    "q_union_by_name",
    # stalest r5-green fill the remaining 16 slots
    "q_argmax_events",
    "q_array_fns",
    "q_bigram_topk",
    "q_canonical_rep",
    "q_clean_normalize",
    "q_corr_stats",
    "q_cube",
    "q_dedup_antijoin",
    "q_dedup_exact",
    "q_event_gap_stats",
    "q_funnel_conversion",
    "q_grouping_sets",
    "q_histogram",
    "q_kv_upsert_dedup",
    "q_lang_id",
    "q_limit_offset",
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
