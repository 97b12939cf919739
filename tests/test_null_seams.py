"""Dirty-testdata parity harness for the null/edge seam class.

The driver's synthetic tables are clean — no NULLs anywhere, documents
are single-spaced ``[a-z0-9 ]`` text — so the sf-dir oracle parity suite
structurally CANNOT catch divergences that only trigger on NULL keys,
NULL measures, NULL/empty/near-empty text, or tiny groups. Every review
round has found real bugs in exactly that seam (pandas groupby dropping
NULL keys, count(*) vs count(col), sequence(0, -1) descending on
size(NULL) = -1, interpolated sketch bands on 2-row groups, ...).

This harness copies ``events``, ``documents``, and ``embeddings`` into a
temp sf dir with hostile rows appended (NULL keys/measures/text/vectors,
empty and near-empty text, HTML entities, short/zero vectors, tiny
groups), then re-runs the SAME query-vs-oracle comparison the driver
runs, over the dirty tables, for every registered query that reads only
these tables. A query whose Spark plan and DuckDB oracle
disagree on any injected edge fails here years before production data
ever shows it to the driver.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.parity import assert_frames_match

# registered queries whose inputs are exactly {events} or {documents} —
# each gets the full dirty-parity treatment. Queries with rows-only
# checks or other input tables are out of scope here.
DIRTY_QUERIES = [
    # sketches over events (NULL event_type/value/user_id + tiny groups)
    "q_quantile_bound",
    "q_tdigest_quantile",
    "q_hll_bound",
    "q_hll_union",
    # events time series (NULL ts/value, tiny day groups)
    "q_autocorr",
    "q_linreg_trend",
    "q_resample_ffill",
    "q_rolling_range",
    "q_session_concurrency",
    "q_ewma",
    "q_sessionize_events",
    # corpus mining over documents (NULL/empty/1-token/double-space text)
    "q_bigram_topk",
    "q_passage_dedup",
    "q_token_topk",
    "q_trigram_entropy",
    "q_canonical_rep",
    "q_cms_estimate",
    "q_tfidf_topk",
    "q_bigram_lm_score",
    # curation over documents
    "q_pii_redact",
    "q_intradoc_repetition",
    "q_decontaminate",
    "q_domain_cap",
    "q_stratified_sample",
    "q_curation_pipeline",
    # sampling / chunking over documents
    "q_hash_sample",
    "q_dataset_split",
    "q_token_chunks",
    "q_chunk_bounds",
    "q_corpus_mixture",
    "q_sequence_pack",
    "q_weighted_sample",
    # scan surface + text sessionization over documents
    "q_scan_project",
    "q_limit_offset",
    "q_regex_filter",
    "q_array_fns",
    "q_explode_lines",
    "q_sessionize_text",
    "q_group_concat",
    # M6 dedup/text family over documents
    "q_minhash_lsh",
    "q_simhash",
    "q_ngram_jaccard",
    "q_text_stats",
    "q_token_count",
    "q_lang_id",
    "q_quality_score",
    "q_doc_fingerprint",
    # multimodal plumbing over documents-as-media
    "q_binary_meta",
    "q_multimodal_features",
    "q_media_resize",
    "q_frame_sample",
    # embedding similarity / centroid over the dirty embeddings table
    "q_cosine_topk",
    "q_ann_lsh_bucket",
    "q_ann_ivf",
    "q_embed_neardup",
    "q_dup_clusters",
    "q_embed_centroid",
    # full reference pipeline (entity-bearing text exercises the decode)
    "q_wod_pipeline",
]


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("dirty_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMOKE}/events.parquet')
            UNION ALL
            SELECT * FROM (VALUES
                (9000001::BIGINT, TIMESTAMP '2024-03-01 10:00:00',
                 42::BIGINT, NULL, 5.25::DOUBLE, NULL),
                (9000002, TIMESTAMP '2024-03-01 11:00:00',
                 NULL, 'null_user_evt', 1.00, NULL),
                (9000003, TIMESTAMP '2024-03-02 09:00:00',
                 43, 'tiny_evt', NULL, NULL),
                (9000004, TIMESTAMP '2024-03-02 09:30:00',
                 44, 'tiny_evt', 2.50, NULL),
                (9000005, TIMESTAMP '2024-03-03 09:30:00',
                 45, 'tiny_evt', 7.75, NULL),
                (9000006, NULL, 46, 'tiny_evt', 3.00, NULL),
                (9000007, TIMESTAMP '2024-03-04 09:30:00',
                 NULL, NULL, NULL, NULL)
            ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMOKE}/documents.parquet')
            UNION ALL
            SELECT * FROM (VALUES
                (9000001::BIGINT, NULL, 'en', 'dirty', NULL::BIGINT),
                (9000002, '', 'en', 'dirty', 0),
                (9000003, 'solo', 'en', 'dirty', 4),
                (9000004, 'a  b', 'en', 'dirty', 4),
                (9000005, 'dup dup dup dup', NULL, 'dirty', 15),
                (9000006, 'x y z', 'xx', NULL, 5),
                (9000007, 'negative source index doc', 'en', 'src-1', 25),
                (9000008, 'even negative source index', 'en', 'src-2', 26),
                (9000009, 'alpha &amp; beta &#8211; gamma &amp;lt; delta',
                 'en', 'src1', 44)
            ) t(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
            UNION ALL
            SELECT * FROM (VALUES
                (9000001::BIGINT, NULL, 3),
                (9000002, [0.5::FLOAT, -0.25::FLOAT, 0.125::FLOAT], 4),
                (9000003, list_transform(range(1, 65),
                                         i -> 0.0::FLOAT), NULL),
                (9000004, list_transform(range(1, 65),
                                         i -> ((i % 7) - 3)::FLOAT / 8), NULL)
            ) t(vec_id, embedding, label)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def dirty_duck(dirty_dir):
    import duckdb

    con = duckdb.connect()
    for name in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS"
            f" SELECT * FROM read_parquet('{dirty_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DIRTY_QUERIES)
def test_query_matches_oracle_on_dirty_data(
    spark, dirty_duck, dirty_dir, name
):
    from weightlifting_wod_etl_spark import queries_registry as reg

    spark_pdf = reg.QUERIES[name](spark, dirty_dir).toPandas()
    duck_pdf = dirty_duck.execute(reg.ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, f"{name}[dirty]")
