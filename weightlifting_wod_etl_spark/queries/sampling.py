"""Sampling / split / chunking queries over the documents corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sampling import dataset_split, hash_sample, token_chunks
from ..functions.casefold import oracle_portable_lower_sql
from ..operators.text import (
    ORACLE_QUALITY_FORMULA_SQL,
    PUNCT_CLASS,
    oracle_quality_feats_sql,
    oracle_stopword_regex,
    ws_token_count,
)
from ..queries_registry import register


@register(
    "q_hash_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 2) < '1a'
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10.2% content-addressed sample (operators/sampling.py) — unlike
    ``df.sample()`` the kept set is a pure function of doc_id: stable
    across reruns, repartitions, and corpus growth, and the predicate is
    scan-local (no shuffle, no seed state)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(hash_sample(F.col("doc_id"), "1a")).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "q_dataset_split",
    oracle="""
    -- NULL doc_id -> NULL split (unidentifiable records must not pool in
    -- 'test' — engine pin, operators/sampling.py::dataset_split)
    SELECT CASE WHEN doc_id IS NULL THEN NULL
                WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cd' THEN 'train'
                WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ≈80/10/10 train/val/test assignment by md5 bucket
    range — a record never migrates between splits when the corpus grows
    (no eval leakage on reruns); per-(split, lang) size audit."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("split", dataset_split(F.col("doc_id"))).groupBy(
        "split", "lang"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "q_token_chunks",
    oracle="""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    )
    SELECT doc_id,
           unnest(generate_series(0, (n_tokens + 511) // 512 - 1)) AS chunk_id,
           n_tokens
    FROM d
    """,
)
def q_token_chunks_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunk ids per document (512-token windows) — the
    chunk plan for sequence packing, as a scan-local explode. ``n_tokens``
    rides inside the chunk struct — computed once per document by
    token_chunks' let-bound split, never re-derived per chunk or by a
    second split."""
    docs = load_table(spark, sf_dir, "documents")
    # n_tokens now rides inside the chunk struct (computed once by
    # token_chunks' let-bound split) — the separate ws_token_count
    # projection re-split every document a second time (review r11)
    chunked = docs.select(
        "doc_id", F.explode(token_chunks(F.col("text"), 512)).alias("c")
    )
    return chunked.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


@register(
    "q_chunk_bounds",
    oracle="""
    WITH d AS (
        SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               unnest(generate_series(0, (n_tokens + 511) // 512 - 1)) AS chunk_id
        FROM d
    )
    SELECT doc_id, chunk_id,
           chunk_id * 512 AS token_start,
           least(chunk_id * 512 + 512, n_tokens) AS token_end
    FROM c
    """,
)
def q_chunk_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (start, end) token bounds per 512-token chunk — the struct
    payload of operators/sampling.token_chunks, exploded."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(token_chunks(F.col("text"), 512)).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.token_start").alias("token_start"),
        F.col("c.token_end").alias("token_end"),
    )


@register(
    "q_corpus_mixture",
    oracle="""
    WITH rated AS (
        SELECT doc_id, source,
               CASE TRY_CAST(substr(source, 4) AS INT) % 4
                    WHEN 0 THEN 'ff' WHEN 1 THEN 'bf'
                    WHEN 2 THEN '80' ELSE '40' END AS cutoff
        FROM documents
    )
    SELECT source, count(*)::BIGINT AS n_kept
    FROM rated
    WHERE substr(md5(doc_id::VARCHAR), 1, 2) < cutoff
    GROUP BY source
    """,
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: each source is down-sampled at its own rate
    (100/75/50/25% by source index) — the data-mixing step of a training
    run, as a broadcast join against a tiny rates dim + the same
    content-addressed keep-predicate as q_hash_sample. Scan-local per row;
    one shuffle for the audit agg."""
    from ..operators.sampling import hash_bucket

    # rate lookup by src_idx % 4 expression, not a 20-row inner-join dim:
    # the join silently DROPPED any source outside src0..src19 while the
    # oracle's CASE keeps every source. A when-chain, NOT element_at((%4)+1):
    # both engines' % is sign-of-dividend, so a negative source index must
    # fall to the ELSE arm — element_at would raise on index 0 (src_idx
    # -1) or silently read from the array's tail (src_idx -2, -3). try_cast
    # keeps unparseable indexes NULL (-> ELSE) in every ANSI mode, exactly
    # like the oracle's TRY_CAST.
    m = F.col("src_idx") % 4
    cutoff = (
        F.when(m == 0, F.lit("ff"))
        .when(m == 1, F.lit("bf"))
        .when(m == 2, F.lit("80"))
        .otherwise(F.lit("40"))
    )
    docs = load_table(spark, sf_dir, "documents").withColumn(
        # substr to END of string: a 10-char cap silently parsed the
        # truncated prefix of an 11+-digit index where the oracle's
        # uncapped TRY_CAST overflows to NULL -> ELSE arm (review r11)
        "src_idx", F.expr("substr(source, 4)").try_cast("int")
    )
    kept = docs.filter(hash_bucket(F.col("doc_id")) < cutoff)
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "q_sequence_pack",
    oracle="""
    WITH d AS (
        SELECT doc_id, lang,
               substr(md5(doc_id::VARCHAR), 1, 1) AS pack_bucket,
               len(string_split(text, ' '))::BIGINT AS n_toks
        FROM documents
    ),
    packed AS (
        SELECT lang, pack_bucket, n_toks,
               ((sum(n_toks) OVER (PARTITION BY lang, pack_bucket
                                   ORDER BY n_toks DESC, doc_id NULLS LAST
                                   ROWS UNBOUNDED PRECEDING) - n_toks) // 2048)::BIGINT AS bin_id
        FROM d
    )
    SELECT lang, pack_bucket, bin_id,
           count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS sum_tokens
    FROM packed
    GROUP BY lang, pack_bucket, bin_id
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: docs sorted (tokens desc, id) per
    (language, content-hash bucket), binned where the running token total
    crosses the 2048 budget — deterministic packing with docs straddling a
    boundary (trailing straddle tokens truncate downstream).

    The window partitions on (lang, pack_bucket) — 16 md5 buckets per
    language — NOT on lang alone: a lang-only partition funnels the whole
    corpus through ~|languages| reducers (a 5-way sort of 100 TB), while
    the bucketed key spreads the same sort over 16x the parallelism at the
    cost of ≤1 underfilled bin per bucket. The bucket is content-addressed
    (same md5 family as hash_sample) so packing stays reproducible across
    engines and reruns. True first-fit needs per-bin state: at scale,
    applyInPandas per (lang, pack_bucket) with this plan as partitioner."""
    from pyspark.sql import Window

    from ..operators.sampling import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang",
        F.substring(hash_bucket(F.col("doc_id")), 1, 1).alias("pack_bucket"),
        # null-guarded: a raw size(split) would fold -1 into a real bin on
        # NULL text AND shift every later row's running sum in the bucket
        ws_token_count(F.col("text")).alias("n_toks"),
    )
    w = (
        Window.partitionBy("lang", "pack_bucket")
        .orderBy(F.col("n_toks").desc(), F.col("doc_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # `div`, not `/ ... cast(bigint)` (review r14): the running token sum
    # is an exact long, but `/` is DOUBLE division — past 2^53 the rounded
    # quotient can land a hair above an integer and truncate into the
    # NEXT bin, while the oracle's `//` divides the exact integer. The
    # per-(lang, bucket) token total at advertised scale is the same
    # silently-inexact-at-scale class as q_gini's int64 wrap (r13).
    packed = d.withColumn("run", F.sum("n_toks").over(w)).withColumn(
        "bin_id", F.expr("(run - n_toks) div 2048")
    ).drop("run")
    return packed.groupBy("lang", "pack_bucket", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_tokens"),
    )


@register(
    "q_curation_pipeline",
    # features + weighted formula INTERPOLATED from operators/text (r13:
    # one shared definition with q_quality_score's oracle — hardcoded
    # copies desynchronize silently when a weight or list changes)
    oracle=rf"""
    WITH feats AS (
        SELECT doc_id, lang, source, text,
               {oracle_quality_feats_sql("en")}
        FROM documents
        -- mirror of quality_score's NULL-text guard: without it DuckDB's
        -- least()/greatest() skip the NULL features, score NULL text 0.7,
        -- and keep a doc the Spark side's NULL quality filters out
        WHERE text IS NOT NULL
    ),
    scored AS (
        SELECT doc_id, lang, source,
               md5(trim(regexp_replace({oracle_portable_lower_sql('text')}, '[ \t\n\f\r]+', ' ', 'g'))) AS fingerprint,
               {ORACLE_QUALITY_FORMULA_SQL} AS quality
        FROM feats
    ),
    survivors AS (
        SELECT * FROM scored
        WHERE quality >= 0.5
        QUALIFY row_number() OVER (PARTITION BY fingerprint
                                   ORDER BY quality DESC,
                                            doc_id NULLS LAST) = 1
    )
    SELECT lang, source, count(*)::BIGINT AS n_docs,
           round(sum(quality), 4) AS sum_quality
    FROM survivors
    GROUP BY lang, source
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality-filter → exact-dedup keeping the
    best-quality copy per fingerprint → per-(lang, source) audit. The
    LLM-pipeline composition query: every stage is an operator declared
    elsewhere (text.quality_score, text.doc_fingerprint, dedup
    row_number=1), chained in one plan — filter pushes into the scan, the
    dedup window and final agg are the only shuffles."""
    from pyspark.sql import Window

    from ..operators.text import doc_fingerprint, quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "source",
        doc_fingerprint(F.col("text")).alias("fingerprint"),
        quality_score(F.col("text")).alias("quality"),
    ).filter(F.col("quality") >= 0.5)
    # doc_id NULLS LAST both sides: a NULL-id duplicate tying on quality
    # must lose the survivor slot identically in both engines (review r11)
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc_nulls_last()
    )
    survivors = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return survivors.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("quality"), 4).alias("sum_quality"),
    )


@register(
    "q_weighted_sample",
    oracle="""
    SELECT doc_id, lang, n_chars,
           round(least(1.0, n_chars / 2000.0), 6) AS keep_prob
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
          < least(1.0, n_chars / 2000.0) * 4294967296
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: each document is kept with
    probability proportional to a per-row weight (here a length proxy,
    capped at 1), decided by comparing its md5-derived uniform in [0, 2^32)
    against weight·2^32 — the importance-sampling primitive for corpus
    mixing, upweighting high-quality documents without any RNG state.

    Same content-addressed guarantees as q_hash_sample (stable across
    reruns, repartitions, corpus growth) but with a CONTINUOUS per-row
    rate rather than one global threshold. Scan-local: no shuffle, no
    seed, nothing global — the predicate is pure row arithmetic at any
    scale. The u32-vs-weight·2^32 comparison is exact-integer on one side
    and a single IEEE multiply on the other, so the kept set is
    bit-identical in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0))
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return docs.filter(u32 < weight * F.lit(4294967296.0)).select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(weight, 6).alias("keep_prob"),
    )
