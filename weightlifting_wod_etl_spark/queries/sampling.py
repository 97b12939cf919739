"""Sampling / split / chunking queries over the documents corpus."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sampling import dataset_split, hash_sample, token_chunks
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
    SELECT CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cd' THEN 'train'
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
    chunk plan for sequence packing, as a scan-local explode."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.size(F.split(F.col("text"), " ")).cast("bigint")
    chunked = docs.select(
        "doc_id",
        F.explode(token_chunks(F.col("text"), 512)).alias("c"),
        n.alias("n_tokens"),
    )
    return chunked.select("doc_id", F.col("c.chunk_id").alias("chunk_id"), "n_tokens")


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
