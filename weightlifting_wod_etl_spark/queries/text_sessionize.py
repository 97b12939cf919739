"""Text sessionization queries — OP5-OP9 + OP14 (the reference's core).

The ``documents`` table has no newlines, so "lines" here are whitespace
tokens — the operator semantics (ordered explode, marker boundary, ordered
group concat) are identical to the reference's per-line form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.pivot import ordered_concat_expr
from ..operators.sessionize import explode_lines, sessionize_by_marker
from ..queries_registry import register

# marker tokens that open a session group within a document
MARKER_PAT = "^(scan|join)$"

_EXPLODE_CTE = """
    exploded AS (
        SELECT doc_id,
               unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS word_idx,
               unnest(string_split(text, ' ')) AS word
        FROM documents
    )
"""

_GROUPED_CTE = f"""
    WITH {_EXPLODE_CTE},
    marked AS (
        SELECT doc_id, word_idx, word,
               CASE WHEN regexp_matches(word, '{MARKER_PAT}') THEN 1 ELSE 0 END AS is_marker
        FROM exploded
    ),
    grouped AS (
        -- reference pairwise rule (transforms.py:119-127): a document
        -- with fewer than two markers yields NO groups — every row keeps
        -- group_id 0 and the downstream group_id > 0 filter drops it
        SELECT doc_id, word_idx, word,
               CASE WHEN sum(is_marker) OVER (PARTITION BY doc_id) >= 2
                    THEN sum(is_marker) OVER (PARTITION BY doc_id
                                              ORDER BY word_idx
                                              ROWS UNBOUNDED PRECEDING)
                    ELSE 0 END AS group_id
        FROM marked
    )
"""


def _exploded_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return explode_lines(
        docs, text_col="text", id_cols=["doc_id"], sep=" ", line_col="word", idx_col="word_idx"
    )


def _grouped_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode + marker sessionization — the ONE definition shared by
    q_sessionize_text and q_group_concat (r13: the two call sites
    duplicated the pattern/partition/order/line arguments verbatim, so a
    one-sided tweak would silently desynchronize their grouping)."""
    return sessionize_by_marker(
        _exploded_words(spark, sf_dir),
        pattern=MARKER_PAT,
        partition_cols=["doc_id"],
        order_col="word_idx",
        line_col="word",
    )


@register(
    "q_explode_lines",
    oracle=f"WITH {_EXPLODE_CTE} SELECT doc_id, word_idx::BIGINT AS word_idx, word FROM exploded",
)
def q_explode_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP5 — ordered table-generating split (transforms.py:156)."""
    return _exploded_words(spark, sf_dir).select(
        "doc_id", F.col("word_idx").cast("bigint").alias("word_idx"), "word"
    )


@register(
    "q_sessionize_text",
    oracle=_GROUPED_CTE
    + """
    SELECT doc_id, group_id::BIGINT AS group_id, count(*)::BIGINT AS n_tokens,
           min(word_idx)::BIGINT AS start_idx, max(word_idx)::BIGINT AS end_idx
    FROM grouped
    WHERE group_id > 0
    GROUP BY doc_id, group_id
    """,
)
def q_sessionize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP6-OP9 — marker-boundary sessionization with preamble dropped
    (reference group_source_by, transforms.py:115-128)."""
    grouped = _grouped_words(spark, sf_dir)
    return grouped.groupBy("doc_id", "group_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.min("word_idx").cast("bigint").alias("start_idx"),
        F.max("word_idx").cast("bigint").alias("end_idx"),
    )


@register(
    "q_group_concat",
    oracle=_GROUPED_CTE
    + """
    SELECT doc_id, group_id::BIGINT AS group_id,
           string_agg(word, ' ' ORDER BY word_idx) AS joined
    FROM grouped
    WHERE group_id > 0
    GROUP BY doc_id, group_id
    """,
)
def q_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP14 — ORDERED group-concat (the §2.3-6 determinism trap: collect
    struct(order, value), array_sort, then join)."""
    grouped = _grouped_words(spark, sf_dir)
    return grouped.groupBy("doc_id", "group_id").agg(
        ordered_concat_expr("word_idx", "word", " ").alias("joined")
    )
