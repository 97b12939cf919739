"""Core query declarations: scan/filter/limit + sessionization flagship."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..plans.flagship import GAP_SECONDS, sessionize_events
from ..queries_registry import register


@register(
    "q_sessionize_events",
    # gap INTERPOLATED from plans/flagship.GAP_SECONDS (r13: the oracle
    # hardcoded 1800, so editing the flagship gap would desynchronize it
    # silently — the interpolate-shared-constants drift class). event_id
    # tiebreak pinned NULLS LAST explicitly (r13): the Spark side pins
    # asc_nulls_last, and DuckDB's default_null_order is a CONNECTION
    # setting — relying on it leaves the tie order one config flip from
    # divergence.
    oracle=f"""
    WITH marked AS (
        SELECT user_id, value, ts, event_id,
               -- row_number = 1, not lag IS NULL: the row AFTER a
               -- trailing NULL-ts row also has lag NULL and opened a
               -- phantom singleton session (review r11); a NULL delta
               -- (undated row) falls to ELSE 0 = joins the last session
               CASE WHEN row_number() OVER w = 1
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts NULLS LAST, event_id NULLS LAST)
    ), sess AS (
        SELECT user_id, value, ts,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts NULLS LAST, event_id NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           session_id::BIGINT AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*)::BIGINT AS n_events,
           round(sum(round(value * 100)::BIGINT) / 100.0, 2) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 30-minute gap sessionization of events per user (§7.2)."""
    return sessionize_events(spark, sf_dir)


@register(
    "q_scan_project",
    oracle="""
    SELECT doc_id, lang, length(text)::BIGINT AS text_len
    FROM documents
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP1/OP4 analog — projection with column pruning down to the scan."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").cast("bigint").alias("text_len")
    )


@register(
    "q_limit_offset",
    oracle="""
    SELECT doc_id, source
    FROM documents
    -- NULLS LAST pinned both sides: a NULL doc_id sorts FIRST in Spark
    -- and LAST in DuckDB, shifting the whole offset window (review r11).
    -- source tiebreak (r13): doc_id alone is not a TOTAL order once a
    -- duplicate id exists — the engines could each keep a different
    -- tied row inside the offset window
    ORDER BY doc_id NULLS LAST, source NULLS LAST
    LIMIT 5 OFFSET 10
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP1 pagination — limit+offset over a total order (reference pushes
    per_page/page into the source; services/invictus_api_service.py:54)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .orderBy(
            F.col("doc_id").asc_nulls_last(), F.col("source").asc_nulls_last()
        )
        .offset(10)
        .limit(5)
    )


@register(
    "q_regex_filter",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE regexp_matches(text, 'merge.*window|window.*merge')
    """,
)
def q_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP6 — regex predicate (reference ``partition_by``, transforms.py:10-16)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("merge.*window|window.*merge"))
        .select("doc_id", "lang")
    )
