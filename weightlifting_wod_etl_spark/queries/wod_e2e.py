"""End-to-end reference pipeline as a single oracle-checked query.

Posts are synthesized deterministically from the ``documents`` table (HTML
with weekday/segment structure + a parseable slug), pushed through the full
``wod_pipeline`` (strip → sessionize ×2 → ordered pivot → spine dates →
clean), and the oracle mirrors every stage in SQL CTEs. This is the
strongest parity evidence the driver can record: the whole chain hashes
equal, not just the pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..plans.wod_pipeline import wod_pipeline
from ..queries_registry import register

_ORACLE = r"""
    WITH posts AS (
        SELECT doc_id AS post_id,
               '<p><strong>Monday (Session One)</strong><br />' || chr(10) ||
               'Suggested Warm-Up' || chr(10) ||
               coalesce(array_to_string(string_split(text, ' ')[1:5], ' '), '') || '</p>' || chr(10) ||
               '<p>A.' || chr(10) ||
               coalesce(array_to_string(string_split(text, ' ')[6:10], ' '), '') || '</p>' || chr(10) ||
               '<p><strong>Tuesday (Session Two)</strong>' || chr(10) || 'B.' || chr(10) ||
               coalesce(array_to_string(string_split(text, ' ')[11:15], ' '), '') || '</p>' || chr(10) ||
               CASE WHEN doc_id % 3 = 0 THEN '<p>Thursday (Rest Day)</p>' ELSE '' END AS html
        FROM documents
    ),
    stripped AS (
        -- outermost regexp_replace = FULL whitespace trim (trim() alone
        -- keeps a trailing newline minted from the final </p>)
        SELECT post_id,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   html,
                   '(?i)<br\s*/?>', chr(10), 'g'),
                   '(?i)</p\s*>', chr(10), 'g'),
                   '<[^>]+>', '', 'g'),
                   '[ \t]*\n[ \t]*', chr(10), 'g'),
                   '\n{2,}', chr(10), 'g'),
                   '^\s+|\s+$', '', 'g') AS text
        FROM posts
    ),
    lines AS (
        SELECT post_id,
               unnest(generate_series(0, len(string_split(text, chr(10))) - 1)) AS line_idx,
               unnest(string_split(text, chr(10))) AS line
        FROM stripped
    ),
    days AS (
        SELECT *, sum(CASE WHEN regexp_matches(line,
                   '(?i)(Monday)|(Tuesday)|(Wednesday)|(Thursday)|(Friday)|(Saturday)|(Sunday)')
                   THEN 1 ELSE 0 END)
                   OVER (PARTITION BY post_id ORDER BY line_idx ROWS UNBOUNDED PRECEDING) AS day_idx
        FROM lines
    ),
    segs AS (
        SELECT *, sum(CASE WHEN regexp_matches(line,
                   '(?i)(Session)|(Suggested Warm-Up)|^[A-F].$') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY post_id, day_idx ORDER BY line_idx ROWS UNBOUNDED PRECEDING) AS seg_idx
        FROM days WHERE day_idx > 0
    ),
    per_seg AS (
        SELECT post_id, day_idx, seg_idx,
               arg_min(line, line_idx) AS key_line,
               count(*) AS n_lines,
               string_agg(line, ' ' ORDER BY line_idx) AS all_joined
        FROM segs WHERE seg_idx > 0
        GROUP BY post_id, day_idx, seg_idx
    ),
    kv AS (
        SELECT post_id, day_idx, seg_idx,
               CASE WHEN seg_idx = 1 THEN 'session' ELSE key_line END AS k,
               CASE WHEN seg_idx = 1 THEN key_line
                    WHEN n_lines > 1 THEN substring(all_joined, length(key_line) + 2)
                    ELSE '' END AS v
        FROM per_seg
    ),
    day_spine AS (SELECT DISTINCT post_id, day_idx FROM segs),
    rest AS (
        SELECT ds.post_id, ds.day_idx, 1::BIGINT AS seg_idx,
               'session' AS k, 'rest day' AS v
        FROM day_spine ds
        ANTI JOIN (SELECT DISTINCT post_id, day_idx FROM kv) z USING (post_id, day_idx)
    ),
    kv_all AS (SELECT * FROM kv UNION ALL SELECT * FROM rest),
    wide AS (
        SELECT post_id, day_idx,
               arg_max(v, seg_idx) FILTER (k = 'session') AS session,
               arg_max(v, seg_idx) FILTER (k = 'Suggested Warm-Up') AS warm_up,
               arg_max(v, seg_idx) FILTER (k = 'A.') AS segment_a,
               arg_max(v, seg_idx) FILTER (k = 'B.') AS segment_b,
               arg_max(v, seg_idx) FILTER (k = 'C.') AS segment_c,
               arg_max(v, seg_idx) FILTER (k = 'D.') AS segment_d,
               arg_max(v, seg_idx) FILTER (k = 'E.') AS segment_e
        FROM kv_all GROUP BY post_id, day_idx
    )
    SELECT post_id,
           strftime((make_date(2024, 4, 1 + post_id % 20)
                     - isodow(make_date(2024, 4, 1 + post_id % 20)) * INTERVAL 1 DAY
                     + day_idx::INT * INTERVAL 1 DAY)::DATE, '%Y-%m-%d') AS date,
           coalesce(session, 'Rest Day') AS session,
           coalesce(warm_up, '') AS warm_up,
           coalesce(segment_a, '') AS segment_a,
           coalesce(segment_b, '') AS segment_b,
           coalesce(segment_c, '') AS segment_c,
           coalesce(segment_d, '') AS segment_d,
           coalesce(segment_e, '') AS segment_e
    FROM wide
"""


def _synth_posts(docs: DataFrame) -> DataFrame:
    toks = F.split("text", " ")
    # coalesce mirrors the oracle's coalesce(array_to_string(...), ''):
    # without it a NULL text null-propagates through F.concat and the post
    # vanishes from the Spark side while the oracle still emits it
    seg = lambda start: F.coalesce(  # noqa: E731
        F.array_join(F.slice(toks, start, 5), " "), F.lit("")
    )
    html = F.concat(
        F.lit("<p><strong>Monday (Session One)</strong><br />\n"),
        F.lit("Suggested Warm-Up\n"),
        seg(1),
        F.lit("</p>\n<p>A.\n"),
        seg(6),
        F.lit("</p>\n<p><strong>Tuesday (Session Two)</strong>\nB.\n"),
        seg(11),
        F.lit("</p>\n"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("<p>Thursday (Rest Day)</p>")).otherwise(
            F.lit("")
        ),
    )
    slug = F.concat(
        F.lit("april-"),
        (1 + F.col("doc_id") % 20).cast("string"),
        F.lit("-"),
        (7 + F.col("doc_id") % 20).cast("string"),
        F.lit("-2024"),
    )
    return docs.select(
        F.col("doc_id").alias("post_id"),
        html.alias("html"),
        F.lit("2024-04-01T00:00:00").alias("post_date"),
        slug.alias("slug"),
        F.lit("Synth Post").alias("title"),
    )


@register("q_wod_pipeline", oracle=_ORACLE)
def q_wod_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline end-to-end (OP4,5,9-16 chained) — hash-checked
    against a stage-by-stage SQL mirror."""
    docs = load_table(spark, sf_dir, "documents")
    return wod_pipeline(_synth_posts(docs))
