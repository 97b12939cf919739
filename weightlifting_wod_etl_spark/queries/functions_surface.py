"""Scalar/higher-order function surface as explicit oracle-checked queries.

SURVEY.md §2.2 lists string / date / array function categories that the rest
of the suite exercises only incidentally (inside sessionization, date
extraction, similarity). These three queries pin each category directly so a
reference user can see every function family verified one-for-one.

The three function-surface queries (string/date/array) are pure per-row
projections — zero Exchanges, they run entirely inside the scan stage and
scale linearly with input at 100 TB. Shared subexpressions (the token
array) are let-bound via ``expr.let`` so Catalyst's CollapseProject cannot
re-inline the split once per reference. The module has since grown two
shuffle-bearing siblings: q_histogram (one |bins|-key aggregate) and
q_rank_fns (one window Exchange + sort) — see their own docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.expr import let
from ..functions.money import oracle_round_ratio_sql, round_ratio_exact_i64
from ..io import load_table
from ..queries_registry import register


@register(
    "q_array_fns",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           len(list_filter(string_split(text, ' '), t -> length(t) > 5))::BIGINT AS n_long,
           list_sum(list_transform(string_split(text, ' '), t -> length(t)))::BIGINT AS total_chars,
           array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 5), ',') AS first5_sorted
    FROM documents
    """,
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate /
    array_sort / slice over a tokenized text column.

    All lambdas run inside codegen on the JVM — this is the UDF-free path
    for per-row collection logic (the same primitives the cosine/minhash
    operators build on). ``let`` binds the split ONCE; naively aliasing it
    would re-split the text 4× after CollapseProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        let(
            F.split(F.col("text"), " "),
            # NULL-array guard on the whole struct: size(NULL) is -1 under
            # ANSI-off where the oracle's len(NULL) is NULL — the other
            # fields are already NULL-propagating
            lambda toks: F.when(
                toks.isNotNull(),
                F.struct(
                    F.size(toks).alias("n_tokens"),
                    F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias(
                        "n_long"
                    ),
                    F.aggregate(
                        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                    ).alias("total_chars"),
                    F.array_join(F.slice(F.array_sort(toks), 1, 5), ",").alias(
                        "first5_sorted"
                    ),
                ),
            ),
        ).alias("a"),
    ).select("doc_id", "a.n_tokens", "a.n_long", "a.total_chars", "a.first5_sorted")


@register(
    "q_string_fns",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS low,
           upper(c_mktsegment) AS seg_up,
           substr(c_name, 1, 8) AS head8,
           replace(c_name, '#', '-') AS dashed,
           lpad(c_custkey::VARCHAR, 10, '0') AS key_pad,
           -- codepoint reversal pinned (r13): DuckDB's reverse() is
           -- grapheme-cluster-aware (keeps combining marks attached)
           -- while Spark's reverses code points; splitting on '' then
           -- list-reversing makes DuckDB reverse code points too —
           -- identity on ASCII, identical on combining marks and
           -- astral (surrogate-pair) chars in both engines (verified)
           array_to_string(list_reverse(string_split(c_mktsegment, '')), '') AS seg_rev,
           regexp_replace(lower(c_name), '[aeiou]', '', 'g') AS no_vowels,
           printf('%s:%d', c_mktsegment, c_custkey) AS tag,
           length(c_name)::INT AS name_len
    FROM customer
    """,
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, replace, pad, reverse,
    global regex replace, printf-style formatting, length.

    Mirrors the reference's string usage (SURVEY §2.2 — replace/lower/
    format templates at transforms.py:57,101, handler.py:127) as native JVM
    expressions; one codegen stage, no shuffle.

    Deliberately NATIVE lower()/upper() (r16): this query demonstrates
    the raw JVM function surface on the ASCII-domain customer table.
    The corpus/text pipelines, whose operating domain is arbitrary
    multilingual text, lowercase through functions/casefold.py's
    portable_lower instead — Spark's full-casing lower() diverges from
    DuckDB's simple mapping on the 72-entry pin set ('İ', final sigma,
    Unicode-version lag), and upper() has its own divergence class
    (ß→SS). If this query's domain ever widens beyond ASCII, pin both
    through casefold.py first.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("low"),
        F.upper("c_mktsegment").alias("seg_up"),
        F.substring("c_name", 1, 8).alias("head8"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
        # code-point reversal; the oracle mirrors it via a ''-split +
        # list_reverse because DuckDB's own reverse() is grapheme-aware
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.regexp_replace(F.lower("c_name"), "[aeiou]", "").alias("no_vowels"),
        # NULL guard: Spark's format_string renders a NULL arg as the
        # literal 'null' while DuckDB's printf returns NULL
        F.when(
            F.col("c_mktsegment").isNotNull() & F.col("c_custkey").isNotNull(),
            F.format_string("%s:%d", F.col("c_mktsegment"), F.col("c_custkey")),
        ).alias("tag"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "q_date_fns",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
           strftime((o_orderdate::DATE + INTERVAL 1 MONTH)::DATE, '%Y-%m-%d') AS next_month,
           date_diff('day', DATE '1992-01-01', o_orderdate::DATE)::INT AS days_since_epoch,
           year(o_orderdate)::INT AS y,
           quarter(o_orderdate)::INT AS q,
           month(o_orderdate)::INT AS m,
           isodow(o_orderdate::DATE)::INT AS iso_dow
    FROM orders
    """,
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function family: truncation, month boundaries, calendar
    arithmetic with end-of-month clamping, day diffs, field extraction.

    ``add_months`` and DuckDB's ``+ INTERVAL 1 MONTH`` both clamp Jan 31 →
    Feb 28, so the oracle agrees on month-end edges. ISO day-of-week
    (Mon=1..Sun=7) = Spark ``weekday()+1`` — avoids the Sunday-first
    ``dayofweek`` mismatch between engines.
    """
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("next_month"),
        F.datediff(d, F.lit("1992-01-01").cast("date")).alias("days_since_epoch"),
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        (F.weekday(d) + F.lit(1)).alias("iso_dow"),
    )


@register(
    "q_histogram",
    oracle="""
    -- EXACT int64 floor division (r12, was floor of a float division —
    -- exact only for |cents| < 2^53, a weaker bound than to_fixed's
    -- ~9.2e18 guard, so extreme values could drift a bin edge): both
    -- engines' integer // and % truncate/sign toward the DIVIDEND, so
    -- subtracting 1 exactly when the remainder is negative turns
    -- truncation into floor with no float in the path
    WITH c AS (SELECT o_totalprice, round(o_totalprice * 100)::BIGINT AS cents FROM orders)
    SELECT (cents // 5000000
            - CASE WHEN cents % 5000000 < 0 THEN 1 ELSE 0 END)::BIGINT AS bin_id,
           ((cents // 5000000
             - CASE WHEN cents % 5000000 < 0 THEN 1 ELSE 0 END) * 50000)::BIGINT AS bin_lo,
           count(*)::BIGINT AS n,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max
    FROM c
    GROUP BY 1, 2
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram for data profiling — $50k bins over order
    totals, binned by integer-cents floor division (width_bucket isn't
    portable; int64 arithmetic is). Bin assignment is scan-local; the only
    shuffle is the |bins|-key aggregate — profiling 100 TB costs one pass.
    """
    from ..functions.money import to_fixed

    o = load_table(spark, sf_dir, "orders")
    # exact int64 floor division: `div` truncates toward zero (as does
    # DuckDB //), and % takes the dividend's sign in both engines, so
    # floor = trunc - 1 exactly when the remainder is negative. No float
    # division anywhere — bins are exact over to_fixed's full long range.
    bin_id = (
        F.expr("__cents div 5000000")
        - F.when(F.col("__cents") % 5000000 < 0, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    return (
        o.select("o_totalprice", to_fixed("o_totalprice").alias("__cents"))
        .select("o_totalprice", bin_id.alias("bin_id"))
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("bin_min"),
            F.round(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .select(
            "bin_id",
            (F.col("bin_id") * 50000).cast("bigint").alias("bin_lo"),
            "n",
            "bin_min",
            "bin_max",
        )
    )


@register(
    "q_rank_fns",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           dense_rank() OVER w::BIGINT AS drnk,
           -- percent_rank/cume_dist are INTEGER ratios ((rank-1)/(n-1),
           -- peers≤/n): rebuilt from rank + partition counts and rounded
           -- on the exact rational (r14, the round()-on-double class) —
           -- count(*) OVER w uses the default RANGE frame, which
           -- includes all peers of the current row, exactly cume_dist's
           -- numerator
           CASE WHEN count(*) OVER wp > 1
                THEN __PCT_RANK__ ELSE 0.0 END AS pct_rank,
           __CUME__ AS cume,
           nth_value(o_orderkey, 10) OVER w::BIGINT AS tenth_key
    FROM orders
    -- NULLS LAST pinned both sides: a NULL price inside a real
    -- priority partition otherwise ranks FIRST in Spark and LAST in
    -- DuckDB, shifting every rank (caught by the r11 dirty rows)
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS LAST, o_orderkey NULLS LAST),
           wp AS (PARTITION BY o_orderpriority)
    """.replace(
        "__PCT_RANK__",
        oracle_round_ratio_sql("rank() OVER w - 1", "count(*) OVER wp - 1", 6),
    ).replace(
        "__CUME__",
        oracle_round_ratio_sql("count(*) OVER w", "count(*) OVER wp", 6),
    ),
)
def q_rank_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface: dense_rank / percent_rank / cume_dist /
    nth_value over one shared partitioned sort (complements q_window_dedup's
    row_number and q_ntile_bucket's ntile; the manual row_number-top-N
    idiom lives in q_domain_cap and decorrelated q_lateral_topk — its
    standalone query, q_window_rank, was retired r13 as a duplicate
    WindowGroupLimit shape).

    All functions share a single WINDOW partitioning — one Exchange + one
    sort serve every ordered function, plus an unordered partition count
    over the same Exchange.

    percent_rank/cume_dist are INTEGER ratios ((rank−1)/(n−1), peers≤/n)
    rounded to 6 digits — the r13 round()-on-double hazard class — so
    they are rebuilt from rank + partition counts and rounded on the
    exact rational (r14). The i64 fast path, not the decimal general
    form: ranks scale with partition size (< 10^12 even at 100 TB, far
    inside the |num|·10^6 < 2^63 guard), and the decimal form's per-row
    pmod cost took this query 0.39 s → 3.59 s at sf0.1 (r14 bench
    adjudication) where the long form measures 0.62 s — faster than the
    SizeBasedWindowFunction builtins it replaced. ``count(*)`` over the
    ordered window uses the default RANGE frame, which includes every
    peer of the current row: exactly cume_dist's numerator. A single-row
    partition pins pct_rank to 0.0, matching both engines' built-in."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    # TWO-STAGE shape, and n from an unbounded frame over the SAME
    # ordered spec rather than a second unordered window (r14 bench
    # adjudication, plan-verified): window EXPRESSIONS are extracted per
    # OCCURRENCE, so composing round_ratio_exact over rank()/count()
    # directly minted ~19 duplicate window functions in one WindowExec
    # (3.59 s at sf0.1); materializing each window output ONCE as a
    # column and doing the ratio arithmetic on the attributes in a
    # follow-up projection restores one WindowExec with 4 functions
    # (0.54 s — parity with the SizeBasedWindowFunction builtins).
    # __peers keeps the default RANGE frame: a ROWS running count would
    # hash-split from the oracle's count(*) OVER w on the sanctioned
    # duplicate-orderkey dirty rows (two rows tying on BOTH sort keys
    # must share one cume value).
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.rank().over(w).alias("__rnk"),
        F.count(F.lit(1)).over(w).alias("__peers"),
        F.count(F.lit(1))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("__n"),
        F.nth_value("o_orderkey", 10).over(w).cast("bigint").alias("tenth_key"),
    )
    n, rnk, peers_le = F.col("__n"), F.col("__rnk"), F.col("__peers")
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "drnk",
        F.when(n > 1, round_ratio_exact_i64(rnk - 1, n - 1, 6))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
        round_ratio_exact_i64(peers_le, n, 6).alias("cume"),
        "tenth_key",
    )
