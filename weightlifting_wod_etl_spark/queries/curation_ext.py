"""Training-corpus curation extensions: PII redaction, eval-set
decontamination, intra-document repetition, per-source caps, stratified
quota sampling, corpus token top-k.

These are the remaining canonical operations of a large-scale pretraining
data pipeline (C4/Gopher/RefinedWeb-style cleanup) not already covered by
``llm_ops`` / ``sampling``: every one is expressed with built-in
DataFrame operators (zero Python UDFs), shuffles only on bounded keys,
and carries a DuckDB oracle.

Scale notes are per-query; the shared trick for the two top-k-per-group
queries is the two-phase window: a per-(group, hash-bucket) local top-k
first, then the exact top-k among ≤ 16k survivors per group — the global
sort per group that a naive QUALIFY row_number() would do through one
reducer never happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..functions.money import oracle_round_ratio_sql, round_ratio_exact
from ..operators.sampling import hash_bucket
from ..queries_registry import register

# deterministic synthetic PII: the generated corpus contains none, so both
# engines append the same trailer before redacting — the transform (not
# the corpus) is what the hash-compare certifies
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\d{3}-\d{3}-\d{4}"


@register(
    "q_pii_redact",
    oracle=r"""
    WITH seeded AS (
        SELECT doc_id, lang,
               text || ' contact user' || doc_id::VARCHAR ||
               '@example.com or 555-123-4567' AS t
        FROM documents
    )
    SELECT doc_id, lang,
           (len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            + len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')))::BIGINT AS n_pii,
           md5(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM seeded
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + replace emails/phones with typed placeholders.
    Pure per-row regex projection — scan-local, codegen'd, zero shuffle;
    at 100 TB this is a map-only pass fused into the scan (the §2.5
    fan-out below only fires on under-split input, never there)."""
    # fan_out (guide §2.5): regex-replace chain dominates; single-row-
    # group testdata pins the scan to one task. Measured 2.7x at sf0.1.
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-123-4567"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    # explicit NULL guard on the SEEDED concat t (not just text): concat
    # nulls whenever ANY piece is NULL, so a NULL doc_id with real text
    # still made t NULL — size(NULL) = -2 where the oracle yields NULL
    # (review r11); size(NULL) is also -1/NULL depending on ANSI mode
    n_pii = F.when(
        t.isNotNull(),
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
        + F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0))),
    ).cast("bigint")
    return docs.select(
        "doc_id", "lang", n_pii.alias("n_pii"), F.md5(redacted).alias("redacted_md5")
    )


@register(
    "q_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series(1, len(w) - 3),
                   i -> array_to_string(w[i:i+3], ' ')))) AS gram
        FROM toks
    ),
    eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    )
    SELECT DISTINCT g.doc_id, d.lang
    FROM grams g
    JOIN eval_grams e ON g.gram = e.gram
    JOIN documents d ON d.doc_id = g.doc_id
    WHERE g.doc_id % 97 <> 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training docs sharing any 4-gram
    with the held-out set (here: doc_id % 97 == 0 stands in for the eval
    corpus). The eval side is distinct-collapsed; NO forced broadcast
    (r13, the r12 forced-broadcast audit rule): the eval slice's distinct
    4-grams are DATA-PROPORTIONAL — 1/97th of a 100 TB corpus's grams is
    far beyond broadcast limits, so the hint must stay with AQE, which
    broadcasts a genuinely benchmark-sized eval set and degrades to a
    shuffled semi-join instead of OOMing the driver when it isn't. Only
    the final distinct shuffles on the bounded flagged-doc set."""
    from ..operators.minhash import shingles

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "lang", F.explode(shingles(F.col("text"), 4)).alias("gram")
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(eval_grams, "gram", "left_semi")
        .select("doc_id", "lang")
        .distinct()
    )


@register(
    "q_intradoc_repetition",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(string_split(text, ' '))::BIGINT AS n_tokens,
               len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct
        FROM documents
    )
    SELECT doc_id, lang, n_tokens, n_distinct,
           -- exact-rational rounding (r13, generated): 1 - d/t is the
           -- integer ratio (t - d)/t, so the round-on-double engine
           -- split is avoidable
           __REP_RATIO__ AS rep_ratio
    FROM t WHERE n_tokens > 0
    """.replace(
        "__REP_RATIO__",
        oracle_round_ratio_sql("n_tokens - n_distinct", "n_tokens", 4),
    ),
)
def q_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (Gopher-style quality signal):
    1 - distinct/total tokens. Pure array expressions over the scan —
    no explode, no shuffle; the filter threshold a real pipeline applies
    downstream pushes into the same map stage."""
    from ..functions.expr import let

    docs = load_table(spark, sf_dir, "documents")
    # let-bind the (n_tokens, n_distinct) pair: CollapseProject re-inlines
    # deterministic aliases with no CSE, so the bare spelling re-split the
    # full text ~4x per row (n_tokens, n_distinct, and both again inside
    # rep_ratio) — the measured 4-10x regex/array pipeline pitfall (r13)
    # the n_tokens > 0 predicate is text IS NOT NULL in both engines
    # (split of empty text yields one empty token, so only a NULL text
    # fails it) — filtering on text keeps the pushed-down predicate off
    # __c, whose inlined copy would re-pay the split
    counted = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        let(
            F.split(F.col("text"), " "),
            lambda toks: F.struct(
                F.size(toks).cast("bigint").alias("n_tokens"),
                F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
            ),
        ).alias("__c"),
    )
    n_tokens = F.col("__c.n_tokens")
    n_distinct = F.col("__c.n_distinct")
    return counted.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        # exact-rational rounding of (t - d)/t (r13, mirrored in the
        # oracle) — the 1.0 - d/t double form rounds shortest-repr in
        # Spark but exact-binary in DuckDB at knife edges
        round_ratio_exact(n_tokens - n_distinct, n_tokens, 4).alias("rep_ratio"),
    )


def _two_phase_top_per_group(
    df: DataFrame, group_col: str, order_cols: list, k: int, bucket_col=None
) -> DataFrame:
    """Exact top-k per group without a single-reducer group sort: local
    top-k inside each (group, 16-way hash bucket), then the true top-k
    among the ≤ 16k survivors. Both windows sort, but the first is spread
    over 16x the reducers and the second's input is bounded by 16k rows
    per group regardless of corpus size.

    ``bucket_col``: the 16-way spreading expression; defaults to the
    first hex digit of md5(doc_id) — pass one explicitly when the frame
    has no doc_id column or already carries the hash (CollapseProject
    does NOT CSE two identical md5 projections)."""
    bucket = (
        bucket_col
        if bucket_col is not None
        else F.substring(hash_bucket(F.col("doc_id")), 1, 1)
    )
    survivors = (
        df.withColumn("__rn", F.row_number().over(
            Window.partitionBy(group_col, bucket).orderBy(*order_cols)
        ))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    final = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        survivors.withColumn("__rn", F.row_number().over(final))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


@register(
    "q_domain_cap",
    oracle="""
    WITH kept AS (
        SELECT source, n_chars, doc_id
        FROM documents
        -- doc_id NULLS LAST pinned both sides (r13): at an n_chars tie
        -- on the rank-20 cut, Spark's bare ASC (NULLS FIRST) and
        -- DuckDB's default (NULLS LAST) would keep different documents
        QUALIFY row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC,
                                            doc_id NULLS LAST) <= 20
    )
    SELECT source, count(*)::BIGINT AS n_kept, sum(n_chars)::BIGINT AS sum_chars
    FROM kept GROUP BY source
    """,
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (C4/RefinedWeb domain balancing): keep the
    20 largest docs per source (n_chars desc, doc_id tiebreak), audit
    kept count + volume. Two-phase top-k: no source's full corpus ever
    sorts through one reducer."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    kept = _two_phase_top_per_group(
        docs,
        "source",
        # asc_nulls_last mirrors the oracle's NULLS LAST (r13 — the one
        # top-k in this file that missed the pin its siblings carry)
        [F.col("n_chars").desc(), F.col("doc_id").asc_nulls_last()],
        20,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "q_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT lang, n_chars, doc_id
        FROM documents
        -- NULLS LAST pinned both sides: md5(NULL) is NULL and Spark
        -- would always sample the NULL-id doc first (review r11)
        QUALIFY row_number() OVER (PARTITION BY lang
                                   ORDER BY md5(doc_id::VARCHAR) NULLS LAST,
                                            doc_id NULLS LAST) <= 30
    )
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
    FROM ranked GROUP BY lang
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quota sample (30 docs/lang) ordered by the
    content-addressed md5 of doc_id — reproducible across engines and
    reruns, unlike seed-based df.sample. Same two-phase top-k shape as
    q_domain_cap: the per-lang 'random' order is a sort on md5, spread
    over hash buckets first."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars", "doc_id")
    docs = docs.withColumn("__h", F.md5(F.col("doc_id").cast("string")))
    kept = _two_phase_top_per_group(
        docs,
        "lang",
        # NULLS LAST: md5(NULL doc_id) is NULL and would rank FIRST under
        # Spark's ASC default, always stealing a quota slot (review r11)
        [F.col("__h").asc_nulls_last(), F.col("doc_id").asc_nulls_last()],
        30,
        # reuse __h's first hex digit: the default bucket would evaluate a
        # SECOND md5 per row (no CSE across projections)
        bucket_col=F.substring(F.col("__h"), 1, 1),
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register(
    "q_token_topk",
    oracle="""
    SELECT tok, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-20 (Zipf head — vocabulary audit /
    stop-list builder). Explode happens map-side; the groupBy partial-
    aggregates before the single bounded-key shuffle; the ORDER+LIMIT
    plans as TakeOrderedAndProject (no global sort materialization)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )
