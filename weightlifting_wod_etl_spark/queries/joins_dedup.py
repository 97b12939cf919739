"""Join / dedup / window / set-op / JSON queries (OP3, OP18 + native extras)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import oracle_round_ratio_sql, round_ratio_exact, to_fixed
from ..io import load_table
from ..operators.asof import asof_join
from ..operators.bloomjoin import bloom_semi_join
from ..operators.dedup import anti_join_ledger, exact_dedup, idempotency_key
from ..operators.rangejoin import band_range_join
from ..queries_registry import register


@register(
    "q_dedup_antijoin",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, sha256('put:' || text) AS idem_key FROM documents
    ), ledger AS (
        SELECT idem_key FROM keyed WHERE doc_id % 10 = 0
    )
    SELECT k.doc_id, k.idem_key
    FROM keyed k ANTI JOIN ledger l USING (idem_key)
    """,
)
def q_dedup_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP3 — idempotent-write guard as a left-anti join against a sha256
    ledger (services/idempotency_service.py:27-106). NO broadcast hint
    (r12): this ledger is data-proportional (~10% of the corpus, 64-char
    keys), so a hard hint would OOM the driver at the 100 TB design point
    where the un-hinted plan lets AQE broadcast at small SF and degrade
    to a shuffled hash join at scale — the exact contract
    operators/dedup.anti_join_ledger documents."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select("doc_id", idempotency_key("put", F.col("text")).alias("idem_key"))
    ledger = keyed.filter(F.col("doc_id") % 10 == 0).select("idem_key")
    return anti_join_ledger(keyed, ledger, "idem_key").select("doc_id", "idem_key")


@register(
    "q_kv_upsert_dedup",
    oracle="""
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           round(value, 2) AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q_kv_upsert_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP18 — last-writer-wins per key, the engine-side equivalent of the
    reference's DynamoDB putItem keyed (date, session)
    (SemiStructureInvictusPost_stateMachine.yml:67-102). Total order via
    (ts, event_id) tiebreak."""
    events = load_table(spark, sf_dir, "events")
    winners = exact_dedup(
        events,
        key_cols=["user_id", "event_type"],
        order_cols=[F.col("ts").desc(), F.col("event_id").desc()],
    )
    return winners.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        F.round("value", 2).alias("last_value"),
    )


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS content_key,
           min(doc_id) AS canonical_doc_id,
           count(*)::BIGINT AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 exact dedup — hash-groupBy on content, deterministic canonical
    representative (min doc_id). One shuffle on the content hash; at 100 TB
    the hash key is what makes the shuffle balanced."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_key")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "q_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations — INTERSECT/EXCEPT semantics via one flags
    aggregation (r18 optimization round, the q_set_ops_all lesson at
    set cardinality): ``a.intersect(b).subtract(c)`` scanned orders
    TWICE and planned two distinct+semi/anti exchange pairs. Both
    orders legs key on o_custkey, so one groupBy computes per-key
    presence flags in a single scan/shuffle, and the set result is
    distinct(a) null-safe-joined to the flags with
    ``has_big AND NOT has_f`` — exactly SQL set semantics, where NULL
    keys group together (the null-safe join mirrors that) and a key
    missing from orders fails the INTERSECT via the inner join.
    Flags coalesce to false: an all-NULL predicate group (NULL price /
    status) is simply "not in that leg". Plan: 3 scans -> 2;
    interleaved min-of-7 A/B 0.241 -> 0.171 s at sf0.1 with identical
    row sets; oracle parity green at all three SFs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 0).select("c_custkey").distinct()
    oflags = orders.groupBy("o_custkey").agg(
        F.coalesce(
            F.max(F.col("o_totalprice") > 50000), F.lit(False)
        ).alias("__big"),
        F.coalesce(
            F.max(F.col("o_orderstatus") == "F"), F.lit(False)
        ).alias("__isf"),
    )
    return (
        a.join(oflags, a.c_custkey.eqNullSafe(oflags.o_custkey))
        .filter(F.col("__big") & ~F.col("__isf"))
        .select("c_custkey")
    )


@register(
    "q_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts, event_id, value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           -- NULL click ts matches NOTHING (c.ts >= p.ts is NULL-false —
           -- the engine's semantics); DuckDB's native ASOF instead sorts
           -- a NULL probe ts past every right ts and hands it the user's
           -- LATEST purchase, so pin the SQL comparison semantics here
           CASE WHEN c.ts IS NULL THEN NULL
                ELSE p.event_id END AS purchase_id,
           CASE WHEN c.ts IS NULL THEN NULL
                ELSE round(p.value, 2) END AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each click, the user's most recent purchase at or
    before it (operators/asof.py — union-sort, one shuffle, no row
    amplification; DuckDB's native ASOF JOIN is the oracle)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_event_id").alias("purchase_id"),
        F.round("asof_value", 2).alias("purchase_value"),
    )


@register(
    "q_range_join",
    oracle="""
    WITH w AS (
        SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
        FROM events WHERE value >= 150
    )
    SELECT w.window_id,
           count(*)::BIGINT AS n_events,
           round(sum(round(e.value * 100)::BIGINT) / 100.0, 2) AS sum_value
    FROM events e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
    GROUP BY w.window_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): count/sum events inside each 10-minute
    incident window opened by a high-value event. Bin-bucketed
    (operators/rangejoin.py) so the plan is an equi-join on time bins, not
    a BroadcastNestedLoopJoin — the shape that survives 100 TB."""

    events = load_table(spark, sf_dir, "events")
    windows = events.filter(F.col("value") >= 150).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    points = events.select("ts", "value")
    joined = band_range_join(points, windows, "ts", "w_start", "w_end", bin_width_s=600)
    return joined.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(to_fixed("value")) / F.lit(100.0), 2).alias("sum_value"),
    )


# Spark's lenient string->number casts (the non-ANSI cast behind
# get_json_object and the variant string->long cast alike) trim EXACTLY
# the single-byte whitespace/ISO-control set [\x00-\x20\x7F] — probed
# r17 on the live engines: tab/CR/LF/VT/FF/space and DEL are stripped,
# while NEL (U+0085) and every Unicode space (NBSP U+00A0, figure space
# U+2007, ideographic U+3000) are NOT. DuckDB's trim() is the OPPOSITE
# corner: it strips the Unicode spaces and keeps the control chars, so
# a bare trim() in the oracle splits both directions ("\t12": Spark 12
# vs NULL; " 12": Spark NULL vs 12). Both oracles strip the exact
# class instead; tests/test_json_channels.py pins the set.
_SPARK_CAST_TRIM_CLASS = "[\\x00-\\x20\\x7F]"


def _spark_cast_trim_sql(expr: str) -> str:
    """DuckDB twin of the trimming Spark's numeric casts perform."""
    c = _SPARK_CAST_TRIM_CLASS
    return f"regexp_replace({expr}, '^{c}+|{c}+$', '', 'g')"


_JSONFNS_TRIMMED = _spark_cast_trim_sql("pj->>'k'")

# the k_val extraction mirror for q_json_fns (shared with its test pin)
JSONFNS_ORACLE_K = f"""
    CASE WHEN json_type(pj->'k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(pj->>'k' AS INT)
         WHEN json_type(pj->'k') = 'DOUBLE' THEN
              CASE WHEN TRY_CAST(pj->>'k' AS DOUBLE) = 0 THEN 0
                   WHEN abs(TRY_CAST(pj->>'k' AS DOUBLE)) >= 0.001
                        AND abs(TRY_CAST(pj->>'k' AS DOUBLE)) < 10000000
                     THEN CAST(trunc(TRY_CAST(pj->>'k' AS DOUBLE)) AS INT)
                   ELSE NULL END
         WHEN json_type(pj->'k') = 'VARCHAR'
              AND regexp_matches(
                  {_JSONFNS_TRIMMED},
                  '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$')
              THEN
              CASE WHEN regexp_extract({_JSONFNS_TRIMMED},
                                       '^[+-]?[0-9]*', 0)
                        IN ('', '+', '-') THEN 0
                   ELSE TRY_CAST(regexp_extract({_JSONFNS_TRIMMED},
                                                '^[+-]?[0-9]*', 0)
                                 AS INT) END
         ELSE NULL END"""


@register(
    "q_json_fns",
    oracle=f"""
    SELECT {JSONFNS_ORACLE_K} AS k_val,
           count(*)::BIGINT AS n,
           round(sum(round(value * 100)::BIGINT) / 100.0, 2) AS sum_value
    FROM (SELECT try_cast(props AS JSON) AS pj, value FROM events)
    GROUP BY k_val
    """,
)
def q_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (reference json.dumps/loads boundary, OP23 analog) —
    get_json_object stays JVM-side.

    The Spark side is hostile-input-lenient by construction
    (get_json_object -> NULL on malformed JSON; the ANSI-off cast ->
    NULL on non-numeric extracts), so the ORACLE carries the try forms
    (r16): bare ``json_extract_string(props, ...)`` RAISES on malformed
    JSON and a bare ``::INT`` raises on a nested-object extract — a
    hostile dirty row would burn the oracle side, not parity.
    get_json_object takes the FIRST duplicate key, same as DuckDB's
    ``->>`` — no duplicate-key CASE needed here (unlike q_variant_json,
    whose try_parse_json rejects duplicate-key bags).

    The numeric mirror is a json_type split (ADVICE r16 #1, measured on
    the live engines): Spark's non-ANSI string->int cast of the
    extracted text parses decimal text and TRUNCATES toward zero
    ('1.5' -> 1, '-2.5' -> -2), where DuckDB's TRY_CAST ROUNDS
    ('1.5' -> 2). Non-integer JSON numbers additionally pass through
    Jackson's Double.toString before the cast: values outside
    [1e-3, 1e7) re-print in EXPONENT form ('1.5E7', '9.0E-4'), which
    the digits-only cast NULLs — so the DOUBLE channel truncates only
    inside that band and NULLs outside it (integer TOKENS are
    unaffected: Jackson prints longs/BigIntegers plain at any
    magnitude, so only int32-range overflow NULLs them). Strings mirror
    the same cast on the raw text: optional sign, digits, one optional
    dot — no exponent — with an empty integer part ('.5') casting
    to 0, after stripping Spark's exact trim class [\\x00-\\x20\\x7F]
    (see _spark_cast_trim_sql — DuckDB's trim() strips the WRONG set).
    Both engines parse fractional tokens to DOUBLE here (unlike
    q_variant_json's exact-decimal variant channel), so there is no
    >17-significant-digit residual on this query."""
    events = load_table(spark, sf_dir, "events")

    return (
        events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_val"), "value"
        )
        .groupBy("k_val")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(to_fixed("value")) / F.lit(100.0), 2).alias("sum_value"),
        )
    )


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE 10 * round(o.o_totalprice * 100)::BIGINT
            * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > 12 * (SELECT sum(round(o2.o_totalprice * 100)::BIGINT)
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced >1.2× their customer's average — the correlated
    scalar-subquery pattern, decorrelated by hand into agg + self-join
    (exactly the rewrite Catalyst applies to a correlated subquery, made
    explicit so the plan is visible).

    Engine-exactness: the comparison is pure integer arithmetic
    (10·cents·count > 12·Σcents) — an avg in doubles differs across
    engines in the last ulp under reordered summation, and a boundary row
    would flip the hash. Scale shape: both sides shuffle on o_custkey —
    one Exchange each, co-partitioned join, no broadcast of the
    data-proportional agg side."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", to_fixed("o_totalprice").alias("__cents")
    )
    per_cust = o.groupBy(F.col("o_custkey").alias("__ck")).agg(
        F.sum("__cents").alias("__sum"), F.count(F.lit(1)).alias("__cnt")
    )
    return (
        o.join(per_cust, o.o_custkey == per_cust.__ck)
        .filter(10 * F.col("__cents") * F.col("__cnt") > 12 * F.col("__sum"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "q_window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (sum(cents) OVER w_run)::BIGINT / 100.0 AS running_total,
           (sum(cents) OVER w_3)::BIGINT / 100.0 AS moving3_total,
           lag(cents) OVER w_ord / 100.0 AS prev_total,
           lead(cents) OVER w_ord / 100.0 AS next_total
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 round(o_totalprice * 100)::BIGINT AS cents
          FROM orders)
    WINDOW
      w_ord AS (PARTITION BY o_custkey
                ORDER BY o_orderdate NULLS LAST, o_orderkey),
      w_run AS (w_ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_3   AS (w_ord ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAMES (vs q_rank_fns's ranking): running cumulative sum,
    3-row moving sum, lag/lead — all over ONE (custkey, date, key) sort, so
    the plan is a single Exchange + Sort shared by every frame variant.

    The order key is total (date + orderkey tie-break) — frame results are
    positionally defined, so any tie ambiguity would flip hashes. Sums run
    in integer cents; the /100.0 is a single IEEE op per row in both
    engines (lag/lead of NULL at partition edges stays NULL). NULL dates
    are pinned LAST — Spark's asc default (NULLS FIRST) would shift every
    frame in the partition against the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    w_ord = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"
    )
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_3 = w_ord.rowsBetween(-2, Window.currentRow)
    cents = to_fixed("o_totalprice")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w_run) / F.lit(100.0)).alias("running_total"),
        (F.sum(cents).over(w_3) / F.lit(100.0)).alias("moving3_total"),
        (F.lag(cents).over(w_ord) / F.lit(100.0)).alias("prev_total"),
        (F.lead(cents).over(w_ord) / F.lit(100.0)).alias("next_total"),
    )


@register(
    "q_fuzzy_dedup",
    oracle="""
    WITH names AS (
        -- explicit char class + backslash-z, not (backslash-S)+$ (r12):
        -- Java's whitespace class includes vertical tab where RE2's
        -- non-space matches it, and Java $ matches BEFORE a trailing
        -- newline where RE2 $ only matches end-of-text — both diverge
        -- the block key. The explicit class and the end-of-input anchor
        -- (same in both engines) pin identical extraction.
        SELECT p_name, count(*)::BIGINT AS cnt,
               regexp_extract(p_name, '([^ \t\n\x0B\f\r]+)\\z', 1) AS blk
        FROM part GROUP BY 1
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name)::BIGINT AS edit_dist,
           a.cnt AS cnt_a, b.cnt AS cnt_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy dedup: candidate merge pairs of part names within
    edit distance 3, blocked on the trailing token — the classic
    blocking+edit-distance entity-resolution shape (and the string-metric
    sibling of the MinHash/SimHash token-set near-dups).

    Scale shape: the quadratic comparison NEVER touches the raw table —
    names are first collapsed to a distinct-name frequency table (tiny
    relative to any corpus: vocabulary, not volume), and pairs form only
    WITHIN a block, so cost is Σ|block|² over a key chosen to keep blocks
    small, not |names|². The self-join shuffles on the block key alone;
    `levenshtein` is a JVM codegen'd exact int — no float, no UDF. At
    100 TB the same plan holds: frequency table ≪ memory, broadcast
    self-join per block, skew bounded by the largest block (pick a finer
    block key — last token + length band — if one token dominates)."""
    # explicit class + \z, mirrored in the oracle (r12): Java-vs-RE2
    # disagree on both \s membership (\x0B) and $-before-trailing-newline
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "blk", F.regexp_extract("p_name", "([^ \t\n\x0B\f\r]+)\\z", 1)
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a"), "blk"
    )
    b = names.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b"),
        F.col("blk").alias("blk_b"),
    )
    return (
        a.join(b, (a.blk == b.blk_b) & (F.col("name_a") < F.col("name_b")))
        # bounded 3-arg levenshtein: early-exits once the distance passes
        # the threshold (returns -1), and the -1 filter keeps Catalyst
        # from re-evaluating the full distance in both Filter AND Project
        # on the quadratic within-block hot set (review r11)
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b", 3).cast("long")
        )
        .filter(F.col("edit_dist") >= 0)
        .select("name_a", "name_b", "edit_dist", "cnt_a", "cnt_b")
    )


@register(
    "q_bloom_semi_join",
    oracle="""
    SELECT o.o_orderpriority,
           count(*)::BIGINT AS n_orders,
           round(sum(round(o.o_totalprice * 100)::BIGINT) / 100.0, 2) AS revenue
    FROM orders o
    WHERE o.o_custkey IN (
        SELECT c.c_custkey
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    )
    GROUP BY o.o_orderpriority
    """,
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-bitmap pruned semi join (operators/bloomjoin.py): orders
    placed by customers of three nations. The dim's key set folds to a
    broadcast bitmap (bit_or monoid, map-side combined); the fact side is
    pruned by a broadcast bit-test BEFORE the exact semi join, so the
    verify join's fact shuffle carries only true matches plus a ~n/m
    false-positive sliver — identical results to the plain semi join the
    oracle runs, by construction. The manual, composable form of AQE's
    runtime bloom-filter join, for when the planner can't see the
    selectivity (100 TB: a 100M-key dim broadcasts as a 128 MB bitmap
    where its raw rows never would)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = customer.join(
        F.broadcast(
            nation.filter(
                F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
            )
        ),
        customer.c_nationkey == nation.n_nationkey,
    ).select("c_custkey")
    matched = bloom_semi_join(orders, dim, "o_custkey", "c_custkey")
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(to_fixed("o_totalprice")) / F.lit(100.0), 2
        ).alias("revenue"),
    )


# the k extraction mirror for q_variant_json (shared with its test pin)
VARIANT_ORACLE_K = f"""
    CASE WHEN len(json_keys(pj)) <> len(list_distinct(json_keys(pj)))
              THEN NULL
         WHEN json_type(pj->'k') = 'BOOLEAN'
              THEN CASE WHEN pj->>'k' = 'true' THEN 1 ELSE 0 END
         WHEN json_type(pj->'k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(pj->>'k' AS BIGINT)
         WHEN json_type(pj->'k') = 'DOUBLE'
              THEN TRY_CAST(trunc(TRY_CAST(pj->>'k' AS DOUBLE)) AS BIGINT)
         WHEN json_type(pj->'k') = 'VARCHAR'
              AND regexp_matches({_spark_cast_trim_sql("pj->>'k'")},
                                 '^[+-]?[0-9]+$')
              THEN TRY_CAST({_spark_cast_trim_sql("pj->>'k'")} AS BIGINT)
         ELSE NULL END"""


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           count(k)::BIGINT AS n_with_k,
           -- exact-rational rounding (r13, generated): avg() rounds a
           -- double quotient, which splits the engines at knife edges
           __AVG_K__ AS avg_k,
           max(k)::BIGINT AS max_k
    FROM (
        -- try_cast(JSON) mirrors try_parse_json (malformed -> NULL);
        -- the duplicate-key CASE mirrors try_parse_json REJECTING
        -- duplicate-key objects (json_keys preserves top-level dups);
        -- the rest is a json_type SPLIT mirroring the variant long-cast
        -- per source type (ADVICE r16 #1 — a flat TRY_CAST on ->> text
        -- ROUNDS fractionals where Spark TRUNCATES: 1.5 -> 2 vs 1):
        --   BOOLEAN: true->1 / false->0 (a json STRING "true" is
        --     VARCHAR-typed, so it stays distinguishable and NULLs);
        --   integer tokens: exact BIGINT cast (full i64 range;
        --     overflow -> NULL, same as the variant cast);
        --   DOUBLE (fractional/huge/exponent tokens): trunc toward
        --     zero on the double VALUE — Spark truncates its decimal/
        --     double the same way; out-of-i64-range -> NULL both sides;
        --   VARCHAR: the variant string->long cast is strict-integral
        --     (signed digits only after stripping Spark's exact trim
        --     class [\\x00-\\x20\\x7F] — never DuckDB trim(), which
        --     strips Unicode spaces Spark keeps; "1.5"/"1e2" -> NULL);
        --   OBJECT/ARRAY/json-null/missing: NULL.
        SELECT event_type,
               __K_EXPR__ AS k
        FROM (SELECT event_type, try_cast(props AS JSON) AS pj FROM events)
    )
    GROUP BY event_type
    """.replace(
        "__AVG_K__", oracle_round_ratio_sql("sum(k)", "count(k)", 4)
    ).replace("__K_EXPR__", VARIANT_ORACLE_K),
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type: parse the
    raw JSON props column once into a binary variant and path-extract with
    ``variant_get`` — the engine encodes the parsed structure instead of
    re-tokenizing JSON text per access, and at rest a variant column
    shreds into parquet subcolumns so repeated paths read columnar. The
    schema-on-read answer for event property bags that evolve faster than
    any declared schema (the reference stores WP post payloads exactly
    this loosely). Typed extraction (``'$.k'`` as long) returns NULL on
    missing paths — same null semantics the oracle's ``->>`` has.

    try_parse_json + try_variant_get, NOT the strict forms (r16, probed
    on hostile props): ``parse_json`` RAISES on malformed JSON and
    ``variant_get('long')`` RAISES on a non-scalar value (``{"k":
    {"x":1}}``, ``{"k":[1,2]}``, overflow numbers) — with the strict
    forms ONE hostile property bag in 100 TB kills the whole job. The
    try forms return NULL; the oracle mirrors each NULL source through
    a json_type split (try_cast JSON, duplicate-key CASE, per-type
    casts — ADVICE r16 #1: fractional numbers TRUNCATE toward zero like
    the variant cast, never the rounding string->BIGINT cast; strings
    are strict-integral). Residual documented gaps: (1) try_parse_json
    also rejects duplicate keys at NESTED depth, which json_keys cannot
    see — nested-duplicate bags are outside the oracled domain
    (top-level duplicates are pinned by the dirty rows; the divergence
    itself is pinned by test_nested_duplicate_key_divergence); (2)
    plain-decimal tokens with >17 significant digits: Spark's variant
    keeps them as exact decimal (0.99999999999999999 truncates to 0)
    while DuckDB's JSON parser double-izes at PARSE time (nearest
    double is 1.0 — the original digits are unrecoverable), so such
    knife-edge bags are likewise outside the oracled domain."""
    e = load_table(spark, sf_dir, "events")
    k = F.expr("try_variant_get(try_parse_json(props), '$.k', 'long')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            # exact-rational rounding (r13, mirrored in the oracle)
            round_ratio_exact(F.sum("k"), F.count("k"), 4).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@register(
    "q_nullsafe_join",
    oracle="""
    WITH o AS (
        SELECT nullif(o_orderstatus, 'O') AS st, o_totalprice FROM orders
    ),
    d(st, label) AS (VALUES ('F', 'finished'), ('P', 'pending'), (NULL, 'open'))
    SELECT d.label,
           count(*)::BIGINT AS n_orders,
           round(sum(round(o.o_totalprice * 100)::BIGINT) / 100.0, 2) AS revenue
    FROM o JOIN d ON o.st IS NOT DISTINCT FROM d.st
    GROUP BY d.label
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics every
    dimension join with an 'unknown' bucket needs. A plain equality join
    here loses every nulled row; eqNullSafe keeps them AND stays a hash
    join (EqualNullSafe is a sargable join key, not a filter), so the
    plan is the same broadcast hash join at any scale."""
    o = load_table(spark, sf_dir, "orders").select(
        F.nullif("o_orderstatus", F.lit("O")).alias("st"), "o_totalprice"
    )
    d = spark.createDataFrame(
        [("F", "finished"), ("P", "pending"), (None, "open")],
        "st string, label string",
    )
    return (
        o.join(F.broadcast(d), o["st"].eqNullSafe(d["st"]))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(to_fixed("o_totalprice")) / F.lit(100.0), 2
            ).alias("revenue"),
        )
    )


@register(
    "q_collation_group",
    oracle="""
    WITH k AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                    ELSE lower(o_orderpriority) END AS k
        FROM orders
    )
    SELECT lower(k) AS pri, count(*)::BIGINT AS n_orders
    FROM k GROUP BY lower(k)
    """,
)
def q_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4 COLLATIONS: the mixed-case
    key (alternate rows upper/lower-cased) groups under ``UTF8_LCASE`` in
    the aggregate itself — the collation is a property of the comparison,
    so the hash/shuffle respect it natively instead of materializing a
    lowercased shadow column. Output is re-lowercased and cast back to a
    plain string (the surviving group representative's case is
    engine-arbitrary; the collation metadata must not leak into the
    result schema the oracle compares).

    Domain note (r16): UTF8_LCASE compares by ICU case folding, which
    diverges from the oracle's lower()-normalized grouping on the same
    ~71-codepoint set documented in functions/casefold.py (plus fold-
    only mappings like ß/ẞ). o_orderpriority is generated ASCII at
    every sf, where folding == lowercasing; a non-ASCII key domain
    would need the portable_lower shadow-column form instead of the
    collation."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.selectExpr(
        "CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority) "
        "ELSE lower(o_orderpriority) END COLLATE UTF8_LCASE AS k"
    )
    return (
        keyed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .selectExpr("CAST(lower(k) AS STRING) AS pri", "n_orders")
    )
