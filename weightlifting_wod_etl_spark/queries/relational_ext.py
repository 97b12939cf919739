"""Relational-surface extensions: semi / anti / outer joins, distinct aggs.

The reference only ever joins implicitly (SURVEY.md §2.2 — left-anti
idempotency, ordinal joins), but a drop-in engine needs the full relational
join matrix. Each query here exercises one join/aggregation shape the rest
of the suite doesn't cover, in the plan form that survives 100 TB:

- semi join instead of join+distinct (no duplicate explosion, the probe side
  streams once and short-circuits per key);
- decorrelated scalar subquery as a single-row broadcast cross join (the
  subquery aggregates to ONE row — never a per-row recompute);
- outer-join count distribution as two cascaded aggregations where the
  second input is already tiny (distinct count values, not rows);
- full-outer on pre-aggregated dailies (both sides shrink by ~3 orders of
  magnitude before the shuffle join);
- multi-column distinct aggregation via Spark's Expand-based plan (each row
  fans out once per distinct column; partial dedup happens map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import to_fixed
from ..io import load_table
from ..queries_registry import register


@register(
    "q_semi_join",
    oracle="""
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS as a LEFT SEMI join.

    Semi join (not join+dropDuplicates): an order with 7 matching lineitems
    emits one row and never materializes the duplicates, so the post-join
    agg input is bounded by |orders|, not |lineitem|. Both sides shuffle on
    orderkey once; the date filter is pushed into the orders parquet scan.
    """
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# q_outer_join_dist RETIRED r12: it was a near-verbatim duplicate of
# tpch_ext.q_tpch_q13 (identical left-outer + two-level count-distribution
# plan; only the join-condition predicate differed), burning a driver
# window slot, a bench run, and a dirty-sweep run on one plan shape. The
# canonical Q13 registration carries the coverage (review r12; cadence
# rule: 152 registered / 50 slots).


@register(
    "q_anti_scalar_sub",
    oracle="""
    WITH thresh AS (
        SELECT sum(round(c_acctbal * 100)::BIGINT) AS total_cents,
               count(*)::BIGINT AS cnt
        FROM customer WHERE c_acctbal > 0.0
    ), rich AS (
        SELECT c.c_custkey, c.c_nationkey, round(c.c_acctbal * 100)::BIGINT AS cents
        FROM customer c, thresh t
        WHERE round(c.c_acctbal * 100)::BIGINT * t.cnt > t.total_cents
    )
    SELECT r.c_nationkey,
           count(*)::BIGINT AS numcust,
           sum(r.cents) / 100.0 AS totacctbal
    FROM rich r
    ANTI JOIN orders o ON r.c_custkey = o.o_custkey
    GROUP BY r.c_nationkey
    """,
)
def q_anti_scalar_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar AVG subquery + NOT EXISTS, decorrelated.

    The average is decorrelated into a one-row (sum_cents, cnt) aggregate
    broadcast via cross join — computed once, never per-row. The comparison
    ``cents * cnt > total_cents`` is pure int64, so Spark and the oracle
    agree bit-for-bit where a float avg threshold could flip boundary rows.
    NOT EXISTS = left anti; only surviving (rich) customers shuffle.
    """
    cust = load_table(spark, sf_dir, "customer")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(to_fixed("c_acctbal")).alias("total_cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    rich = (
        cust.select(
            "c_custkey", "c_nationkey", to_fixed("c_acctbal").alias("cents")
        )
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("cents") * F.col("cnt") > F.col("total_cents"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("cents") / F.lit(100.0)).alias("totacctbal"),
        )
    )


@register(
    "q_full_outer",
    oracle="""
    WITH od AS (
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*)::BIGINT AS n_orders
        FROM orders GROUP BY 1
    ), sd AS (
        SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, count(*)::BIGINT AS n_ship
        FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(od.d, sd.d) AS d,
           COALESCE(od.n_orders, 0)::BIGINT AS n_orders,
           COALESCE(sd.n_ship, 0)::BIGINT AS n_ship
    FROM od FULL OUTER JOIN sd ON od.d = sd.d
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two daily activity series (order days vs ship days),
    preserving days present on only one side.

    Aggregate-before-join: both inputs collapse to |distinct days| rows
    (~2.4k for 7 years) BEFORE the full-outer shuffle — at 100 TB the join
    touches kilobytes, not the fact tables. Unmatched sides are zero-filled
    so the output schema is total.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    od = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    sd = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("d")
    ).agg(F.count(F.lit(1)).alias("n_ship"))
    return (
        od.join(sd, od.d == sd.d, "full_outer")
        .select(
            F.coalesce(od.d, sd.d).alias("d"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_ship", F.lit(0)).alias("n_ship"),
        )
    )


@register(
    "q_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)::BIGINT AS n_parts,
           count(DISTINCT l_suppkey)::BIGINT AS n_supps,
           count(*)::BIGINT AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column COUNT(DISTINCT) — Catalyst's Expand-based rewrite.

    Two distinct columns fan each row out ×3 (one replica per distinct
    column + one for the plain count), then partial-deduplicate map-side
    before the shuffle — the expansion never hits the wire at full width.
    For approximate needs at 100 TB, ``q_approx_distinct`` (HLL) is the
    cheap path; this is the exact one.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_null_semantics",
    oracle="""
    WITH c AS (
        SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
               round(c_acctbal * 100)::BIGINT AS cents
        FROM customer
    ), agg AS (
        SELECT seg, count(*)::BIGINT AS n_rows, count(seg)::BIGINT AS n_nonnull,
               sum(cents)::BIGINT / 100.0 AS bal
        FROM c GROUP BY seg
    ), dim AS (SELECT DISTINCT seg FROM c)
    SELECT coalesce(d.seg, 'NULLSEG') AS tag, a.n_rows, a.n_nonnull, a.bal,
           row_number() OVER (ORDER BY a.seg ASC NULLS LAST)::BIGINT AS rn
    FROM agg a JOIN dim d ON a.seg IS NOT DISTINCT FROM d.seg
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics pinned end-to-end: NULL forms its own GROUP BY bucket,
    ``count(col)`` skips NULLs while ``count(*)`` doesn't, a null-safe
    equi-join (``<=>`` / IS NOT DISTINCT FROM) matches the NULL key where a
    plain join would drop it, and sort-null placement is EXPLICIT
    (``asc_nulls_last``) because Spark defaults NULLS FIRST for ASC while
    DuckDB defaults NULLS LAST — the one default you must never rely on.
    The global row_number window runs over 5 post-agg rows, not the fact.
    """
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        to_fixed("c_acctbal").alias("cents"),
    )
    agg = c.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("seg").alias("n_nonnull"),
        (F.sum("cents") / F.lit(100.0)).alias("bal"),
    )
    dim = c.select("seg").distinct()
    return (
        agg.join(dim, agg.seg.eqNullSafe(dim.seg))
        .select(
            F.coalesce(dim.seg, F.lit("NULLSEG")).alias("tag"),
            "n_rows",
            "n_nonnull",
            "bal",
            F.row_number()
            .over(Window.orderBy(agg.seg.asc_nulls_last()))
            .cast("bigint")
            .alias("rn"),
        )
    )


@register(
    "q_decimal_agg",
    oracle="""
    SELECT o_orderstatus,
           sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS total,
           min(o_totalprice::DECIMAL(18,2))::DOUBLE AS min_price,
           max(o_totalprice::DECIMAL(18,2))::DOUBLE AS max_price,
           count(*)::BIGINT AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL(18,2) aggregation — the type-system path to exact money
    math (the fixed-point cents helpers are the expression-level path; both
    must agree). Spark widens the sum to DECIMAL(28,2) internally, DuckDB to
    DECIMAL(38,2); the values are identical exact decimals, so the final
    cast to double is the same nearest-double in both engines. AVG is
    deliberately absent: engines disagree on decimal-division result scale,
    so an average would be derived as sum/count by the caller.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("double").alias("total"),
        F.min(dec).cast("double").alias("min_price"),
        F.max(dec).cast("double").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_set_ops_all",
    oracle="""
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
    EXCEPT ALL
    SELECT l_orderkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-preserving set ops (INTERSECT ALL / EXCEPT ALL) — bag
    semantics, complementing q_set_ops' set semantics. Multiplicity math
    must match the oracle exactly, which a dedup-based rewrite would
    silently break.

    ONE aggregation instead of chained intersectAll/exceptAll (r18
    optimization round, guide §2.3/§2.4): the operator chain planned 3
    lineitem scans, 2 corpus-keyed exchanges and a mid-plan Generate
    that re-materialized every intersect duplicate only to re-count it.
    Since all three legs key on l_orderkey, one groupBy computes the
    per-key leg counts (cr, cf, cl) in a single scan/shuffle and the
    final bag multiplicity is the closed form the SQL standard defines:
    INTERSECT ALL keeps min(cr, cf) copies, EXCEPT ALL then keeps
    max(min(cr, cf) - cl, 0) — reproduced by one sequence explode.
    NULL keys group together exactly as the operators' null-safe
    equality matches them; a NULL l_shipdate fails the `late` predicate
    in both forms. Bag-identical by construction (the driver hash is
    the proof); plan: 3 scans -> 1, 2 exchanges -> 1, 2 Generates -> 1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("__cr"),
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0)).alias("__cf"),
        F.sum(
            F.when(
                F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"), 1
            ).otherwise(0)
        ).alias("__cl"),
    )
    mult = F.greatest(
        F.least(F.col("__cr"), F.col("__cf")) - F.col("__cl"), F.lit(0).cast("long")
    )
    return (
        counts.select("l_orderkey", mult.alias("__m"))
        .filter(F.col("__m") > 0)
        .select(
            "l_orderkey",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("__m"))).alias("__i"),
        )
        .select("l_orderkey")
    )


@register(
    "q_union_by_name",
    oracle="""
    SELECT doc_id, lang,
           coalesce(n_chars, -1)::BIGINT AS n_chars,
           coalesce(n_words, -1)::BIGINT AS n_words,
           batch
    FROM (
        SELECT doc_id, lang, length(text)::BIGINT AS n_chars,
               'v1' AS batch
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL BY NAME
        SELECT doc_id, lang,
               len(string_split(text, ' '))::BIGINT AS n_words,
               'v2' AS batch
        FROM documents WHERE doc_id % 2 = 1
    )
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union — two batch versions with drifted columns
    merged by NAME with missing columns null-filled, then normalized.

    The DataFrame analog of the reference's unknown-column preservation
    (transforms.py:316-317): positional UNION would silently misalign
    drifted schemas; ``unionByName(allowMissingColumns=True)`` is the only
    safe merge for append-over-time tables whose schema widened. Purely
    map-side — no shuffle, scales as two scans.
    """
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", F.length("text").cast("long").alias("n_chars"),
        F.lit("v1").alias("batch"),
    )
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        F.lit("v2").alias("batch"),
    )
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return merged.select(
        "doc_id", "lang",
        F.coalesce("n_chars", F.lit(-1)).alias("n_chars"),
        F.coalesce("n_words", F.lit(-1)).alias("n_words"),
        "batch",
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus,
               round(o_totalprice * 100)::BIGINT AS cents
        FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    ), v2 AS (
        SELECT o_orderkey, o_orderstatus,
               (round(o_totalprice * 100)::BIGINT * 11) // 10 AS cents
        FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    )
    SELECT coalesce(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
           CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           v1.cents / 100.0 AS old_price, v2.cents / 100.0 AS new_price
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.cents <> v2.cents OR v1.o_orderstatus <> v2.o_orderstatus
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: two versions of a table (simulated by
    date-sliced + price-bumped views of orders) compared into an
    insert/update/delete changelog — the table-diff operator that feeds
    incremental downstream syncs.

    A single FULL OUTER join on the primary key, change detection as a
    post-join filter — one co-partitioned shuffle per side, no row
    explosion; at 100 TB both snapshots would be bucketed on the key so
    even that Exchange disappears (io.write_bucketed). The simulated
    price bump stays in INTEGER CENTS with floor division — a
    ``round(price * 1.1, 2)`` on doubles lands on .xx5 boundaries where
    Spark's exact-decimal and a scaled-double rounding disagree (16 rows
    at sf0.01), exactly the drift the fixed-point rule exists to kill."""
    o = load_table(spark, sf_dir, "orders")
    cents = to_fixed("o_totalprice")
    v1 = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_orderstatus").alias("status1"),
        cents.alias("cents1"),
    )
    v2 = o.filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderstatus").alias("status2"),
        cents.alias("__c"),
    ).select(
        "k2",
        "status2",
        # SQL `div` = exact long INTEGER division, truncating toward
        # ZERO — exactly like the oracle's `// 10` (verified: DuckDB
        # (-15025*11)//10 = -16527, truncation, where true floor is
        # -16528), so negative cents agree to the cent. NOT floor
        # division: swapping in F.floor(__c * 11 / 10) would both
        # reintroduce the IEEE rounding past 2^53 this fixed (review
        # r11) and shift every negative row down one cent (review r12).
        F.expr("(__c * 11) div 10").alias("cents2"),
    )
    joined = v1.join(v2, v1.k1 == v2.k2, "full_outer")
    changed = joined.filter(
        F.col("k1").isNull()
        | F.col("k2").isNull()
        | (F.col("cents1") != F.col("cents2"))
        | (F.col("status1") != F.col("status2"))
    )
    return changed.select(
        F.coalesce("k1", "k2").alias("o_orderkey"),
        F.when(F.col("k1").isNull(), "insert")
        .when(F.col("k2").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        (F.col("cents1") / F.lit(100.0)).alias("old_price"),
        (F.col("cents2") / F.lit(100.0)).alias("new_price"),
    )


@register(
    "q_lateral_topk",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL top-k: the two richest customers per nation via
    ``DataFrame.lateralJoin`` with an ``.outer()`` correlated reference —
    the per-row-subquery surface SQL users reach for before they learn
    window functions.

    The interesting part is what Catalyst does with it: the correlated
    sort+limit DECORRELATES into a rank-window plan with WindowGroupLimit
    (per-partition partial top-k BEFORE the exchange), one hash exchange
    on the join key, zero nested loops — identical at-scale shape to the
    hand-written row_number()<=k idiom (q_domain_cap), proving the
    lateral API costs nothing over the manual rewrite. Ties on the
    double acctbal break by custkey in both engines; no arithmetic, so
    no float drift."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = load_table(spark, sf_dir, "customer")
    top2 = (
        cust.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(2)
        .select("c_custkey", "c_acctbal")
    )
    return nation.lateralJoin(top2).select(
        "n_name", "c_custkey", "c_acctbal"
    )


@register(
    "q_global_topn",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey NULLS LAST
    LIMIT 100
    """,
)
def q_global_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY ... LIMIT N — the 100 highest-value orders with
    their customer names. Trivial SQL, non-trivial at 100 TB: a full
    global sort is a range-partitioned total shuffle of the fact table,
    but a bounded LIMIT compiles to TakeOrderedAndProject — each task
    keeps a 100-row heap, only per-task top-100s (N·tasks rows) ever
    reach the driver-side merge, and NO sort exchange exists in the plan
    (pinned in test_plan_shapes). The customer name attaches by broadcast
    AFTER conceptually only 100 rows matter; Spark joins first here
    (dims broadcast, cost ~scan) — at extreme dim sizes you'd take the
    top-100 keys first and join the names onto 100 rows.

    The order key is total (price DESC, orderkey ASC) so the kept set is
    deterministic under ties in any engine, and every output value is a
    raw stored column — nothing computed, nothing to round."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # NO broadcast hint on customer: it is data-proportional (~1.5M
    # rows/TB — the q_tpch_q3 rule), so the hint must stay with AQE,
    # which broadcasts at bench SF and degrades to shuffle at 100 TB
    # instead of OOMing
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name")
        # asc_nulls_last pins the tiebreak: the dirty schema injects a
        # NULL o_orderkey, and at an exact price tie on the LIMIT cut
        # Spark (NULLS FIRST) and DuckDB (NULLS LAST) would keep
        # different rows (review r11)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc_nulls_last())
        .limit(100)
    )


@register(
    "q_data_quality",
    oracle="""
    -- FK probes filter NULL keys: SQL FK semantics are vacuous on a
    -- NULL child key (MATCH SIMPLE), so a NULL FK is a nullability
    -- finding, never a referential violation (review r12 — it was
    -- oracle-mirrored-counted as one before)
    SELECT 'orphan_lineitem' AS rule, count(*)::BIGINT AS n_violations
    FROM (SELECT l_orderkey FROM lineitem WHERE l_orderkey IS NOT NULL) l
    ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    -- event_id IS NOT NULL: SQL UNIQUE constraints never treat two
    -- NULLs as duplicates of each other (r12, same intent rule as the
    -- FK probes); missing ids are the nullability rules' business
    SELECT 'dup_event_id', coalesce(sum(n - 1), 0)::BIGINT
    FROM (SELECT event_id, count(*) AS n FROM events
          WHERE event_id IS NOT NULL GROUP BY 1 HAVING count(*) > 1)
    UNION ALL
    SELECT 'null_user', count(*)::BIGINT FROM events WHERE user_id IS NULL
    UNION ALL
    SELECT 'nonpositive_price', count(*)::BIGINT
    FROM lineitem WHERE l_extendedprice <= 0
    UNION ALL
    SELECT 'discount_out_of_range', count(*)::BIGINT
    FROM lineitem WHERE l_discount < 0 OR l_discount > 1
    UNION ALL
    SELECT 'custkey_fk_broken', count(*)::BIGINT
    FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
    ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: one row per constraint with its violation
    count — referential integrity (orphan lineitems, broken customer
    FKs), uniqueness (duplicate event ids), nullability, and domain
    ranges. The validation gate a pipeline runs before promoting a
    snapshot; zeros are emitted (not omitted) so the report schema is
    stable and a disappearing rule is itself detectable.

    FK semantics (review r12): a NULL child key is filtered from the
    probe side — SQL foreign keys (MATCH SIMPLE) pass vacuously on NULL,
    so counting one as a referential violation was a wrong-intent audit;
    nullability already has its own rule style ('null_user').

    Scale shape: each rule is the cheapest plan for its class — FK checks
    are LEFT ANTI joins on the key (semi-join pruned, no row
    multiplication), uniqueness is a keyed count HAVING>1 (map-side
    combined), range checks are scan-local predicates. The two range
    rules FUSE into one conditional-aggregate pass over lineitem
    (review r12 — as separate filter→count subtrees Spark planned a full
    FileScan each, the multi-consumer re-scan gotcha; at 100 TB that was
    a spare fact-table read per audit). The single-row aggregates union
    AFTER reduction, so the plan ships six rows. At 100 TB you
    additionally gate each rule behind a sampled pre-check if the table
    is known-clean."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    def one(rule: str, cnt_df) -> DataFrame:
        return cnt_df.select(
            F.lit(rule).alias("rule"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_violations"),
        )

    orphan = (
        l.filter(F.col("l_orderkey").isNotNull())
        .join(o, l.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # NULL ids are excluded (r12): SQL UNIQUE never counts two NULLs as
    # duplicates; nullability is its own rule class
    dup = (
        e.filter(F.col("event_id").isNotNull())
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.sum(F.col("c") - 1).alias("n"))
    )
    null_user = e.filter(F.col("user_id").isNull()).agg(F.count(F.lit(1)).alias("n"))
    # one lineitem pass for both scan-local range rules; the 1-row result
    # is lazily checkpointed because BOTH report rows consume it (without
    # the checkpoint each consumer re-runs the scan — the q15/q17 rule)
    ranges = l.agg(
        F.sum(
            F.when(F.col("l_extendedprice") <= 0, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_nonpos"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_disc"),
    ).localCheckpoint(eager=False)
    nonpos = ranges.select(F.col("n_nonpos").alias("n"))
    disc = ranges.select(F.col("n_disc").alias("n"))
    fk = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        one("orphan_lineitem", orphan)
        .unionByName(one("dup_event_id", dup))
        .unionByName(one("null_user", null_user))
        .unionByName(one("nonpositive_price", nonpos))
        .unionByName(one("discount_out_of_range", disc))
        .unionByName(one("custkey_fk_broken", fk))
    )
