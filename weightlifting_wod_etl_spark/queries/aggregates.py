"""Aggregate / join benchmark queries — TPC-H-style plans + explicit pivot.

These are the headline bench queries: they exercise hash aggregation with
map-side partial combine, broadcast vs shuffle join selection, and AQE.
All money aggregates use integer-cents fixed point (functions/money.py) so
results are order-free and engine-exact at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import to_fixed
from ..io import load_table
from ..operators.pivot import pivot_wide
from ..operators.skew import replicated_salted_join, salted_groupby
from ..queries_registry import register

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "q_pivot_wide",
    oracle="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click' THEN round(value*100)::BIGINT END) / 100.0, 2) AS click,
           round(sum(CASE WHEN event_type = 'view' THEN round(value*100)::BIGINT END) / 100.0, 2) AS view,
           round(sum(CASE WHEN event_type = 'purchase' THEN round(value*100)::BIGINT END) / 100.0, 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup' THEN round(value*100)::BIGINT END) / 100.0, 2) AS signup,
           round(sum(CASE WHEN event_type = 'error' THEN round(value*100)::BIGINT END) / 100.0, 2) AS error
    FROM events
    GROUP BY user_id
    """,
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP14 pivot — one wide row per key with EXPLICIT pivot values
    (implicit pivot would plan an extra distinct-scan job; SURVEY §4)."""
    events = load_table(spark, sf_dir, "events")
    agg = F.round(F.sum(to_fixed("value")) / F.lit(100.0), 2)
    return pivot_wide(
        events.select("user_id", "event_type", "value"),
        group_cols=["user_id"],
        key_col="event_type",
        values=EVENT_TYPES,
        agg_expr=agg,
    )


@register(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty,
           sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_base_price,
           sum(round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT) / 10000.0 AS sum_disc_price,
           sum(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000)::BIGINT) / 10000.0 AS sum_charge,
           -- per-measure non-null divisors (r12): the fixed-point
           -- numerators skip NULL measures, so a count(*) divisor would
           -- deflate each average (the r11 avg_fixed defect class);
           -- count_order stays count(*) by Q1's own definition
           round(sum(round(l_quantity * 100)::BIGINT) / count(l_quantity) / 100.0, 4) AS avg_qty,
           round(sum(round(l_extendedprice * 100)::BIGINT) / count(l_extendedprice) / 100.0, 4) AS avg_price,
           round(sum(round(l_discount * 10000)::BIGINT) / count(l_discount) / 10000.0, 4) AS avg_disc,
           count(*)::BIGINT AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — partial+final hash agg on 2 keys;
    the canonical 'does map-side combine happen' plan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    # per-measure non-null divisors (r12): the fixed-point numerators skip
    # NULL measures, so dividing by count(*) deflated each average — the
    # r11 avg_fixed defect class, oracle-mirrored here until now.
    # count_order stays count(*) by Q1's own definition.
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(to_fixed("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
        (F.sum(to_fixed("l_extendedprice")) / F.lit(100.0)).alias("sum_base_price"),
        (F.sum(to_fixed(disc_price, 4)) / F.lit(10000.0)).alias("sum_disc_price"),
        (F.sum(to_fixed(charge, 4)) / F.lit(10000.0)).alias("sum_charge"),
        F.round(
            F.sum(to_fixed("l_quantity")) / F.count("l_quantity") / F.lit(100.0), 4
        ).alias("avg_qty"),
        F.round(
            F.sum(to_fixed("l_extendedprice"))
            / F.count("l_extendedprice")
            / F.lit(100.0),
            4,
        ).alias("avg_price"),
        F.round(
            F.sum(to_fixed("l_discount", 4)) / F.count("l_discount") / F.lit(10000.0),
            4,
        ).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT) / 10000.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority — dim filter → join → agg →
    total-order top-k (ties broken by orderkey).

    customer is data-proportional (≈1.5M rows/TB), so it gets NO broadcast
    hint: AQE broadcasts it at small SF (post-filter size < threshold) and
    falls back to a shuffle join at cluster scale. Hard-hinting it would
    OOM a 1000-executor run."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    revenue_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(revenue_fixed) / F.lit(10000.0)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join star query.

    Broadcast hints only on the BOUNDED dims (region: 5 rows, nation: 25 —
    constant at any SF). customer/supplier grow with the data, so their
    join strategy is left to AQE: broadcast at bench SF, shuffle at
    cluster scale. The fact joins (orders⋈lineitem) shuffle on orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(revenue_fixed) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "q_tpch_q6",
    oracle="""
    SELECT sum(round(l_extendedprice * l_discount * 10000)::BIGINT) / 10000.0 AS revenue,
           count(*)::BIGINT AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast revenue — the canonical predicate-pushdown
    query: all four filters reach the parquet scan (PushedFilters), the
    projection prunes to 4 columns, and the global agg is one partial+final
    pair with no grouped shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = to_fixed(F.col("l_extendedprice") * F.col("l_discount"), 4)
    return li.agg(
        (F.sum(rev) / F.lit(10000.0)).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(round(l_quantity * 100)::BIGINT) / 100.0 AS sum_qty,
           count(*)::BIGINT AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — Spark expands grouping sets in a
    single pass (one shuffle, grouping-id expansion), no per-level rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        (F.sum(to_fixed("l_quantity")) / F.lit(100.0)).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_skew_agg",
    oracle="""
    SELECT user_id, event_type,
           round(sum(round(value * 100)::BIGINT) / 100.0, 2) AS sum_value,
           count(value)::BIGINT AS n_events,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) — result-identical
    to the direct groupBy (this oracle proves it); the salt fans a hot key
    over 16 reducers before the merge phase."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", to_fixed("value").alias("__cents")
    )
    out = salted_groupby(
        events,
        keys=["user_id", "event_type"],
        aggs=[
            ("__cents", "sum", "__sum_cents"),
            ("value", "count", "n_events"),
            ("value", "min", "__min_v"),
            ("value", "max", "__max_v"),
        ],
        salt_on="event_id",
        buckets=16,
    )
    return out.select(
        "user_id",
        "event_type",
        F.round(F.col("__sum_cents") / F.lit(100.0), 2).alias("sum_value"),
        "n_events",
        F.round("__min_v", 2).alias("min_value"),
        F.round("__max_v", 2).alias("max_value"),
    )


@register(
    "q_skew_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*)::BIGINT AS n_events,
           round(sum(round(e.value * 100)::BIGINT) / 100.0, 2) AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-salted join (operators/skew.py): events (skew-prone fact)
    ⋈ customer replicated ×8 on (key, salt) — row-identical to the plain
    equi-join per this oracle, but the hot key spreads over 8 tasks."""
    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = replicated_salted_join(
        events, cust, big_key="user_id", small_key="c_custkey",
        salt_on="event_id", buckets=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(to_fixed("value")) / F.lit(100.0), 2).alias("sum_value"),
    )


@register(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, sum(round(l_quantity * 100)::BIGINT) AS qty_cents
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(round(l_quantity * 100)::BIGINT) > 25000
    )
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           big.qty_cents / 100.0 AS sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY sum_qty DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume customers — aggregate-then-filter
    (HAVING) feeding a join, then total-order top-k.

    Scale shape: the HAVING prunes lineitem to the top ~2% of orders
    BEFORE either join, so the joins move only the survivors; the orderkey
    agg and the orders join share the same key, and AQE converts the
    post-agg side to broadcast when it fits. No hints — selectivity is
    data-dependent and AQE sees the real post-agg size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(to_fixed("l_quantity")).alias("__qty_cents"))
        .filter(F.col("__qty_cents") > 25000)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            (F.col("__qty_cents") / F.lit(100.0)).alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate)::BIGINT AS l_year,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style volume shipping between a nation pair, by year.

    The two nation joins broadcast (25 rows, SF-constant); the disjunctive
    pair predicate sits above them so Catalyst can still push the date
    range into the lineitem scan. Fact joins shuffle on orderkey/suppkey —
    bounded keys at any scale."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    revenue_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg((F.sum(revenue_fixed) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "q_tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(c.c_acctbal, 2) AS c_acctbal,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: quarter of orders, R-flag
    lineitems, revenue per customer, total-order top-20. Both selective
    predicates (date range, returnflag) push into their scans; nation
    broadcasts; the agg keys on custkey — bounded by |customer|."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .agg((F.sum(revenue_fixed) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q14",
    oracle="""
    SELECT round(100.0 * (sum(CASE WHEN p.p_type = 'PROMO'
                     THEN round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT
                     ELSE 0 END) / 10000.0)
           / (sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT) / 10000.0),
           4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: one month of lineitem joined
    to part, conditional fixed-point aggregate over the same join — a
    single shuffle-free final agg after the join. part is
    data-proportional, so no broadcast hint: AQE decides."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    revenue_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    promo_fixed = F.when(F.col("p_type") == "PROMO", revenue_fixed).otherwise(F.lit(0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                (F.lit(100.0) * (F.sum(promo_fixed) / F.lit(10000.0)))
                / (F.sum(revenue_fixed) / F.lit(10000.0)),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style order-priority check: one quarter of orders having
    at least one lineitem shipped after the order date (EXISTS adapted to
    this schema's columns — no commitdate/receiptdate in the testdata).

    EXISTS plans as a LEFT SEMI join on orderkey with the non-equi ship-
    date predicate attached to the join — no row multiplication, no
    distinct; the quarter filter pushes into the orders scan; the final
    agg keys on the 5-value priority (partial combine makes the tiny-key
    skew irrelevant)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH cost AS (
        -- l_suppkey IS NOT NULL (r12): a NULL-suppkey observation could
        -- win rn=1 for its part, and the later supplier equi-join would
        -- then drop the PART entirely — the real min-cost supplier
        -- vanishes (the tpch_q16 probe-NULL class, oracle-mirrored)
        SELECT l_partkey, l_suppkey,
               min(round(l_extendedprice / l_quantity * 10000)::BIGINT) AS unit_fp
        FROM lineitem WHERE l_quantity > 0 AND l_suppkey IS NOT NULL
        GROUP BY 1, 2
    ), best AS (
        SELECT l_partkey, l_suppkey, unit_fp
        FROM cost
        -- NULLS LAST pinned on both sides: Spark defaults ASC NULLS
        -- FIRST, so a NULL unit cost would steal rn=1 (review r11);
        -- DuckDB's window NULL order is also empirically unstable
        QUALIFY row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY unit_fp NULLS LAST,
                                            l_suppkey NULLS LAST) = 1
    )
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
           b.unit_fp / 10000.0 AS unit_cost
    FROM best b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped min-cost supplier per part, adapted to this schema
    (no partsupp table — observed unit price from lineitem stands in for
    ps_supplycost).

    Unit prices go through integer fixed-point (×10⁴) BEFORE any min, so
    the winner is chosen on exact BIGINTs and ties resolve by suppkey —
    a float min would be engine-portable but its equality-to-best filter
    would not. Plan: (partkey,suppkey) pre-agg shrinks lineitem to the
    supply matrix before the partkey window (one Exchange each); the two
    dimension joins carry only one row per part, and AQE picks
    broadcast vs shuffle by size."""
    # l_suppkey IS NOT NULL mirrors the oracle (r12): without it a
    # NULL-suppkey row winning the per-part minimum silently dropped the
    # whole part at the supplier join in BOTH engines
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & F.col("l_suppkey").isNotNull()
    )
    unit_fp = to_fixed(F.col("l_extendedprice") / F.col("l_quantity"), 4)
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_fp).alias("unit_fp")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_fp").asc_nulls_last(), F.col("l_suppkey").asc_nulls_last()
    )
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            (F.col("unit_fp") / F.lit(10000.0)).alias("unit_cost"),
        )
    )


@register(
    "q_corr_stats",
    oracle="""
    SELECT l_returnflag,
           count(*)::BIGINT AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp
    FROM lineitem
    GROUP BY 1
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical co-moments per group: Pearson correlation, sample
    stddev, sample covariance — the profile pass a feature-engineering
    pipeline runs before normalizing columns.

    All three are single-pass streaming aggregates (Welford-style merge
    in both engines — numerically stable, so cross-engine drift stays
    ~1e-12 and the 4-6 digit rounding is safe); one shuffle on a 3-value
    key, partial-combined map-side."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qp"
        ),
    )


@register(
    "q_ntile_bucket",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority, o_totalprice,
               -- NULLS LAST pinned both sides (Spark ASC defaults
               -- NULLS FIRST: a NULL price would land in bucket 1 and
               -- shift every quartile boundary — review r11)
               ntile(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice NULLS LAST,
                                       o_orderkey NULLS LAST) AS bucket
        FROM orders
    )
    SELECT o_orderpriority, bucket::BIGINT AS bucket, count(*)::BIGINT AS n,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM b GROUP BY 1, 2
    """,
)
def q_ntile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group quartile assignment (ntile) + per-bucket price bands —
    the partitioned flavor of quantile bucketing.

    Deliberately PARTITIONED ntile: a global ORDER BY window would plan a
    single-partition sort (the classic 100 TB killer); per-priority
    windows keep every sort partition-local. For an unpartitioned global
    ntile at scale, use approx-quantile cut points + a broadcast range
    join instead (see q_histogram). Total order inside each window via
    the orderkey tiebreak makes bucket assignment engine-exact."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return (
        o.withColumn("bucket", F.ntile(4).over(w))
        .groupBy("o_orderpriority", F.col("bucket").cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@register(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate)::BIGINT AS o_year,
           sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT
               - round(p.p_retailprice * 0.1 * l.l_quantity * 10000)::BIGINT)
               / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style product-type profit: revenue minus a retail-price
    cost proxy (no partsupp table in this schema) per supplier nation and
    order year, restricted to '%red%' parts.

    The widest join matrix in the suite — lineitem against part, supplier,
    nation, and orders simultaneously. The selective LIKE prunes part
    FIRST (pushed to its scan); nation broadcasts; both profit terms are
    rounded to fixed-point INDIVIDUALLY before the subtraction so the sum
    is order-free and engine-exact."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    rev_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    cost_fixed = to_fixed(
        F.col("p_retailprice") * F.lit(0.1) * F.col("l_quantity"), 4
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(rev_fixed - cost_fixed) / F.lit(10000.0)).alias("sum_profit")
        )
    )


@register(
    "q_tpch_q19",
    oracle="""
    SELECT sum(round(l.l_extendedprice * (1 - l.l_discount) * 10000)::BIGINT)
               / 10000.0 AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 5 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 10 AND 40)
    """,
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive discounted-revenue: three brand/size/
    quantity predicate branches OR-ed across the lineitem⋈part join.

    The disjunction mixes columns from BOTH sides, so it must evaluate
    post-join — but Catalyst still derives the implied single-side
    prefilters (brand IN (...), size/quantity range hulls) and pushes
    them into the scans, shrinking both join inputs; verify with
    .explain (PushedFilters on both scans). Single-row fixed-point agg."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    branch = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(10, 40)
    )
    rev_fixed = to_fixed(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(branch)
        .agg((F.sum(rev_fixed) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "q_rollup_time",
    oracle="""
    -- revenue through integer cents (r12): this was the one money
    -- aggregate in the file summing raw doubles — order-dependent
    -- addition that can flip round(x, 2) at a .xx5 boundary between
    -- engines/runs, worst for the grand-total rollup row
    SELECT extract(year FROM o_orderdate)::BIGINT AS yr,
           extract(month FROM o_orderdate)::BIGINT AS mo,
           count(*)::BIGINT AS n_orders,
           round(sum(round(o_totalprice * 100)::BIGINT) / 100.0, 2) AS revenue
    FROM orders
    GROUP BY ROLLUP(extract(year FROM o_orderdate)::BIGINT,
                    extract(month FROM o_orderdate)::BIGINT)
    """,
)
def q_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy ROLLUP over DERIVED keys (year(ts) → month(ts)) —
    the calendar-drilldown variant of ``q_rollup``, which rolls up plain
    columns: here the grouping expressions are computed projections, so
    this additionally pins that the Expand node evaluates derived keys
    once map-side rather than per grouping set. One Expand feeding ONE
    hash aggregate, partially aggregated before the shuffle — at 100 TB
    the exchange carries ~|years|·|months| rows, not 3× the table."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            # fixed-point, not a raw double sum (r12): the grand-total
            # row sums every order, where partial-merge addition order
            # can flip the 2nd decimal across engines/runs. Hoisted into
            # the pre-rollup projection (r13 adjudication): inside the
            # agg it was evaluated per EXPAND output row — 3x per order
            # for the 3 grouping sets — which was most of the r12
            # 0.08 -> 0.165 normalized move
            to_fixed("o_totalprice").alias("__cents"),
        )
        .rollup("yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("__cents") / F.lit(100.0), 2).alias("revenue"),
        )
    )


@register(
    "q_unpivot_measures",
    oracle="""
    WITH long AS (
        SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    SELECT l_returnflag, measure,
           count(*)::BIGINT AS n,
           -- count(val), not count(*) (r12): the fixed sum skips NULL
           -- measures, so a row-count divisor deflated every cell's
           -- average (the r11 avg_fixed class); n stays the row count
           round(sum(round(val * 10000)::BIGINT) / 10000.0 / count(val), 4) AS avg_val,
           round(sum(round(val * 10000)::BIGINT) / 10000.0, 4) AS sum_val
    FROM long GROUP BY l_returnflag, measure
    """,
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT into a (group, measure) aggregation grid — a retained id
    column (l_returnflag survives the melt) and mixed aggregate types
    (count / avg / fixed-point sum) per cell, the generic shape of a
    per-segment metrics matrix. (Absorbed q_unpivot, retired r13: the
    global per-metric totals variant exercised the identical Expand +
    4-key exchange with strictly less surface.)

    Unpivot is a zero-shuffle Expand (4 output rows per input row emitted
    map-side, like rollup's expansion) feeding a partially-aggregated
    groupBy — at 100 TB the exchange carries |flags|×|measures| combined
    rows, not 4× the table. The oracle states the same reshape as the
    portable UNION ALL form. Sums go through fixed-point so the 4×
    expansion can't change float addition order across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    ).unpivot(
        "l_returnflag",
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "val",
    )
    # avg through the SAME fixed-point sum as sum_val: raw F.avg sums
    # doubles in partial-merge order, which can flip the 4th decimal at a
    # rounding boundary between runs/engines — the exact drift the
    # docstring promises away
    # to_fixed(val, 4), not a hand-inlined round().cast: the helper
    # carries the r11 non-finite/overflow guard (a huge finite measure
    # would clamp to Long.MAX and wrap the sums where the oracle raises)
    fixed = F.sum(to_fixed(F.col("val"), 4)) / F.lit(10000.0)
    # avg divides by count(val) — the numerator skips NULL measures, so
    # the old count(*) divisor deflated the cell average (r12, the r11
    # avg_fixed class, oracle-mirrored here until now); n stays count(*)
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(fixed / F.count("val"), 4).alias("avg_val"),
        F.round(fixed, 4).alias("sum_val"),
    )


@register(
    "q_weighted_median",
    oracle="""
    WITH vals AS (
        SELECT l_returnflag,
               round(l_extendedprice * 100)::BIGINT AS cents,
               sum(round(l_quantity)::BIGINT)::BIGINT AS w
        FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
        -- cents IS NOT NULL (r12): a NULL-price group's weight counted
        -- into tw while its value can never satisfy the cut — inflating
        -- the 2*cw >= tw threshold (or, when NULL-weight dominates,
        -- yielding a NULL median for a group with a well-defined one).
        -- operators/percentile.py already uses the zero-weight-for-NULL
        -- convention; this brings the weighted median in line. The
        -- NULLS LAST pins stay as belt-and-braces for the (now
        -- impossible) NULL cents.
        SELECT l_returnflag, cents, w,
               sum(w) OVER (PARTITION BY l_returnflag
                            ORDER BY cents NULLS LAST
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM vals WHERE cents IS NOT NULL
    )
    SELECT l_returnflag,
           min(cents) / 100.0 AS w_median,
           max(tw)::BIGINT AS total_weight
    FROM cum WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower convention: smallest value whose
    cumulative weight reaches half the total) of extended price weighted
    by quantity — the order statistic quantity-weighted pricing needs,
    which no built-in aggregate provides.

    Same counts-first scaling contract as operators/percentile.py: weights
    pre-aggregate per DISTINCT (group, value) before any window, so the
    exchange and the cumulative window see the value histogram, never raw
    rows; prices are exact integer cents so cumulative sums are
    bit-deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy(
        "l_returnflag", to_fixed("l_extendedprice").alias("cents")
    ).agg(
        # to_fixed(.., 0), not a raw round().cast: a non-finite or huge
        # quantity would clamp to Long.MAX and silently dominate cw/tw
        # where the oracle raises (review r11)
        F.sum(to_fixed("l_quantity", 0)).alias("w")
    )
    # NULL cents carry zero weight (r12): a NULL-price group's mass
    # otherwise inflated tw while its value could never satisfy the cut
    # (operators/percentile.py's convention, mirrored in the oracle)
    vals = vals.filter(F.col("cents").isNotNull())
    wflag = Window.partitionBy("l_returnflag")
    wcum = wflag.orderBy(F.col("cents").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = vals.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wflag).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            (F.min("cents") / F.lit(100.0)).alias("w_median"),
            F.max("tw").cast("long").alias("total_weight"),
        )
    )


@register(
    "q_gini",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(n_chars) OVER (PARTITION BY source) AS tot
        FROM documents
        -- a NULL size has no rank: Spark sorts NULLS FIRST, DuckDB
        -- NULLS LAST, so an unfiltered NULL shifts every other rank i
        WHERE n_chars IS NOT NULL
    )
    SELECT source,
           round((2.0 * sum(i * n_chars)) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           max(n)::BIGINT AS n_docs
    FROM ranked GROUP BY source
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document-size concentration per source — the
    inequality statistic a corpus-curation pipeline watches (one source
    contributing its mass through a handful of giant documents behaves
    differently from one with uniform sizes, at equal token counts).

    Discrete formula over ascending sizes: G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n,
    with a (size, doc_id) total order making rank assignment — and thus
    the result — deterministic. One exchange keyed by source; integer
    rank·size products keep the only float step at the final division."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w.orderBy("n_chars", "doc_id")).alias("i"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("n_chars").over(w).alias("tot"),
    )
    return ranked.groupBy("source").agg(
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("n_chars")))
            / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").cast("long").alias("n_docs"),
    )
