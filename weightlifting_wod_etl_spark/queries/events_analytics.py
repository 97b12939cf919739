"""Event-log analytics — funnels, cohorts, arg-extremum, gap statistics,
SCD2 snapshots, z-score normalization.

The product-analytics query family the reference's event pipeline feeds
downstream (SURVEY §2.2 events surface). Every query here is a
single-key shuffle on ``user_id``/``event_type`` — bounded, uniform keys
that hold at 100 TB; no global sorts, no driver loops.

Determinism: time arithmetic stays in exact integer microseconds
(``unix_micros``), counts are BIGINT, and the only double ops are single
IEEE divisions performed identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import (
    oracle_round_ratio_sql,
    round_ratio_exact,
    to_fixed,
)
from ..io import load_table
from ..queries_registry import register


@register(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
        -- user_id IS NOT NULL (r13): the pooled anonymous bucket counted
        -- as ONE user and let one actor's view qualify another actor's
        -- click as a phantom conversion — a NULL key is not an entity
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM events WHERE user_id IS NOT NULL
    ), c AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM v
    ), p AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM c
    ), u AS (
        SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click,
               min(t_purchase) AS t_purchase
        FROM p GROUP BY 1
    )
    SELECT count(*)::BIGINT AS n_users,
           count(t_view)::BIGINT AS n_viewed,
           count(t_click)::BIGINT AS n_clicked_after_view,
           count(t_purchase)::BIGINT AS n_purchased_after_click
    FROM u
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: each stage's timestamp is
    the earliest qualifying event STRICTLY AFTER the prior stage (the
    sequence constraint product funnels need, not mere per-type counts).

    The three stage columns are chained windows over the SAME partition
    key, so Catalyst plans one Exchange on user_id and stacks three
    Window operators on it — per-user state never re-shuffles. The final
    global count is a single-row aggregate (partial counts combine
    map-side).

    user_id IS NOT NULL (r13): anonymous events pooled into one
    pseudo-user, fabricating cross-actor conversions (mirrored in the
    oracle)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)
    per_user = staged.groupBy("user_id").agg(
        F.min("t_view").alias("t_view"),
        F.min("t_click").alias("t_click"),
        F.min("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
    )


@register(
    "q_retention_cohort",
    oracle="""
    WITH weeks AS (
        -- an undated event is not activity: a NULL ts would mint a
        -- (cohort, NULL offset) bucket, and a NULL-ts-only user a
        -- (NULL, NULL) cohort of size 1 (review r11)
        -- user_id IS NOT NULL (r13): the pooled anonymous bucket read
        -- as one eternally-retained user — a NULL key is not an entity
        SELECT user_id, date_trunc('week', ts) AS wk
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2
    ), w2 AS (
        SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS cohort_wk
        FROM weeks
    )
    SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
           ((epoch_us(wk) - epoch_us(cohort_wk)) // 604800000000)::BIGINT AS week_offset,
           count(*)::BIGINT AS n_active
    FROM w2 GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-active week,
    counted in every later week they return. The classic growth query a
    training-data engine's event sink must answer.

    Plan: distinct (user, week) FIRST — collapses the fact table to at
    most |users|×|weeks| rows before any window — then a user-partitioned
    window for the cohort week, then the small (cohort, offset) agg.
    Week arithmetic is exact integer µs (week starts are 604800e6-aligned
    after date_trunc), so no float rounding can split a cohort."""
    e = load_table(spark, sf_dir, "events")
    weeks = (
        # undated events are not activity; anonymous (NULL-user) events
        # are not an entity — the pooled bucket cohorted as one
        # eternally-retained user (r13, mirrored in the oracle)
        e.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", F.date_trunc("week", "ts").alias("wk"))
        .distinct()
    )
    w = Window.partitionBy("user_id")
    w2 = weeks.withColumn("cohort_wk", F.min("wk").over(w))
    offset_us = F.unix_micros("wk") - F.unix_micros("cohort_wk")
    return (
        w2.groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (offset_us / F.lit(604800000000)).cast("bigint").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "q_argmax_events",
    oracle="""
    -- cents guard mirrors functions/money.to_fixed: NaN/Inf/overflow ->
    -- NULL (a raw round()::BIGINT would RAISE here while Spark's ANSI-off
    -- cast silently crowned a garbage winner — review r11)
    WITH c AS (
        SELECT event_type, event_id,
               CASE WHEN value IS NOT NULL AND NOT isnan(value)
                         AND abs(value) < 92233720368547758.0
                    THEN round(value * 100)::BIGINT END AS cents
        FROM events
    )
    SELECT event_type,
           arg_max(event_id, cents * 100000000 + event_id)::BIGINT
               AS top_event_id,
           arg_min(event_id, cents * 100000000 + event_id)::BIGINT
               AS bottom_event_id,
           round(max(cents) / 100.0, 2) AS max_value,
           count(*)::BIGINT AS n
    FROM c
    GROUP BY event_type
    """,
)
def q_argmax_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremum aggregation (max_by / min_by): the event carrying the
    extreme value per type — a pure hash-aggregate, no sort and no window
    (contrast q_lateral_topk's rank-window top-N).

    Ties are broken exactly: the ordering key packs fixed-point cents and
    the unique event_id into one BIGINT ((cents << ~27b) + id), so max_by
    is total-ordered and engine-portable — never argmax over raw doubles,
    whose ties would be resolved by arrival order. Packing bound: |id| <
    1e8 and |value| < 9e8, asserted nowhere because the synthetic domain
    is ~1e6/1e3; a production deployment would widen to a struct key."""
    e = load_table(spark, sf_dir, "events")
    # to_fixed, not a raw round().cast: NaN became cents 0 (competing as
    # 0.00 in min_by), and +/-Inf or a huge finite value clamped to
    # Long.MAX whose *1e8 packing wraps NEGATIVE — silently crowning the
    # wrong winner where the oracle raises (review r11)
    cents = to_fixed("value")
    key = cents * F.lit(100000000) + F.col("event_id")
    return e.groupBy("event_type").agg(
        F.max_by("event_id", key).cast("bigint").alias("top_event_id"),
        F.min_by("event_id", key).cast("bigint").alias("bottom_event_id"),
        F.round(F.max(cents) / F.lit(100.0), 2).alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_event_gap_stats",
    oracle="""
    WITH g AS (
        -- user_id IS NOT NULL (r13): a NULL key is not an entity — the
        -- pooled anonymous bucket lag-chained UNRELATED actors' events
        -- into fabricated inter-event gaps (oracle-mirrored; the r11
        -- NULL-ts rule applied to the partition key)
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST) AS gap_us
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT user_id,
           count(gap_us)::BIGINT AS n_gaps,
           -- exact-rational rounding (r13, generated): round() on the
           -- double quotient splits the engines at knife edges
           __AVG_GAP__ AS avg_gap_s,
           max(gap_us)::BIGINT AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1
    """.replace(
        "__AVG_GAP__",
        oracle_round_ratio_sql("sum(gap_us)", "count(gap_us) * 1000000", 6),
    ),
)
def q_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user (lag over a total order) — the
    dwell-time / liveness profile behind sessionization threshold tuning.

    One Exchange on user_id serves both the lag window and the groupBy
    (same key — Catalyst reuses the partitioning). Gaps are exact integer
    µs; the average's two divisions are performed in the same order as
    the oracle so the double is bit-identical.

    user_id IS NOT NULL (r13): anonymous events share one NULL bucket,
    which lag-chained unrelated actors into fake gaps — a NULL key is
    not an entity (mirrored in the oracle)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # event_type tiebreak (r13, mirrored in the oracle): (ts, event_id)
    # is not total when two NULL event_ids share a timestamp
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    us = F.unix_micros("ts")
    gaps = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        # exact-rational rounding (r13, mirrored in the oracle)
        round_ratio_exact(
            F.sum("gap_us"), F.count("gap_us") * F.lit(1_000_000), 6
        ).alias("avg_gap_s"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@register(
    "q_scd2_snapshot",
    oracle="""
    WITH ordered AS (
        -- typed events only: a NULL event_type is not a state, and
        -- leaving it in conflated 'first row' with 'previous type was
        -- NULL' — the row AFTER a NULL-type event always re-emitted its
        -- unchanged state as a phantom A->A interval (review r11)
        SELECT user_id, event_type, ts, event_id,
               -- event_type tiebreak (r13): NULL-eid ts ties made the
               -- state chain shuffle-order-dependent
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS LAST, event_id NULLS LAST,
                                              event_type NULLS LAST) AS prev_type
        FROM events WHERE event_type IS NOT NULL
    ), changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts NULLS LAST, event_id NULLS LAST,
                                            event_type NULLS LAST),
                    '%Y-%m-%d %H:%M:%S') AS valid_to
    FROM changes
    """,
)
def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse an event stream
    into state intervals — a row per CHANGE of state with
    [valid_from, valid_to) bounds, open-ended for the current state. The
    temporal-table operator every warehouse load needs (and the batch
    analog of streaming state tracking).

    Both windows (change detection lag, interval-close lead) partition on
    user_id with the same total order, so Catalyst plans ONE Exchange and
    one sort for the whole query. Interval bounds render as formatted
    strings so parquet timestamp precision can't flip the hash."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()  # a NULL type is not a state
    )
    # event_type tiebreak (r13, mirrored in the oracle): (ts, event_id)
    # is not total when two NULL event_ids share a timestamp
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    changes = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias(
            "valid_to"
        ),
    )


@register(
    "q_zscore_normalize",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               -- count(value), not count(*): the numerator skips NULL
               -- cents, so a NULL-bearing group's mean was biased low in
               -- BOTH engines while stddev used only non-NULLs (r11)
               sum(round(value * 100)::BIGINT) / count(value) / 100.0 AS mean_v,
               stddev_samp(value) AS sd_v
        FROM events GROUP BY 1
    )
    -- IS NOT DISTINCT FROM (r13): the equality join silently dropped
    -- every NULL-type event (and the NULL group's stats) — the same
    -- null-unsafe-join class r11 fixed in q_chi_square
    SELECT e.event_id, e.event_type,
           round((e.value - s.mean_v) / nullif(s.sd_v, 0), 4) AS z
    FROM events e JOIN stats s ON e.event_type IS NOT DISTINCT FROM s.event_type
    """,
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score normalization: every event's value standardized
    against its type's mean/stddev — the feature-scaling pass before any
    model consumes the column.

    Two-pass shape done right at scale: the per-group stats aggregate is
    map-side-combined down to |groups| rows, then BROADCAST back onto the
    fact table — the alternative (a stats window over event_type) would
    re-shuffle every fact row onto 5 hot partitions. The mean is exact
    integer cents / n; stddev is the engines' numerically stable
    single-pass aggregate (cross-engine drift ~1e-12, absorbed by the
    4-digit rounding). A zero-variance group divides by nullif(sd,0) in
    BOTH engines so it yields NULL z on each side — without the guard
    Spark's Divide returns NULL but DuckDB (IEEE float division) returns
    ±Inf, and the hashes would diverge on a constant-valued group."""
    e = load_table(spark, sf_dir, "events")
    cents = to_fixed("value")
    stats = e.groupBy("event_type").agg(
        # divide by the rows the numerator kept (avg_fixed's r11 rule) —
        # count(*) biased every NULL-bearing group's mean low while
        # stddev_samp used only the non-NULL population
        (F.sum(cents) / F.count(cents) / F.lit(100.0)).alias(
            "mean_v"
        ),
        F.stddev_samp("value").alias("sd_v"),
    )
    # eqNullSafe (r13, mirrored in the oracle): the bare equality join
    # dropped every NULL-type event from a feature-scaling pass whose
    # contract is row-aligned output — the q_chi_square r11 class
    stats = stats.withColumnRenamed("event_type", "__st")
    return (
        e.join(F.broadcast(stats), F.col("event_type").eqNullSafe(F.col("__st")))
        .select(
            "event_id",
            "event_type",
            F.round(
                (F.col("value") - F.col("mean_v"))
                / F.nullif(F.col("sd_v"), F.lit(0.0)),
                4,
            ).alias("z"),
        )
    )


@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               -- event_type tiebreak (r13): NULL-eid ts ties
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS LAST, event_id NULLS LAST,
                                              event_type NULLS LAST) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n,
           -- exact-rational rounding (r13, generated)
           __P_NEXT__ AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """.replace(
        "__P_NEXT__",
        oracle_round_ratio_sql(
            "count(*)", "sum(count(*)) OVER (PARTITION BY prev_type)", 6
        ),
    ),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (prev → next counts and conditional probabilities) — the sequence-
    mining aggregate behind journey analysis and next-action models.

    Transitions are minted by one lag window on user_id; the count keys on
    a |types|² = 25-cell matrix (partial combine makes the key skew
    irrelevant); the row-conditional probability is a window over the
    25-row AGGREGATE, not the fact table. p_next's division is one IEEE
    op on exact BIGINTs, ordered identically in the oracle."""
    e = load_table(spark, sf_dir, "events")
    # event_type tiebreak (r13, mirrored in the oracle): (ts, event_id)
    # is not total when two NULL event_ids share a timestamp
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        # exact-rational rounding (r13, mirrored in the oracle)
        round_ratio_exact(F.col("n"), F.sum("n").over(wrow), 6).alias(
            "p_next"
        ),
    )


@register(
    "q_cumulative_distinct",
    oracle="""
    WITH e AS (
        -- a NULL timestamp has no activity day: the NULL-day spine row
        -- would ride the global running-sum window, whose NULL placement
        -- differs per engine (and is unstable inside DuckDB's window)
        -- user_id IS NOT NULL too (r13): the pooled anonymous bucket
        -- minted one phantom 'new user' — a NULL key is not an entity
        SELECT * FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ), days AS (
        SELECT DISTINCT date_trunc('day', ts) AS day FROM e
    ), u AS (
        SELECT user_id, min(date_trunc('day', ts)) AS day FROM e GROUP BY 1
    ), p AS (
        SELECT user_id, event_type, min(date_trunc('day', ts)) AS day
        FROM e GROUP BY 1, 2
    ), nu AS (
        SELECT day, count(*)::BIGINT AS new_users FROM u GROUP BY 1
    ), np AS (
        SELECT day, count(*)::BIGINT AS new_pairs FROM p GROUP BY 1
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           coalesce(nu.new_users, 0)::BIGINT AS new_users,
           (sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day))::BIGINT
               AS cum_users,
           coalesce(np.new_pairs, 0)::BIGINT AS new_pairs,
           (sum(coalesce(np.new_pairs, 0)) OVER (ORDER BY d.day))::BIGINT
               AS cum_pairs
    FROM days d LEFT JOIN nu USING (day) LEFT JOIN np USING (day)
    """,
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding distinct counts — per activity day, how many NEVER-seen
    users and (user, event_type) pairs appeared, and the running totals.
    The growth-curve / vocabulary-saturation operator (for a corpus: new
    domains or new n-grams per ingest day).

    A naive `count(DISTINCT x) OVER (ORDER BY day)` is quadratic state;
    this is the scale formulation: distinct-ness collapses to ONE row per
    entity (min first-seen day — a plain partial-aggregable min keyed on
    the entity), daily counts aggregate that tiny set, and the running
    sum runs over the DAILY aggregate — bounded by the calendar (≤ a few
    thousand rows at any corpus size), so the single-partition global
    window is a deliberate non-cost, not a skew hazard. Every fact-sized
    shuffle keys on the entity id (uniform); ints throughout."""
    e = (
        load_table(spark, sf_dir, "events")
        # NULL-user events are not an entity (r13) — the pooled bucket
        # counted as one phantom new user on its first day
        .filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select(F.date_trunc("day", "ts").alias("day"), "user_id", "event_type")
    )
    days = e.select("day").distinct()
    # ONE fact pass feeds both entity families: per-(user, type) first-seen
    # days are the finer aggregate, and a user's first-seen day is the MIN
    # over their pairs' first-seen days — so nu derives from the tiny
    # `pairs` frame instead of re-scanning the fact (review r11: 3
    # FileScans -> 2; the checkpoint stops the two consumers re-running
    # the shared groupBy lineage, the q15/q17 pattern)
    pairs = (
        e.groupBy("user_id", "event_type")
        .agg(F.min("day").alias("day"))
        .localCheckpoint(eager=False)
    )
    nu = (
        pairs.groupBy("user_id").agg(F.min("day").alias("day"))
        .groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    )
    np_ = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("new_pairs"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(nu, "day", "left")
        .join(np_, "day", "left")
        .select(
            "day",
            F.coalesce("new_users", F.lit(0)).alias("new_users"),
            F.coalesce("new_pairs", F.lit(0)).alias("new_pairs"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
            "new_pairs",
            F.sum("new_pairs").over(w).alias("cum_pairs"),
        )
    )


@register(
    "q_mad_anomaly",
    oracle="""
    WITH e AS (
        SELECT event_type, round(value * 100)::BIGINT AS cents FROM events
    ), med AS (
        SELECT event_type, quantile_cont(cents, 0.5) AS m50 FROM e GROUP BY 1
    ), dev AS (
        -- IS NOT DISTINCT FROM (r13): the equality joins silently
        -- dropped the NULL-type group — its median/MAD were computed
        -- then discarded, leaving untyped events with no fence at all
        SELECT e.event_type, abs(e.cents - m.m50) AS dev
        FROM e JOIN med m ON e.event_type IS NOT DISTINCT FROM m.event_type
    ), mad AS (
        SELECT event_type, quantile_cont(dev, 0.5) AS d50 FROM dev GROUP BY 1
    )
    SELECT dv.event_type,
           m.m50 / 100.0 AS median_v,
           a.d50 / 100.0 AS mad_v,
           count(*)::BIGINT AS n_events,
           sum(CASE WHEN dv.dev > 3 * a.d50 THEN 1 ELSE 0 END)::BIGINT
               AS n_anomalies
    FROM dev dv
    JOIN mad a ON dv.event_type IS NOT DISTINCT FROM a.event_type
    JOIN med m ON dv.event_type IS NOT DISTINCT FROM m.event_type
    GROUP BY 1, m.m50, a.d50
    """,
)
def q_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: per event type, the median and the
    median-absolute-deviation (MAD) of value, and how many events sit
    beyond the 3×MAD fence — the outlier filter that, unlike z-scores
    (q_zscore_normalize), is itself immune to the outliers it hunts.

    Both medians are EXACT at scale via the counts-first percentile
    operator (operators/percentile.py): shuffle volume is distinct
    (group, value) pairs, never raw rows — F.percentile/median would
    buffer whole groups on single reducers. Stats reduce to |groups| rows
    and broadcast back twice; the fence itself is exact arithmetic: cents
    are ints, the median is a half-integer, deviations are half-integers,
    MAD is a quarter-integer, and 3×MAD stays exactly representable — so
    the > comparison cannot flip between engines and no rounding margin
    is needed anywhere."""
    from ..operators.percentile import exact_percentiles

    # dev feeds mad AND the final agg: checkpoint it so its scan +
    # broadcast-join lineage runs once, not once per consumer (was 4
    # events FileScans per execution; now 2 — med's own pruned scan of
    # the 2-column projection is cheaper than materializing the full
    # fact, so e itself stays un-checkpointed).
    e = load_table(spark, sf_dir, "events").select(
        "event_type", to_fixed("value").alias("cents")
    )
    med = exact_percentiles(e, ["event_type"], "cents", [0.5], out_prefix="m").select(
        "event_type", F.col("m50")
    )
    # eqNullSafe joins (r13, mirrored in the oracle): equality joins
    # dropped the NULL-type group whose median/MAD were just computed —
    # untyped events (the population most likely malformed) had no fence
    med = med.withColumnRenamed("event_type", "__mt")
    dev = (
        e.join(F.broadcast(med), F.col("event_type").eqNullSafe(F.col("__mt")))
        .select(
            "event_type", "m50", F.abs(F.col("cents") - F.col("m50")).alias("dev")
        )
        .localCheckpoint(eager=False)
    )
    mad = exact_percentiles(dev, ["event_type"], "dev", [0.5], out_prefix="d").select(
        F.col("event_type").alias("__at"), F.col("d50")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type").eqNullSafe(F.col("__at")))
        .groupBy("event_type", "m50", "d50")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("d50"), 1).otherwise(0)
            ).alias("n_anomalies"),
        )
        .select(
            "event_type",
            (F.col("m50") / F.lit(100.0)).alias("median_v"),
            (F.col("d50") / F.lit(100.0)).alias("mad_v"),
            "n_events",
            "n_anomalies",
        )
    )


@register(
    "q_pagerank",
    oracle="""
    WITH seq AS (
        SELECT event_type AS next,
               -- event_type tiebreak (r13): NULL-eid ts ties
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS LAST, event_id NULLS LAST,
                                              event_type NULLS LAST) AS prev
        FROM events
    ), edges AS (
        SELECT prev AS src, next AS dst, count(*)::DOUBLE AS w
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
        SELECT count(*)::DOUBLE AS n FROM nodes
    ), norm AS (
        SELECT e.src, e.dst, e.w / sum(e.w) OVER (PARTITION BY e.src) AS p
        FROM edges e
    ), r0 AS (
        SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes
    ), r1 AS (
        SELECT nd.node,
               0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(sum(r0.r * m.p), 0) AS r
        FROM nodes nd
        LEFT JOIN norm m ON m.dst = nd.node
        LEFT JOIN r0 ON r0.node = m.src
        GROUP BY 1
    ), r2 AS (
        SELECT nd.node,
               0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(sum(r1.r * m.p), 0) AS r
        FROM nodes nd
        LEFT JOIN norm m ON m.dst = nd.node
        LEFT JOIN r1 ON r1.node = m.src
        GROUP BY 1
    ), r3 AS (
        SELECT nd.node,
               0.15 / (SELECT n FROM nn)
               + 0.85 * coalesce(sum(r2.r * m.p), 0) AS r
        FROM nodes nd
        LEFT JOIN norm m ON m.dst = nd.node
        LEFT JOIN r2 ON r2.node = m.src
        GROUP BY 1
    )
    SELECT node AS event_type, round(r, 6) AS pagerank FROM r3
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the event-type transition graph (edges =
    q_event_transitions' Markov counts): which states the per-user event
    streams gravitate toward. The second ITERATIVE graph operator after
    connected components — power iteration as a driver loop over
    DataFrame rounds (operators/graph.py:pagerank), the shape GraphX/
    Pregel users port to DataFrames.

    3 fixed rounds, damping 0.85, no dangling redistribution (every
    observed type has outgoing transitions). Each round shuffles on the
    node id twice (join ranks→edges, re-agg by dst) with localCheckpoint
    truncating lineage — at 100 TB node count, the same loop holds; only
    round count grows with desired convergence. The oracle unrolls the
    identical three rounds as chained CTEs. Contribution sums are IEEE
    doubles in engine order — ~1 ulp drift, absorbed by round(6) (the
    repo's accepted-drift convention for non-fixed-point float aggs)."""
    from ..operators.graph import pagerank

    e = load_table(spark, sf_dir, "events")
    # event_type tiebreak (r13, mirrored in the oracle): (ts, event_id)
    # is not total when two NULL event_ids share a timestamp
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    edges = (
        e.select(
            F.col("event_type").alias("dst_t"),
            F.lag("event_type").over(w).alias("src_t"),
        )
        .filter(F.col("src_t").isNotNull())
        .groupBy("src_t", "dst_t")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, src="src_t", dst="dst_t", weight="w", iters=3)
    return ranks.select(
        F.col("node").alias("event_type"), F.round("r", 6).alias("pagerank")
    )


@register(
    "q_chi_square",
    oracle="""
    WITH obs AS (
        SELECT event_type, (user_id % 4)::BIGINT AS segment,
               count(*)::BIGINT AS o
        FROM events GROUP BY 1, 2
    ),
    rows_ AS (SELECT event_type, sum(o)::BIGINT AS r FROM obs GROUP BY 1),
    cols_ AS (SELECT segment, sum(o)::BIGINT AS c FROM obs GROUP BY 1),
    tot AS (SELECT sum(o)::BIGINT AS n FROM obs),
    grid AS (
        SELECT rw.event_type, cl.segment, rw.r, cl.c, t.n,
               coalesce(ob.o, 0) AS o
        FROM rows_ rw CROSS JOIN cols_ cl CROSS JOIN tot t
        LEFT JOIN obs ob
          -- null-safe: a NULL event_type or NULL segment is a real
          -- marginal category (rows_/cols_ group it), and the plain
          -- equality could never re-match its observed cells — their
          -- mass counted in r, c, n but o fell to 0, inflating chi2 by
          -- the full expected mass of every NULL-keyed cell (review r11)
          ON ob.event_type IS NOT DISTINCT FROM rw.event_type
         AND ob.segment IS NOT DISTINCT FROM cl.segment
    )
    SELECT round(sum(pow(o - r * c / CAST(n AS DOUBLE), 2)
                     / (r * c / CAST(n AS DOUBLE))), 4) AS chi2,
           -- dof counts the NULL categories too (r13): count(DISTINCT)
           -- skips NULL in both engines, but the chi2 sum above
           -- deliberately includes the NULL rows/columns (r11 grid fix)
           -- — excluding them from dof made the (chi2, dof) pair
           -- statistically inconsistent
           ((count(DISTINCT event_type)
             + max(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) - 1)
            * (count(DISTINCT segment)
               + max(CASE WHEN segment IS NULL THEN 1 ELSE 0 END) - 1)
           )::BIGINT AS dof,
           max(n)::BIGINT AS n
    FROM grid
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × user segment — the
    distributed contingency-table statistic a curation pipeline uses to
    detect behavioral drift between cohorts.

    Plan: ONE data-proportional pass (the partial-aggregated groupBy to
    observed cell counts); every downstream step — marginals, the full
    R×C grid (explicit, so structurally-zero cells contribute their
    expected mass), the statistic — runs on |R|·|C| rows via broadcast
    joins. The cell-count frame is lazily localCheckpointed so the four
    consumers (marginals ×2, total, grid) share ONE events scan instead
    of each re-deriving it — plan-test-pinned. At 100 TB the cost is the
    one events shuffle, nothing else grows with data volume."""
    e = load_table(spark, sf_dir, "events")
    obs = (
        e.groupBy(
            "event_type", F.expr("user_id % 4").cast("long").alias("segment")
        )
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    rows_ = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    cols_ = obs.groupBy("segment").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    # null-safe re-match (mirrors the oracle's IS NOT DISTINCT FROM):
    # NULL-keyed cells' mass is in the marginals, so the grid must find
    # their observed counts too
    ob2 = obs.select(
        F.col("event_type").alias("__ot"),
        F.col("segment").alias("__os"),
        "o",
    )
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(
            ob2,
            F.col("event_type").eqNullSafe(F.col("__ot"))
            & F.col("segment").eqNullSafe(F.col("__os")),
            "left",
        )
        .withColumn("o", F.coalesce("o", F.lit(0)))
        .drop("__ot", "__os")
    )
    exp = F.col("r") * F.col("c") / F.col("n").cast("double")
    # dof counts NULL categories (r13, mirrored in the oracle): the chi2
    # sum includes the NULL rows/columns, so dof must count them —
    # countDistinct skips NULLs in both engines
    n_types = F.countDistinct("event_type") + F.max(
        F.when(F.col("event_type").isNull(), 1).otherwise(0)
    )
    n_segs = F.countDistinct("segment") + F.max(
        F.when(F.col("segment").isNull(), 1).otherwise(0)
    )
    return grid.agg(
        F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 4).alias("chi2"),
        ((n_types - 1) * (n_segs - 1)).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n"),
    )


@register(
    "q_streaks",
    oracle="""
    WITH days AS (
        -- an undated event is not an active day: the NULL day_no row
        -- formed a length-1 NULL island, inflating n_active_days (and a
        -- NULL-ts-only user reported best_streak 1 from zero real days)
        SELECT DISTINCT user_id,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS day_no
        FROM events WHERE ts IS NOT NULL
    ),
    islands AS (
        SELECT user_id, day_no,
               day_no - row_number() OVER (PARTITION BY user_id
                                           ORDER BY day_no) AS island
        FROM days
    ),
    runs AS (
        SELECT user_id, island, count(*)::BIGINT AS len
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           max(len)::BIGINT AS best_streak,
           sum(len)::BIGINT AS n_active_days
    FROM runs GROUP BY user_id
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern (day_number − row_number is constant within a
    consecutive run), the engagement metric every retention dashboard
    needs.

    Plan: dedup to (user, day) first — the window then runs over at most
    users × days rows, not raw events — and the row_number partitions by
    user, so no global sort and no hot key (each user's partition is tiny).
    At 100 TB the only data-proportional step is the distinct; everything
    after operates on the bounded activity-calendar."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()  # undated events are not active days
    )
    days = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_no"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_no")
    runs = (
        days.withColumn("island", F.col("day_no") - F.row_number().over(w))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("best_streak"),
        F.sum("len").cast("long").alias("n_active_days"),
    )


@register(
    "q_mode_per_group",
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*)::BIGINT AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event_type, n AS n_mode
    FROM counts
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type NULLS LAST) = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent event_type per user).
    Built-in ``mode()`` breaks ties arbitrarily — useless under an oracle
    and non-reproducible across runs — so the mode is counts + a total
    order (count DESC, value ASC). Plan: partial-aggregated count, then a
    WindowGroupLimit rank over the tiny per-user count list."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # tiebreak pins NULLS LAST on both engines: on an exact tie between a
    # NULL event_type and a real one, Spark's asc default (NULLS FIRST)
    # would crown NULL the mode while DuckDB picks the real value
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").alias("n_mode"),
        )
    )


@register(
    "q_recursive_reachability",
    oracle="""
    WITH RECURSIVE e AS (
        SELECT DISTINCT src, dst FROM (
            SELECT event_type AS src,
                   -- event_type tiebreak (r13): NULL-eid ts ties
                   lead(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts NULLS LAST, event_id NULLS LAST,
                                                   event_type NULLS LAST) AS dst
            FROM events
        ) WHERE dst IS NOT NULL AND src <> dst
    ),
    reach(node, hops) AS (
        SELECT 'signup', 0
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN e ON e.src = r.node
        WHERE r.hops < 4
    )
    SELECT node, min(hops)::BIGINT AS min_hops
    FROM reach GROUP BY node
    """,
)
def q_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS reachability through the observed event-type transition graph
    (which states can follow 'signup', and in how few steps) via Spark 4's
    recursive CTE — the SQL-standard fixpoint the engine previously only
    offered as the driver-loop iterate primitive (operators/graph.py).

    Scale split: the ONE data-proportional step is deriving the edge set
    (a per-user lead window, then DISTINCT collapses to ≤|event types|²
    rows); the recursion itself iterates over the collapsed graph, so its
    cost is bounded by graph size × hop cap, never by event volume. The
    hop bound also makes the UNION ALL recursion terminate on cyclic
    graphs — min(hops) afterwards recovers BFS depth from the walk
    expansion."""
    e = load_table(spark, sf_dir, "events")
    # event_type tiebreak (r13, mirrored in the oracle): (ts, event_id)
    # is not total when two NULL event_ids share a timestamp
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("event_type").asc_nulls_last(),
    )
    edges = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        # materialize the collapsed graph once: without this the recursion
        # re-runs the events window per hop (measured 1.84 s → 0.2 s)
        .localCheckpoint(eager=False)
    )
    edges.createOrReplaceTempView("wod_transition_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, hops) AS (
            SELECT 'signup', 0
            UNION ALL
            SELECT e.dst, r.hops + 1
            FROM reach r JOIN wod_transition_edges e ON e.src = r.node
            WHERE r.hops < 4
        )
        SELECT node, CAST(min(hops) AS BIGINT) AS min_hops
        FROM reach GROUP BY node
        """
    )
