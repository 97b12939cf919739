"""Time-series operators — gap-filled resampling, time-range rolling
windows, session concurrency.

The regular-grid half of event analytics (queries/events_analytics.py is
the irregular half): downsample to a daily grid with forward fill, roll
aggregates over wall-clock ranges rather than row counts, and project
interval overlap onto bucketed load curves. Everything keys its shuffles
on ``user_id`` or a time bucket — bounded, uniform, 100 TB-safe; spines
are minted map-side with ``sequence`` (never a driver-side date loop).

Determinism: grid points come from exact date_trunc'd timestamps, "last
value of the day" is a row_number over a total order (never ``last()``
arrival order), and rolling sums use integer-cents fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import sum_fixed, to_fixed
from ..io import load_table
from ..plans.flagship import GAP_SECONDS
from ..queries_registry import register


def _daily_revenue(e: DataFrame) -> DataFrame:
    """Shared (event_type, day_x, rev) daily series for the trend queries
    (q_linreg_trend, q_autocorr). ``rev`` is the order-free fixed-point
    sum — a plain round(sum(double)) is knife-edge across partial-agg
    orders the moment values carry more than 2 decimals. NULL timestamps
    have no day: the NULL-day row would ride q_autocorr's lag chain at an
    engine-dependent (and DuckDB-unstable) position."""
    return e.filter(F.col("ts").isNotNull()).groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_x"),
    ).agg(F.round(sum_fixed("value"), 4).alias("rev"))


@register(
    "q_resample_ffill",
    oracle="""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS day, value
        FROM events
        -- value tiebreak (r13): (ts, event_id) is not total when two
        -- NULL event_ids share a timestamp — 'last value of the day'
        -- then depended on shuffle arrival order
        QUALIFY row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                   ORDER BY ts DESC NULLS LAST,
                                            event_id DESC NULLS LAST,
                                            value DESC NULLS LAST) = 1
    ), bounds AS (
        SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ), spine AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM bounds
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           round(last_value(round(d.value * 100)::BIGINT IGNORE NULLS) OVER (
                     PARTITION BY s.user_id ORDER BY s.day
                     ROWS UNBOUNDED PRECEDING) / 100.0,
                 2) AS value_ffill
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample an irregular event stream to a per-user DAILY grid and
    forward-fill gaps with the last observed value — the gap-filling
    operator behind every time-series feature table.

    The grid is minted with ``sequence(min_day, max_day)`` per user —
    map-side after a tiny per-user bounds agg, never a driver loop or a
    calendar cross join (a global spine × users cross join would be
    |days|·|users| rows BEFORE pruning; per-user sequences materialize
    only the rows that exist). All three stages (daily last-value, spine,
    forward-fill window) shuffle on user_id alone. "Last value of the
    day" is row_number over (ts, event_id) DESC — a total order."""
    e = load_table(spark, sf_dir, "events")
    wday = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc(),
        # value tiebreak (r13, mirrored in the oracle) — NULL-eid ts ties
        F.col("value").desc_nulls_last(),
    )
    # daily feeds both the per-user bounds aggregate (spine) and the grid
    # join: checkpoint the small one-row-per-(user, day) frame so the
    # events scan + dedup window run once per execution, not once per
    # consumer (2 FileScans, 0 ReusedExchange before — the q15/q17 class)
    daily = (
        e.select("user_id", F.date_trunc("day", "ts").alias("day"), "ts",
                 "event_id", "value")
        .withColumn("rn", F.row_number().over(wday))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", to_fixed("value").alias("cents"))
        .localCheckpoint(eager=False)
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.last("cents", ignorenulls=True).over(wfill) / F.lit(100.0), 2
            ).alias("value_ffill"),
        )
    )


@register(
    "q_rolling_range",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           round(sum(round(value * 100)::BIGINT) OVER (
                     PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 / 100.0,
                 2) AS rolling_1h
    FROM events
    """,
)
def q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour sum per user — a RANGE frame over WALL-CLOCK time,
    not row counts (q_window_frames covers ROWS frames): each row sums
    every event in its trailing hour, however many rows that is.

    Spark range frames need a numeric ordering column, so the frame is
    [unix_micros − 3600e6, unix_micros] — exactly DuckDB's
    ``RANGE INTERVAL 1 HOUR PRECEDING``. Equal-timestamp peers are IN the
    frame in both engines (range semantics), so no tiebreak is needed for
    the sum itself; event_id merely labels output rows. One Exchange on
    user_id; summands are integer cents."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round(F.sum(to_fixed("value")).over(w) / F.lit(100.0), 2).alias(
            "rolling_1h"
        ),
    )


@register(
    "q_session_concurrency",
    # gap interpolated from plans/flagship.GAP_SECONDS (r13 — hardcoded
    # 1800 was the oracle-constant drift class)
    oracle=f"""
    WITH marked AS (
        -- user_id IS NOT NULL (r13): ALL anonymous events sessionized as
        -- ONE pseudo-user (unrelated actors chained into single
        -- sessions), and count(DISTINCT user_id) then skipped the NULL —
        -- emitting impossible hours with active_sessions >= 1 and
        -- active_users = 0. A NULL key is not an entity.
        SELECT user_id, ts, event_id,
               -- row_number = 1, not lag IS NULL (same r11 rule as
               -- q_sessionize_events: trailing NULL-ts rows join the
               -- last session instead of each opening a phantom one)
               CASE WHEN row_number() OVER w = 1
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST)
    ), sess AS (
        SELECT user_id,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS session_id,
               ts
        FROM marked
    ), intervals AS (
        SELECT user_id, session_id,
               date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM sess GROUP BY 1, 2
    ), hours AS (
        SELECT user_id, session_id,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM intervals
    )
    SELECT strftime(hour, '%Y-%m-%d %H:00') AS hour,
           count(*)::BIGINT AS active_sessions,
           count(DISTINCT user_id)::BIGINT AS active_users
    FROM hours GROUP BY 1
    """,
)
def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session load curve: 30-minute-gap sessions (the flagship
    sessionizer's semantics) projected onto hourly buckets — how many
    sessions and users were active each hour. The capacity-planning view
    of interval overlap, O(sessions × span-hours) instead of the
    O(sessions²) interval self-join.

    Session detection shuffles on user_id (shared lag + running-sum
    window); the hour expansion is a map-side ``sequence`` explode over
    each session's [first, last] hour; the final agg keys on the hour
    bucket — time-uniform by construction."""
    # NULL-user events are not an entity (r13, mirrored in the oracle):
    # the pooled bucket chained unrelated anonymous actors into single
    # sessions that count_distinct then ignored (active_users = 0 rows)
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last())
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    marked = e.select("user_id", "ts", "event_id").withColumn(
        # row_number = 1, not lag IS NULL — the r11 trailing-NULL rule
        "is_new",
        F.when(
            (F.row_number().over(w) == 1) | (gap_us > GAP_SECONDS * 1_000_000), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = intervals.select(
        "user_id",
        "session_id",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias(
            "hour"
        ),
    )
    return hours.groupBy(
        F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("active_sessions"),
        F.count_distinct("user_id").alias("active_users"),
    )


@register(
    "q_ewma",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts, round(value * 100)::BIGINT AS cents
        FROM events
    )
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           (((((((
             cents * 1.0
             + coalesce(lag(cents, 1) OVER w * 0.5, 0))
             + coalesce(lag(cents, 2) OVER w * 0.25, 0))
             + coalesce(lag(cents, 3) OVER w * 0.125, 0))
             + coalesce(lag(cents, 4) OVER w * 0.0625, 0))
             + coalesce(lag(cents, 5) OVER w * 0.03125, 0))
             + coalesce(lag(cents, 6) OVER w * 0.015625, 0))
             + coalesce(lag(cents, 7) OVER w * 0.0078125, 0))
           / ((((((((
             1.0
             + CASE WHEN lag(cents, 1) OVER w IS NULL THEN 0 ELSE 0.5 END)
             + CASE WHEN lag(cents, 2) OVER w IS NULL THEN 0 ELSE 0.25 END)
             + CASE WHEN lag(cents, 3) OVER w IS NULL THEN 0 ELSE 0.125 END)
             + CASE WHEN lag(cents, 4) OVER w IS NULL THEN 0 ELSE 0.0625 END)
             + CASE WHEN lag(cents, 5) OVER w IS NULL THEN 0 ELSE 0.03125 END)
             + CASE WHEN lag(cents, 6) OVER w IS NULL THEN 0 ELSE 0.015625 END)
             + CASE WHEN lag(cents, 7) OVER w IS NULL THEN 0 ELSE 0.0078125 END)
             * 100.0) AS ewma
    FROM e
    -- cents tiebreak (r13): (ts, event_id) is not total when two NULL
    -- event_ids share a timestamp — the lag chain then depends on
    -- shuffle arrival order
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts NULLS LAST, event_id NULLS LAST, cents NULLS LAST)
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α=0.5) of each user's value
    stream over the last 8 observations — the smoothing operator behind
    rate limiting, trend features, and anomaly baselines.

    The recursive EWMA (yₜ = α·xₜ + (1-α)·yₜ₋₁) is sequential state; the
    scale formulation truncates the geometric tail at 8 terms (weight
    < 0.4% beyond that) so it becomes 8 ``lag`` reads over ONE per-user
    window — a single Exchange + Sort, no self-join, no state carried
    across rows. α=½ is chosen so every weight is an exact dyadic
    (2⁻ᵈ): weight·cents products and their partial sums are all
    exactly-representable doubles, making the whole expression
    bit-deterministic across engines with NO rounding margin — only the
    final division is a (deterministic) IEEE op."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", to_fixed("value").alias("cents")
    )
    # cents tiebreak (r13, mirrored in the oracle): two NULL-event_id
    # rows at one ts made the lag chain shuffle-order-dependent
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(),
        F.col("event_id").asc_nulls_last(),
        F.col("cents").asc_nulls_last(),
    )
    # Two-stage (r15 window-duplication sweep): each lag is referenced
    # TWICE below (num term + den presence test), and window expressions
    # extract per OCCURRENCE with no CSE — composed directly, the plan
    # carried 14 _we chains for 7 lags. Stage 1 materializes each lag
    # once as a Window output attribute; stage 2's arithmetic then reads
    # plain attributes (a Project above a Window node cannot be inlined
    # back into the extraction).
    staged = e.select(
        "user_id",
        "event_id",
        "ts",
        "cents",
        *[F.lag("cents", d).over(w).alias(f"lag_{d}") for d in range(1, 8)],
    )
    num = F.col("cents") * F.lit(1.0)
    den = F.lit(1.0)
    for d in range(1, 8):
        lagged = F.col(f"lag_{d}")
        num = num + F.coalesce(lagged * F.lit(0.5**d), F.lit(0))
        den = den + F.when(lagged.isNull(), F.lit(0)).otherwise(F.lit(0.5**d))
    return staged.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        (num / (den * F.lit(100.0))).alias("ewma"),
    )


@register(
    "q_linreg_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS day_x,
               round(sum(round(value * 100)::BIGINT) / 100.0, 4) AS rev
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type,
           round(regr_slope(rev, day_x), 6) AS slope,
           round(regr_intercept(rev, day_x), 4) AS intercept,
           round(regr_r2(rev, day_x), 6) AS r2,
           -- count(rev), not count(*): an all-NULL-value day yields a
           -- NULL rev row the regr_* aggregates skip — n_days must
           -- describe the fit's actual sample size (review r11)
           count(rev)::BIGINT AS n_days
    FROM daily GROUP BY event_type
    """,
)
def q_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series least-squares trend (slope / intercept / R²) of daily
    revenue — drift detection over time series, via the ANSI ``regr_*``
    aggregates both engines implement from the same closed form.

    Plan: one partial-aggregated pass to the daily series (the only
    data-proportional step; the daily sum is rounded BEFORE the regression
    so float summation order can't leak into the fit), then the regr_*
    co-moments aggregate |days| rows per series in a single reduce — at
    100 TB the regression itself touches thousands of rows, not billions."""
    daily = _daily_revenue(load_table(spark, sf_dir, "events"))
    return daily.groupBy("event_type").agg(
        F.round(F.expr("regr_slope(rev, day_x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(rev, day_x)"), 4).alias("intercept"),
        F.round(F.expr("regr_r2(rev, day_x)"), 6).alias("r2"),
        # the fit's true N: regr_* skip NULL-rev days (review r11)
        F.count("rev").alias("n_days"),
    )


@register(
    "q_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               (CAST(ts AS DATE) - DATE '1970-01-01') AS day_x,
               round(sum(round(value * 100)::BIGINT) / 100.0, 4) AS rev
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, rev,
               lag(rev) OVER (PARTITION BY event_type ORDER BY day_x) AS prev
        FROM daily
    )
    SELECT event_type,
           round(corr(rev, prev), 6) AS autocorr_1,
           -- pairs corr actually used: count(prev) alone counted pairs
           -- whose rev side is NULL, which corr skips (review r11)
           count(CASE WHEN rev IS NOT NULL AND prev IS NOT NULL
                      THEN 1 END)::BIGINT AS n_pairs
    FROM lagged GROUP BY event_type
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each daily revenue series — the
    self-similarity statistic behind seasonality checks and anomaly
    baselines, composed from the same co-moment aggregate as
    q_corr_stats applied to (value, lag(value)).

    Plan: the data-proportional pass is the daily partial-agg (rounded
    before the window so float sum order can't leak); lag + corr then run
    per series over |days| rows, one exchange keyed by series. Nothing
    downstream grows with event volume."""
    daily = _daily_revenue(load_table(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy("day_x")
    lagged = daily.withColumn("prev", F.lag("rev").over(w))
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("rev", "prev"), 6).alias("autocorr_1"),
        # pairs corr actually used — both sides non-NULL (review r11)
        F.count(F.when(F.col("rev").isNotNull() & F.col("prev").isNotNull(), 1)).alias(
            "n_pairs"
        ),
    )
