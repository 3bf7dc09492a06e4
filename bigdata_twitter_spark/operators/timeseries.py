"""Time-series / log-analytics operators (SURVEY.md §2.I) — the
reference's core surface: tweets-per-bucket, trending top-K, most
active users, sessionization, error-rate KPIs.

Reference parity: these are the canonical BigData-Twitter analytics
(tweets per minute, top hashtags, top tweeters) mapped onto the events
and documents fixtures (SURVEY.md §2.I; reference checkout empty —
§0.1).

Scale posture: all buckets are computed with ``window()``/date_trunc
(codegen, no UDF); top-K uses TakeOrderedAndProject; sessionization is
one shuffle on user_id plus two partition-local window passes (the
standard gap-and-island plan, which at 100 TB beats any
per-user-collect approach because state never leaves the executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..numerics import dsum, dsum_sql
from ..registry import query
from ..tables import load

SESSION_GAP_US = 1_800_000_000  # 30 minutes


@query(
    "ts_tumbling_counts",
    sql=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tables=("events",),
    scale_note=(
        "Tumbling buckets via window(): group key is (bucket, type) — "
        "two-phase agg, shuffle carries only group rows."
    ),
)
def ts_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events per hour per type (tweets-per-minute analog) via window()."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "ts_sliding_counts",
    sql="""
    SELECT TIMESTAMP '1970-01-01'
             + (900 * (epoch_us(ts) // 900000000) - 900 * k.k)
               * INTERVAL 1 SECOND AS window_start,
           event_type, COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
    GROUP BY 1, 2
    """,
    tables=("events",),
    scale_note=(
        "Sliding window = window(1h, 15m): each row lands in exactly 4 "
        "buckets (4x row expansion before the agg — slide/width ratio bounds "
        "the blowup; keep it small at 100 TB)."
    ),
)
def ts_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 15 min (each event in 4 windows).

    Oracle form: every event at time t belongs to the 4 aligned windows
    starting at 900s*floor(t/900s) - k*900s for k in 0..3, expressed as
    TZ-free timestamp arithmetic from the epoch.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query(
    "ts_sessionize_batch",
    sql=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                         > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ), numbered AS (
        SELECT user_id, ts, event_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM numbered
    GROUP BY user_id, session_id
    """,
    tables=("events",),
    scale_note=(
        "Gap-and-island: shuffle once on user_id, lag + running sum are "
        "partition-local, final agg reuses the same partitioning. State "
        "never accumulates on the driver."
    ),
)
def ts_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user: id, bounds, size, duration."""
    e = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_order))
    marked = e.withColumn(
        "brk", F.when(gap_us > SESSION_GAP_US, 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "session_id", F.sum("brk").over(w_run).cast("long")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@query(
    "trending_topk_terms",
    sql="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 10
    """,
    tables=("documents",),
    scale_note=(
        "The canonical Twitter trending query: explode → two-phase count → "
        "TakeOrderedAndProject top-10. Partial map-side counting means the "
        "shuffle carries vocab-sized data, not corpus-sized."
    ),
)
def trending_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens by frequency (trending hashtags/words analog)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(10)
    )


@query(
    "top_active_users",
    sql=f"""
    SELECT user_id, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id ASC
    LIMIT 10
    """,
    tables=("events",),
    scale_note="Top tweeters analog: agg then top-K; deterministic tiebreak on user_id.",
)
def top_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten most active users by event count."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(10)
    )


@query(
    "error_rate_per_day",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_total,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE)
             / COUNT(*) AS error_rate
    FROM events
    GROUP BY 1
    """,
    tables=("events",),
    scale_note="Conditional aggregation: one pass, one shuffle of day-sized groups.",
)
def error_rate_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate KPI (exact integer ratio → engine-stable double)."""
    e = load(spark, sf_dir, "events")
    n_err = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_total"),
            n_err.alias("n_errors"),
            (n_err.cast("double") / F.count("*")).alias("error_rate"),
        )
    )


@query(
    "ts_gap_fill",
    sql="""
    WITH b AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type
        FROM events
    ),
    r AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
    hrs AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS window_start
        FROM r
    ),
    t AS (SELECT DISTINCT event_type FROM b),
    c AS (SELECT h AS window_start, event_type, COUNT(*) AS n
          FROM b GROUP BY 1, 2)
    SELECT hrs.window_start, t.event_type,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n
    FROM hrs
    CROSS JOIN t
    LEFT JOIN c ON c.window_start = hrs.window_start
               AND c.event_type = t.event_type
    """,
    tables=("events",),
    scale_note=(
        "Gap filling: the dense (hour × type) grid is built from "
        "sequence()+explode over the observed range — grid-sized "
        "(hours × key cardinality), independent of input rows — then one "
        "broadcast-able left join against the hourly aggregate. No "
        "driver-side loop, no collect; a dashboard/forecasting "
        "prerequisite the raw groupBy can't provide (absent buckets)."
    ),
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts per event type with missing hours zero-filled over
    the global observed range."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = rng.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("window_start")
    )
    types = e.select("event_type").distinct()
    grid = hours.crossJoin(types)
    return grid.join(F.broadcast(hourly), ["window_start", "event_type"], "left").select(
        "window_start",
        "event_type",
        F.coalesce("cnt", F.lit(0).cast("bigint")).alias("n"),
    )


@query(
    "funnel_conversion",
    sql="""
    WITH c AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               MIN(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               MAX(ts) AS last_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.day,
           COUNT(*) AS n_click_users,
           COUNT(CASE WHEN p.last_purchase >= c.first_click THEN 1 END)
               AS n_converted,
           CAST(COUNT(CASE WHEN p.last_purchase >= c.first_click THEN 1 END)
                AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM c
    LEFT JOIN p ON p.user_id = c.user_id AND p.day = c.day
    GROUP BY c.day
    """,
    tables=("events",),
    scale_note=(
        "Two-stage funnel (click → same-day purchase after the click): "
        "both stages pre-aggregate to one row per (user, day) BEFORE "
        "the join — the join input is user-days, not raw events, and "
        "both sides share the (user_id, day) key so one shuffle serves "
        "filter-agg-join. The standard conversion readout over an "
        "event log at any scale."
    ),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click→purchase conversion: users whose last purchase of the
    day is at/after their first click of the day."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", day)
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", day)
        .agg(F.max("ts").alias("last_purchase"))
    )
    converted = F.count(
        F.when(F.col("last_purchase") >= F.col("first_click"), F.lit(1))
    )
    return (
        clicks.join(purchases, ["user_id", "day"], "left")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_click_users"),
            converted.alias("n_converted"),
            (converted.cast("double") / F.count("*")).alias("conversion_rate"),
        )
    )


@query(
    "ts_anomaly_zscore",
    sql="""
    WITH h AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, COUNT(*) AS cnt,
               SUM(n) AS s1, SUM(n * n) AS s2
        FROM h GROUP BY event_type
    )
    SELECT h.window_start, h.event_type, h.n,
           CASE WHEN s.cnt < 2 THEN NULL
                WHEN (CAST(s.s2 AS DOUBLE)
                      - (CAST(s.s1 AS DOUBLE) / s.cnt) * s.s1)
                     / (s.cnt - 1) = 0.0 THEN NULL
                ELSE (CAST(h.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.cnt)
                     / sqrt((CAST(s.s2 AS DOUBLE)
                             - (CAST(s.s1 AS DOUBLE) / s.cnt) * s.s1)
                            / (s.cnt - 1)) END AS zscore,
           CASE WHEN s.cnt < 2 THEN NULL
                WHEN (CAST(s.s2 AS DOUBLE)
                      - (CAST(s.s1 AS DOUBLE) / s.cnt) * s.s1)
                     / (s.cnt - 1) = 0.0 THEN NULL
                ELSE abs((CAST(h.n AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.cnt)
                         / sqrt((CAST(s.s2 AS DOUBLE)
                                 - (CAST(s.s1 AS DOUBLE) / s.cnt) * s.s1)
                                / (s.cnt - 1))) >= 2.0 END AS is_anomaly
    FROM h JOIN s USING (event_type)
    """,
    tables=("events",),
    scale_note=(
        "Volume-anomaly detection: hourly per-type counts scored "
        "against per-type mean/stddev DERIVED FROM EXACT BIGINT SUMS "
        "(sum, sum-of-squares), so the statistics are accumulation-"
        "order independent and the float z-score is one identical "
        "IEEE expression on both engines. Two tiny aggs + a broadcast "
        "join of the per-type stats — input-sized work is one pass."
    ),
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(hour, type) event-count z-scores; |z| >= 2 flags anomalies."""
    e = load(spark, sf_dir, "events")
    h = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n"))
    s = h.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = (F.col("s2").cast("double") - mean * F.col("s1")) / (
        F.col("cnt") - 1
    )
    # A 1-hour series (cnt < 2: Bessel /0) or an all-equal series
    # (var = 0) has no defined z — NULL, not an ANSI DIVIDE_BY_ZERO
    # job kill (r10 one-row sweep; oracle guarded identically).  The
    # cnt test MUST precede the var test: CASE evaluates lazily, so
    # var's (cnt-1) division never runs at cnt = 1.
    z = (
        F.when(F.col("cnt") < 2, F.lit(None).cast("double"))
        .when(var == 0.0, F.lit(None).cast("double"))
        .otherwise((F.col("n").cast("double") - mean) / F.sqrt(var))
    )
    return h.join(F.broadcast(s), "event_type").select(
        "window_start",
        "event_type",
        "n",
        z.alias("zscore"),
        (F.abs(z) >= 2.0).alias("is_anomaly"),
    )


@query(
    "ts_retention_cohort",
    sql="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
               AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM act a JOIN firsts f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tables=("events",),
    scale_note=(
        "Cohort retention triangle: first-seen day per user (one "
        "user-keyed agg), distinct user-days (map-side combinable), "
        "one join sharing the user_id key, then a cohort-sized "
        "rollup. The join input is user-days, never raw events — at "
        "100 TB the user dimension is the only wide exchange. "
        "(COUNT(*) over act rows == COUNT(DISTINCT user) since act is "
        "already distinct — avoids a second Expand.)"
    ),
)
def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention: users active N days after their first day,
    grouped by signup-day cohort."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    act = e.select("user_id", day).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "ts_interpolate",
    sql="""
    WITH b AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type
        FROM events
    ),
    r AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
    hrs AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS window_start FROM r
    ),
    t AS (SELECT DISTINCT event_type FROM b),
    c AS (SELECT h AS window_start, event_type, COUNT(*) AS n
          FROM b GROUP BY 1, 2),
    grid AS (
        SELECT hrs.window_start, t.event_type, c.n
        FROM hrs CROSS JOIN t
        LEFT JOIN c ON c.window_start = hrs.window_start
                   AND c.event_type = t.event_type
    ),
    w AS (
        SELECT window_start, event_type, n,
               last_value(n IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_n,
               last_value(CASE WHEN n IS NOT NULL THEN window_start END
                          IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_t,
               first_value(n IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_n,
               first_value(CASE WHEN n IS NOT NULL THEN window_start END
                           IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_t
        FROM grid
    )
    SELECT window_start, event_type, n,
           CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                WHEN prev_n IS NULL OR next_n IS NULL THEN NULL
                ELSE CAST(prev_n AS DOUBLE)
                     + (CAST(next_n AS DOUBLE) - prev_n)
                       * (CAST(epoch_us(window_start) - epoch_us(prev_t)
                               AS DOUBLE)
                          / (epoch_us(next_t) - epoch_us(prev_t)))
           END AS n_filled
    FROM w
    """,
    tables=("events",),
    scale_note=(
        "Linear interpolation of missing buckets: dense grid (grid-"
        "sized, not data-sized) + two IGNORE-NULLS window passes per "
        "direction — one shuffle on the series key, partition-local "
        "sorts. Interpolation arithmetic runs on exact integer counts "
        "and µs epochs, one identical IEEE expression both engines. "
        "The standard sensor/metric gap-repair pass before modeling."
    ),
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type counts with interior gaps linearly interpolated
    (exterior gaps stay null)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "window_start"
        )
    )
    types = e.select("event_type").distinct()
    grid = (
        hours.crossJoin(types)
        .join(F.broadcast(hourly), ["window_start", "event_type"], "left")
        .select("window_start", "event_type", F.col("cnt").alias("n"))
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("n").isNotNull(), F.col("window_start"))
    wdf = grid.select(
        "window_start",
        "event_type",
        "n",
        F.last("n", ignorenulls=True).over(w_prev).alias("prev_n"),
        F.last(obs_t, ignorenulls=True).over(w_prev).alias("prev_t"),
        F.first("n", ignorenulls=True).over(w_next).alias("next_n"),
        F.first(obs_t, ignorenulls=True).over(w_next).alias("next_t"),
    )
    frac = (
        F.unix_micros("window_start") - F.unix_micros("prev_t")
    ).cast("double") / (F.unix_micros("next_t") - F.unix_micros("prev_t"))
    lerp = (
        F.col("prev_n").cast("double")
        + (F.col("next_n").cast("double") - F.col("prev_n")) * frac
    )
    filled = (
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .when(F.col("prev_n").isNull() | F.col("next_n").isNull(), F.lit(None))
        .otherwise(lerp)
    )
    return wdf.select(
        "window_start", "event_type", "n", filled.alias("n_filled")
    )


PATH_HEAD = 5


@query(
    "win_session_paths",
    sql=f"""
    WITH m AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts)
                         - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                         > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    n AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS session_id
        FROM m
    ),
    p AS (
        SELECT user_id, session_id,
               array_to_string(
                   list_slice(list(event_type ORDER BY ts, event_id),
                              1, {PATH_HEAD}), '>') AS path,
               COUNT(*) AS n_events
        FROM n GROUP BY 1, 2
    )
    SELECT path, COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events
    FROM p GROUP BY path
    """,
    tables=("events",),
    scale_note=(
        "User-journey mining: gap-and-island sessionization (one "
        "user-keyed shuffle, reused by every window here), per-session "
        "ordered path head via sort_array(collect_list(struct)) — "
        "bounded at 5 steps so state per session is constant — then a "
        "path-keyed count whose map-side combine absorbs popular-path "
        "skew. The 'what do users do' readout of the events genre."
    ),
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency of session-opening event-type paths (first 5 steps per
    30-min-gap session)."""
    e = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w_order)
    )
    numbered = e.withColumn(
        "brk", F.when(gap_us > SESSION_GAP_US, 1).otherwise(0)
    ).withColumn("session_id", F.sum("brk").over(w_run).cast("long"))
    # struct field order (ts, event_id, type) makes sort_array order by
    # time with the deterministic event_id tiebreak.
    path = F.array_join(
        F.slice(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            1,
            PATH_HEAD,
        ),
        ">",
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        path.alias("path"), F.count("*").alias("n_events")
    )
    return sessions.groupBy("path").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
    )


# Truncated EWMA: alpha=0.3 over the last 8 events.  The coefficients
# 0.3 * 0.7^k are exact decimal literals, and BOTH engines evaluate the
# identical left-associated multiply-add chain, so the doubles are
# bit-equal — no rounding needed for the hash oracle.
EWMA_COEFFS = tuple(round(0.3 * 0.7**k, 10) for k in range(8))


@query(
    "ts_ewma",
    sql=f"""
    SELECT user_id, event_id, ts,
           {' + '.join(
               f"{c!r} * coalesce(lag(value, {k}, 0.0) OVER "
               "(PARTITION BY user_id ORDER BY ts, event_id), 0.0)"
               .replace('lag(value, 0, 0.0) OVER '
                        '(PARTITION BY user_id ORDER BY ts, event_id)',
                        'value')
               for k, c in enumerate(EWMA_COEFFS)
           )} AS ewma
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "Per-user exponentially weighted moving average, truncated to 8 "
        "terms: a fixed lag-chain of codegen multiply-adds — one shuffle "
        "on user_id, one partition-local sort, no recursion and no "
        "per-row Python. The truncation (0.7^8 < 6% residual weight) is "
        "what makes EWMA vectorizable/window-expressible; the untruncated "
        "recurrence is inherently sequential and would become the "
        "stream_stateful_running shape instead. Coefficients are exact "
        "decimal literals so Spark and DuckDB produce bit-equal doubles."
    ),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated (8-term) EWMA of event values over time."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    terms = [
        F.lit(c)
        * (
            F.col("value")
            if k == 0
            else F.coalesce(F.lag("value", k, 0.0).over(w), F.lit(0.0))
        )
        for k, c in enumerate(EWMA_COEFFS)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return e.select("user_id", "event_id", "ts", ewma.alias("ewma"))


@query(
    "ts_downsample_ohlc",
    sql="""
    WITH r AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               value,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts ASC, event_id ASC) AS rn_first,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
           COUNT(*) AS n
    FROM r GROUP BY event_type, day
    """,
    tables=("events",),
    scale_note=(
        "OHLC downsampling (the metrics/observability compaction): one "
        "shuffle on the (type, day) bucket key, two partition-local "
        "window passes for deterministic open/close (ts + event_id "
        "tiebreak — never first()/last() without order), min/max/count "
        "fold in the same agg. At 100 TB this is the rollup that turns "
        "raw event streams into dashboard-resolution series; buckets "
        "shrink output by orders of magnitude so the shuffle carries "
        "group rows only."
    ),
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day): open/high/low/close of value + count,
    with deterministic first/last via (ts, event_id) tiebreaks."""
    e = load(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w_first = Window.partitionBy("event_type", day).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_last = Window.partitionBy("event_type", day).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.select(
        "event_type",
        day.alias("day"),
        "value",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return r.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_first") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_last") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n"),
    )


@query(
    "win_streak_longest",
    sql="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    grouped AS (
        SELECT user_id, day,
               day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day
               ) AS INT) AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
        FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id, streak_len,
           strftime(streak_start, '%Y-%m-%d') AS streak_start
    FROM (
        SELECT user_id, streak_len, streak_start,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY streak_len DESC, streak_start
               ) AS rk
        FROM streaks
    ) WHERE rk = 1
    """,
    tables=("events",),
    scale_note=(
        "Longest consecutive-active-day streak per user — the "
        "gaps-and-islands integer trick: day minus its per-user rank is "
        "CONSTANT within a consecutive run, so streaks fall out of one "
        "groupBy with no self-join and no iteration. Two partition-local "
        "window passes plus two aggs, all keyed on user_id — one "
        "shuffle total reused across every stage. The engagement metric "
        "of the genre (posting streaks), and the same plan shape covers "
        "any run-length analysis over a 100-TB activity log."
    ),
)
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, with the
    earliest such streak's start date as the deterministic tiebreak."""
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    w_rank = Window.partitionBy("user_id").orderBy("day")
    grouped = days.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w_rank))
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len"), F.min("day").alias("streak_start")
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            "streak_len",
            # String date: DATE round-trips as Timestamp through one
            # engine's pandas bridge but not the other's — a string is
            # the representation both agree on.
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
        )
    )


@query(
    "ts_seasonal_decompose",
    sql="""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(hour(ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2, 3
    ), seasonal AS (
        SELECT event_type, hod,
               CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS BIGINT)
                   AS seasonal_n
        FROM hourly
        GROUP BY event_type, hod
    )
    SELECT h.event_type, h.day, h.hod, h.n, s.seasonal_n,
           CAST(h.n AS DOUBLE) - s.seasonal_n AS residual
    FROM hourly h JOIN seasonal s
      ON h.event_type = s.event_type AND h.hod = s.hod
    """,
    tables=("events",),
    scale_note=(
        "Additive seasonal decomposition of the event-rate series: "
        "observed hourly counts minus the hour-of-day seasonal mean "
        "per type.  Two aggregations — (type, day, hod) then (type, "
        "hod) — where the second input is already group-row-sized, so "
        "the seasonal profile is a (|types| × 24)-row dim that "
        "BROADCASTS back onto the hourly series (map-side join, no "
        "second data shuffle).  The mean is computed as exact bigint "
        "SUM / COUNT in one double division, so both engines perform "
        "the identical IEEE op (davg's recipe); residual subtraction "
        "is then bit-deterministic.  At 100 TB the hourly pre-agg is "
        "the only data-sized pass — the anomaly-detection cousin of "
        "ts_anomaly_zscore with a seasonal rather than global "
        "baseline."
    ),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline + residual per (type, day, hour)
    observed bucket (diurnal-cycle removal for anomaly screening)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    seasonal = hourly.groupBy("event_type", "hod").agg(
        (
            F.sum("n").cast("double")
            / F.count("*").cast("bigint")
        ).alias("seasonal_n")
    )
    h, s = hourly.alias("h"), F.broadcast(seasonal.alias("s"))
    return h.join(
        s,
        (F.col("h.event_type") == F.col("s.event_type"))
        & (F.col("h.hod") == F.col("s.hod")),
    ).select(
        F.col("h.event_type").alias("event_type"),
        F.col("h.day").alias("day"),
        F.col("h.hod").alias("hod"),
        F.col("h.n").alias("n"),
        F.col("s.seasonal_n").alias("seasonal_n"),
        (F.col("h.n").cast("double") - F.col("s.seasonal_n")).alias(
            "residual"
        ),
    )


FUNNEL_WINDOW_HOURS = 2


@query(
    "ts_funnel_sequence",
    sql=f"""
    WITH s AS (
        SELECT user_id, ts, event_id, event_type
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
    ),
    a AS (
        SELECT *,
               MAX(CASE WHEN event_type = 'click' THEN ts END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_click
        FROM s
    ),
    d AS (
        SELECT *,
               CASE WHEN event_type = 'view' AND last_click IS NOT NULL
                    THEN last_click + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
               END AS view_deadline
        FROM a
    ),
    m AS (
        SELECT *,
               MAX(view_deadline) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_deadline
        FROM d
    )
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'purchase'
                       AND best_deadline >= ts THEN 1 END) > 0 AS matched,
           MIN(CASE WHEN event_type = 'purchase'
                     AND best_deadline >= ts THEN ts END)
               AS first_completion
    FROM m
    GROUP BY user_id
    """,
    tables=("events",),
    scale_note=(
        "Ordered 3-step funnel with a time window (the windowFunnel / "
        "sequenceMatch capability): click → view → purchase in strict "
        "(ts, event_id) order with purchase ≤ click + 2h.  The naive "
        "chain join is cubic in per-user activity; this plan is ONE "
        "LINEAR per-user scan built on a completeness lemma — if any "
        "valid chain exists through a view, the chain through that "
        "view's LATEST prior click is also valid (later click ⇒ later "
        "deadline) — so two running-max windows suffice: last click "
        "before each view (its deadline = click + window), then best "
        "deadline before each purchase.  Both windows partition by "
        "user_id (keyed exchange reused by the final groupBy); state "
        "per row is one timestamp.  Timestamp comparisons/interval "
        "arithmetic are exact µs on both engines."
    ),
)
def ts_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered click→view→purchase funnel completion within a
    2-hour window of the anchoring click, as one linear keyed scan."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select("user_id", "ts", "event_id", "event_type")
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = e.withColumn(
        "last_click",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(wprev),
    )
    d = a.withColumn(
        "view_deadline",
        F.when(
            (F.col("event_type") == "view") & F.col("last_click").isNotNull(),
            F.col("last_click")
            + F.expr(f"INTERVAL {FUNNEL_WINDOW_HOURS} HOUR"),
        ),
    )
    m = d.withColumn(
        "best_deadline", F.max("view_deadline").over(wprev)
    )
    hit = (F.col("event_type") == "purchase") & (
        F.col("best_deadline") >= F.col("ts")
    )
    return m.groupBy("user_id").agg(
        (F.count(F.when(hit, F.lit(1))) > 0).alias("matched"),
        F.min(F.when(hit, F.col("ts"))).alias("first_completion"),
    )


# ---- hysteresis burst detection (round 7) ----------------------------
# Burst episodes over the dense hourly series per type with a TWO-
# threshold (hysteresis) gate: a burst OPENS when the count exceeds
# 2× the type's mean rate and stays open until the count drops below
# the mean — the Schmitt-trigger shape that keeps single-hour dips
# from fragmenting one episode into many (what a plain z-score flag
# like ts_anomaly_zscore cannot express, because the decision depends
# on the PREVIOUS state).  The state recurrence needs no recursion:
# state(t) = the most recent crossing EVENT at or before t — one
# last(ignore nulls) running window.  Threshold tests are the
# division-free integer comparisons count·n_hours vs {2·, 1·}Σcount,
# so every open/close decision is exact on both engines.


@query(
    "ts_burst_hysteresis",
    sql="""
    WITH b AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type
        FROM events
    ),
    r AS (SELECT min(h) AS lo, max(h) AS hi FROM b),
    hrs AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM r
    ),
    t AS (SELECT DISTINCT event_type FROM b),
    c AS (SELECT h, event_type, COUNT(*) AS n FROM b GROUP BY 1, 2),
    g AS (
        SELECT hrs.h, t.event_type, COALESCE(c.n, 0) AS n
        FROM hrs CROSS JOIN t
        LEFT JOIN c ON c.h = hrs.h AND c.event_type = t.event_type
    ),
    m AS (
        SELECT event_type, SUM(n) AS tot, COUNT(*) AS nh
        FROM g GROUP BY event_type
    ),
    ev AS (
        SELECT g.h, g.event_type, g.n,
               CASE WHEN g.n * m.nh > 2 * m.tot THEN 1
                    WHEN g.n * m.nh < m.tot THEN 0
                    ELSE NULL END AS crossing
        FROM g JOIN m USING (event_type)
    ),
    st AS (
        SELECT h, event_type, n,
               COALESCE(last_value(crossing IGNORE NULLS)
                        OVER (PARTITION BY event_type ORDER BY h
                              ROWS UNBOUNDED PRECEDING), 0) AS state
        FROM ev
    ),
    isl AS (
        SELECT h, event_type, n,
               CAST(date_diff('hour', TIMESTAMP '1970-01-01', h) AS BIGINT)
               - row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS grp
        FROM st WHERE state = 1
    )
    SELECT event_type,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY MIN(h)) AS INT) AS burst_id,
           MIN(h) AS start_hour,
           MAX(h) AS end_hour,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(MAX(n) AS BIGINT) AS peak
    FROM isl GROUP BY event_type, grp
    """,
    tables=("events",),
    scale_note=(
        "Stateful burst segmentation WITHOUT recursion: the hysteresis "
        "recurrence collapses to last(crossing IGNORE NULLS) over one "
        "type-partitioned running window, because state only changes "
        "at threshold crossings — so the plan is the dense-grid build "
        "(grid-sized, ts_gap_fill's shape), a broadcast per-type "
        "mean join, ONE running window, and a gaps-and-islands "
        "aggregation.  All decisions are integer (count·n_hours vs "
        "Σcount tests; epoch-hour arithmetic for islands), output is "
        "episode-sized.  At 100 TB the only data-sized pass is the "
        "hourly pre-aggregation; everything after runs on the "
        "(hours × types) grid."
    ),
)
def ts_burst_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst episodes (start, end, length, peak) per event type under
    a 2×mean open / 1×mean close hysteresis gate over the dense
    hourly series."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    rng = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = rng.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = e.select("event_type").distinct()
    g = (
        hours.crossJoin(types)
        .join(F.broadcast(hourly), ["h", "event_type"], "left")
        .select(
            "h", "event_type",
            F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n"),
        )
    )
    m = g.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count("*").alias("nh")
    )
    ev = g.join(F.broadcast(m), "event_type").withColumn(
        "crossing",
        F.when(F.col("n") * F.col("nh") > 2 * F.col("tot"), F.lit(1))
        .when(F.col("n") * F.col("nh") < F.col("tot"), F.lit(0)),
    )
    run = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    st = ev.withColumn(
        "state",
        F.coalesce(F.last("crossing", ignorenulls=True).over(run), F.lit(0)),
    )
    isl = (
        st.filter(F.col("state") == 1)
        .withColumn(
            "grp",
            (F.unix_timestamp("h") / 3600).cast("bigint")
            - F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
    )
    per_burst = isl.groupBy("event_type", "grp").agg(
        F.min("h").alias("start_hour"),
        F.max("h").alias("end_hour"),
        F.count("*").cast("bigint").alias("n_hours"),
        F.max("n").cast("bigint").alias("peak"),
    )
    return per_burst.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("start_hour"))
        .cast("int")
        .alias("burst_id"),
        "start_hour",
        "end_hour",
        "n_hours",
        "peak",
    )


# ---- rolling exact order statistics (round 7) ------------------------
# The robust rolling baseline ts_anomaly_zscore's mean/std cannot give:
# a 24-observed-hour rolling MEDIAN and P90 per type, exact (discrete
# order statistic over integer counts — never an interpolated float).
# Window state is 24 ints per row, so collect-sort-index inside the
# window is constant work per row; both engines sort the identical
# integer lists, and the k-th element of identical lists is identical,
# making the key hash-grade with no numeric caveats at all.
ROLL_MED_W = 24


@query(
    "ts_rolling_median",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hr, cnt,
               list_sort(list(cnt) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN {ROLL_MED_W - 1} PRECEDING
                        AND CURRENT ROW)) AS win
        FROM hourly
    )
    SELECT event_type, hr, cnt,
           CAST(len(win) AS INT) AS n_win,
           win[(len(win) + 1) // 2] AS med,
           win[CAST(ceil(len(win) * 0.9) AS INT)] AS p90
    FROM w
    """,
    tables=("events",),
    scale_note=(
        "Rolling exact median/p90 per key: one type-partitioned sort "
        "(the ts_ewma shuffle, reused by any other per-type window in "
        "the same stage), then CONSTANT per-row work — the window "
        "holds ≤24 integers, so collect+sort+index is O(w log w) per "
        "row with w fixed by the spec, not by data volume; state "
        "never leaves the executor and no partition is data-sized "
        "beyond the keyed sort every rolling operator pays.  Discrete "
        "order statistics over identical integer lists are identical "
        "on both engines — no interpolation, no float accumulation."
    ),
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 24-observed-hour median and p90 of hourly event
    counts per type (discrete order statistics, never interpolated)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-(ROLL_MED_W - 1), Window.currentRow)
    )
    win = F.sort_array(F.collect_list("cnt").over(w))
    sized = hourly.select(
        "event_type", "hr", "cnt", win.alias("win")
    ).withColumn("n_win", F.size("win"))
    n = F.col("n_win")
    return sized.select(
        "event_type",
        "hr",
        "cnt",
        n.cast("int").alias("n_win"),
        F.element_at("win", ((n + 1) / 2).cast("int")).alias("med"),
        F.element_at("win", F.ceil(n * 0.9).cast("int")).alias("p90"),
    )


# ---- last-touch attribution (round 7) --------------------------------
# The marketing-analytics join-free classic: credit each purchase to
# the user's most recent click within a 2-hour lookback, bucketed into
# a channel (props.k mod 4; -1 = organic/no prior click).  Same
# completeness trick as ts_funnel_sequence: "most recent prior click"
# is ONE last(ignore nulls) running window per user — no purchase×click
# join, no per-user collect; the lookback test and channel arithmetic
# are exact integers (µs timestamps, JSON int k).
ATTR_LOOKBACK_US = 7_200_000_000  # 2 hours
ATTR_CHANNELS = 4


@query(
    "ts_attribution_last_touch",
    sql=f"""
    WITH m AS (
        SELECT user_id, ts, event_type,
               CAST(value AS DECIMAL(12,2)) AS value,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k,
               event_id
        FROM events
    ),
    w AS (
        SELECT *,
               last_value(CASE WHEN event_type = 'click'
                               THEN {{'cts': ts, 'ck': k}} END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS lc
        FROM m
    ),
    p AS (
        SELECT CASE WHEN lc IS NOT NULL
                     AND date_diff('microsecond', lc.cts, ts)
                         <= {ATTR_LOOKBACK_US}
                    THEN lc.ck % {ATTR_CHANNELS}
                    ELSE -1 END AS channel,
               value
        FROM w WHERE event_type = 'purchase'
    )
    SELECT CAST(channel AS INT) AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(value) AS DOUBLE) AS attributed_value
    FROM p GROUP BY 1
    """,
    tables=("events",),
    scale_note=(
        "Join-free attribution: 'most recent prior click' collapses "
        "to one last(IGNORE NULLS) running window per user (the "
        "ts_funnel_sequence lemma — a later click always wins, so "
        "carrying ONE candidate is complete), so the whole plan is "
        "one user-keyed shuffle + one partition-local window + a "
        "channel-sized two-phase agg.  Lookback and channel tests "
        "are exact integers (µs timestamp diff, JSON int k); revenue "
        "accumulates as exact decimal, cast to double once per "
        "output row.  No purchase×click join exists to blow up on a "
        "heavy user, and state per row is one struct."
    ),
)
def ts_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Credit purchases to the last click within 2 h per user; report
    purchases and exact attributed revenue per channel (k mod 4)."""
    from ..numerics import dec

    e = load(spark, sf_dir, "events")
    m = e.select(
        "user_id",
        "ts",
        "event_type",
        dec("value").alias("value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        "event_id",
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lc = F.last(
        F.when(
            F.col("event_type") == "click", F.struct("ts", F.col("k").alias("ck"))
        ),
        ignorenulls=True,
    ).over(wprev)
    w = m.withColumn("lc", lc)
    p = w.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lc").isNotNull()
            & (
                F.unix_micros("ts") - F.unix_micros("lc.ts")
                <= ATTR_LOOKBACK_US
            ),
            F.col("lc.ck") % ATTR_CHANNELS,
        )
        .otherwise(F.lit(-1))
        .cast("int")
        .alias("channel"),
        "value",
    )
    return p.groupBy("channel").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("value").cast("double").alias("attributed_value"),
    )


# ---- event-sequence regex matching (round 7) -------------------------
# The MATCH_RECOGNIZE / sequenceMatch capability as a regex over
# per-user event-type INITIALS: each user's (ts, event_id)-ordered
# activity becomes a compact string (c=click, v=view, p=purchase,
# s=signup, e=error) and a pattern like "cv*p" (click, any views,
# purchase) is counted with non-overlapping leftmost matching — the
# same semantics in Java regex (Spark), RE2 (DuckDB), and Python re
# (the referee), verified for this pattern family.  Sequences are
# capped at the first 256 events per user (DETERMINISTIC truncation,
# part of the declared semantics) so per-user state is bounded at any
# corpus size — the same contract streaming state caps use.
SEQ_REGEX_PATTERN = "cv*p"
SEQ_REGEX_CAP = 256


@query(
    "ts_sequence_regex_match",
    sql=f"""
    WITH capped AS (
        SELECT user_id, event_type, ts, event_id FROM (
            SELECT user_id, event_type, ts, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ) WHERE rn <= {SEQ_REGEX_CAP}
    ),
    seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM capped GROUP BY user_id
    )
    SELECT user_id, CAST(len(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, '{SEQ_REGEX_PATTERN}'))
                AS INT) AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{SEQ_REGEX_PATTERN}')) > 0
    """,
    tables=("events",),
    scale_note=(
        "Sequence-pattern matching with BOUNDED per-user state: one "
        "user-keyed shuffle feeds both the capping window and the "
        "ordered string_agg (same exchange, partition-local), the "
        "256-event cap makes every per-user string ≤256 bytes "
        "regardless of user skew (deterministic declared truncation "
        "— the streaming state-cap contract), and the regex runs "
        "per-row codegen over those bounded strings.  Non-"
        "overlapping leftmost match counts agree across Java regex / "
        "RE2 / Python re for the v* pattern family (referee-pinned), "
        "so the key is hash-grade.  Output is matching-users-sized."
    ),
)
def ts_sequence_regex_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count non-overlapping click→views*→purchase patterns in each
    user's (capped) event-initial sequence; emit matching users."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    capped = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SEQ_REGEX_CAP)
    )
    seqs = capped.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("i"))
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("seq")
    )
    n = F.size(F.expr(f"regexp_extract_all(seq, '{SEQ_REGEX_PATTERN}', 0)"))
    return (
        seqs.select(
            "user_id",
            F.length("seq").cast("int").alias("seq_len"),
            n.cast("int").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )


# ---- event-transition matrix (round 7) -------------------------------
# First-order Markov structure of user behavior: counts and row-
# normalized probabilities of (previous event type → next event type)
# transitions within each user's (ts, event_id)-ordered stream — the
# session-model input win_session_paths' path strings summarize but
# never quantify.  Counts are exact integers off ONE user-keyed lag
# window; each probability is one division of exact integers.


@query(
    "ts_markov_transitions",
    sql="""
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    r AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS row_n
        FROM c GROUP BY 1
    )
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n AS DOUBLE) / r.row_n AS p
    FROM c JOIN r USING (prev_type)
    """,
    tables=("events",),
    scale_note=(
        "One user-keyed shuffle for the lag window (the shared "
        "sessionization exchange), then a types²-sized two-phase "
        "aggregation — the transition matrix is 25 rows regardless "
        "of corpus size, and the row-normalizing join is against an "
        "aggregate-sized table.  Counts exact, probabilities one "
        "IEEE division each."
    ),
)
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts and probabilities between event
    types within per-user ordered streams."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = o.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    r = c.groupBy("prev_type").agg(F.sum("n").cast("bigint").alias("row_n"))
    return c.join(F.broadcast(r), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("row_n")).alias("p"),
    )


# ---- exponentially decayed trending (round 7) ------------------------
# top_active_users ranks by RAW lifetime counts, which never forgets;
# real trending decays: score = Σ_events 2^(30 − age_hours div 12) —
# a half-life of 12 hours implemented entirely with INTEGER bit
# shifts (2⁻ᵏ decay ⇒ dyadic weights ⇒ exact bigint sums, no pow(),
# no float accumulation), so the decayed ranking is hash-stable.
DECAY_HALFLIFE_HOURS = 12
DECAY_HALFLIFE_US = DECAY_HALFLIFE_HOURS * 3_600_000_000  # exact µs
DECAY_MAX_SHIFT = 30
DECAY_TOPK = 20


@query(
    "trending_decayed_topk",
    sql=f"""
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    s AS (
        SELECT e.user_id,
               least((epoch_us(mx.mts) - epoch_us(e.ts))
                     // {DECAY_HALFLIFE_US}, {DECAY_MAX_SHIFT}) AS k
        FROM events e, mx
    ),
    sc AS (
        SELECT user_id,
               CAST(SUM((1::BIGINT << ({DECAY_MAX_SHIFT} - k)))
                    AS BIGINT) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY 1
    )
    SELECT user_id, score, n_events,
           CAST(row_number() OVER (ORDER BY score DESC, user_id)
                AS INT) AS rnk
    FROM sc
    ORDER BY rnk LIMIT {DECAY_TOPK}
    """,
    tables=("events",),
    scale_note=(
        "Recency-weighted trending with EXACT arithmetic: the 12-hour "
        "half-life is a power-of-two decay, so each event's weight is "
        "an integer bit shift and per-user scores are exact bigint "
        "sums (associative — partial-aggregated map-side; no float "
        "accumulation to drift under re-partitioning).  One 1-row "
        "broadcast max-timestamp join, one two-phase agg, then a "
        "global top-20 via TakeOrderedAndProject (per-partition "
        "heaps).  At a true 100 TB the age cap bounds weights to "
        "2^30 so a user's score fits bigint below ~2^33 events."
    ),
)
def trending_decayed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by exponentially decayed activity (12 h half-life,
    integer dyadic weights)."""
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("mts"))
    s = e.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({DECAY_MAX_SHIFT} - "
            f"least((unix_micros(mts) - unix_micros(ts))"
            f" div {DECAY_HALFLIFE_US}, "
            f"CAST({DECAY_MAX_SHIFT} AS BIGINT)) AS INT))"
        ).alias("w"),
    )
    sc = s.groupBy("user_id").agg(
        F.sum("w").cast("bigint").alias("score"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    top = (
        sc.orderBy(F.col("score").desc(), "user_id")
        .limit(DECAY_TOPK)
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "user_id"))
            .cast("int"),
        )
    )
    return top.select("user_id", "score", "n_events", "rnk")


# ---- MAD-based robust anomaly detection (round 7) --------------------
# ts_anomaly_zscore standardizes with mean/std, which the outliers
# themselves inflate (masking).  The robust version standardizes with
# median / MAD (median absolute deviation): both are exact DISCRETE
# order statistics over integer hourly counts (the ts_rolling_median
# selection discipline — lower median, never interpolation), so the
# only float in the flag decision is one division by the scaled MAD.
# Flag: |x − med| > 3.5 · 1.4826 · MAD (the standard consistency
# constant); MAD = 0 series are guarded (no flags — a constant series
# has no outliers).
MAD_K = 3.5
MAD_CONSISTENCY = 1.4826


@query(
    "ts_anomaly_mad",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, cnt_med FROM (
            SELECT event_type, cnt AS cnt_med,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt, hr) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM hourly
        ) WHERE rk = (n + 1) // 2
    ),
    dev AS (
        SELECT h.event_type, h.hr, h.cnt, m.cnt_med,
               abs(h.cnt - m.cnt_med) AS ad
        FROM hourly h JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, ad AS mad FROM (
            SELECT event_type, ad,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ad, hr) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rk = (n + 1) // 2
    )
    SELECT d.event_type, d.hr, d.cnt,
           CAST(d.cnt_med AS BIGINT) AS series_median,
           CAST(m.mad AS BIGINT) AS mad,
           CAST(d.cnt - d.cnt_med AS DOUBLE)
               / ({MAD_CONSISTENCY} * m.mad) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0
      AND abs(CAST(d.cnt - d.cnt_med AS DOUBLE))
          > {MAD_K} * ({MAD_CONSISTENCY} * m.mad)
    """,
    tables=("events",),
    scale_note=(
        "Robust outlier flagging: median and MAD are exact lower-"
        "median ORDER STATISTICS (selection via a type-partitioned "
        "rank over the grid-sized hourly table — ts_rolling_median's "
        "discipline, no interpolation, no float accumulation), "
        "broadcast back as 1-row-per-type tables; the flag test and "
        "robust z are one identical IEEE expression over exact "
        "integers.  The hourly pre-agg is the only data-sized pass; "
        "MAD=0 (constant) series are excluded by contract rather "
        "than dividing by zero differently per engine."
    ),
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose count deviates from the per-type median by more
    than 3.5 consistency-scaled MADs (robust z-score anomalies)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("cnt"))

    def lower_median(df, val, extra_order):
        w = Window.partitionBy("event_type").orderBy(val, extra_order)
        n = Window.partitionBy("event_type")
        return (
            df.withColumn("rk", F.row_number().over(w))
            .withColumn("n", F.count("*").over(n))
            .filter(F.col("rk") == ((F.col("n") + 1) / 2).cast("bigint"))
        )

    med = lower_median(hourly, F.col("cnt"), F.col("hr")).select(
        "event_type", F.col("cnt").alias("cnt_med")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("cnt") - F.col("cnt_med"))
    )
    mad = lower_median(dev, F.col("ad"), F.col("hr")).select(
        "event_type", F.col("ad").alias("mad")
    )
    j = dev.join(F.broadcast(mad), "event_type").filter(F.col("mad") > 0)
    diff = (F.col("cnt") - F.col("cnt_med")).cast("double")
    scaled = F.lit(MAD_CONSISTENCY) * F.col("mad")
    return j.filter(F.abs(diff) > F.lit(MAD_K) * scaled).select(
        "event_type",
        "hr",
        "cnt",
        F.col("cnt_med").cast("bigint").alias("series_median"),
        F.col("mad").cast("bigint").alias("mad"),
        (diff / scaled).alias("robust_z"),
    )


# ---- weighted moving average (round 7) -------------------------------
# The linear-weights smoother between the flat rolling mean and the
# exponential EWMA: WMA_t = Σᵢ i·x_{t−w+i} / Σᵢ i over the last w=8
# observed hours.  Integer weights make the numerator an EXACT bigint
# window sum (collect the ≤8-int window, fold with position weights),
# and the single division by the constant 36 is the only float.
WMA_W = 8
WMA_DEN = WMA_W * (WMA_W + 1) // 2  # Σ 1..8 = 36


@query(
    "ts_weighted_moving_avg",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hr, cnt,
               list(cnt) OVER (PARTITION BY event_type ORDER BY hr
                               ROWS BETWEEN {WMA_W - 1} PRECEDING
                                    AND CURRENT ROW) AS win
        FROM hourly
    )
    SELECT event_type, hr, cnt,
           CAST(len(win) AS INT) AS n_win,
           CAST(list_sum(list_transform(range(1, len(win) + 1),
                    i -> (i + {WMA_W} - len(win)) * win[i])) AS BIGINT)
               AS wma_num,
           CAST(list_sum(list_transform(range(1, len(win) + 1),
                    i -> (i + {WMA_W} - len(win)) * win[i])) AS DOUBLE)
           / {WMA_DEN}.0 AS wma
    FROM w WHERE len(win) = {WMA_W}
    """,
    tables=("events",),
    scale_note=(
        "Same shape as ts_rolling_median: one type-partitioned sort "
        "then CONSTANT per-row work over a ≤8-integer window; the "
        "weighted numerator is an exact bigint fold (weights are "
        "positions — no float accumulates), the single division by "
        "the constant 36 is correctly rounded identically on both "
        "engines.  Warm-up rows (window shorter than w) are excluded "
        "by contract rather than re-normalized differently per "
        "engine."
    ),
)
def ts_weighted_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hour linear-weighted moving average of hourly counts per
    type (exact integer numerator; warm-up rows excluded)."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-(WMA_W - 1), Window.currentRow)
    )
    win = F.collect_list("cnt").over(w)
    d = hourly.select("event_type", "hr", "cnt", win.alias("win")).filter(
        F.size("win") == WMA_W
    )
    num = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(1), F.size("win")),
            F.col("win"),
            lambda i, x: (i + WMA_W - F.size("win")) * x,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "event_type",
        "hr",
        "cnt",
        F.size("win").cast("int").alias("n_win"),
        num.alias("wma_num"),
        (num.cast("double") / WMA_DEN).alias("wma"),
    )


# ---- finance-style indicator trio (round-7 continuation) --------------
# Bollinger bands, Wilder RSI, and maximum drawdown — the three
# indicator shapes a metrics/finance user computes over ANY keyed
# series (here: the hourly/daily event series).  House numeric rules:
# window statistics accumulate EXACT integers or decimals (associative
# — safe under DuckDB's segment-tree vs Spark's running-fold window
# evaluation, the ts_rolling_median lesson), and the sequential Wilder
# recurrence is an ordered per-key fold (the Holt idiom) restated as a
# recursive CTE on the oracle side, token-identical.

BOLL_W = 8  # trailing window (hours); bands need full windows only


@query(
    "ts_bollinger_bands",
    sql=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT event_type, hr, cnt,
               CAST(SUM(cnt) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN {BOLL_W - 1} PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS s,
               CAST(SUM(cnt * cnt) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN {BOLL_W - 1} PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS ss,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hr
               ) AS rn
        FROM hourly
    )
    SELECT event_type, hr, cnt,
           CAST(s AS DOUBLE) / {BOLL_W}.0 AS mid,
           CAST(s AS DOUBLE) / {BOLL_W}.0
           + 2.0 * sqrt((CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / {BOLL_W}.0) / {BOLL_W}.0) AS upper_band,
           CAST(s AS DOUBLE) / {BOLL_W}.0
           - 2.0 * sqrt((CAST(ss AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                           / {BOLL_W}.0) / {BOLL_W}.0) AS lower_band
    FROM w WHERE rn >= {BOLL_W}
    """,
    tables=("events",),
    scale_note=(
        "Trailing mean +/- 2 sigma bands per type: one event_type "
        "shuffle, one partition-local sort reused by all three "
        "windows, constant per-row work.  The window sums are EXACT "
        "BIGINTs (associative - immune to the segment-tree vs "
        "running-fold association-order split between engines that "
        "makes windowed DOUBLE sums hash-unsafe); mean and sigma are "
        "per-row IEEE expressions from those integers.  Warm-up rows "
        "(first W-1 per key) are excluded by contract so every "
        "emitted band is a full-window statistic."
    ),
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (8-hour trailing mean ± 2σ) over hourly event
    counts per type; warm-up rows excluded."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-(BOLL_W - 1), Window.currentRow)
    )
    wn = Window.partitionBy("event_type").orderBy("hr")
    w = hourly.select(
        "event_type",
        "hr",
        "cnt",
        F.sum("cnt").over(wf).cast("bigint").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(wf).cast("bigint").alias("ss"),
        F.row_number().over(wn).alias("rn"),
    ).where(F.col("rn") >= BOLL_W)
    s, ss = F.col("s"), F.col("ss")
    mid = s.cast("double") / F.lit(float(BOLL_W))
    sigma = F.sqrt(
        (
            ss.cast("double")
            - s.cast("double") * s.cast("double") / F.lit(float(BOLL_W))
        )
        / F.lit(float(BOLL_W))
    )
    return w.select(
        "event_type",
        "hr",
        "cnt",
        mid.alias("mid"),
        (mid + F.lit(2.0) * sigma).alias("upper_band"),
        (mid - F.lit(2.0) * sigma).alias("lower_band"),
    )


RSI_N = 14  # Wilder's smoothing period


@query(
    "ts_rsi_wilder",
    sql=f"""
    WITH RECURSIVE hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               {dsum_sql('value')} AS x
        FROM events GROUP BY 1, 2
    ),
    d0 AS (
        SELECT event_type, hr,
               x - lag(x) OVER (
                   PARTITION BY event_type ORDER BY hr
               ) AS d
        FROM hourly
    ),
    s AS (
        SELECT event_type, d,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hr
               ) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM d0 WHERE d IS NOT NULL
    ),
    seed AS (
        SELECT event_type, n, CAST({RSI_N} AS BIGINT) AS rn,
               list_reduce(
                   list(greatest(d, 0.0) ORDER BY rn),
                   (a, b) -> a + b) / {RSI_N}.0 AS ag,
               list_reduce(
                   list(greatest(-d, 0.0) ORDER BY rn),
                   (a, b) -> a + b) / {RSI_N}.0 AS al
        FROM s WHERE rn <= {RSI_N} AND n >= {RSI_N} + 1
        GROUP BY event_type, n
    ),
    rec AS (
        SELECT event_type, n, rn, ag, al FROM seed
        UNION ALL
        SELECT r.event_type, r.n, t.rn,
               (r.ag * 13.0 + greatest(t.d, 0.0)) / {RSI_N}.0 AS ag,
               (r.al * 13.0 + greatest(-t.d, 0.0)) / {RSI_N}.0 AS al
        FROM rec r
        JOIN s t ON t.event_type = r.event_type AND t.rn = r.rn + 1
        WHERE r.rn < r.n
    )
    SELECT event_type, n AS n_deltas, ag AS avg_gain, al AS avg_loss,
           CASE WHEN al = 0.0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi
    FROM rec WHERE rn = n
    """,
    tables=("events",),
    scale_note=(
        "Wilder-smoothed RSI over the hourly value series per type: "
        "the textbook RECURSIVE smoother (avg_gain <- (13*prev + "
        "gain)/14), handled like Holt - an ordered per-key aggregate "
        "fold over the delta array (O(hours) state per key, fold "
        "runs in the executor), restated as a recursive CTE on the "
        "oracle side so both engines run the identical IEEE "
        "sequence.  The hourly sums behind the deltas are exact "
        "decimals; the 14-delta seed mean folds left-to-right on "
        "both engines (ANOVA order-pinning).  Sequential in time, "
        "embarrassingly parallel in keys."
    ),
)
def ts_rsi_wilder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder RSI (period 14) of hourly event-value sums per type:
    seed mean of first 14 gains/losses, then the recursive smoother."""
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(dsum("value").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("hr")
    d0 = hourly.select(
        "event_type",
        "hr",
        (F.col("x") - F.lag("x").over(wo)).alias("d"),
    ).where(F.col("d").isNotNull())
    s = d0.select(
        "event_type",
        "d",
        F.row_number().over(wo).alias("rn"),
    )
    series = (
        s.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "d"))),
                lambda x: x["d"],
            ).alias("ds")
        )
        .where(F.size("ds") >= RSI_N + 1)
    )
    st = series.select(
        "event_type",
        F.size("ds").cast("bigint").alias("n_deltas"),
        F.expr(
            f"""
            aggregate(
                slice(ds, {RSI_N + 1}, size(ds) - {RSI_N}),
                named_struct(
                    'ag', aggregate(slice(ds, 1, {RSI_N}),
                                    CAST(0.0 AS DOUBLE),
                                    (a, x) -> a + greatest(x, 0.0D))
                          / {RSI_N}.0D,
                    'al', aggregate(slice(ds, 1, {RSI_N}),
                                    CAST(0.0 AS DOUBLE),
                                    (a, x) -> a + greatest(-x, 0.0D))
                          / {RSI_N}.0D),
                (acc, x) -> named_struct(
                    'ag', (acc.ag * 13.0D + greatest(x, 0.0D))
                          / {RSI_N}.0D,
                    'al', (acc.al * 13.0D + greatest(-x, 0.0D))
                          / {RSI_N}.0D)
            )
            """
        ).alias("st"),
    )
    ag, al = F.col("st.ag"), F.col("st.al")
    return st.select(
        "event_type",
        "n_deltas",
        ag.alias("avg_gain"),
        al.alias("avg_loss"),
        F.when(al == 0.0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + ag / al))
        .alias("rsi"),
    )


@query(
    "ts_drawdown_max",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(value AS DECIMAL(12,2))) AS v
        FROM events GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, day,
               SUM(v) OVER (
                   PARTITION BY event_type ORDER BY day
               ) AS cum
        FROM daily
    ),
    d AS (
        SELECT event_type, day, cum,
               MAX(cum) OVER (
                   PARTITION BY event_type ORDER BY day
               ) - cum AS dd
        FROM c
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(dd) AS DOUBLE) AS max_drawdown
    FROM d GROUP BY event_type
    """,
    tables=("events",),
    scale_note=(
        "Maximum drawdown of the cumulative daily value per type: "
        "cumulative sum and running max are both over EXACT DECIMALs "
        "(associative - window-evaluation-order immune), so the "
        "drawdown is exact until the single final DOUBLE cast.  One "
        "event_type shuffle, one partition-local sort shared by both "
        "windows, then a dimension-sized agg.  The cumulative window "
        "is per-key (never unpartitioned); a key whose history "
        "exceeds one partition takes the two-level range-bucket "
        "cumulative (sample_weighted_pps idiom)."
    ),
)
def ts_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown (peak-to-trough of the cumulative daily value
    series) per event type, exact-decimal until the final cast."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("v"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = daily.select(
        "event_type", "day", F.sum("v").over(wc).alias("cum")
    )
    d = c.select(
        "event_type",
        (F.max("cum").over(wc) - F.col("cum")).alias("dd"),
    )
    return d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("dd").cast("double").alias("max_drawdown"),
    )

@query(
    "ts_entropy_daily",
    sql="""
    WITH cell AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ct AS (
        SELECT day, event_type, c,
               CAST(SUM(c) OVER (PARTITION BY day) AS BIGINT) AS n
        FROM cell
    )
    SELECT day,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS INT) AS k_types,
           list_reduce(
               list(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                          * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 8)
                    ORDER BY event_type),
               (a, b) -> a + b) + 0.0 AS entropy
    FROM ct GROUP BY day
    """,
    tables=("events",),
    scale_note=(
        "Shannon entropy (nats) of the daily event-type mix: cell "
        "counts are one two-phase agg (grid-sized: days x types), "
        "the day total is an exact BIGINT window over the grid, and "
        "the entropy total folds over a day's <=|types| cells in "
        "event_type order — ORDER-PINNED on both engines (the ANOVA "
        "cell-fold idiom) because -p*ln(p) terms are floats; each "
        "term is rounded to 8dp BEFORE the fold (the perplexity "
        "key's ln-ulp discipline: engine ln() implementations "
        "differ in the last ulp, rounding re-synchronizes them so "
        "the pinned fold adds identical doubles).  The "
        "trailing +0.0 normalizes the k=1 corner where the single "
        "fold term is IEEE -0.0 (DuckDB's init-less reduce would "
        "return it verbatim; Spark's 0.0-seeded fold flips it).  "
        "Grid-sized work after the first agg."
    ),
)
def ts_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type distribution per day, from
    exact cell counts with an order-pinned float fold."""
    e = load(spark, sf_dir, "events")
    cell = e.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("c"))
    wd = Window.partitionBy("day")
    ct = cell.withColumn("n", F.sum("c").over(wd).cast("bigint"))
    fold = F.aggregate(
        F.transform(
            F.sort_array(F.collect_list(F.struct("event_type", "c", "n"))),
            lambda x: F.round(
                -(x["c"].cast("double") / x["n"].cast("double"))
                * F.log(x["c"].cast("double") / x["n"].cast("double")),
                8,
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return ct.groupBy("day").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.count("*").cast("int").alias("k_types"),
        (fold + F.lit(0.0)).alias("entropy"),
    )


# ---- rolling cross-series correlation (round-7 continuation) ----------
# 24-observation rolling Pearson correlation between the click and
# purchase hourly count series — the windowed companion of
# ts_cross_correlation's whole-series lead-lag.  All five window
# accumulations are EXACT BIGINTs (counts and their products), so the
# correlation is one per-row IEEE expression over identical integers;
# zero-variance windows emit NULL by contract (no 0/0).

RCORR_W = 24  # observations (hours) per window
RCORR_A, RCORR_B = "click", "purchase"


@query(
    "ts_rolling_correlation",
    sql=f"""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(SUM(CASE WHEN event_type = '{RCORR_A}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = '{RCORR_B}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events
        WHERE event_type IN ('{RCORR_A}', '{RCORR_B}')
        GROUP BY 1
    ),
    w AS (
        SELECT hr, x, y,
               CAST(SUM(x) OVER win AS BIGINT) AS sx,
               CAST(SUM(y) OVER win AS BIGINT) AS sy,
               CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER win AS BIGINT) AS syy,
               row_number() OVER (ORDER BY hr) AS rn
        FROM hourly
        WINDOW win AS (ORDER BY hr
                       ROWS BETWEEN {RCORR_W - 1} PRECEDING
                                AND CURRENT ROW)
    )
    SELECT hr, x, y,
           CASE WHEN ({RCORR_W} * sxx - sx * sx) > 0
                 AND ({RCORR_W} * syy - sy * sy) > 0
                THEN (CAST({RCORR_W} AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (sqrt(CAST({RCORR_W} AS DOUBLE)
                             * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST({RCORR_W} AS DOUBLE)
                               * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                ELSE NULL END AS rolling_corr
    FROM w WHERE rn >= {RCORR_W}
    """,
    tables=("events",),
    scale_note=(
        "Rolling Pearson between two keyed count series: one "
        "conditional hourly agg (grid-sized), one global hour sort "
        "shared by all five windows and the row_number (the series "
        "spine is calendar-bounded — hours, not corpus rows; a "
        "per-key variant partitions the window by key).  All window "
        "sums exact BIGINTs (segment-tree/running-fold immune); "
        "corr is one IEEE expression per full window; zero-variance "
        "windows NULL by contract."
    ),
)
def ts_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling Pearson correlation between click and purchase
    hourly counts (exact integer window sums)."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(RCORR_A, RCORR_B)
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.when(F.col("event_type") == RCORR_A, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == RCORR_B, 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    win = Window.orderBy("hr").rowsBetween(-(RCORR_W - 1), Window.currentRow)
    wn = Window.orderBy("hr")
    w = hourly.select(
        "hr",
        "x",
        "y",
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("syy"),
        F.row_number().over(wn).alias("rn"),
    ).where(F.col("rn") >= RCORR_W)
    wd = F.lit(float(RCORR_W))
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    varx = RCORR_W * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = RCORR_W * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (wd * sxy - sx * sy) / (
        F.sqrt(wd * sxx - sx * sx) * F.sqrt(wd * syy - sy * sy)
    )
    return w.select(
        "hr",
        "x",
        "y",
        F.when((varx > 0) & (vary > 0), corr)
        .otherwise(F.lit(None).cast("double"))
        .alias("rolling_corr"),
    )


# ---- daily bounce rate + ABC revenue classes (round-7 continuation) ---
# Two classic product-analytics readouts on machinery already
# certified here: bounce rate (share of single-event sessions) per
# day over the gap-and-island sessionization, and ABC/Pareto
# classification of orders by cumulative revenue share — the "do 20%
# of orders carry 80% of revenue" answer agg_gini_coefficient's
# scalar cannot give.  Both are exact until one final ratio.


@query(
    "ts_bounce_rate_daily",
    sql=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
                         > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ), numbered AS (
        SELECT user_id, ts, event_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS session_id
        FROM marked
    ), sess AS (
        SELECT user_id, session_id,
               CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS day,
               COUNT(*) AS n_events
        FROM numbered GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS bounce_rate
    FROM sess GROUP BY day
    """,
    tables=("events",),
    scale_note=(
        "Bounce rate per day over the certified gap-and-island "
        "sessionization: one user_id shuffle (lag + running sum "
        "partition-local), session agg reuses the partitioning, "
        "then a days-sized conditional count.  Sessions are dated "
        "by their START day (contract).  The ratio is exact-int / "
        "exact-int, one IEEE division per day row."
    ),
)
def ts_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of single-event (bounce) sessions per day, dated by
    session start, over 30-min-gap sessions."""
    e = load(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w_order)
    )
    numbered = e.withColumn(
        "brk", F.when(gap_us > SESSION_GAP_US, 1).otherwise(0)
    ).withColumn("session_id", F.sum("brk").over(w_run).cast("long"))
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day"),
        F.count("*").alias("n_events"),
    )
    n_bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sess.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        n_bounce.cast("bigint").alias("n_bounces"),
        (n_bounce.cast("double") / F.count("*")).alias("bounce_rate"),
    )


# ---- new-vs-returning split (round-7 continuation) --------------------
# The acquisition-vs-retention daily split: a user is NEW on the day
# of their first event, RETURNING on any later active day.  First-seen
# is one user-keyed min; the daily split is exact distinct counts —
# a companion to ts_retention_cohort that answers "how much of today's
# traffic is growth?" in one row per day.


@query(
    "ts_new_vs_returning_daily",
    sql="""
    WITH fs AS (
        SELECT user_id,
               CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS first_day
        FROM events GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               user_id
        FROM events
    )
    SELECT act.day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN fs.first_day = act.day
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN fs.first_day <> act.day
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN fs.first_day = act.day
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS new_share
    FROM act JOIN fs ON fs.user_id = act.user_id
    GROUP BY act.day
    """,
    tables=("events",),
    scale_note=(
        "New-vs-returning: one user-keyed min (two-phase), one "
        "distinct (day,user) projection, one user-keyed join that "
        "reuses the same hash partitioning, then a days-sized "
        "conditional count.  The first-seen table is users-sized "
        "(broadcastable well past fixture scale; at 100 TB it joins "
        "shuffle-on-user with the distinct pass).  Exact-int ratio, "
        "one IEEE division per day."
    ),
)
def ts_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into new (first-ever day) vs
    returning, with the new-user share."""
    e = load(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    act = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    j = act.join(fs, "user_id")
    is_new = F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
    return j.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(is_new).cast("bigint").alias("n_new"),
        F.sum(1 - is_new).cast("bigint").alias("n_returning"),
        (F.sum(is_new).cast("double") / F.count("*")).alias("new_share"),
    )


# ---- cohort LTV accumulation (round-7 continuation) --------------------
# The revenue side of ts_retention_cohort: customers cohorted by
# first-order month, cumulative revenue tracked by cohort age in
# months — the LTV curve table every growth team keeps.  Revenue is
# exact decimal throughout; the age axis is pure integer month
# arithmetic ((Δyear)·12 + Δmonth — no months_between float); the
# cumulative is an exact decimal window per cohort; one final DOUBLE
# cast per output cell.


@query(
    "ts_cohort_ltv",
    sql="""
    WITH fo AS (
        SELECT o_custkey,
               CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP)
                   AS cohort_month
        FROM orders GROUP BY o_custkey
    ),
    rv AS (
        SELECT fo.cohort_month,
               (EXTRACT(year FROM o.o_orderdate)
                - EXTRACT(year FROM fo.cohort_month)) * 12
               + (EXTRACT(month FROM o.o_orderdate)
                  - EXTRACT(month FROM fo.cohort_month)) AS age_months,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
        GROUP BY 1, 2
    )
    SELECT cohort_month,
           CAST(age_months AS INT) AS age_months,
           n_orders,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(SUM(cents) OVER (
               PARTITION BY cohort_month ORDER BY age_months
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_revenue_cents
    FROM rv
    """,
    tables=("orders",),
    scale_note=(
        "LTV curves: one customer-keyed first-order min, one "
        "customer-keyed join reusing the partitioning, a (cohort, "
        "age)-grid two-phase agg, then an exact-integer cumulative "
        "over the months axis per cohort (grid-sized window — "
        "months, never orders).  The age axis is integer month "
        "arithmetic ((dy)*12 + dm), not months_between's float; "
        "revenue stays exact cents end to end."
    ),
)
def ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue by (first-order-month cohort, age in
    months) — the LTV curve table, exact cents throughout."""
    o = load(spark, sf_dir, "orders")
    fo = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    j = o.join(fo, "o_custkey")
    age = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    )
    rv = j.groupBy(
        "cohort_month", age.alias("age_months")
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        ),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rv.select(
        "cohort_month",
        F.col("age_months").cast("int").alias("age_months"),
        "n_orders",
        F.col("cents").cast("bigint").alias("revenue_cents"),
        F.sum("cents").over(w).cast("bigint").alias("cum_revenue_cents"),
    )


@query(
    "ts_dow_hod_heatmap",
    sql="""
    WITH tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
    -- DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7.
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS DOUBLE) / CAST(MAX(tot.n) AS DOUBLE)
               AS share_of_total
    FROM events CROSS JOIN tot
    GROUP BY 1, 2, 3
    """,
    tables=("events",),
    scale_note=(
        "The calendar heatmap grid behind ts_anova_hour_of_day's "
        "statistic: one two-phase agg to the (dow x hod x type) "
        "grid (<= 7*24*types rows at any corpus size), the 1-row "
        "total broadcast, one IEEE division per cell.  Spark's "
        "dayofweek is 1=Sunday..7 while DuckDB's is 0-based — the "
        "oracle shifts by +1 (measured, referee-pinned)."
    ),
)
def ts_dow_hod_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day-of-week × hour-of-day × type) activity grid with share of
    total — the calendar heatmap readout."""
    e = load(spark, sf_dir, "events")
    tot = e.agg(F.count("*").cast("bigint").alias("n"))
    g = (
        e.crossJoin(F.broadcast(tot))
        .groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
            "event_type",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            (
                F.count("*").cast("double")
                / F.max("n").cast("double")
            ).alias("share_of_total"),
        )
    )
    return g
