"""Window functions (SURVEY.md §2.E): ranking, lag/lead, running and
range frames, distribution functions.

Reference parity: "top-K per group" (top hashtags per hour, top users
per topic) and inter-tweet gap analysis are the genre's window-shaped
queries (SURVEY.md §2.E; reference checkout empty — §0.1).

Scale posture: every window here partitions by a key (nation, user) —
one shuffle on the key, then a partition-local sort; there is no
global-window (empty partitionBy) operator in the inventory because a
single-partition window does not scale.  Orderings always end in a
unique tiebreak column so frame contents are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..numerics import dec
from ..registry import query
from ..tables import load

HOUR_US = 3_600_000_000


@query(
    "win_rank_topk_per_group",
    sql="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, rn, rnk, drnk
    FROM (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn,
               rank()       OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC) AS rnk,
               dense_rank() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC) AS drnk
        FROM customer
    ) t WHERE rn <= 3
    """,
    tables=("customer",),
    scale_note=(
        "Top-K per group via row_number filter: one shuffle on the group key; "
        "Spark pushes a per-partition rank limit (WindowGroupLimit) so only "
        "K rows per group survive the sort."
    ),
)
def win_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation with all three rank flavors."""
    c = load(spark, sf_dir, "customer")
    w_tie = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        c.select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w_tie).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_lag_lead_delta",
    sql="""
    SELECT event_id, user_id, ts,
           lag(ts)  OVER w AS prev_ts,
           lead(ts) OVER w AS next_ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tables=("events",),
    scale_note="lag/lead are O(1) per row after the per-user sort.",
)
def win_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user (inter-tweet interval analog)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).alias("gap_us"),
    )


@query(
    "win_running_sum",
    sql="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_n
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "Running totals in DECIMAL so every prefix is exact under the "
        "deterministic (ts, event_id) order."
    ),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user activity value over time."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_range_frame",
    sql=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
               AS hour_value,
           COUNT(*) OVER w AS hour_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW)
    """,
    tables=("events",),
    scale_note=(
        "RANGE frame over the µs epoch: trailing 1-hour per-user totals with "
        "a sliding two-pointer pass — no self-join, no window explosion."
    ),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour per-user activity (range frame; tie-order independent)."""
    e = load(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros(F.col("ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-HOUR_US, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(dec("value")).over(w).cast("double").alias("hour_value"),
        F.count("*").over(w).alias("hour_n"),
    )


@query(
    "win_ntile_pctrank",
    sql="""
    SELECT o_orderkey, o_totalprice,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
           percent_rank() OVER (ORDER BY o_totalprice) AS pct_rank,
           cume_dist() OVER (ORDER BY o_totalprice) AS cume
    FROM orders
    """,
    tables=("orders",),
    scale_note=(
        "Global distribution ranks need a single ordered partition — fine for "
        "result-sized sets; at 100 TB use approx quantiles or bucket first."
    ),
)
def win_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deciles / percent_rank / cume_dist of order totals."""
    o = load(spark, sf_dir, "orders")
    w_tie = Window.orderBy("o_totalprice", "o_orderkey")
    w = Window.orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.ntile(10).over(w_tie).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
