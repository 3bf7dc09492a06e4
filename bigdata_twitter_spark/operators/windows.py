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
        "Global distribution ranks need a single ordered partition — fine "
        "for result-sized sets only. The production path at 100 TB is the "
        "shipped twin win_ntile_pctrank_dist (same oracle, same output): "
        "range-repartition + local row_number + broadcast cumulative "
        "offsets, no single-partition window anywhere."
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


NTILE_BUCKETS = 10


@query(
    "win_ntile_pctrank_dist",
    sql="""
    SELECT o_orderkey, o_totalprice,
           ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
           percent_rank() OVER (ORDER BY o_totalprice) AS pct_rank,
           cume_dist() OVER (ORDER BY o_totalprice) AS cume
    FROM orders
    """,
    tables=("orders",),
    scale_note=(
        "The 100-TB twin of win_ntile_pctrank: NO single-partition window "
        "anywhere. Global row_number = range-repartition on the sort key "
        "(every partition holds a contiguous key range) + per-partition "
        "local row_number + broadcast-joined cumulative partition counts; "
        "tie-aware rank/cume come from a window KEYED on the sort value; "
        "ntile/percent_rank/cume_dist are then arithmetic. Three bounded "
        "parallel shuffles replace the one unbounded sort."
    ),
)
def win_ntile_pctrank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deciles / percent_rank / cume_dist via distributed global ranking
    (identical results to the single-window formulation, hence the same
    oracle — the point is the plan, not the answer)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    width = spark.sparkContext.defaultParallelism
    # 1. Range partitioning: partition i holds keys strictly below
    #    partition i+1 (RangePartitioner's sample seed is derived from
    #    the partition index, so the split is deterministic).
    ranged = o.repartitionByRange(width, "o_totalprice", "o_orderkey")
    with_pid = ranged.withColumn("pid", F.spark_partition_id())
    # 2. Local row_number inside each range partition (keyed window).
    w_local = Window.partitionBy("pid").orderBy("o_totalprice", "o_orderkey")
    local = with_pid.withColumn("local_rn", F.row_number().over(w_local))
    # 3. Cumulative partition sizes → global offset per pid.  `width`
    #    rows total: the cumsum window is over a cluster-width-sized
    #    frame, not a data-sized one.  Counts come from max(local_rn),
    #    NOT count(*): that keeps this branch anchored on the SAME
    #    windowed subtree as the main branch, so the range+pid
    #    exchanges are reused instead of re-scanning the input twice.
    counts = local.groupBy("pid").agg(F.max("local_rn").alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "pid", (F.sum("cnt").over(w_off) - F.col("cnt")).alias("offset")
    )
    rn = local.join(F.broadcast(offsets), "pid").withColumn(
        "rn", F.col("offset") + F.col("local_rn")
    )
    # 4. Tie-aware rank (min rn over equal keys) and cume numerator
    #    (max rn over equal keys) via a window keyed on the sort value.
    w_val = Window.partitionBy("o_totalprice")
    ranked = rn.select(
        "o_orderkey",
        "o_totalprice",
        "rn",
        F.min("rn").over(w_val).alias("rank"),
        F.max("rn").over(w_val).alias("max_rn"),
    )
    # 5. Broadcast the total count; everything below is per-row math.
    n_total = o.agg(F.count("*").alias("n"))
    q = F.floor(F.col("n") / NTILE_BUCKETS)
    rem = F.col("n") % NTILE_BUCKETS
    big = q + 1  # first `rem` buckets carry one extra row
    decile = F.when(
        F.col("rn") <= rem * big,
        F.floor((F.col("rn") - 1) / big) + 1,
    ).otherwise(rem + F.floor((F.col("rn") - rem * big - 1) / q) + 1)
    return ranked.join(F.broadcast(n_total)).select(
        "o_orderkey",
        "o_totalprice",
        decile.cast("int").alias("decile"),
        # SQL percent_rank of a single row is 0.0 by definition; the
        # naive (rank-1)/(n-1) is 0/0 there and under ANSI kills the
        # job (r10 one-row sweep) — match the native semantics.
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("rank") - 1).cast("double")
            / (F.col("n") - 1).cast("double")
        )
        .alias("pct_rank"),
        (F.col("max_rn").cast("double") / F.col("n").cast("double")).alias(
            "cume"
        ),
    )


@query(
    "win_dedup_latest",
    sql="""
    SELECT user_id, event_id, ts, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
    tables=("events",),
    scale_note=(
        "Log compaction / CDC upsert resolution: latest record per key "
        "via one keyed window (single shuffle on user_id, per-partition "
        "sort). The batch twin of stream_dedup's keep-latest semantics; "
        "at 100 TB this is the standard snapshot-from-changelog pass."
    ),
)
def win_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user (deterministic event_id tiebreak) — the
    keep-latest compaction pattern."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# ---- running distinct count (round-7 continuation) ---------------------
# "How many DISTINCT parts has this customer bought up to each
# order?" — the cumulative-uniques window that naive COUNT(DISTINCT)
# OVER cannot express in either engine.  Standard decomposition:
# flag each (customer, part)'s FIRST purchase with one keyed
# row_number, then a running sum of flags per customer — both
# windows partition-local after one customer-keyed shuffle, all
# integers.


@query(
    "win_running_distinct",
    sql="""
    WITH x AS (
        SELECT o.o_custkey AS c, o.o_orderkey AS ok,
               CAST(o.o_orderdate AS TIMESTAMP) AS od, l.l_partkey AS p,
               row_number() OVER (
                   PARTITION BY o.o_custkey, l.l_partkey
                   ORDER BY o.o_orderdate, o.o_orderkey, l.l_linenumber
               ) AS rn
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    per_order AS (
        SELECT c, ok, od,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new
        FROM x GROUP BY 1, 2, 3
    )
    SELECT c AS o_custkey, ok AS o_orderkey, od AS o_orderdate,
           n_new AS n_new_parts,
           CAST(SUM(n_new) OVER (
               PARTITION BY c ORDER BY od, ok
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_distinct_parts
    FROM per_order
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Cumulative DISTINCT per key — the window neither engine's "
        "COUNT(DISTINCT) OVER expresses: first-occurrence flags via "
        "one (customer, part)-keyed row_number, an order-grain "
        "conditional sum, then a customer-keyed running BIGINT sum "
        "— one fact-fact join, then every window partition-local "
        "after one customer shuffle (the (c,p) window re-shuffles "
        "within the same key family).  All integers; no distinct "
        "state accumulates anywhere."
    ),
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer order: new parts in this order and cumulative
    distinct parts bought so far (first-occurrence-flag idiom)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    x = l.join(o, o["o_orderkey"] == l["l_orderkey"]).select(
        F.col("o_custkey").alias("c"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderdate").alias("od"),
        F.col("l_partkey").alias("p"),
        "l_linenumber",
    )
    w_first = Window.partitionBy("c", "p").orderBy(
        "od", "ok", "l_linenumber"
    )
    flagged = x.withColumn("rn", F.row_number().over(w_first))
    per_order = flagged.groupBy("c", "ok", "od").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_new")
    )
    w_run = (
        Window.partitionBy("c")
        .orderBy("od", "ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_order.select(
        F.col("c").alias("o_custkey"),
        F.col("ok").alias("o_orderkey"),
        F.col("od").alias("o_orderdate"),
        F.col("n_new").alias("n_new_parts"),
        F.sum("n_new").over(w_run).cast("bigint").alias(
            "cum_distinct_parts"
        ),
    )
