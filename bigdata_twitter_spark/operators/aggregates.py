"""Aggregation operators (SURVEY.md §2.D).

Reference parity: the BigData-Twitter genre's core analytics are
grouped counts/sums over the tweet log (tweets per user, per hashtag,
per time bucket); SURVEY.md §2.D maps those onto the driver fixtures.
Reference file:line citations are impossible — the checkout is empty
(SURVEY.md §0.1); capability provenance is per-row in §2.D.

Scale posture: every aggregate here is a plain ``groupBy().agg`` —
Spark automatically plans two-phase (partial map-side + final) hash
aggregation, so the shuffle carries one row per (partition × group),
not per input row.  Group-key cardinalities (returnflag×linestatus = 6,
event_type = 5, user ~ |users|) stay far below partition counts at
100 TB, so no skew handling is needed beyond AQE defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..numerics import davg, davg_sql, dec, dsum, dsum_sql
from ..registry import query
from ..tables import load, spread


@query(
    "agg_q1_pricing",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))
                    * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tables=("lineitem",),
    scale_note=(
        "Two-phase hash agg over 6 groups; shuffle payload is O(partitions). "
        "DECIMAL accumulation is exact, so the plan parallelizes freely."
    ),
)
def agg_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship TPC-H-Q1-shaped pricing summary per (returnflag, linestatus)."""
    # The fixture is a single-row-group parquet file, so the scan is
    # ONE split and the five DECIMAL partial aggregates would run on
    # one core (guide §2.5: unsplittable input → repartition after the
    # read; measured 2.12 → 0.74 s best-of-3 at sf0.1/local[32]).
    # Project to the 8 needed columns FIRST — column pruning does not
    # reach through the repartition, and the unprojected spread
    # shuffles all 16 (measured 1.49 vs 0.77 s).  No-op at real scan
    # widths; DECIMAL partials are exact, so the result is
    # partitioning-independent.
    l = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        ),
        sf_dir, "lineitem", "l_orderkey",
    )
    disc_price = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    charge = disc_price * dec(F.lit(1) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_global",
    sql=f"""
    SELECT COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           {dsum_sql('value')} AS sum_value,
           MIN(ts) AS first_ts, MAX(ts) AS last_ts
    FROM events
    """,
    tables=("events",),
    scale_note="Single global group: partial aggregates reduce to one row per partition.",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregates over the event log."""
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        dsum("value").alias("sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "agg_count_distinct",
    sql="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tables=("events",),
    scale_note=(
        "Exact distinct = expand + two-phase agg (Spark rewrites internally). "
        "At 100 TB prefer agg_approx_count_distinct (HLL) unless exactness is required."
    ),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (unique-users-per-hashtag analog)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "agg_approx_count_distinct",
    sql=None,  # approximate — rows-only check; cross-validated vs exact in tests
    tables=("events",),
    scale_note=(
        "HLL++ sketch: fixed-size state per group, single shuffle of sketches. "
        "This is the 100-TB path for distinct counting."
    ),
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type (HyperLogLog++)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "agg_having",
    sql=f"""
    SELECT user_id, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= 5
    """,
    tables=("events",),
    scale_note="HAVING is a post-agg filter on already-reduced rows — no extra shuffle.",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active users: per-user totals filtered post-aggregation."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
        .filter(F.col("n_events") >= 5)
    )


@query(
    "agg_rollup",
    sql=f"""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
    tables=("events",),
    scale_note=(
        "Rollup expands to grouping-set rows before the shuffle; cost is "
        "O(levels) × base agg. Fine at 100 TB for low-cardinality dims."
    ),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: (type, day) → (type) → grand total."""
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return e.rollup("event_type", "day").agg(
        F.count("*").alias("n"), dsum("value").alias("total_value")
    )


@query(
    "agg_cube",
    sql=f"""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
    tables=("events",),
    scale_note="Cube = 2^dims grouping sets; keep dims ≤ 3 at scale.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-subsets totals over (event_type, day)."""
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return e.cube("event_type", "day").agg(
        F.count("*").alias("n"), dsum("value").alias("total_value")
    )


@query(
    "agg_grouping_sets",
    sql=f"""
    SELECT event_type, user_id, COUNT(*) AS n, {dsum_sql('value')} AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id))
    """,
    tables=("events",),
    scale_note="Explicit grouping sets avoid the full cube when only two views are needed.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent aggregate views (by type, by user) in one pass."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        SELECT event_type, user_id, COUNT(*) AS n, {dsum_sql("value")} AS total_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id))
        """
    )


@query(
    "agg_collect_sorted",
    sql="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS events_csv,
           COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
    tables=("events",),
    scale_note=(
        "collect_list is bounded by per-group size; sort_array makes the result "
        "partition-order independent (required for hash-stable output)."
    ),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sorted event-type list, emitted as a canonical CSV string."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias(
            "events_csv"
        ),
        F.count("*").alias("n"),
    )


PIVOT_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           count(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events
    GROUP BY 1
    """,
    tables=("events",),
    scale_note=(
        "Explicit pivot value list ⇒ single-pass conditional aggregation "
        "(no extra job to discover values) and a stable output schema."
    ),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event_type activity matrix."""
    e = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    piv = e.groupBy("day").pivot("event_type", PIVOT_EVENT_TYPES).count()
    # Spark pivot leaves missing combinations null; the CASE-WHEN oracle
    # counts them as 0 — align.
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in PIVOT_EVENT_TYPES]
    )


_STATS_SQL = """
    WITH s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sq,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sqq,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS spp,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sqp
        FROM lineitem
    )
    SELECT n,
           sq / n AS mean_qty,
           CASE WHEN n < 2 THEN NULL
                ELSE (sqq - sq * sq / n) / (n - 1) END AS var_qty,
           CASE WHEN n < 2 THEN NULL
                ELSE sqrt((sqq - sq * sq / n) / (n - 1)) END AS stddev_qty,
           CASE WHEN n < 2 THEN NULL
                ELSE (spp - sp * sp / n) / (n - 1) END AS var_price,
           CASE WHEN sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n) = 0.0
                THEN NULL
                ELSE (sqp - sq * sp / n)
                     / (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n))
           END AS corr_qty_price
    FROM s
"""


@query(
    "agg_stats",
    sql=_STATS_SQL,
    tables=("lineitem",),
    scale_note=(
        "Variance/corr from exact decimal co-moments in ONE pass (sum, sum of "
        "squares, cross product) — associative, so it distributes perfectly; "
        "the float math happens once on the final single row."
    ),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mean/variance/stddev/correlation via decimal co-moments.

    Spark's builtin var_samp/corr accumulate doubles in partition order,
    which is not reproducible against the oracle; computing the
    co-moments in DECIMAL and deriving the statistics in one final
    double expression is order-independent and bit-stable on both
    engines.
    """
    # Single-split fixture scan → decimal co-moment partials on one
    # core; spread the projected scan (guide §2.5, see agg_q1_pricing).
    # Co-moments are exact DECIMAL: partitioning-independent.
    l = spread(
        load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        sf_dir, "lineitem", "l_orderkey",
    )
    s = l.agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sq"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("sqq"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sp"),
        F.sum(dec("l_extendedprice") * dec("l_extendedprice"))
        .cast("double")
        .alias("spp"),
        F.sum(dec("l_quantity") * dec("l_extendedprice"))
        .cast("double")
        .alias("sqp"),
    )
    n, sq, sqq, sp, spp, sqp = (F.col(c) for c in ["n", "sq", "sqq", "sp", "spp", "sqp"])
    # n < 2 zeroes the Bessel denominator — sample variance is
    # undefined on a single row; NULL, not an ANSI DIVIDE_BY_ZERO
    # (r10 one-row sweep; oracle guarded identically).
    one_row = n < 2
    return s.select(
        n.alias("n"),
        (sq / n).alias("mean_qty"),
        F.when(one_row, F.lit(None).cast("double"))
        .otherwise((sqq - sq * sq / n) / (n - 1))
        .alias("var_qty"),
        F.when(one_row, F.lit(None).cast("double"))
        .otherwise(F.sqrt((sqq - sq * sq / n) / (n - 1)))
        .alias("stddev_qty"),
        F.when(one_row, F.lit(None).cast("double"))
        .otherwise((spp - sp * sp / n) / (n - 1))
        .alias("var_price"),
        # corr is undefined when either variable is constant (zero
        # variance): NULL, not an ANSI DIVIDE_BY_ZERO job kill —
        # guarded identically in the oracle (r10 degenerate-domain
        # sweep).
        F.when(
            F.sqrt(sqq - sq * sq / n) * F.sqrt(spp - sp * sp / n) == 0.0,
            F.lit(None).cast("double"),
        )
        .otherwise(
            (sqp - sq * sp / n)
            / (F.sqrt(sqq - sq * sq / n) * F.sqrt(spp - sp * sp / n))
        )
        .alias("corr_qty_price"),
    )


@query(
    "agg_unpivot_melt",
    sql="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           CAST(l_quantity AS DOUBLE) AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice',
           CAST(l_extendedprice AS DOUBLE) FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount',
           CAST(l_discount AS DOUBLE) FROM lineitem
    """,
    tables=("lineitem",),
    scale_note=(
        "Wide-to-long unpivot (melt) via Spark's native df.unpivot — a "
        "single row-local Expand node in codegen (one input row fans "
        "out to 3 output rows in the same task), zero shuffles, no "
        "UNION re-scan: the oracle's 3-branch UNION ALL reads the "
        "table three times, the engine reads it ONCE. At 100 TB "
        "that's the difference between one corpus pass and three."
    ),
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt three lineitem measures into (measure, val) long form."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@query(
    "agg_argmax_minby",
    sql="""
    WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id DESC) AS rmax,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value ASC, event_id ASC) AS rmin
        FROM events
        WHERE value IS NOT NULL
    )
    SELECT event_type,
           max(CASE WHEN rmax = 1 THEN event_id END) AS argmax_event_id,
           max(CASE WHEN rmax = 1 THEN value END) AS max_value,
           max(CASE WHEN rmin = 1 THEN event_id END) AS argmin_event_id,
           max(CASE WHEN rmin = 1 THEN value END) AS min_value
    FROM r GROUP BY event_type
    """,
    tables=("events",),
    scale_note=(
        "max_by/min_by with a deterministic (value, event_id) struct "
        "ordinal — one two-phase hash agg, no window, no sort: the "
        "argmax travels with the partial aggregate, so the shuffle "
        "payload is one row per (partition, group). The oracle states "
        "the same tiebreak via rank windows because ANSI SQL lacks a "
        "tiebroken arg_max; the engine-side agg is the plan that "
        "scales (windows would sort every partition at 100 TB)."
    ),
)
def agg_argmax_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type argmax/argmin of value with smallest/largest-id ties
    resolved deterministically via struct ordinals.

    NULL values are excluded on BOTH sides: Spark's struct comparison
    with a null field and DuckDB's default NULLS-LAST DESC ordering
    would otherwise pick different rows, so the non-null invariant is
    asserted by the filter rather than assumed of the fixture.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ord_max = F.struct(F.col("value"), F.col("event_id"))
    return e.groupBy("event_type").agg(
        F.max_by("event_id", ord_max).alias("argmax_event_id"),
        F.max("value").alias("max_value"),
        F.min_by("event_id", ord_max).alias("argmin_event_id"),
        F.min("value").alias("min_value"),
    )


@query(
    "agg_q3_shipping",
    sql="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE)
               AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tables=("customer", "orders", "lineitem"),
    scale_note=(
        "TPC-H-Q3-shaped shipping-priority composite: both dimension-"
        "side filters (mktsegment, orderdate) cut BEFORE any join; "
        "only the filtered customer KEYS are broadcast (orders takes "
        "a map-side broadcast join, never a shuffle for the dim); "
        "orders⋈lineitem shuffles once on the shared orderkey; the "
        "final top-10 is TakeOrderedAndProject (per-partition heaps, "
        "no global sort). Revenue accumulates in exact DECIMAL so the "
        "two-phase agg parallelizes without float-order drift."
    ),
)
def agg_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 unshipped BUILDING-segment orders by revenue as of
    1998-01-01 (TPC-H Q3 shape on the fixture schema)."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    # Broadcast ONLY the filtered customer keys into orders (map-side
    # semi-reduction); the single real shuffle is orders⋈lineitem on
    # their shared orderkey.
    oc = o.join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    return (
        l.join(oc, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# Price-bucket width for the distributed weighted-median search.  Any
# positive width is correct (bucketing only localizes the scan); at
# 100 TB pick width so the per-group bucket table stays metadata-sized
# while the median bucket holds ~one task of rows.
WMEDIAN_BUCKET = 1000.0


@query(
    "agg_weighted_median",
    sql="""
    WITH pl AS (
        SELECT l_returnflag, l_extendedprice AS price,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
        FROM lineitem
        GROUP BY l_returnflag, l_extendedprice
    ), c AS (
        SELECT l_returnflag, price,
               SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM pl
    )
    SELECT l_returnflag,
           CAST(MIN(price) AS DOUBLE) AS weighted_median_price
    FROM c WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
    tables=("lineitem",),
    scale_note=(
        "EXACT weighted median WITHOUT a per-group global sort: "
        "phase 1 aggregates weight per (group, price-bucket) — one "
        "partial-agg shuffle, output metadata-sized; phase 2 finds "
        "each group's median bucket and its cumulative offset with a "
        "window over the bucket aggregates (hundreds of rows); phase "
        "3 re-scans ONLY the median bucket's rows (map-side broadcast "
        "semi-filter) and resolves the exact value inside it.  The "
        "naive shape — rank every row per group — needs a full sort "
        "of 100 TB; this shape sorts one bucket.  All weight "
        "arithmetic in DECIMAL so the >= tw/2 boundary row is "
        "engine-exact; the oracle computes the same median by the "
        "textbook per-group cumulative window."
    ),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact l_quantity-weighted median of l_extendedprice per
    returnflag via bucket-localized search (no global per-group sort).

    Correctness of the localization: buckets are price-ordered
    intervals, so a bucket's cumulative end weight equals the global
    cumulative weight at its max price; the first bucket whose
    cumulative end reaches tw/2 therefore contains the global median
    price, and in-bucket cumsum + the preceding buckets' offset
    reproduces the global cumsum exactly.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    pl = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum(dec("l_quantity")).alias("w"))
        .withColumn(
            "bucket", F.floor(F.col("price") / F.lit(WMEDIAN_BUCKET))
        )
    )
    bk = pl.groupBy("l_returnflag", "bucket").agg(F.sum("w").alias("bw"))
    wb = Window.partitionBy("l_returnflag").orderBy("bucket")
    wt = Window.partitionBy("l_returnflag")
    bk_cum = bk.withColumn("cum_end", F.sum("bw").over(wb)).withColumn(
        "tw", F.sum("bw").over(wt)
    )
    qual = Window.partitionBy("l_returnflag").orderBy("bucket")
    mb = (
        bk_cum.filter(2 * F.col("cum_end") >= F.col("tw"))
        .withColumn("rn", F.row_number().over(qual))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_returnflag").alias("mb_flag"),
            F.col("bucket").alias("mb"),
            (F.col("cum_end") - F.col("bw")).alias("offset"),
            "tw",
        )
    )
    in_bucket = pl.join(
        F.broadcast(mb),
        (F.col("l_returnflag") == F.col("mb_flag"))
        & (F.col("bucket") == F.col("mb")),
    ).select("l_returnflag", "price", "w", "offset", "tw")
    wp = Window.partitionBy("l_returnflag").orderBy("price")
    return (
        in_bucket.withColumn("cum", F.sum("w").over(wp))
        .filter(2 * (F.col("offset") + F.col("cum")) >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").cast("double").alias("weighted_median_price")
        )
    )


# ---- hierarchical share-of-parent (round-7 continuation) --------------
# The ratio layer the rollup/cube keys do not give you: each nation's
# revenue as a share of its region and of the grand total — the
# drill-down readout every BI hierarchy renders.  Revenue sums are
# exact decimals; region/total denominators are decimal window sums
# over the DIMENSION-sized nation table (associative, window-order
# immune); the two shares are safe-magnitude decimal->double
# divisions (the HHI cast discipline — no wide-decimal cast).


@query(
    "agg_share_of_parent",
    sql="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS rv
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rv AS DOUBLE) AS revenue,
           CAST(rv AS DOUBLE)
           / CAST(SUM(rv) OVER (PARTITION BY region) AS DOUBLE)
               AS share_of_region,
           CAST(rv AS DOUBLE)
           / CAST(SUM(rv) OVER () AS DOUBLE) AS share_of_total
    FROM rev
    """,
    tables=("lineitem", "orders", "customer", "nation", "region"),
    scale_note=(
        "Share-of-parent hierarchy ratios: ONE fact-side two-phase "
        "agg to the nations-sized revenue table (dims broadcast), "
        "then two window sums over that DIMENSION-sized table (25 "
        "rows — the unpartitioned total is dimension-sized, never "
        "corpus-sized) and two IEEE divisions per output row.  All "
        "decimal->double casts stay in the sub-2^53-units regime "
        "(the HHI cast discipline); a x1000 corpus re-caps the "
        "denominators to DECIMAL(18,2) first."
    ),
)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue share of region and of total — hierarchical
    drill-down ratios from exact decimal sums."""
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        l.join(o, o["o_orderkey"] == l["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(dec("l_extendedprice") * (1 - dec("l_discount"))).alias("rv"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    rv = F.col("rv")
    return rev.select(
        "region",
        "nation",
        rv.cast("double").alias("revenue"),
        (rv.cast("double") / F.sum(rv).over(wr).cast("double")).alias(
            "share_of_region"
        ),
        (rv.cast("double") / F.sum(rv).over(wt).cast("double")).alias(
            "share_of_total"
        ),
    )


# ---- ABC / Pareto revenue classification (round-7 continuation) -------
# "Which orders carry 80% of the money?" — classify each order A/B/C
# by its group's cumulative revenue share at 80%/95%, ENTIRELY in
# integer arithmetic: the cumulative is exact cents, and the class
# boundaries are cross-multiplied integer comparisons
# (cum*100 <= total*80), so no float exists anywhere in the
# classification — only the summary row counts/ratios at the end.


@query(
    "agg_abc_classification",
    sql="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT o_orderpriority, cents,
               SUM(cents) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY cents DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               SUM(cents) OVER (PARTITION BY o_orderpriority) AS total
        FROM c
    ),
    k AS (
        SELECT o_orderpriority,
               CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               cents
        FROM r
    )
    SELECT o_orderpriority, abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM k GROUP BY 1, 2
    """,
    tables=("orders",),
    scale_note=(
        "Pareto/ABC classes per group with ZERO float in the "
        "classification: value-descending rank + exact-cents "
        "cumulative via the shared two-level path (distcum.py; the "
        "per-group total is a groups-sized broadcast), class boundaries as "
        "cross-multiplied INTEGER comparisons (cum*100 <= total*80 "
        "— no 0.8 literal to round), then a classes-sized agg.  "
        "cum*100 stays inside BIGINT until ~9e16 total cents per "
        "group; the DECIMAL(38,0) upgrade is the noted scale swap."
    ),
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B/C revenue classes per priority: orders covering the first
    80% / next 15% / tail of cumulative value, exact-integer cuts."""
    from ..operators.distcum import two_level_cumulative

    o = load(spark, sf_dir, "orders")
    c = o.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    # Value-descending exact-cents cumulative via the shared two-level
    # path (distcum.py); the per-group total is a groups-sized agg
    # broadcast back — no whole-group window partition anywhere.
    cum = two_level_cumulative(
        c,
        order_by=[F.col("cents").desc(), F.col("o_orderkey")],
        bucket_key="cents",
        group_cols=["o_orderpriority"],
        sum_cols=["cents"],
        descending=True,
    )
    totals = c.groupBy("o_orderpriority").agg(
        F.sum("cents").alias("total")
    )
    r = cum.join(F.broadcast(totals), "o_orderpriority").select(
        "o_orderpriority",
        "cents",
        F.col("cum_cents").alias("cum"),
        "total",
    )
    k = r.select(
        "o_orderpriority",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
    )
    return k.groupBy("o_orderpriority", "abc_class").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("class_cents"),
    )


# ---- trimmed mean (round-7 continuation) -------------------------------
# The robust-location companion of agg_weighted_median and the Tukey
# fences: drop the lowest and highest 5% of each group by rank
# (CROSS-MULTIPLIED integer boundaries — rank·20 vs n, no 0.05
# literal), then the exact-cents mean of the kept middle.  Zero float
# anywhere except the final division.


@query(
    "agg_trimmed_mean",
    sql="""
    WITH c AS (
        SELECT o_orderpriority AS g,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT g, cents,
               row_number() OVER (
                   PARTITION BY g ORDER BY cents, o_orderkey
               ) AS rnk,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM c
    ),
    kept AS (
        SELECT g, cents, n FROM r
        WHERE rnk * 20 > n AND rnk * 20 <= 19 * n
    )
    SELECT g AS o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(cents) AS BIGINT) AS kept_cents,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS trimmed_mean_cents
    FROM kept GROUP BY g
    """,
    tables=("orders",),
    scale_note=(
        "5%-each-side trimmed mean per group: the gini/Lorenz two-"
        "level rank (distcum.py; per-group n broadcast back), trim boundaries as CROSS-MULTIPLIED integer "
        "comparisons (rank*20 > n / <= 19n — no 0.05 literal to "
        "round), exact-cents sum of the kept middle, ONE division "
        "per group."
    ),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5% two-sided trimmed mean of order values per priority —
    exact-integer trim cuts, one final division."""
    from ..operators.distcum import two_level_cumulative

    o = load(spark, sf_dir, "orders")
    c = o.select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    # Rank via the shared two-level path (distcum.py); n via a groups-
    # sized agg broadcast back — no whole-group window partition.
    ranked = two_level_cumulative(
        c,
        order_by=["cents", "o_orderkey"],
        bucket_key="cents",
        group_cols=["g"],
        rank_col="rnk",
    )
    n_tbl = c.groupBy("g").agg(F.count("*").cast("bigint").alias("n"))
    r = ranked.join(F.broadcast(n_tbl), "g").select(
        "g", "cents", "rnk", "n"
    )
    kept = r.where(
        (F.col("rnk") * 20 > F.col("n"))
        & (F.col("rnk") * 20 <= 19 * F.col("n"))
    )
    return kept.groupBy("g").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("cents").cast("bigint").alias("kept_cents"),
        (F.sum("cents").cast("double") / F.count("*")).alias(
            "trimmed_mean_cents"
        ),
    ).select(
        F.col("g").alias("o_orderpriority"),
        "n_total",
        "n_kept",
        "kept_cents",
        "trimmed_mean_cents",
    )


@query(
    "agg_q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * CAST(floor(l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_micro,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * CAST(floor(l_discount * 100) AS BIGINT))
                AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    tables=("lineitem",),
    scale_note=(
        "TPC-H Q6 analog — the canonical predicate-pushdown showcase: "
        "ONE lineitem scan with all three predicates pushed into the "
        "parquet reader (shipdate min/max prunes whole row groups at "
        "100 TB when the table is ship-date-clustered — the "
        "sink_sorted_clustered layout), then a partial+final agg of a "
        "single BIGINT.  Zero joins, zero windows, shuffle carries "
        "exactly one row per task.  Revenue accumulates as exact "
        "cents×basis-points integers (< 2^63 at any plausible SF); "
        "the only float is one final display division."
    ),
)
def agg_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: potential revenue increase from discounted small
    orders shipped in 1996."""
    l = load(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("bigint")
    disc_bp = F.floor(F.col("l_discount") * 100).cast("bigint")
    filt = l.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filt.agg(
        F.sum(cents * disc_bp).cast("bigint").alias("revenue_micro"),
        (F.sum(cents * disc_bp).cast("double") / F.lit(10000.0)).alias(
            "revenue"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
