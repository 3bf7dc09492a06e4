"""Sort / limit / top-K operators (SURVEY.md §2.F).

Reference parity: "top-K trending" (hashtags, users) is the signature
query of the tweet-analytics genre; global sorted exports are its
output stage (provenance §2.F; reference checkout empty — §0.1).

Scale posture: a global ORDER BY + LIMIT k plans as
TakeOrderedAndProject — per-partition top-k heaps, then a k-element
merge on the driver — so top-K never triggers a full global sort.
Unbounded global sorts (sort_multikey) use range partitioning with
sampled bounds; at 100 TB keep them to final exports only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "sort_multikey",
    sql="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
    """,
    tables=("orders",),
    scale_note=(
        "Global sort = sample-based range partitioning + partition-local sort; "
        "O(n log n) per partition, one extra stage for bounds sampling."
    ),
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null ordering and a total tiebreak."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    ).orderBy(
        F.col("o_orderpriority").asc_nulls_first(),
        F.col("o_totalprice").desc(),
        F.col("o_orderkey").asc(),
    )


@query(
    "limit_topk_global",
    sql="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id ASC
    LIMIT 10
    """,
    tables=("events",),
    scale_note=(
        "TakeOrderedAndProject: per-partition 10-element heaps → driver merge. "
        "The unique event_id tiebreak makes the top-10 set deterministic."
    ),
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 events by value (trending-list analog) with total order."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
    )


# ---- range-partition boundary planning (round 7) ---------------------
# The planner inside every repartitionByRange / global sort (TeraSort's
# trick), made explicit and verifiable: draw a DETERMINISTIC sample
# (md5 rank — the house permutation stand-in for Spark's reservoir),
# take its order statistics as bucket boundaries, and report how the
# FULL table lands in those buckets.  At 100 TB this is the step that
# decides whether a global sort is balanced; making it a first-class
# verified operator means the balance claim is measurable instead of
# folklore.
RANGE_BUCKETS = 16
RANGE_SAMPLE = 1600  # sample size: 100 per boundary


@query(
    "sort_range_boundaries",
    sql=f"""
    WITH s AS (
        SELECT o_totalprice FROM (
            SELECT o_totalprice,
                   row_number() OVER (
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
                   ) AS rn
            FROM orders
        ) WHERE rn <= {RANGE_SAMPLE}
    ),
    b AS (
        SELECT o_totalprice AS bound FROM (
            SELECT o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice) AS sr,
                   COUNT(*) OVER () AS sn
            FROM s
        ) WHERE (sn // {RANGE_BUCKETS}) > 0
          AND sr % (sn // {RANGE_BUCKETS}) = 0
          AND sr // (sn // {RANGE_BUCKETS}) < {RANGE_BUCKETS}
    ),
    assigned AS (
        SELECT o.o_orderkey, o.o_totalprice,
               (SELECT COUNT(*) FROM b WHERE b.bound < o.o_totalprice)
                   AS bucket
        FROM orders o
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM assigned GROUP BY 1
    """,
    tables=("orders",),
    scale_note=(
        "The repartitionByRange planner as a verified operator: the "
        "sample is md5-deterministic (layout-independent, unlike "
        "Spark's RNG reservoir — so boundaries are reproducible "
        "across runs and engines), boundary extraction is an order "
        "statistic over the SAMPLE (a 1600-row window — "
        "aggregate-sized), and full-table assignment is a broadcast "
        "of ≤15 boundary values folded per row (codegen; the oracle "
        "states it as a correlated count, same integers).  The "
        "per-bucket histogram is the balance evidence a 100-TB "
        "global sort needs BEFORE it launches; buckets land within "
        "sampling error of n/16 (referee-pinned ±40%)."
    ),
)
def sort_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundaries from a deterministic sample, plus
    the full table's per-bucket histogram (the balance audit)."""
    from pyspark.sql import Window

    from .distcum import two_level_cumulative

    o = load(spark, sf_dir, "orders")
    # md5-rank the table on the two-level path (round-9 window audit:
    # the naive rank window got NO WindowGroupLimit — RANGE_SAMPLE
    # exceeds Spark's 1000-row rewrite threshold — so the whole table
    # sorted in one partition).  Bucket on the first-8-hex-digit
    # numeric prefix: monotone in the md5 string, so the bucket cut
    # preserves the sample order; rank_limit prunes each bucket to
    # its local top-1600 before the offset join.
    hashed = o.select(
        "o_totalprice",
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    ).withColumn(
        "hb", F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")
    )
    s = two_level_cumulative(
        hashed,
        order_by=["h", "o_orderkey"],
        bucket_key="hb",
        rank_col="rn",
        rank_limit=RANGE_SAMPLE,
    ).select("o_totalprice")
    ranked = s.select(
        "o_totalprice",
        F.row_number().over(Window.orderBy("o_totalprice")).alias("sr"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("sn"),
    )
    # A sample smaller than the bucket count has step 0: no boundary
    # can be cut (everything lands in bucket 0) — the step > 0 guard
    # keeps the modulo from raising ANSI REMAINDER_BY_ZERO (r10
    # one-row sweep; oracle guarded identically).  The guard is a
    # lazy CASE arm, not a leading conjunct: Catalyst does not
    # guarantee left-to-right conjunct evaluation inside one Filter
    # after optimization, so `(step > 0) & (sr % step == 0)` could be
    # reordered into the very raise it guards against (ADVICE r10).
    step = (F.col("sn") / RANGE_BUCKETS).cast("bigint")
    keep = F.when(
        step > 0,
        (F.col("sr") % step == 0)
        & ((F.col("sr") / step).cast("bigint") < RANGE_BUCKETS),
    ).otherwise(F.lit(False))
    bounds = ranked.filter(keep).select(F.col("o_totalprice").alias("bound"))
    blist = bounds.agg(
        F.sort_array(F.collect_list("bound")).alias("bs")
    )
    assigned = o.crossJoin(F.broadcast(blist)).select(
        "o_totalprice",
        F.aggregate(
            F.filter("bs", lambda b: b < F.col("o_totalprice")),
            F.lit(0),
            lambda acc, _: acc + 1,
        ).alias("bucket"),
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    ).select(
        F.col("bucket").cast("int").alias("bucket"), "n_rows", "lo", "hi"
    )


# ---- Pareto skyline (round-7 continuation) ----------------------------
# The classic "skyline query" (Börzsönyi et al., ICDE 2001): the set
# of non-dominated rows under (minimize price, maximize size).  The
# Spark path is the sort-sweep formulation — domination collapses to
# a running-max scan over the price-DOMAIN-sized distinct table — and
# the oracle states the textbook NOT EXISTS anti-join semantics, so
# the two engines compute the front by DISJOINT routes (the
# multimodal_jpeg_decode verification pattern).


@query(
    "agg_skyline_pareto",
    sql="""
    SELECT p_partkey, p_name, p_brand,
           CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
           p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE CAST(floor(q.p_retailprice * 100) AS BIGINT)
                  <= CAST(floor(p.p_retailprice * 100) AS BIGINT)
          AND q.p_size >= p.p_size
          AND (CAST(floor(q.p_retailprice * 100) AS BIGINT)
                   < CAST(floor(p.p_retailprice * 100) AS BIGINT)
               OR q.p_size > p.p_size)
    )
    """,
    tables=("part",),
    scale_note=(
        "2-D skyline via sort-sweep: collapse to the DISTINCT "
        "(price_cents -> max size) table (price-domain-sized, not "
        "corpus-sized), one running-max window over sorted prices "
        "keeps a price level iff its best size strictly beats every "
        "strictly-cheaper level, then one semi-join back to the "
        "corpus lists every row on the front.  No pairwise "
        "domination join anywhere on the Spark side; the oracle's "
        "NOT EXISTS is the quadratic textbook statement — disjoint "
        "routes to the same front.  Past the domain regime the "
        "sweep takes the two-level range-bucket cumulative "
        "(sample_weighted_pps idiom)."
    ),
)
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto front of parts under (min retail price, max size), via a
    domain-sized sort-sweep + semi-join back to rows."""
    from .distcum import two_level_cumulative

    p = load(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100).cast("bigint")
    rows = p.select(
        "p_partkey",
        "p_name",
        "p_brand",
        cents.alias("price_cents"),
        "p_size",
    )
    # price level -> best size at that level (same-price domination)
    lvl = rows.groupBy("price_cents").agg(F.max("p_size").alias("ms"))
    # Running max over strictly-cheaper levels via the shared
    # two-level path (distcum.py) — the distinct-price table is
    # domain-sized today but grows with the price domain at real
    # scale; no unpartitioned window at any size.
    front_lvls = (
        two_level_cumulative(
            lvl,
            order_by=["price_cents"],
            bucket_key="price_cents",
            prevmax_cols=["ms"],
        )
        .where(
            F.col("prevmax_ms").isNull() | (F.col("ms") > F.col("prevmax_ms"))
        )
        .select("price_cents", F.col("ms").alias("p_size"))
    )
    return rows.join(
        F.broadcast(front_lvls), ["price_cents", "p_size"], "semi"
    ).select("p_partkey", "p_name", "p_brand", "price_cents", "p_size")
