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
