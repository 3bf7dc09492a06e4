"""Set operators (SURVEY.md §2.G): union all/distinct, intersect, except.

Scale posture: UNION ALL is a zero-shuffle concatenation of inputs;
the distinct variants add one hash-aggregate shuffle on all columns.
INTERSECT/EXCEPT plan as hash joins on the full row — fine when the
projected key set is narrow, as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "set_union_all",
    sql="""
    SELECT user_id, event_type, value FROM events WHERE value > 250.0
    UNION ALL
    SELECT user_id, event_type, value FROM events WHERE event_type = 'signup'
    """,
    tables=("events",),
    scale_note="Bag union: plan concatenation, no shuffle, duplicates kept.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two overlapping event slices (duplicates preserved)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
    return e.filter(F.col("value") > 250.0).unionByName(
        e.filter(F.col("event_type") == "signup")
    )


@query(
    "set_union_distinct",
    sql="""
    SELECT user_id, event_type, value FROM events WHERE value > 250.0
    UNION
    SELECT user_id, event_type, value FROM events WHERE event_type = 'signup'
    """,
    tables=("events",),
    scale_note="Set union = bag union + hash-distinct (one shuffle).",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union of the same two slices (duplicates collapsed)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
    return (
        e.filter(F.col("value") > 250.0)
        .unionByName(e.filter(F.col("event_type") == "signup"))
        .distinct()
    )


@query(
    "set_intersect",
    sql="""
    SELECT user_id FROM events
    INTERSECT
    SELECT c_custkey AS user_id FROM customer
    """,
    tables=("events", "customer"),
    scale_note="INTERSECT (distinct) = hash semi-join on the projected key.",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event users that are also customer keys (set semantics)."""
    e = load(spark, sf_dir, "events").select("user_id")
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    return e.intersect(c)


@query(
    "set_except",
    sql="""
    SELECT user_id FROM events
    EXCEPT
    SELECT c_custkey AS user_id FROM customer
    """,
    tables=("events", "customer"),
    scale_note="EXCEPT (distinct) = hash anti-join on the projected key.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event users that are NOT customer keys (set difference)."""
    e = load(spark, sf_dir, "events").select("user_id")
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    return e.subtract(c)
