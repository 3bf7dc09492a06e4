"""Projection / filter / predicate operators (SURVEY.md §2.B).

Reference parity: the tweet-analytics genre filters by language,
keyword, and numeric thresholds before aggregating (SURVEY.md §2.B
provenance; no file:line possible — reference checkout empty, §0.1).

Scale posture: filters and column pruning here are expressed
declaratively so Catalyst pushes them into the parquet scan
(PushedFilters / ReadSchema in explain output) — at 100 TB predicate
pushdown + row-group statistics skipping is the difference between
scanning terabytes and scanning gigabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..numerics import dec
from ..registry import query
from ..tables import load


@query(
    "project_select",
    sql="""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_no,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2)) AS DOUBLE) AS revenue,
           l_returnflag
    FROM lineitem
    """,
    tables=("lineitem",),
    scale_note=(
        "4-column projection of a wide table: column pruning reaches the scan, "
        "so only those parquet column chunks are read."
    ),
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + computed column (tweet field extraction analog)."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        (dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("revenue"),
        "l_returnflag",
    )


@query(
    "filter_predicate",
    sql="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type = 'click' AND value > 100.0)
       OR (event_type = 'error' AND value <= 50.0)
    """,
    tables=("events",),
    scale_note="Conjunctive/disjunctive predicate pushed to the parquet scan.",
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicates (keyword+threshold filter analog)."""
    e = load(spark, sf_dir, "events")
    return e.filter(
        ((F.col("event_type") == "click") & (F.col("value") > 100.0))
        | ((F.col("event_type") == "error") & (F.col("value") <= 50.0))
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "filter_in_between_null",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderdate IS NOT NULL
    """,
    tables=("orders",),
    scale_note="IN/BETWEEN/IS NULL all convert to scan-level filters.",
)
def filter_in_between_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, BETWEEN range, and null-check predicate semantics."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_regex",
    sql=r"""
    SELECT doc_id, lang, text
    FROM documents
    WHERE regexp_matches(text, 'spark [a-z]+ (join|merge)')
    """,
    tables=("documents",),
    scale_note=(
        "Regex runs JVM-side inside codegen; ASCII-only pattern keeps Java and "
        "RE2 dialects identical. At 100 TB pre-filter with a cheap substring "
        "contains() before the regex."
    ),
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex keyword matching over document text (tweet keyword filter analog)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(F.col("text").rlike(r"spark [a-z]+ (join|merge)")).select(
        "doc_id", "lang", "text"
    )


@query(
    "distinct_rows",
    sql="SELECT DISTINCT user_id, event_type FROM events",
    tables=("events",),
    scale_note="DISTINCT = hash aggregate on all columns; two-phase, no sort.",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user, event_type) pairs."""
    e = load(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()
