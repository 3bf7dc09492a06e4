"""Skew-mitigated join (SURVEY.md §7 "100-TB posture" salting recipe,
now as a registered operator rather than prose).

The demonstration key is ``l_returnflag``: 3 distinct values over the
whole lineitem table — the textbook hot-key distribution where a plain
shuffle join lands everything on 3 reducer partitions.  The salted
plan:

* fact side gets ``salt = pmod(xxhash64(unique cols), S)`` — a
  value-derived, partition-order-independent spread over S buckets;
* the (tiny, aggregated) dim side is exploded ×S so every
  (key, salt) fact row finds its dim row;
* the join key becomes (key, salt): 3 hot keys → 3·S well-sized
  buckets.  ``hint("shuffle_hash")`` forces the shuffle join so the
  salting (not auto-broadcast) is what the plan demonstrates; in
  production the same recipe applies when the dim is too big to
  broadcast but the fact key is skewed.

Result values are salt-independent (salting only re-partitions), so
the DuckDB oracle is the plain unsalted join — a full hash-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

SALT_BUCKETS = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    unique_cols: list[str],
    buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """The reusable salting recipe: join ``fact`` (skewed on
    ``key_cols``) to a small-but-not-broadcastable ``dim``.

    The fact salt is value-derived (``xxhash64`` of ``unique_cols`` —
    deterministic and partition-order independent, never
    ``monotonically_increasing_id``); the dim side is exploded
    ``×buckets`` so every (key, salt) fact row finds its dim row.  Each
    hot key's reducer bucket shrinks ``buckets``-fold.  Values are
    salt-invariant: the result equals the plain join.
    """
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    fact_salted = fact.withColumn(
        "salt",
        F.pmod(F.xxhash64(*unique_cols), F.lit(buckets)).cast("int"),
    )
    return fact_salted.join(
        dim_salted.hint("shuffle_hash"), [*key_cols, "salt"]
    ).drop("salt")


@query(
    "join_skew_salted",
    sql="""
    WITH dim AS (
        SELECT l_returnflag,
               round(avg(CAST(l_discount AS DOUBLE)), 6) AS flag_avg_disc,
               COUNT(*) AS flag_rows
        FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           d.flag_avg_disc, d.flag_rows
    FROM lineitem l JOIN dim d USING (l_returnflag)
    """,
    tables=("lineitem",),
    scale_note=(
        "Hot-key (3-value) join salted to key×16: fact salt is "
        "value-derived (xxhash64 of the row's unique columns, never "
        "monotonically_increasing_id), dim exploded ×16, shuffle-hash "
        "join on (key, salt) → worst reducer bucket shrinks 16×. "
        "Values are salt-invariant, so the oracle is the unsalted join."
    ),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row lineitem enrichment with per-returnflag stats via a
    salted shuffle join over the 3-value hot key."""
    li = load(spark, sf_dir, "lineitem")
    dim = li.groupBy("l_returnflag").agg(
        F.round(F.avg(F.col("l_discount").cast("double")), 6).alias(
            "flag_avg_disc"
        ),
        F.count("*").alias("flag_rows"),
    )
    fact = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    return salted_join(
        fact, dim, ["l_returnflag"], ["l_orderkey", "l_linenumber"]
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "flag_avg_disc",
        "flag_rows",
    )
