"""Iterative graph analytics (SURVEY.md §2.N extras): PageRank over
the customer–part co-purchase graph — the representative of the
iterative-DataFrame-algorithm family (fixed-point loops the driver's
SQL oracle cannot express; declared rows-only per the
``__spark_entry__`` contract, with an exact local numpy cross-check in
tests/test_weak_ops.py).

Graph construction is deterministic from the fixtures: an undirected
bipartite edge (customer, part) exists where the customer ever ordered
the part.  Part vertices are offset by PART_OFFSET to disambiguate the
two id spaces.

Scale posture: each iteration is one edge-keyed join + one vertex-keyed
aggregation — the standard Pregel-as-DataFrame shape.  Ranks and the
(static) adjacency stay partitioned on vertex id across iterations, so
every iteration reuses the same hash partitioning; the edge list is
persisted once.  No collect, no driver-side graph.  ITERATIONS is
fixed (5) — at 100 TB convergence-checked loops add one tiny agg per
round (max |Δrank|), same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import query
from ..tables import load

PART_OFFSET = 1_000_000_000
DAMPING = 0.85
ITERATIONS = 5


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (customer, part) edges, both directions, distinct."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_partkey") + PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    return cp.select(F.col("c").alias("src"), F.col("p").alias("dst")).unionAll(
        cp.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )


@query(
    "graph_pagerank",
    sql=None,  # Fixed-point iteration — not SQL-expressible for the
    # driver oracle; tests/test_weak_ops.py cross-checks every rank
    # against an exact numpy power iteration at sf0.001.
    tables=("orders", "lineitem"),
    scale_note=(
        "PageRank as iterated DataFrame algebra: per-iteration cost is "
        "one join on src + one groupBy on dst — both hash-partitioned "
        "on vertex id, so the partitioning is reused across all 5 "
        "rounds; the edge list is computed once and persisted. No "
        "dangling mass (undirected construction ⇒ every vertex has "
        "out-degree ≥ 1). The Pregel-on-Spark shape that scales to "
        "billions of edges."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration damped PageRank over the co-purchase graph; returns
    (vertex, is_part, rank)."""
    edges = copurchase_edges(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    vertices = deg.select("src").withColumnRenamed("src", "v")
    n = vertices.count()  # scalar (vertex count), not data
    adj = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    ranks = vertices.select("v", F.lit(1.0 / n).alias("rank"))
    for _ in range(ITERATIONS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["v"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = vertices.join(
            contribs, vertices["v"] == contribs["dst"], "left"
        ).select(
            "v",
            (
                F.lit((1.0 - DAMPING) / n)
                + F.lit(DAMPING) * F.coalesce("s", F.lit(0.0))
            ).alias("rank"),
        )
    edges.unpersist()
    return ranks.select(
        F.when(F.col("v") >= PART_OFFSET, F.col("v") - PART_OFFSET)
        .otherwise(F.col("v"))
        .alias("vertex"),
        (F.col("v") >= PART_OFFSET).alias("is_part"),
        "rank",
    )
