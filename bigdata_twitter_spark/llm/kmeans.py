"""Deterministic Lloyd k-means over the embedding corpus — the
iterative-ML sibling of graph_pagerank (operators/graph.py): model
state lives on the driver (K×DIM floats, metadata-sized), each
iteration is one map-side assignment pass plus one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

K_MIN = 8
K_MAX = 128
TARGET_CLUSTER_SIZE = 250
ITERS = 3
DIM = 64


def k_for(n: int) -> int:
    """K ≈ n / target cluster size, clamped — keeps expected cluster
    occupancy (and any in-cluster pairwise work downstream, e.g.
    dedup_semantic_cluster) bounded as the corpus grows.  At the
    fixture scales (n ≤ 2000) this stays at K_MIN, so driver rows and
    numpy pins are geometry-stable."""
    return max(K_MIN, min(K_MAX, -(-n // TARGET_CLUSTER_SIZE)))


def _dist_structs(centroids: list[list[float]]) -> F.Column:
    """array<struct<dist,cid>> of squared L2 distances to each centroid.

    Whole-stage-codegen HOFs only (zip_with + aggregate) — no UDF, no
    explode: the embedding array never leaves its row for assignment.
    """
    entries = []
    for cid, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with("embedding", lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        entries.append(F.struct(d.alias("dist"), F.lit(cid).alias("cid")))
    return F.array(*entries)


@query(
    "cluster_kmeans_lloyd",
    sql=None,  # Iterative fixed-point — not SQL-expressible for the
    # driver oracle; tests/test_weak_ops.py re-runs the identical
    # deterministic algorithm in numpy and requires assignment
    # equality at sf0.001.
    tables=("embeddings",),
    scale_note=(
        "Lloyd k-means the way MLlib runs it: centroids are MODEL "
        "STATE (K×DIM floats, K ≈ n/250 clamped to [8, 128] so "
        "cluster occupancy stays bounded at scale) — collected once per "
        "iteration and broadcast back as literals, never a data-sized "
        "collect. Assignment is map-side whole-stage-codegen "
        "(zip_with/aggregate HOFs, no UDF, no explode); the only "
        "shuffle per iteration is the (cluster, pos)-keyed mean agg, "
        "partial-aggregated map-side first. Deterministic: init = "
        "first K vec_ids, fixed iteration count, argmin ties break to "
        "the smallest centroid id. At 100 TB: assignment scans "
        "parallelize freely, the shuffle payload is K×DIM per "
        "partition, and the driver holds only the model."
    ),
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration deterministic Lloyd k-means (K = k_for(n), init =
    first K vectors by vec_id); returns (vec_id, cluster, dist6)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.persist()
    try:
        k = k_for(emb.count())  # scalar; catalog stats at 100 TB
        init_rows = (
            emb.orderBy("vec_id").limit(k).select("embedding").collect()
        )
        centroids = [list(map(float, r["embedding"])) for r in init_rows]
        if not centroids:
            # Empty corpus: run the normal plan against one dummy
            # centroid — zero rows out, and the schema (incl.
            # nullability) is identical to the non-empty path.
            # (array_min over an EMPTY struct array would type as VOID
            # and break the cid extraction.)
            centroids = [[0.0] * DIM]

        for _ in range(ITERS):
            assigned = emb.withColumn(
                "best", F.array_min(_dist_structs(centroids))
            ).select(
                "vec_id",
                "embedding",
                F.col("best.cid").alias("cluster"),
            )
            means = (
                assigned.select(
                    "cluster", F.posexplode("embedding").alias("pos", "val")
                )
                .groupBy("cluster", "pos")
                .agg(F.avg("val").alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("pm")
                )
                .select("cluster", F.col("pm.m").alias("centroid"))
                .collect()  # K rows of DIM floats: model state, not data
            )
            new_centroids = list(centroids)  # empty cluster keeps old
            for r in means:
                new_centroids[r["cluster"]] = list(map(float, r["centroid"]))
            centroids = new_centroids

        return emb.withColumn(
            "best", F.array_min(_dist_structs(centroids))
        ).select(
            "vec_id",
            F.col("best.cid").alias("cluster"),
            F.round(F.col("best.dist"), 6).alias("dist6"),
        )
    finally:
        emb.unpersist()
