"""kNN graph construction + embedding health stats (SURVEY.md §2.N,
round 4).

`knn_graph_topk` is the exact-ground-truth twin of the family's scale
paths (same division of labor as sim_pairs_threshold vs
sim_pairs_bucketed): the k-nearest-neighbor GRAPH — every vector's
top-k neighbors — is the substrate for graph-based dedup
(dedup_components over kNN edges), semantic clustering, and ANN recall
evaluation.  At corpus scale the same output comes from the IVF /
SRP-LSH candidate generators (sim_ivf_topk, sim_pairs_bucketed)
followed by this exact re-rank restricted to candidates.

`embed_dim_stats` is the per-dimension distribution profile (collapse /
scale drift detection) every embedding pipeline runs before trusting
cosine geometry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, spread
from .vectors import DIMS, duck_cosine

KNN_K = 3


@query(
    "knn_graph_topk",
    sql=f"""
    WITH pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               {duck_cosine('a.embedding', 'b.embedding')} AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    )
    SELECT src, dst, cosine,
           CAST(rn AS INT) AS k
    FROM (
        SELECT src, dst, cosine,
               row_number() OVER (
                   PARTITION BY src ORDER BY cosine DESC, dst ASC
               ) AS rn
        FROM pairs
    )
    WHERE rn <= {KNN_K}
    """,
    tables=("embeddings",),
    scale_note=(
        "Exact kNN graph (ground-truth twin): all-pairs cosine BY "
        "CONTRACT — this is the baseline the ANN paths are validated "
        "against, and the exact re-rank applied to their candidate "
        "sets. The top-k cut is a per-src window on the rounded "
        "cosine with a dst tiebreak (deterministic on both engines). "
        "At 100 TB the pair generator is replaced by sim_ivf_topk / "
        "sim_pairs_bucketed candidates and THIS plan re-ranks them — "
        "candidates x O(k) instead of n^2."
    ),
)
def knn_graph_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 cosine neighbors for every vector (kNN graph)."""
    e = load(spark, sf_dir, "embeddings")
    # Hoist each side's self-dot out of the pair projection: the naive
    # spark_cosine recomputes BOTH norms per pair (3 x 64-term folds x
    # n² pairs); precomputing them per ROW leaves one fold per pair —
    # the same expression over the same values, so the double (and its
    # 6dp rounding) is bit-identical (guide §1.2 step 2).
    sq = F.expr(
        "aggregate(zip_with(embedding, embedding,"
        " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    # Spread the probe side by src BEFORE the broadcast join: the scan
    # is a single split locally, so the n² cosine folds would run on
    # one core; hash-partitioning on src is also exactly the window's
    # clustered-distribution requirement, so the n² pair rows never
    # shuffle — the ONLY exchange is the n-row pre-join spread (guide
    # §2.4/§2.5; no-op at real scan widths).
    a = spread(e, sf_dir, "embeddings", "vec_id").select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("va"),
        sq.alias("sa"),
    )
    b = e.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("vb"),
        sq.alias("sb"),
    )
    dot_ab = F.expr(
        "aggregate(zip_with(va, vb,"
        " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    pairs = a.join(F.broadcast(b), F.col("src") != F.col("dst")).select(
        "src",
        "dst",
        F.round(dot_ab / (F.sqrt("sa") * F.sqrt("sb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
        .select("src", "dst", "cosine", F.col("rn").cast("int").alias("k"))
    )


@query(
    "embed_dim_stats",
    sql=f"""
    WITH d AS (
        SELECT i.i AS dim, CAST(embedding[i.i] AS DOUBLE) AS x
        FROM embeddings, range(1, {DIMS + 1}) AS i(i)
    )
    SELECT CAST(dim AS INT) AS dim,
           round(AVG(x), 6) AS mean,
           round(STDDEV_SAMP(x), 6) AS std,
           round(MIN(x), 6) AS min_v,
           round(MAX(x), 6) AS max_v
    FROM d GROUP BY dim
    """,
    tables=("embeddings",),
    scale_note=(
        "Per-dimension distribution profile (collapse / drift check): "
        "posexplode to (dim, value) then ONE partial-aggregated "
        "shuffle whose key space is the embedding width — the reduce "
        "side is 64 rows no matter the corpus size. The map side "
        "combines locally, so shuffle volume is partitions x dims, "
        "not rows x dims."
    ),
)
def embed_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/std/min/max per embedding dimension across the corpus."""
    e = load(spark, sf_dir, "embeddings")
    d = e.select(
        F.posexplode(F.col("embedding")).alias("pos", "xf")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    return d.groupBy("dim").agg(
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.stddev_samp("x"), 6).alias("std"),
        F.round(F.min("x"), 6).alias("min_v"),
        F.round(F.max("x"), 6).alias("max_v"),
    )
