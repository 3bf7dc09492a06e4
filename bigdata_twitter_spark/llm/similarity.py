"""Similarity search over embeddings (SURVEY.md §2.L): brute-force
cosine top-k, threshold pair mining, label centroids, k-NN against
centroids — all with pure DataFrame higher-order functions (no UDFs).

Scale posture (100 TB / billions of vectors): the brute-force paths
here are the exact baselines; the scale path is IVF-style bucketing —
assign each vector to its nearest centroid (sim_knn_join IS that
assignment), then restrict pair mining / top-k probes to matching or
adjacent buckets. LSH banding (as in dedup_minhash_lsh) is the
alternative when no trained centroids exist.  Float accumulation is
rounded to 6dp on both engines because summation order/compensation
differs (Kahan vs fold) at the 1e-15 level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .vectors import (
    DIMS,
    PAIR_COSINE_THRESHOLD,
    duck_cosine as _duck_cosine,
    spark_cosine as _spark_cosine,
)


@query(
    "sim_cosine_topk",
    sql=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           {_duck_cosine('e.embedding', 'q.qv')} AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id ASC
    LIMIT 10
    """,
    tables=("embeddings",),
    scale_note=(
        "Brute-force top-k: broadcast the query vector, one scan, "
        "TakeOrderedAndProject top-10 (per-partition heaps). The exact "
        "baseline every ANN variant is validated against."
    ),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest vectors (cosine) to the vec_id=0 query vector."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            _spark_cosine("embedding", "qv").alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "sim_pairs_threshold",
    sql=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           {_duck_cosine('a.embedding', 'b.embedding')} AS cosine
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND {_duck_cosine('a.embedding', 'b.embedding')} >= {PAIR_COSINE_THRESHOLD}
    """,
    tables=("embeddings",),
    scale_note=(
        "All-pairs ≥ τ via self cross-join — exact but O(n²): correct at "
        "fixture scale, and the verification oracle for the bucketed path. "
        "At 100 TB: IVF-bucket by nearest centroid first (sim_knn_join), "
        "then run this within buckets only."
    ),
)
def sim_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ 0.4."""
    e = load(spark, sf_dir, "embeddings")
    # Precompute each vector's self-dot ONCE (r4: the naive form let
    # the pushed-down join condition re-fold BOTH norms per candidate
    # pair — 3 interpreted 64-element folds x n²/2 pairs ≈ 95 s at
    # n=2000; one fold per pair is ~3x less work, same values bitwise
    # since sqrt(sum) of the identical left fold is unchanged).
    self_dot = F.expr(
        "aggregate(zip_with(embedding, embedding,"
        " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    w = e.select("vec_id", "embedding", self_dot.alias("sq"))
    a = w.alias("a")
    b = w.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding,"
        " (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    cosine = F.round(
        dot / (F.sqrt(F.col("a.sq")) * F.sqrt(F.col("b.sq"))), 6
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= PAIR_COSINE_THRESHOLD)
    )


@query(
    "embed_centroid_per_label",
    sql=f"""
    SELECT label, CAST(i - 1 AS INT) AS pos,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS centroid_val
    FROM embeddings, range(1, {DIMS + 1}) t(i)
    GROUP BY 1, 2
    """,
    tables=("embeddings",),
    scale_note=(
        "posexplode → (label, pos) mean: shuffle carries labels × dims rows "
        "after partial aggregation — constant-size regardless of vector count."
    ),
)
def embed_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("centroid_val"))
    )


@query(
    "sim_knn_join",
    sql=f"""
    WITH c AS (
        SELECT label AS clabel, i AS pos,
               round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        GROUP BY 1, 2
    ),
    cl AS (SELECT clabel, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1),
    s AS (
        SELECT e.vec_id, e.label, cl.clabel,
               {_duck_cosine('e.embedding', 'cl.cvec')} AS cosine
        FROM embeddings e, cl
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, clabel) AS rnk
          FROM s)
    SELECT vec_id, label, clabel, cosine, rnk FROM r WHERE rnk <= 3
    """,
    tables=("embeddings",),
    scale_note=(
        "k-NN against label centroids: centroids are tiny and broadcast, so "
        "this is a map-side scoring pass + per-vector top-3 window (the IVF "
        "assignment step for the bucketed similarity path). Centroid values "
        "are rounded BEFORE scoring so both engines score identical centroids."
    ),
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest label centroids per vector."""
    e = load(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy(F.col("label").alias("clabel"), F.col("pos"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("cv"))
    )
    cvec = cent.groupBy("clabel").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))),
            lambda x: x["cv"],
        ).alias("cvec")
    )
    scored = e.join(F.broadcast(cvec)).select(
        "vec_id",
        "label",
        "clabel",
        _spark_cosine("embedding", "cvec").alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("clabel")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


BATCH_QUERY_IDS = (0, 1, 2)
BATCH_TOPK = 3


@query(
    "sim_batch_queries_topk",
    sql=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id IN {BATCH_QUERY_IDS!r}
    )
    SELECT query_id, e.vec_id, e.label,
           {_duck_cosine('e.embedding', 'q.qv')} AS cosine
    FROM embeddings e, q
    WHERE e.vec_id <> q.query_id
    QUALIFY row_number() OVER (
        PARTITION BY query_id
        ORDER BY {_duck_cosine('e.embedding', 'q.qv')} DESC, e.vec_id ASC
    ) <= {BATCH_TOPK}
    """,
    tables=("embeddings",),
    scale_note=(
        "Batched ANN serving shape: ALL query vectors broadcast once, "
        "one corpus scan scores every (vector, query) pair map-side, "
        "one query-keyed window takes per-query top-k. Corpus is read "
        "ONCE regardless of batch size — the amortization that makes "
        "1000-query batches affordable at 100 TB (vs. 1000 scans)."
    ),
)
def sim_batch_queries_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query top-3 cosine neighbors for a broadcast batch of
    query vectors (vec_ids 0, 1, 2), in one corpus scan."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id").isin(*BATCH_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            _spark_cosine("embedding", "qv").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BATCH_TOPK)
        .drop("rn")
    )


# ---- centroid-classifier confusion matrix (round-7 continuation) ------
# The eval layer over sim_knn_join's rank-1 assignment: treat "nearest
# label centroid" as a classifier and report the confusion matrix plus
# per-label accuracy — the same eval-key pattern as ann_recall_eval
# (retrieval) and text_lang_id_eval (lang-id).  COMPOSES the
# registered sim_knn_join plan (broadcast centroids, map-side scoring,
# per-vector top-1 window), so the probed scale path is inherited.


@query(
    "embed_centroid_confusion",
    sql=f"""
    WITH c AS (
        SELECT label AS clabel, i AS pos,
               round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        GROUP BY 1, 2
    ),
    cl AS (SELECT clabel, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1),
    s AS (
        SELECT e.vec_id, e.label, cl.clabel,
               {_duck_cosine('e.embedding', 'cl.cvec')} AS cosine
        FROM embeddings e, cl
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, clabel) AS rnk
          FROM s),
    p AS (SELECT label, clabel AS predicted FROM r WHERE rnk = 1)
    SELECT label, predicted,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN label = predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM p GROUP BY 1, 2
    """,
    tables=("embeddings",),
    scale_note=(
        "Nearest-centroid-classifier confusion matrix: inherits "
        "sim_knn_join's probed plan (labels-sized centroid table "
        "broadcast, map-side cosine scoring, per-vector top-1 "
        "window), then one labels-squared-sized two-phase agg — "
        "the eval output is K^2 rows regardless of corpus size.  "
        "Centroid values are rounded before scoring so both "
        "engines score identical centroids (the sim_knn_join "
        "discipline)."
    ),
)
def embed_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the nearest-label-centroid classifier over
    the embeddings table (composes sim_knn_join's rank-1 assignment)."""
    top1 = sim_knn_join(spark, sf_dir).where(F.col("rnk") == 1)
    return (
        top1.select("label", F.col("clabel").alias("predicted"))
        .groupBy("label", "predicted")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("label") == F.col("predicted"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
    )


# ---- centroid silhouette (round-7 continuation) ------------------------
# The clustering-quality eval beside embed_centroid_confusion: the
# simplified (centroid-based) silhouette — a = cosine DISTANCE to the
# nearest label centroid, b = distance to the second-nearest,
# s = (b − a)/max(a, b) — per vector.  Composes sim_knn_join's rank-1
# and rank-2 rows (broadcast rounded centroids, map-side scoring), so
# every float is already engine-pinned; the silhouette is two
# subtractions and one division more.


@query(
    "embed_silhouette_centroid",
    sql=f"""
    WITH c AS (
        SELECT label AS clabel, i AS pos,
               round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        GROUP BY 1, 2
    ),
    cl AS (SELECT clabel, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1),
    s AS (
        SELECT e.vec_id, e.label, cl.clabel,
               {_duck_cosine('e.embedding', 'cl.cvec')} AS cosine
        FROM embeddings e, cl
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cosine DESC, clabel) AS rnk
          FROM s),
    p AS (
        SELECT r1.vec_id, r1.label,
               r1.clabel AS assigned,
               1.0 - r1.cosine AS a_dist,
               1.0 - r2.cosine AS b_dist
        FROM r r1 JOIN r r2
          ON r2.vec_id = r1.vec_id AND r1.rnk = 1 AND r2.rnk = 2
    )
    SELECT vec_id, label, assigned, a_dist, b_dist,
           CASE WHEN greatest(a_dist, b_dist) = 0.0 THEN 0.0
                ELSE (b_dist - a_dist) / greatest(a_dist, b_dist)
           END AS silhouette
    FROM p
    """,
    tables=("embeddings",),
    scale_note=(
        "Centroid-based silhouette per vector: inherits "
        "sim_knn_join's probed plan (labels-sized broadcast "
        "centroids, map-side cosine, per-vector top-2 window) plus "
        "one vec-keyed self-pair and three IEEE ops per row — "
        "map-sided end to end, output corpus-rows-sized like every "
        "per-vector scoring key.  Degenerate a=b=0 pins to 0.0 by "
        "contract."
    ),
)
def embed_silhouette_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (nearest vs second-nearest label
    centroid, cosine distance) per embedding vector."""
    top2 = sim_knn_join(spark, sf_dir).where(F.col("rnk") <= 2)
    r1 = top2.where(F.col("rnk") == 1).select(
        "vec_id",
        "label",
        F.col("clabel").alias("assigned"),
        (F.lit(1.0) - F.col("cosine")).alias("a_dist"),
    )
    r2 = top2.where(F.col("rnk") == 2).select(
        "vec_id", (F.lit(1.0) - F.col("cosine")).alias("b_dist")
    )
    p = r1.join(r2, "vec_id")
    a, b = F.col("a_dist"), F.col("b_dist")
    return p.select(
        "vec_id",
        "label",
        "assigned",
        "a_dist",
        "b_dist",
        F.when(F.greatest(a, b) == 0.0, F.lit(0.0))
        .otherwise((b - a) / F.greatest(a, b))
        .alias("silhouette"),
    )
