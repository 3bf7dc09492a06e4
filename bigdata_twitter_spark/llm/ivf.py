"""IVF-probed approximate nearest-neighbor search (SURVEY.md §2.N) —
the query-side companion to ``sim_knn_join`` (the assignment pass) and
``sim_pairs_bucketed`` (the pair-mining pass): top-k search that scans
only the inverted-file buckets nearest the query, not the corpus.

IVF = inverted file: every vector is assigned to its nearest centroid
(here the per-label centroids); a query probes the P nearest
centroids' buckets and ranks only those vectors.  Both the assignment
and the probe are DETERMINISTIC (rounded centroids, clabel tiebreak),
so the entire restriction is restated in the DuckDB oracle — this ANN
operator is fully hash-verified, not rows-only.

Scale posture: centroids are tiny and broadcast; assignment is the
map-side scoring pass of sim_knn_join (one shuffle on vector id for
the rank window); the probed search touches ~P/K of the corpus
(K centroids, P probes) and finishes with a TakeOrderedAndProject
top-k — per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .vectors import DIMS, duck_cosine, spark_cosine

IVF_PROBES = 2
TOP_K = 10
QUERY_VEC_ID = 0

_CENTROID_SQL = f"""
    c AS (
        SELECT label AS clabel, i AS pos,
               round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS cv
        FROM embeddings, range(1, {DIMS + 1}) t(i)
        GROUP BY 1, 2
    ),
    cl AS (SELECT clabel, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1)
"""


def ivf_index(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared IVF index builder: (cvec, assign).

    ``cvec`` = per-label centroid vectors (rounded 6dp, broadcast-
    sized codebook); ``assign`` = every vector's nearest-centroid
    bucket with the (cosine desc, clabel) tiebreak.  ann_recall_eval
    (llm/recall.py) evaluates THIS index — one definition, so a change
    to centroid rounding / tiebreaks cannot desynchronize the recall
    metric from the index sim_ivf_topk actually serves."""
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
    # Assignment: nearest centroid per vector (sim_knn_join's rnk=1).
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("c_cos").desc(), F.col("clabel")
    )
    assign = (
        e.join(F.broadcast(cvec))
        .select(
            "vec_id",
            "clabel",
            spark_cosine("embedding", "cvec").alias("c_cos"),
        )
        .withColumn("rnk", F.row_number().over(w_assign))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "clabel")
    )
    return cvec, assign


@query(
    "sim_ivf_topk",
    sql=f"""
    WITH {_CENTROID_SQL},
    assign AS (
        SELECT vec_id, clabel FROM (
            SELECT e.vec_id, cl.clabel,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {duck_cosine('e.embedding', 'cl.cvec')} DESC,
                                cl.clabel) AS rnk
            FROM embeddings e, cl
        ) WHERE rnk = 1
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    probes AS (
        SELECT clabel FROM (
            SELECT cl.clabel,
                   row_number() OVER (
                       ORDER BY {duck_cosine('q.qv', 'cl.cvec')} DESC,
                                cl.clabel) AS rnk
            FROM cl, q
        ) WHERE rnk <= {IVF_PROBES}
    )
    SELECT e.vec_id, e.label,
           {duck_cosine('e.embedding', 'q.qv')} AS cosine
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id
    JOIN probes p ON p.clabel = a.clabel
    CROSS JOIN q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
    tables=("embeddings",),
    scale_note=(
        "ANN top-k probing only the 2 nearest centroid buckets "
        "(~P/K of the corpus scanned): broadcast centroids → map-side "
        "assignment + rank window on vec_id → bucket-restricted scoring "
        "→ TakeOrderedAndProject. Deterministic assignment/probe lets "
        "the oracle restate the SAME restriction — exact hash check, "
        "recall measured against sim_cosine_topk in the local suite."
    ),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest vectors to the vec_id=0 query, searching only the
    2 nearest IVF (per-label centroid) buckets."""
    e = load(spark, sf_dir, "embeddings")
    cvec, assign = ivf_index(e)
    # Probe list: the query's IVF_PROBES nearest centroids.
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    probes = (
        cvec.join(F.broadcast(q))
        .select("clabel", spark_cosine("cvec", "qv").alias("q_cos"))
        .orderBy(F.col("q_cos").desc(), F.col("clabel"))
        .limit(IVF_PROBES)
        .select("clabel")
    )
    # Search only the probed buckets.
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(assign, "vec_id")
        .join(F.broadcast(probes), "clabel")
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            spark_cosine("embedding", "qv").alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )
