"""Maximal Marginal Relevance diversification (SURVEY.md §2.N growth,
similarity family) — the re-rank step between ANN retrieval and
serving/training-subset selection: from the top-POOL retrieved
vectors, greedily pick K that trade relevance against redundancy,

    score(d) = λ·rel(d) − (1−λ)·max_{s ∈ selected} cos(d, s)

with λ = 1/2 so the score is the division-exact (rel − maxsim) / 2.

Determinism contract (what makes this hash-grade where textbook MMR
is not): every cosine is the shared 6dp-rounded left-fold
(llm/vectors.py), ties break by vec_id, and K/POOL are fixed — so the
greedy trajectory is a pure function of the corpus and the oracle can
replay it as K unrolled CTEs.

Scale posture: the corpus-sized work is the ONE retrieval scan
(broadcast query, TakeOrdered top-POOL — sim_cosine_topk's plan); the
greedy loop then operates on the POOL-row persisted table only, K
iterations of (anti-join + broadcast-selected cosine max + top-1) —
every per-step input is pool-sized, independent of corpus size, and
nothing is collected to the driver.  At 100 TB the retrieval scan is
replaced by any ANN key (sim_ivf_topk / sim_pairs_bucket_jobs) and
this loop re-ranks its candidates unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, persist_fresh
from .vectors import duck_cosine, spark_cosine

MMR_QUERY_ID = 0
MMR_POOL = 20
MMR_K = 5


def _mmr_oracle_sql() -> str:
    """K unrolled greedy steps over the top-POOL pool — the exact
    trajectory the engine loop walks, stated in DuckDB SQL."""
    cos_ps = duck_cosine("p.embedding", "s.embedding")
    sql = f"""
    WITH q AS (SELECT embedding AS qv
               FROM embeddings WHERE vec_id = {MMR_QUERY_ID}),
    rel AS (
        SELECT e.vec_id, e.embedding,
               {duck_cosine('e.embedding', 'q.qv')} AS rel
        FROM embeddings e, q
        WHERE e.vec_id <> {MMR_QUERY_ID}
    ),
    pool AS (
        SELECT vec_id, embedding, rel FROM rel
        ORDER BY rel DESC, vec_id ASC LIMIT {MMR_POOL}
    ),
    s1 AS (
        SELECT vec_id, embedding, rel, rel AS score FROM pool
        ORDER BY rel DESC, vec_id ASC LIMIT 1
    )"""
    picked = "SELECT vec_id, embedding FROM s1"
    for k in range(2, MMR_K + 1):
        sql += f""",
    c{k} AS (
        SELECT p.vec_id, p.embedding, p.rel,
               round((p.rel - MAX({cos_ps})) / 2, 6) AS score
        FROM pool p, ({picked}) s
        WHERE p.vec_id NOT IN (SELECT vec_id FROM ({picked}))
        GROUP BY p.vec_id, p.embedding, p.rel
    ),
    s{k} AS (
        SELECT vec_id, embedding, rel, score FROM c{k}
        ORDER BY score DESC, vec_id ASC LIMIT 1
    )"""
        picked += f" UNION ALL SELECT vec_id, embedding FROM s{k}"
    parts = [
        f"SELECT {k} AS rank, vec_id, rel AS relevance, score AS mmr_score"
        f" FROM s{k}"
        for k in range(1, MMR_K + 1)
    ]
    sql += "\n    " + "\n    UNION ALL ".join(parts)
    return sql


@query(
    "embed_mmr_diverse",
    sql=_mmr_oracle_sql(),
    tables=("embeddings",),
    scale_note=(
        "MMR re-rank, λ=1/2: one corpus-sized retrieval scan "
        "(broadcast query + TakeOrdered top-POOL, sim_cosine_topk's "
        "plan) feeds a persisted POOL-row table; the K-step greedy "
        "loop then runs entirely on pool-sized inputs — anti-join "
        "against selections, max-cosine vs the (≤K-row, broadcast) "
        "selected set, global top-1 — with NO driver collect anywhere "
        "(the selected set stays a unioned Catalyst plan).  Every "
        "cosine is the shared 6dp fold and ties break by vec_id, so "
        "the greedy trajectory is engine-independent and the oracle "
        "replays it as K unrolled CTEs.  At 100 TB the scan swaps for "
        "any ANN candidate key; the re-rank loop is unchanged."
    ),
)
def embed_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 MMR-diversified selection from the top-20 retrieval pool
    of the vec_id=0 query (rank, relevance, and MMR score per pick)."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    rel = (
        e.filter(F.col("vec_id") != MMR_QUERY_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            spark_cosine("embedding", "qv").alias("rel"),
        )
    )
    pool = persist_fresh(
        "mmr_pool",
        sf_dir,
        rel.orderBy(F.col("rel").desc(), F.col("vec_id").asc()).limit(
            MMR_POOL
        ),
    )
    first = (
        pool.orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(1)
        .select("vec_id", "embedding", "rel", F.col("rel").alias("score"))
    )
    selected = first.withColumn("rank", F.lit(1))
    for k in range(2, MMR_K + 1):
        sel = selected.select(
            F.col("vec_id").alias("s_id"),
            F.col("embedding").alias("s_emb"),
        )
        cand = pool.join(
            sel.select("s_id"),
            pool["vec_id"] == F.col("s_id"),
            "left_anti",
        )
        scored = (
            cand.join(F.broadcast(sel))
            .select(
                "vec_id",
                "embedding",
                "rel",
                spark_cosine("embedding", "s_emb").alias("sim"),
            )
            .groupBy("vec_id", "embedding", "rel")
            .agg(
                F.round(
                    (F.col("rel") - F.max("sim")) / 2, 6
                ).alias("score")
            )
        )
        nxt = (
            scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(1)
            .withColumn("rank", F.lit(k))
        )
        selected = selected.unionAll(nxt)
    return selected.select(
        F.col("rank").cast("int").alias("rank"),
        "vec_id",
        F.col("rel").alias("relevance"),
        F.col("score").alias("mmr_score"),
    )
