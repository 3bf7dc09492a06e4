"""Embedding quantization (SURVEY.md §2.N extras): per-vector int8
scalar quantization — the storage/serving transform that makes a
100-TB embedding corpus 4× smaller and ANN-cache-resident.

Engine-neutral math: every float element is cast to DOUBLE first
(float32 → float64 is exact), the affine quantization runs in IEEE
doubles with an identical op sequence on both engines, and rounding is
``floor(x + 0.5)`` (identical both sides — no HALF_EVEN/HALF_UP
divergence), so the int codes hash-match the DuckDB oracle exactly.

Scale posture: pure per-row HOF codegen (``transform`` over the
array) — zero shuffles, fuses with whatever scan feeds it.  The codes
are emitted as a canonical CSV string (same convention as
agg_collect_sorted) to keep the value-hash engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .vectors import DIMS

Q_LEVELS = 255  # int8 range: codes -128..127


@query(
    "embed_quantize_int8",
    sql=f"""
    WITH d AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, label, v,
               list_min(v) AS mn,
               (list_max(v) - list_min(v)) / {Q_LEVELS} AS scale
        FROM d
    )
    SELECT vec_id, label, mn, scale,
           array_to_string(
               list_transform(
                   v, x -> CAST(CAST(floor((x - mn) / scale + 0.5) AS BIGINT)
                                - 128 AS VARCHAR)),
               ',') AS q_codes
    FROM s
    """,
    tables=("embeddings",),
    scale_note=(
        "Per-vector affine int8 quantization as pure HOF codegen — no "
        "shuffle, no UDF; 4× storage reduction for the ANN serving tier. "
        "All arithmetic in doubles with an identical op sequence on both "
        "engines (floor(x+0.5) rounding), so even the float math "
        "hash-matches the oracle."
    ),
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantize each embedding to int8 codes + (min, scale) metadata."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = e.select("vec_id", "label", v.alias("v"))
    s = d.select(
        "vec_id",
        "label",
        "v",
        F.array_min("v").alias("mn"),
        ((F.array_max("v") - F.array_min("v")) / Q_LEVELS).alias("scale"),
    )
    code = lambda x: (  # noqa: E731
        F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5)).cast("bigint")
        - 128
    ).cast("string")
    return s.select(
        "vec_id",
        "label",
        "mn",
        "scale",
        F.array_join(F.transform(F.col("v"), code), ",").alias("q_codes"),
    )


MATRYOSHKA_DIMS = 16


@query(
    "embed_matryoshka_truncate",
    sql=f"""
    WITH s AS (
        SELECT vec_id, label,
               list_sum(list_transform(range(1, {DIMS + 1}),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE))) AS ss_full,
               list_sum(list_transform(range(1, {MATRYOSHKA_DIMS + 1}),
                   i -> CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE))) AS ss_trunc,
               embedding
        FROM embeddings
    )
    SELECT vec_id, label,
           round(sqrt(ss_full), 6) AS norm_full,
           round(sqrt(ss_trunc), 6) AS norm_trunc,
           round(ss_trunc / nullif(ss_full, 0), 6) AS energy_kept,
           CASE WHEN ss_trunc > 0 THEN
               array_to_string(list_transform(range(1, 4),
                   i -> CAST(CAST(round(CAST(embedding[i] AS DOUBLE)
                                  / sqrt(ss_trunc) * 1000000, 0) AS BIGINT)
                             AS VARCHAR)), ',')
           END AS head3_renormed
    FROM s
    """,
    tables=("embeddings",),
    scale_note=(
        "Matryoshka-style truncation: keep the first 16 of 64 dims and "
        "L2-renormalize, reporting the energy retained — the standard "
        "cheap-tier embedding for coarse ANN routing before full-dim "
        "re-scoring. Row-local HOF arithmetic in whole-stage codegen "
        "(zip-free: slice + fold), zero shuffles, fuses with the "
        "feeding scan; 4x less vector bandwidth for the coarse tier at "
        "100 TB. 6dp rounding on both engines per the shared "
        "float-accumulation convention (llm/vectors.py)."
    ),
)
def embed_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncate embeddings to the first 16 dims, renormalize, report
    retained energy and the first 3 renormalized coordinates
    (integer micro-units)."""
    e = load(spark, sf_dir, "embeddings")

    def ss(expr: str) -> F.Column:
        return F.expr(
            f"aggregate(transform({expr}, x -> CAST(x AS DOUBLE) * "
            f"CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )

    s = e.select(
        "vec_id",
        "label",
        ss("embedding").alias("ss_full"),
        ss(f"slice(embedding, 1, {MATRYOSHKA_DIMS})").alias("ss_trunc"),
        "embedding",
    )
    # Integer micro-units: CAST(double AS STRING) renders small values
    # in scientific notation on Spark but decimal on DuckDB, so the
    # coordinates are emitted as round(x * 1e6) bigints instead.
    # Zero guards: all-zero truncations/rows yield NULL instead of a
    # division by zero (engines disagree on casting inf to BIGINT).
    head3 = F.expr(
        "CASE WHEN ss_trunc > 0 THEN "
        "array_join(transform(slice(embedding, 1, 3), "
        "x -> CAST(CAST(round(CAST(x AS DOUBLE) / sqrt(ss_trunc) "
        "* 1000000, 0) AS BIGINT) AS STRING)), ',') END"
    )
    return s.select(
        "vec_id",
        "label",
        F.round(F.sqrt("ss_full"), 6).alias("norm_full"),
        F.round(F.sqrt("ss_trunc"), 6).alias("norm_trunc"),
        F.round(
            F.col("ss_trunc") / F.nullif(F.col("ss_full"), F.lit(0.0)), 6
        ).alias("energy_kept"),
        head3.alias("head3_renormed"),
    )
