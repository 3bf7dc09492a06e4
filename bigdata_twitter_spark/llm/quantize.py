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
                   v, x -> CASE WHEN scale = 0.0 THEN '-128'
                           ELSE CAST(CAST(floor((x - mn) / scale + 0.5)
                                          AS BIGINT)
                                     - 128 AS VARCHAR) END),
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
    # A constant vector has range 0 → scale 0; the affine map sends
    # every element (= mn) to code -128 rather than raising an ANSI
    # DIVIDE_BY_ZERO (r10 degenerate-domain sweep; oracle identical).
    code = lambda x: F.when(  # noqa: E731
        F.col("scale") == 0.0, F.lit("-128")
    ).otherwise(
        (
            F.floor(
                (x - F.col("mn")) / F.col("scale") + F.lit(0.5)
            ).cast("bigint")
            - 128
        ).cast("string")
    )
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


# ---- 1-bit (binary) quantization + hamming search (round 7) ----------
# The aggressive end of the quantization ladder (float32 → int8 →
# matryoshka → BINARY): keep only each dimension's sign, pack the 64
# dims into ONE int64, search by popcount(xor) hamming, then re-rank
# the shortlist with exact cosines — the memory layout that serves
# billion-vector corpora from RAM (64× smaller than float32).
BINQ_QUERY_ID = 0
BINQ_TOPK = 10


@query(
    "embed_binary_quantize",
    sql=f"""
    WITH b AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN embedding[u.i + 1] <= 0 THEN 0
                        WHEN u.i = 63
                        THEN CAST(-9223372036854775808 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT) << u.i)
                        END) AS BIGINT) AS code
        FROM embeddings, UNNEST(range(0, {DIMS})) AS u(i)
        GROUP BY vec_id
    ),
    q AS (SELECT code AS qcode FROM b WHERE vec_id = {BINQ_QUERY_ID}),
    qv AS (SELECT embedding AS qemb FROM embeddings
           WHERE vec_id = {BINQ_QUERY_ID}),
    short AS (
        SELECT b.vec_id,
               CAST(bit_count(xor(b.code, q.qcode)) AS INT) AS hamming
        FROM b, q
        WHERE b.vec_id <> {BINQ_QUERY_ID}
        ORDER BY hamming ASC, b.vec_id ASC
        LIMIT {BINQ_TOPK}
    )
    SELECT s.vec_id, s.hamming,
           __BINQ_COS__ AS cosine
    FROM short s
    JOIN embeddings e ON e.vec_id = s.vec_id, qv
    """,
    tables=("embeddings",),
    scale_note=(
        "Binary quantization search: sign-bit packing is per-row "
        "codegen (64 dims → one int64, 64× smaller than float32); the "
        "search is one scan computing popcount(xor) against the "
        "broadcast query code — integer end to end, so shortlist "
        "membership and order are engine-exact (ties by vec_id); only "
        "the TOPK-row re-rank touches floats (the shared 6dp cosine), "
        "on rows fetched by a TOPK-sized join.  At 100 TB the packed "
        "codes column is the resident index and this plan is the "
        "serving path; the bit-63 two's-complement wrap is stated "
        "explicitly in the oracle (the dedup_simhash_md5 idiom)."
    ),
)
def embed_binary_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit binary codes + hamming top-10 for the vec_id=0 query,
    re-ranked with exact 6dp cosines."""
    from .vectors import spark_cosine

    e = load(spark, sf_dir, "embeddings")
    pack = F.expr(
        f"aggregate(sequence(0, {DIMS - 1}), 0L, (acc, i) -> acc +"
        " (CASE WHEN element_at(embedding, i + 1) > 0"
        "  THEN shiftleft(1L, i) ELSE 0L END))"
    )
    codes = e.select("vec_id", pack.alias("code"))
    q = codes.filter(F.col("vec_id") == BINQ_QUERY_ID).select(
        F.col("code").alias("qcode")
    )
    short = (
        codes.filter(F.col("vec_id") != BINQ_QUERY_ID)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.bit_count(F.col("code").bitwiseXOR(F.col("qcode")))
            .cast("int")
            .alias("hamming"),
        )
        .orderBy(F.col("hamming").asc(), F.col("vec_id").asc())
        .limit(BINQ_TOPK)
    )
    qv = e.filter(F.col("vec_id") == BINQ_QUERY_ID).select(
        F.col("embedding").alias("qemb")
    )
    return (
        short.join(e.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            "hamming",
            spark_cosine("embedding", "qemb").alias("cosine"),
        )
    )


def _inject_binq_cos() -> None:
    """Splice the shared 6dp cosine fragment into the binary-quantize
    oracle (kept out of the decorator literal for reuse of the exact
    llm/vectors.py fragment both engines already hash-match)."""
    from ..registry import REGISTRY
    from .vectors import duck_cosine

    REGISTRY["embed_binary_quantize"].sql = REGISTRY[
        "embed_binary_quantize"
    ].sql.replace("__BINQ_COS__", duck_cosine("e.embedding", "qv.qemb"))


_inject_binq_cos()
