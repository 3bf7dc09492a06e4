"""Embedding-side flagship composite (round 5): the serving-prep path
a 100-TB embedding corpus takes from raw vectors to a quantized,
cell-restricted top-k search — health gate → matryoshka truncation →
int8 quantization → label-cell candidate join → integer-dot top-k —
composed as ONE Catalyst plan and hash-verified end to end (the
embedding twin of text-side ``train_pipeline_e2e``).

Exactness: the float work (truncation, affine code computation) uses
the engine-neutral recipes established by ``embed_quantize_int8`` /
``embed_matryoshka_truncate`` (float32→double exact, identical IEEE op
sequence, floor(x+0.5) rounding); everything downstream of
quantization is INTEGER arithmetic — the dot products are exact
Σ int8·int8 in BIGINT — so the ranking has zero float-comparison
hazard on either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

E2E_DIMS = 16  # matryoshka prefix kept for serving
E2E_LEVELS = 255  # int8 affine levels (codes -128..127)
E2E_GATE_ABS = 3.0  # health gate: max |x| over the prefix
E2E_QUERY_MOD = 97  # vec_id % 97 == 0 -> query side (~1%)
E2E_TOPK = 3


@query(
    "embed_pipeline_e2e",
    sql=f"""
    WITH t AS (
        SELECT vec_id, label,
               list_transform(list_slice(embedding, 1, {E2E_DIMS}),
                              x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), gated AS (
        SELECT * FROM t
        WHERE list_max(list_transform(v, x -> abs(x))) <= {E2E_GATE_ABS}
    ), s AS (
        SELECT vec_id, label, v,
               list_min(v) AS mn,
               (list_max(v) - list_min(v)) / {E2E_LEVELS} AS scale
        FROM gated
    ), q AS (
        SELECT vec_id, label,
               list_transform(
                   v, x -> CAST(floor((x - mn) / scale + 0.5) AS BIGINT)
                           - 128) AS codes
        FROM s WHERE scale > 0
    ), queries AS (
        SELECT vec_id AS query_id, label, codes AS qc FROM q
        WHERE vec_id % {E2E_QUERY_MOD} = 0
    ), corpus AS (
        SELECT vec_id AS corpus_id, label, codes AS cc FROM q
        WHERE vec_id % {E2E_QUERY_MOD} <> 0
    ), scored AS (
        SELECT query_id, corpus_id,
               CAST(list_sum(list_transform(
                   range(1, {E2E_DIMS} + 1),
                   i -> qc[i] * cc[i])) AS BIGINT) AS dot
        FROM queries JOIN corpus USING (label)
    ), ranked AS (
        SELECT query_id, corpus_id, dot,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY dot DESC, corpus_id) AS rnk
        FROM scored
    )
    SELECT query_id, CAST(rnk AS INT) AS rnk, corpus_id, dot
    FROM ranked WHERE rnk <= {E2E_TOPK}
    """,
    tables=("embeddings",),
    scale_note=(
        "FLAGSHIP composite for the embedding side, one Catalyst "
        "plan: health gate and truncation fuse into the scan (pure "
        "HOF codegen, zero shuffle), quantization likewise; the only "
        "data shuffles are the label-cell equi-join (label plays the "
        "IVF-cell role — candidates ∝ cell occupancy, NEVER queries × "
        "corpus) and the per-query top-k window over cell-local "
        "candidates.  Post-quantization everything is exact BIGINT "
        "arithmetic, so the end-to-end result hash-matches with no "
        "float-ranking hazard.  At 100 TB the cell key comes from a "
        "trained IVF index (sim_ivf_topk's shape) instead of the "
        "label, and the quantized corpus is the 4×-smaller table the "
        "serving tier actually caches — this operator IS that "
        "build+search path, verified."
    ),
)
def embed_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate → truncate(16) → int8-quantize → label-cell join →
    exact-integer top-3 per query, end to end in one plan."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform(
        F.slice(F.col("embedding"), 1, E2E_DIMS),
        lambda x: x.cast("double"),
    )
    t = e.select("vec_id", "label", v.alias("v"))
    gated = t.filter(
        F.array_max(F.transform(F.col("v"), F.abs)) <= E2E_GATE_ABS
    )
    s = gated.select(
        "vec_id",
        "label",
        "v",
        F.array_min("v").alias("mn"),
        ((F.array_max("v") - F.array_min("v")) / E2E_LEVELS).alias("scale"),
    )
    codes = F.transform(
        F.col("v"),
        lambda x: (
            F.floor((x - F.col("mn")) / F.col("scale") + F.lit(0.5)).cast(
                "bigint"
            )
            - 128
        ),
    )
    q = s.filter(F.col("scale") > 0).select(
        "vec_id", "label", codes.alias("codes")
    )
    queries = q.filter(F.col("vec_id") % E2E_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        "label",
        F.col("codes").alias("qc"),
    )
    corpus = q.filter(F.col("vec_id") % E2E_QUERY_MOD != 0).select(
        F.col("vec_id").alias("corpus_id"),
        "label",
        F.col("codes").alias("cc"),
    )
    dot = F.expr(
        "aggregate(zip_with(qc, cc, (x, y) -> x * y), 0L, (a, e) -> a + e)"
    ).cast("bigint")
    scored = queries.join(corpus, "label").select(
        "query_id", "corpus_id", dot.alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= E2E_TOPK)
        .select("query_id", "rnk", "corpus_id", "dot")
    )
