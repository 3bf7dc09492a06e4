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


# ---- embedding-space contamination screen (round 7) ------------------
# text_contamination_overlap catches VERBATIM eval leakage (n-gram
# containment); paraphrased leakage needs the embedding-space screen:
# flag corpus vectors whose cosine to ANY eval vector clears a
# rational threshold τ.  The threshold test is EXACT INTEGER/DECIMAL
# arithmetic with no sqrt:
# cos(a,b) ≥ p/q  ⟺  a·b > 0 ∧ (q·(a·b))² ≥ (p·|a|²)·(p·|b|²)
# — cross-multiplied squares over int-scaled vectors, computed in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact, so membership
# is engine-deterministic with no epsilon anywhere.  The reported
# best_cos double is derived from exact-in-double bigints (dot and
# norms < 2^53) by one identical IEEE expression.
# τ = 7/20 = 0.35, calibrated so the screen BITES on the synthetic
# fixture (3/12/85 vectors flagged at sf0.001/0.01/0.1 — the fixture's
# random embeddings never reach the 0.95 a production paraphrase
# screen would use; the membership math is threshold-independent).
CONTAM_TAU_NUM = 7
CONTAM_TAU_DEN = 20
CONTAM_EVAL_MOD = 100  # eval set stand-in: vec_id ≡ 0 (mod 100)


@query(
    "embed_contamination_eval",
    sql=f"""
    WITH iv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                             AS BIGINT)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
                   AS nrm
        FROM iv
    ),
    ev AS (SELECT vec_id AS eval_id, v AS evec, nrm AS enrm FROM n
           WHERE vec_id % {CONTAM_EVAL_MOD} = 0),
    cp AS (SELECT vec_id, v, nrm FROM n
           WHERE vec_id % {CONTAM_EVAL_MOD} <> 0),
    pairs AS (
        SELECT c.vec_id, e.eval_id,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> c.v[i] * e.evec[i])) AS BIGINT) AS dot,
               c.nrm, e.enrm
        FROM cp c JOIN ev e ON TRUE
    ),
    hits AS (
        SELECT vec_id, eval_id,
               CAST(dot AS DOUBLE)
                   / (sqrt(CAST(nrm AS DOUBLE))
                      * sqrt(CAST(enrm AS DOUBLE))) AS cos
        FROM pairs
        WHERE dot > 0
          AND CAST({CONTAM_TAU_DEN} * dot AS HUGEINT)
              * CAST({CONTAM_TAU_DEN} * dot AS HUGEINT)
              >= CAST({CONTAM_TAU_NUM} * nrm AS HUGEINT)
                 * CAST({CONTAM_TAU_NUM} * enrm AS HUGEINT)
    ),
    ranked AS (
        SELECT vec_id, eval_id, cos,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, eval_id) AS rb,
               COUNT(*) OVER (PARTITION BY vec_id) AS nh
        FROM hits
    )
    SELECT vec_id, CAST(nh AS INT) AS n_eval_hits,
           CAST(eval_id AS BIGINT) AS best_eval_id,
           cos AS best_cos
    FROM ranked WHERE rb = 1
    """,
    tables=("embeddings",),
    scale_note=(
        "Paraphrase-level decontamination: the eval side is tiny by "
        "definition (benchmarks are KBs, corpora are TBs), so it "
        "broadcasts and the screen is ONE map-side scan of the "
        "corpus — corpus×eval pairs never shuffle; the per-vector "
        "verdict aggregates map-side.  Membership at rational τ=p/q is an "
        "exact cross-multiplied integer test (no sqrt, no epsilon): "
        "deterministic on any engine, any partitioning, any FMA "
        "setting.  best_cos is one identical IEEE expression over "
        "exact-in-double bigints, used only for reporting/ranking.  "
        "At a real 100-TB corpus this composes with the LSH bucketing "
        "keys to pre-filter candidates; the exact test stays the "
        "final arbiter."
    ),
)
def embed_contamination_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus vectors with cosine ≥ 7/20 to any eval vector
    (vec_id ≡ 0 mod 100 stands in for the eval set), with exact
    integer threshold membership and per-vector best-hit report."""
    e = load(spark, sf_dir, "embeddings")
    iv = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5).cast(
                "bigint"
            ),
        ).alias("v"),
    ).withColumn(
        "nrm",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ),
    )
    ev = iv.filter(F.col("vec_id") % CONTAM_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("v").alias("evec"),
        F.col("nrm").alias("enrm"),
    )
    cp = iv.filter(F.col("vec_id") % CONTAM_EVAL_MOD != 0)
    dot = F.aggregate(
        F.zip_with("v", "evec", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    pairs = cp.join(F.broadcast(ev)).select(
        "vec_id", "eval_id", dot.alias("dot"), "nrm", "enrm"
    )
    d20 = (F.lit(CONTAM_TAU_DEN) * F.col("dot")).cast("decimal(19,0)")
    n19a = (F.lit(CONTAM_TAU_NUM) * F.col("nrm")).cast("decimal(19,0)")
    n19b = (F.lit(CONTAM_TAU_NUM) * F.col("enrm")).cast("decimal(19,0)")
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("nrm").cast("double"))
        * F.sqrt(F.col("enrm").cast("double"))
    )
    hits = pairs.filter(
        (F.col("dot") > 0) & (d20 * d20 >= n19a * n19b)
    ).select("vec_id", "eval_id", cos.alias("cos"))
    return hits.groupBy("vec_id").agg(
        F.count("*").cast("int").alias("n_eval_hits"),
        F.min(F.struct((-F.col("cos")).alias("nc"), "eval_id"))["eval_id"]
        .cast("bigint")
        .alias("best_eval_id"),
        F.max("cos").alias("best_cos"),
    )
