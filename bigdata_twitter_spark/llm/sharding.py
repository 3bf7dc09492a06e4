"""Training-data layout (SURVEY.md §2.N, round 4): deterministic
global shuffle + shard assignment, and source-mixture downsampling
with inverse-probability weights — the two passes between "curated
corpus" and "tensors on trainers".

Both are md5-keyed so they are reproducible across runs, retries and
cluster layouts, and byte-identical between Spark and the DuckDB
oracle (the same reasoning as sample_hash_stratified /
sample_negative_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

N_SHARDS = 16

# Mixture tiers over documents.source (src0..src19): keep-rate in
# 16ths, decided by one md5 nibble of the doc key.  weight = 16/rate
# is the inverse-probability factor downstream loss re-weighting uses.
TIER_RATES = {  # source-number range -> keep nibbles out of 16
    "high": 16,  # src0-src4: keep all
    "mid": 8,  # src5-src9: keep half
    "low": 4,  # src10+:    keep quarter
}


def _md5_global_rank(d: DataFrame, key: str) -> DataFrame:
    """Distributed rank of md5(key): 16 md5-nibble buckets get local
    row_numbers, then broadcast bucket-count offsets lift them to the
    global rank — no unpartitioned window (the pack_token_budget /
    sample_negative_pairs idiom)."""
    h = d.select(
        F.col(key), F.md5(F.col(key).cast("string")).alias("h")
    ).withColumn("bucket", F.conv(F.substring("h", 1, 1), 16, 10).cast("int"))
    in_bucket = Window.partitionBy("bucket").orderBy("h")
    local = h.withColumn("lrk", F.row_number().over(in_bucket))
    sizes = h.groupBy("bucket").agg(F.count("*").alias("bn"))
    over_buckets = Window.orderBy("bucket")
    offsets = sizes.withColumn(
        "boff", F.sum("bn").over(over_buckets) - F.col("bn")
    ).select("bucket", "boff")
    return local.join(F.broadcast(offsets), "bucket").select(
        key,
        (F.col("boff") + F.col("lrk") - 1).cast("bigint").alias("rk"),
    )


@query(
    "train_shuffle_shard",
    sql=f"""
    WITH r AS (
        SELECT doc_id, n_chars,
               CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
                    - 1 AS BIGINT) AS rk
        FROM documents
    )
    SELECT doc_id,
           CAST(rk % {N_SHARDS} AS INT) AS shard_id,
           rk // {N_SHARDS} AS pos_in_shard,
           n_chars
    FROM r
    """,
    tables=("documents",),
    scale_note=(
        "Deterministic global shuffle for training order: the md5 "
        "permutation is content-keyed (reproducible across runs and "
        "cluster layouts, resumable mid-epoch), round-robin over "
        f"{N_SHARDS} shards balances shard sizes to within one row, "
        "and the rank is computed DISTRIBUTED — 16 md5-nibble buckets "
        "with local row_numbers plus broadcast bucket offsets, never "
        "an unpartitioned window. Writing shard files is then one "
        "repartition(shard_id) + sortWithinPartitions(pos_in_shard) "
        "(sink_sorted_clustered's plan)."
    ),
)
def train_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a (shard, position) in a deterministic
    md5-shuffled training order."""
    d = load(spark, sf_dir, "documents")
    ranked = _md5_global_rank(d, "doc_id")
    return (
        ranked.join(d.select("doc_id", "n_chars"), "doc_id")
        .select(
            "doc_id",
            (F.col("rk") % N_SHARDS).cast("int").alias("shard_id"),
            F.floor(F.col("rk") / N_SHARDS).cast("bigint").alias(
                "pos_in_shard"
            ),
            "n_chars",
        )
    )


@query(
    "data_mixture_sample",
    sql=f"""
    WITH t AS (
        SELECT doc_id, source, lang,
               CAST(substr(source, 4) AS INT) AS src_num,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                    AS INT) AS nib
        FROM documents
    ), rated AS (
        SELECT doc_id, source, lang, nib,
               CASE WHEN src_num <= 4 THEN {TIER_RATES["high"]}
                    WHEN src_num <= 9 THEN {TIER_RATES["mid"]}
                    ELSE {TIER_RATES["low"]} END AS rate
        FROM t
    )
    SELECT doc_id, source, lang,
           round(16.0 / rate, 6) AS weight
    FROM rated
    WHERE nib < rate
    """,
    tables=("documents",),
    scale_note=(
        "Source-mixture downsampling (the data-mixture step of every "
        "pretraining run): per-tier keep rates are enforced by ONE md5 "
        "nibble of the row key — a pure map-side filter that pushes "
        "down to the scan, reproducible across runs, no RNG state; "
        "the emitted inverse-probability weight keeps downstream "
        "statistics unbiased. Changing the mixture is a constant-table "
        "edit, not a re-shuffle — at 100 TB this is the difference "
        "between a config change and a second copy of the corpus."
    ),
)
def data_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tiered mixture sample over documents.source with
    inverse-probability weights."""
    d = load(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    nib = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    rate = (
        F.when(src_num <= 4, F.lit(TIER_RATES["high"]))
        .when(src_num <= 9, F.lit(TIER_RATES["mid"]))
        .otherwise(F.lit(TIER_RATES["low"]))
    )
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            nib.alias("nib"),
            rate.alias("rate"),
        )
        .filter(F.col("nib") < F.col("rate"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.round(F.lit(16.0) / F.col("rate"), 6).alias("weight"),
        )
    )


# Temperature for source rebalancing (alpha = 0.5 ⇒ sqrt scaling —
# chosen because sqrt is correctly-rounded IEEE on both engines,
# unlike pow(x, alpha) for general alpha, so the oracle is bit-exact).
MIXTURE_TARGET_FRAC = 0.2  # base keep-rate for a source at share 1.0
HEX_SPACE = 16 ** 5  # md5 5-hex-char prefix space for the keep test


@query(
    "sample_temperature_mixture",
    sql=f"""
    WITH s AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_s
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(n_chars) AS BIGINT) AS chars_tot FROM documents
    ), t AS (
        SELECT source,
               least(1.0, {MIXTURE_TARGET_FRAC} /
                   sqrt(CAST(chars_s AS DOUBLE) / CAST(chars_tot AS DOUBLE)))
                   AS rate
        FROM s, tot
    )
    SELECT d.doc_id, d.source, t.rate
    FROM documents d JOIN t ON d.source = t.source
    WHERE t.rate >= 1.0
       OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)
          < lower(lpad(to_hex(CAST(FLOOR(t.rate * {HEX_SPACE}) AS BIGINT)),
                       5, '0'))
    """,
    tables=("documents",),
    scale_note=(
        "Temperature-balanced source sampling (the multilingual-corpus "
        "rebalance recipe: keep-rate ∝ share^(α-1), α=1/2, capped at "
        "1) — small sources are up-weighted relative to their share, "
        "dominant sources down-sampled.  Per-source char shares are "
        "one partial-agg pass; the 20-row rate table broadcasts; the "
        "keep decision is a per-row md5-prefix comparison against the "
        "source's rate threshold, so the whole sample is a map-side "
        "filter that pushes to the scan, reproducible across runs "
        "and cluster layouts (no RNG state).  Exactness: α=1/2 makes "
        "the rate sqrt-based (correctly-rounded IEEE on both "
        "engines), and the hex-prefix compare is lexicographic = "
        "numeric on fixed-width lowercase hex."
    ),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature (α=0.5) source-mixture sample of the
    documents table with per-source md5-threshold keep decisions."""
    d = load(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("chars_s")
    )
    total = d.agg(F.sum("n_chars").cast("bigint").alias("chars_tot"))
    rates = (
        per_src.crossJoin(F.broadcast(total))
        .select(
            "source",
            F.least(
                F.lit(1.0),
                F.lit(MIXTURE_TARGET_FRAC)
                / F.sqrt(
                    F.col("chars_s").cast("double")
                    / F.col("chars_tot").cast("double")
                ),
            ).alias("rate"),
        )
    )
    thresh = F.lower(
        F.lpad(
            F.hex(F.floor(F.col("rate") * HEX_SPACE).cast("bigint")),
            5,
            "0",
        )
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(
            (F.col("rate") >= 1.0)
            | (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 5)
                < thresh
            )
        )
        .select("doc_id", "source", "rate")
    )
