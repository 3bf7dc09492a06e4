"""Operators whose entire point is the 100-TB posture (SURVEY.md §2.N):
reproducible hash-based sampling and mergeable HLL sketches — the two
primitives a training-data pipeline leans on when exact passes over the
full corpus stop being affordable.

Why hash sampling and not ``df.sample()``: RNG sampling is
partition-order dependent and unrepeatable across retries/re-runs; a
content-hash predicate is a pure function of the row, so the same rows
are selected on every run, on any cluster layout, and the predicate
pushes down to the scan like any other filter.  md5 over the
stringified key is computed identically by Spark and DuckDB (verified
byte-equal), which is what makes the sample oracle-checkable.

Why sketches: a per-partition HLL sketch is a few KB regardless of
input size and sketches MERGE, so distinct-counting 100 TB becomes a
two-phase agg whose shuffle carries kilobytes per group — same shape
Spark already uses for partial aggregation, made explicit here at the
(group × day) granularity so rollups across days reuse daily sketches
instead of rescanning raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Keep 2 of 16 md5 first-nibble buckets ⇒ a deterministic 12.5% sample.
SAMPLE_NIBBLES = ("0", "1")
BOOSTED_TYPE = "error"  # rare class kept at 100% (training-data rebalance)


@query(
    "sample_hash_stratified",
    sql=f"""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type = '{BOOSTED_TYPE}'
       OR substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
          IN {SAMPLE_NIBBLES!r}
    """,
    tables=("events",),
    scale_note=(
        "Deterministic stratified sampling: rare class kept at 100%, the "
        "rest by a content-hash predicate (md5 nibble) — reproducible "
        "across runs/retries/cluster layouts, pushes down as a plain "
        "filter, no RNG state. The standard reproducible-subset recipe "
        "for 100-TB training-data curation."
    ),
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep all 'error' events plus a deterministic 12.5% hash-sample of
    everything else."""
    e = load(spark, sf_dir, "events")
    nibble = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    keep = F.when(F.col("event_type") == BOOSTED_TYPE, F.lit(True)).otherwise(
        nibble.isin(*SAMPLE_NIBBLES)
    )
    return e.filter(keep).select("event_id", "event_type", "value")


@query(
    "agg_hll_sketch",
    sql=None,  # DataSketches HLL binary sketches have no DuckDB twin;
    # the local suite pins the estimate within 5% of the exact count.
    tables=("events",),
    scale_note=(
        "Mergeable distinct-count sketches: per-(type, day) HLL sketches "
        "(KBs each) built in one pass, then UNIONED to per-type totals — "
        "the shuffle carries sketches, not user ids. At 100 TB the daily "
        "sketch layer is materialized once and every rollup window "
        "(7d/30d/all-time) is a sketch merge, never a rescan."
    ),
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via daily HLL sketches
    merged with hll_union_agg (exact twin: agg_count_distinct)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )


SAMPLE_K = 20


@query(
    "sample_exact_k_stratified",
    sql=f"""
    SELECT event_id, event_type, value FROM (
        SELECT event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rn
        FROM events
    ) WHERE rn <= {SAMPLE_K}
    """,
    tables=("events",),
    scale_note=(
        "Exact-k-per-stratum sampling: rank rows inside each stratum by "
        "their content hash (md5 of the key — a deterministic, "
        "layout-independent permutation) and keep the first k. The "
        "fraction-based twin is sample_hash_stratified; exact-k is what "
        "eval-set construction needs (same k per class regardless of "
        "class skew). One shuffle on the stratum key; the per-stratum "
        "top-k never materializes more than k rows per group past the "
        "window."
    ),
)
def sample_exact_k_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k=20 events per event_type, chosen by content-hash rank
    (reproducible across runs and cluster layouts)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        e.select("event_id", "event_type", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
        .drop("rn")
    )


# K-minimum-values sketch size for the portable distinct-count twin.
KMV_K = 64
# 16^15 = 2^60 as an exact double: the hash-prefix value space.
KMV_SPACE = float(1 << 60)


@query(
    "agg_kmv_distinct",
    sql="""
    WITH h AS (
        SELECT DISTINCT event_type,
               md5(CAST(user_id AS VARCHAR)) AS hv
        FROM events
    ), ranked AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rn
        FROM h
    ), sk AS (
        SELECT event_type,
               CAST(MAX(rn) AS BIGINT) AS n_seen,
               MAX(hv) AS kth
        FROM ranked WHERE rn <= 64
        GROUP BY event_type
    )
    SELECT event_type, n_seen,
           CASE WHEN n_seen < 64 THEN CAST(n_seen AS DOUBLE)
                ELSE (64 - 1)
                     / (CAST((((((((((((((((CAST(0 AS BIGINT) * 16 + (strpos('0123456789abcdef', substring(kth, 1, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 2, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 3, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 4, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 5, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 6, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 7, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 8, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 9, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 10, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 11, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 12, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 13, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 14, 1)) - 1)) * 16 + (strpos('0123456789abcdef', substring(kth, 15, 1)) - 1)) AS DOUBLE)
                        / 1152921504606846976.0)
           END AS est_users
    FROM sk
    """,
    tables=("events",),
    scale_note=(
        "Distinct-count SKETCH with a driver value-hash check -- the "
        "portable twin of agg_approx_count_distinct/agg_hll_sketch "
        "(whose HLL internals are engine-specific by nature): "
        "K-minimum-values over md5(user). The estimator (k-1)/v_k "
        "needs only the k-th smallest hash per group, so sketch state "
        "is k hashes per group (mergeable by union+truncate -- the "
        "same partial/final split HLL enjoys; the declared per-group "
        "rank window is the semantic spec, and at 100 TB the rank is "
        "replaced by a per-partition top-k merge so no full per-group "
        "sort happens). Small groups (n<k) report exactly. The hash "
        "prefix value is recovered by a 15-digit Horner fold in "
        "BIGINT (exact: 16^15 < 2^63) so both engines divide the "
        "same two numbers."
    ),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a k-minimum-
    values sketch (k=64) under a portable md5 hash family."""
    e = load(spark, sf_dir, "events")
    h = e.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("hv")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.max("rn").cast("bigint").alias("n_seen"),
            F.max("hv").alias("kth"),
        )
    )
    val = F.expr("(((((((((((((((CAST(0 AS BIGINT) * 16 + (locate(substring(kth, 1, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 2, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 3, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 4, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 5, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 6, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 7, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 8, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 9, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 10, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 11, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 12, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 13, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 14, 1), '0123456789abcdef') - 1)) * 16 + (locate(substring(kth, 15, 1), '0123456789abcdef') - 1))")
    return sk.select(
        "event_type",
        "n_seen",
        F.when(
            F.col("n_seen") < KMV_K, F.col("n_seen").cast("double")
        )
        .otherwise(
            (KMV_K - 1) / (val.cast("double") / F.lit(KMV_SPACE))
        )
        .alias("est_users"),
    )
