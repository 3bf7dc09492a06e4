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
