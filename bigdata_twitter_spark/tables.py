"""Fixture-table loaders: declared schemas, the one true events loader.

Every operator loads inputs through :func:`load` — never a raw
``spark.read.parquet`` — so the two verified landmines (SURVEY.md §1.4)
are fixed in exactly one place:

1. ``events.ts`` has shipped in two encodings across driver rounds:
   TIMESTAMP(NANOS) (arrives as LongType nanoseconds under the legacy
   conf; DuckDB truncates the same column to µs, so we match with
   *integer* division ``ts div 1000`` → ``timestamp_micros`` — float
   division corrupts 118/1000 rows at sf0.001) and, since round 3,
   plain timestamp[us] (arrives as TIMESTAMP_NTZ; cast to TIMESTAMP,
   value-identical under the UTC session TZ).  The loader dispatches
   on the arriving dtype so operators always see TimestampType µs.
2. All loads run through :func:`session.configure` so a driver-owned
   session gets the required runtime confs.

At 100 TB these tables would be partitioned/bucketed parquet datasets;
the loaders take a directory and a table name, so swapping a single
file for a partitioned layout is a zero-change operation for every
operator above this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always be broadcast when joined
# against a fact table (region 5 / nation 25 / supplier / part rows are
# tiny at every SF; at 100 TB they are still << the 10 MB-class
# broadcast budget).
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical column types."""
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # ns → µs with integer division ONLY (SURVEY.md §1.4.2);
            # identical to DuckDB's truncating nanos read.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type != "timestamp":
            # timestamp[us] fixtures arrive as TIMESTAMP_NTZ; the cast
            # is value-preserving under the UTC session timezone.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# (sf_dir, name) → scan split count; .rdd forces physical planning, so
# the probe is done once per fixture file, not once per query.
_SCAN_SPLITS: dict[tuple[str, str], int] = {}


def spread(df: DataFrame, sf_dir: str, name: str, *cols: str) -> DataFrame:
    """Re-spread a narrow scan before a CPU-heavy per-row pipeline.

    The fixtures are single-row-group parquet files, so Spark's
    byte-range splitting cannot parallelize them: a shingle/hash/fold
    pipeline downstream would run on ONE core however many the session
    has.  When (and only when) the scan yields fewer splits than
    ``defaultParallelism``, hash-repartition on ``cols`` — chosen as
    the downstream grouping key so the exchange is REUSED by the
    following groupBy rather than added to it.  At 100 TB the scan
    carries thousands of row-group splits and this is a no-op; a plain
    query (filter/agg without heavy per-row compute) should NOT call
    this — the exchange round-trip costs more than single-core scanning
    saves (measured: global spread-on-load slowed the bench ~25%).
    """
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    key = (sf_dir, name)
    if key not in _SCAN_SPLITS:
        _SCAN_SPLITS[key] = load(spark, sf_dir, name).rdd.getNumPartitions()
    if _SCAN_SPLITS[key] >= width:
        return df
    return df.repartition(width, *cols) if cols else df.repartition(width)


# (tag, sf_dir) → the persisted DataFrame from that operator's last
# call; the next call frees it before persisting a fresh plan.
_PERSIST_REGISTRY: dict[tuple[str, str], DataFrame] = {}


def persist_fresh(tag: str, sf_dir: str, df: DataFrame) -> DataFrame:
    """Persist a multiply-consumed intermediate, freeing the previous
    generation for the same (tag, sf_dir).

    Catalyst does NOT reuse exchanges across self-join aliases, so a
    DataFrame consumed by both sides of a self-join (or by a self-join
    plus a sizes/df aggregate) re-executes its whole subtree once per
    consumer.  For the dedup/similarity family that subtree is the
    expensive part (shingle explosion, 32-hash MinHash, SRP plane
    dots); the persisted intermediate is the SMALL side (signatures,
    bands, candidate pairs — a few machine words per row).  At 100 TB
    the same call is MEMORY_AND_DISK on the cluster cache tier, exactly
    as each operator's scale_note prescribes.
    """
    key = (tag, sf_dir)
    prev = _PERSIST_REGISTRY.pop(key, None)
    if prev is not None:
        prev.unpersist()
    # Evict cached generations that belong to a DIFFERENT dataset:
    # every persist within one query execution shares its sf_dir, so
    # cross-dir blocks are never mid-pipeline — they are dead weight
    # from a previous scale's run (the ×100 probe stacked sf0.1 and
    # ×100 generations until the shuffle writers could not acquire
    # pages).  unpersist() is lazily CORRECT in Spark — a consumer
    # that somehow re-executes just recomputes from source.
    # Decision (ADVICE r11, adjudicated): dir-inequality eviction can
    # thrash if two fixture dirs interleave within one session, but
    # the driver, bench, and parity sweep are all single-dataset-per-
    # run, and pytest's interleavings are read-only re-loads — the
    # cost is a recompute, never a wrong answer.  A size/age policy
    # buys nothing here until a genuinely multi-dir consumer exists.
    for other in [k for k in _PERSIST_REGISTRY if k[1] != sf_dir]:
        _PERSIST_REGISTRY.pop(other).unpersist()
    # SERIALIZED storage, not the deserialized default: cached blocks
    # live in the same unified pool the shuffle/agg tasks allocate
    # from, and deserialized rows inflate 3-5x.  The r11 wave-3 ×30
    # probe OOM-killed the adamic-adar pair shuffle
    # (UNABLE_TO_ACQUIRE_MEMORY mid-spill) when two cache generations
    # (the sf0.1 run's block kept alive beside the ×30 one — the
    # registry frees same-(tag, sf_dir) only) squeezed the execution
    # pool under 32 concurrent shuffle writers; serialized blocks cut
    # the squeeze by the inflation factor and spill to disk losslessly.
    # (PySpark 4: MEMORY_AND_DISK IS the serialized level; the
    # deserialized default is MEMORY_AND_DISK_DESER.)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSIST_REGISTRY[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view (for the SQL entry point)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
