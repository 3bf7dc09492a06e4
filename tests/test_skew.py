"""Skew stress for the salting recipe (VERDICT-r2 item 5).

The registered ``join_skew_salted`` passes on lineitem's 3-value key;
this test manufactures *real* imbalance — one key holding ~50% of all
rows — and pins three properties of ``salted_join``:

1. **Correctness under skew**: salted result ≡ plain join result.
2. **No dominating task**: after the (key, salt) shuffle the largest
   partition holds a small fraction of rows, while the plain key
   shuffle provably lands ≥50% of rows in one partition.
3. **Wall-time**: joining the skewed fixture salted stays within ~2×
   (3× asserted for host-noise headroom) of joining a same-sized
   *uniform* fixture plain — i.e. salting removes the skew penalty.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from bigdata_twitter_spark.operators.skew import SALT_BUCKETS, salted_join

N_ROWS = 200_000
N_COLD_KEYS = 1_000
SHUFFLE_PARTS = 32


@pytest.fixture(scope="module")
def skewed(spark):
    """~50% of rows on key 'hot', remainder uniform over 1000 keys."""
    df = (
        spark.range(N_ROWS)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("hot"))
            .otherwise(
                F.concat(F.lit("k"), (F.col("id") % N_COLD_KEYS).cast("string"))
            )
            .alias("key"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.col("id"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def uniform(spark):
    df = (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("k"), (F.col("id") % N_COLD_KEYS).cast("string"))
            .alias("key"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.col("id"),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def _dim(df):
    return df.groupBy("key").agg(
        F.round(F.avg("v"), 6).alias("k_avg"), F.count("*").alias("k_rows")
    )


def _join_plain(fact, dim):
    return fact.join(dim.hint("shuffle_hash"), ["key"])


def _materialize_timed(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def _max_partition_share(df, *cols) -> float:
    sizes = (
        df.repartition(SHUFFLE_PARTS, *[F.col(c) for c in cols])
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    return sizes / N_ROWS


def test_salted_equals_plain_under_skew(skewed):
    dim = _dim(skewed)
    salted = salted_join(skewed, dim, ["key"], ["id"])
    plain = _join_plain(skewed, dim)
    agg = lambda d: d.agg(  # noqa: E731 — one checksum row
        F.count("*").alias("n"),
        F.sum(F.col("k_rows").cast("decimal(28,0)")).alias("sum_rows"),
        F.sum(F.col("v").cast("decimal(18,6)")).alias("sum_v"),
        F.sum(F.col("k_avg").cast("decimal(18,6)")).alias("sum_avg"),
    )
    assert agg(salted).collect() == agg(plain).collect()


def test_salt_breaks_dominating_partition(skewed):
    plain_share = _max_partition_share(skewed, "key")
    salted = skewed.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    salted_share = _max_partition_share(salted, "key", "salt")
    assert plain_share >= 0.5, f"fixture not skewed: {plain_share:.3f}"
    # 50% hot key over 16 salts → ~3.1% per salt bucket; several buckets
    # can hash-collide into one of the 32 partitions, so the guarantee
    # is relative: the dominating partition shrinks severalfold and no
    # partition holds anywhere near the hot key's 50%.
    assert salted_share <= plain_share / 3, (
        f"salted shuffle still dominated: max partition holds "
        f"{salted_share:.1%} vs plain {plain_share:.1%}"
    )
    assert salted_share <= 0.2


def test_salted_skew_walltime_near_uniform(spark, skewed, uniform):
    skewed_dim, uniform_dim = _dim(skewed), _dim(uniform)
    # Isolate the salting effect from AQE's own skew splitting.
    before = spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        # Warm both plans, then best-of-3 (shared-host noise, BASELINE.md).
        for _ in range(1):
            _materialize_timed(_join_plain(uniform, uniform_dim))
            _materialize_timed(salted_join(skewed, skewed_dim, ["key"], ["id"]))
        t_uniform = min(
            _materialize_timed(_join_plain(uniform, uniform_dim))
            for _ in range(3)
        )
        t_salted = min(
            _materialize_timed(salted_join(skewed, skewed_dim, ["key"], ["id"]))
            for _ in range(3)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", before)
    # ~2× is the design target; 3× asserted for shared-host headroom.
    assert t_salted <= max(3.0 * t_uniform, t_uniform + 1.0), (
        f"salted skew join {t_salted:.2f}s vs uniform plain "
        f"{t_uniform:.2f}s exceeds headroom"
    )
