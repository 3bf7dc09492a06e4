"""two_level_cumulative: the shared distributed rank/running-sum used
by the rank-statistics family (VERDICT r8 "Next round" #2).

Semantics pins — the helper must agree exactly with the naive
unpartitioned-window formulation — plus the determinism property that
killed the first (repartitionByRange-based) draft: results must be
byte-stable across repeated evaluations even when the input is a
shuffled aggregate with nondeterministic intra-partition row order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_twitter_spark.operators.distcum import two_level_cumulative


def _demo(spark, n=500, groups=("a", "b", "c")):
    # Deterministic skewed demo data; routed through a groupBy so the
    # helper's input has shuffle-dependent physical row order (the
    # regime that broke the sampling-based draft).
    rows = spark.range(n).select(
        (F.col("id") % len(groups)).cast("int").alias("gi"),
        ((F.col("id") * 37) % 101).cast("bigint").alias("v"),
        F.col("id").alias("k"),
    )
    g = F.element_at(F.array(*[F.lit(x) for x in groups]), F.col("gi") + 1)
    return rows.select(g.alias("g"), "v", "k").groupBy("g", "v").agg(
        F.count("*").cast("bigint").alias("c"),
        F.min("k").alias("k"),
    )


def test_rank_matches_naive_window_per_group(spark):
    df = _demo(spark)
    got = two_level_cumulative(
        df,
        order_by=["v", "k"],
        bucket_key="v",
        group_cols=["g"],
        rank_col="rnk",
        num_buckets=7,
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    want = df.withColumn("rnk", F.row_number().over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cumsum_matches_naive_window_global_and_desc(spark):
    df = _demo(spark)
    got = two_level_cumulative(
        df,
        order_by=[F.col("v").desc(), F.col("k")],
        bucket_key="v",
        sum_cols=["c"],
        descending=True,
        num_buckets=5,
    ).select("g", "v", "k", "cum_c")
    w = (
        Window.orderBy(F.col("v").desc(), F.col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.select("g", "v", "k", F.sum("c").over(w).alias("cum_c"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_rank_limit_prunes_to_topk(spark):
    df = _demo(spark)
    got = two_level_cumulative(
        df,
        order_by=[F.col("v").desc(), F.col("k")],
        bucket_key="v",
        group_cols=["g"],
        rank_col="rnk",
        rank_limit=10,
        descending=True,
        num_buckets=5,
    )
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("k"))
    want = df.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 10
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_deterministic_across_repeated_evaluations(spark):
    # The offsets branch and the data branch each re-execute the input
    # subtree; placement MUST be a pure function of the data (the
    # repartitionByRange draft failed here: resampled boundaries per
    # subtree execution scrambled the offset join).
    df = _demo(spark, n=2000)
    out = two_level_cumulative(
        df,
        order_by=["v", "k"],
        bucket_key="v",
        group_cols=["g"],
        sum_cols=["c"],
        rank_col="rnk",
        num_buckets=13,
    )
    baseline = sorted(map(tuple, out.collect()))
    for _ in range(3):
        assert sorted(map(tuple, out.collect())) == baseline


def test_single_value_domain_is_one_bucket(spark):
    # max == min → span 1 → every row in bucket 0; still correct.
    df = spark.range(50).select(
        F.lit(7).cast("bigint").alias("v"), F.col("id").alias("k")
    )
    got = two_level_cumulative(
        df, order_by=["v", "k"], bucket_key="v", rank_col="rnk"
    )
    rows = {(r["k"], r["rnk"]) for r in got.collect()}
    assert rows == {(i, i + 1) for i in range(50)}


def test_tied_order_raises_with_guard(spark):
    """The total-order guard (VERDICT r10 carried item): an order_by
    with ties inside a (bucket, group) must raise at runtime when
    validation is on — not silently emit layout-dependent running
    sums.  `v` alone is not a total order in _demo's output (one row
    per (g, v), but globally-ungrouped v repeats across g)."""
    import pytest

    df = _demo(spark)
    bad = two_level_cumulative(
        df.select("v", "c"),  # v repeats across former groups -> ties
        order_by=["v"],
        bucket_key="v",
        sum_cols=["c"],
        num_buckets=5,
        validate_total_order=True,
    )
    with pytest.raises(Exception, match="not a total order"):
        bad.collect()


def test_tied_order_passes_without_guard_flag(spark, monkeypatch):
    """validate_total_order=False (explicit) skips the guard — the
    production default when BDT_DISTCUM_VALIDATE is unset."""
    df = _demo(spark)
    out = two_level_cumulative(
        df.select("v", "c"),
        order_by=["v"],
        bucket_key="v",
        sum_cols=["c"],
        num_buckets=5,
        validate_total_order=False,
    )
    assert out.count() == df.count()
