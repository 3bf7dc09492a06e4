"""Geo family semantics: the grid-bucketed radius join must be exact.

The 3x3 cell expansion is a *candidate* structure — correctness
requires it to be COMPLETE (no point within the radius may fall
outside the landmark's neighbour cells).  That holds iff
RADIUS_MILLI <= CELL_MILLI; these tests pin the invariant and check
the bucketed plans against a brute-force cross join at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_twitter_spark.operators import geo
from bigdata_twitter_spark.tables import load


def _brute_candidates(spark, sf_dir):
    """All (event, landmark) pairs within the radius — O(n*m) cross
    join, the semantic ground truth the grid structure must match."""
    sup = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(geo._SLAT_MILLI).alias("slat"),
        F.expr(geo._SLON_MILLI).alias("slon"),
    )
    pts = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr(geo._LAT_MILLI).alias("elat"),
        F.expr(geo._LON_MILLI).alias("elon"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    dlat = F.col("elat") - F.col("slat")
    dlon = F.col("elon") - F.col("slon")
    return (
        pts.crossJoin(sup)
        .withColumn("d2", dlat * dlat + dlon * dlon)
        .where(F.col("d2") <= F.lit(geo._RADIUS_SQ))
    )


def test_expansion_invariant():
    # +-1 cell completeness requires radius <= cell size.
    assert geo._RADIUS_MILLI <= geo._CELL_MILLI


def test_distance_join_matches_brute_force(spark, sf_dir):
    brute = (
        _brute_candidates(spark, sf_dir)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
    )
    got = geo.geo_distance_join(spark, sf_dir)
    assert got.count() == brute.count()
    assert (
        got.join(brute, ["s_suppkey", "n_events", "sum_value"]).count()
        == brute.count()
    )


def test_nearest_landmark_matches_brute_force(spark, sf_dir):
    brute = (
        _brute_candidates(spark, sf_dir)
        .groupBy("event_id")
        .agg(F.min(F.struct("d2", "s_suppkey")).alias("best"))
        .select(
            "event_id",
            F.col("best.s_suppkey").alias("nearest_suppkey"),
            F.col("best.d2").alias("nearest_d2"),
        )
    )
    got = geo.geo_nearest_landmark(spark, sf_dir)
    assert got.count() == brute.count()
    assert (
        got.join(
            brute, ["event_id", "nearest_suppkey", "nearest_d2"]
        ).count()
        == brute.count()
    )
