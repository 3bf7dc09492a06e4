"""Geo grid binning (genre surface: tweet coordinates/place hotspots).

The reference genre carried a geo surface — per-tweet coordinates
binned into cells and ranked into hotspot leaderboards (SURVEY.md §1.2
names the coordinates/place columns; reference checkout empty — §0.1).
The synthetic tables carry no lat/lon, so position is DERIVED
deterministically from (event_id, user_id) with integer hashing — the
binning/ranking machinery downstream of the derivation is the real
operator under test, and the derivation is mirrored exactly in the
DuckDB oracle.

Scale shape: a geo hotspot query at 100 TB is a codegen map stage
(derive cell id) followed by a partial-agg shuffle whose reduce side is
bounded by the CELL CARDINALITY (18x36 = 648 ten-degree cells here,
~65k at one degree), not the row count — the canonical
high-cardinality-in, low-cardinality-out rollup.  No window, no sort
until the final top-K over <=648 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Knuth multiplicative constants keep the derived positions uniform
# across cells; all arithmetic stays in non-negative int64 so `%` and
# `div` agree between Spark (truncating) and DuckDB (flooring).
_LAT_MILLI = "(event_id * 2654435761 + user_id * 40503) % 180000"
_LON_MILLI = "(event_id * 97 + user_id * 1009 + 7) % 360000"


@query(
    "geo_grid_hotspots",
    sql=f"""
    WITH pts AS (
        SELECT ({_LAT_MILLI}) // 10000 AS lat_band,
               ({_LON_MILLI}) // 10000 AS lon_band,
               value
        FROM events
    )
    SELECT CAST(lat_band * 10 - 90 AS BIGINT) AS cell_lat,
           CAST(lon_band * 10 - 180 AS BIGINT) AS cell_lon,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS sum_value
    FROM pts
    GROUP BY lat_band, lon_band
    ORDER BY n_events DESC, cell_lat, cell_lon
    LIMIT 20
    """,
    tables=("events",),
    scale_note=(
        "Map-side cell-id derivation in codegen, then a groupBy whose "
        "distinct-key space is the grid (648 cells at 10 degrees) — "
        "partial aggregation collapses each task's rows to <=648 "
        "partials, so the shuffle carries O(tasks x cells) rows "
        "regardless of input size.  Top-20 over the aggregated cells "
        "is driver-trivial.  DECIMAL(18,2) keeps the value sum "
        "engine-exact; ties in the leaderboard break on (lat, lon)."
    ),
)
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten-degree-grid hotspot leaderboard over derived event positions."""
    e = load(spark, sf_dir, "events")
    pts = e.select(
        F.expr(f"({_LAT_MILLI}) div 10000").alias("lat_band"),
        F.expr(f"({_LON_MILLI}) div 10000").alias("lon_band"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )
    return (
        pts.groupBy("lat_band", "lon_band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
        .select(
            (F.col("lat_band") * 10 - 90).cast("bigint").alias("cell_lat"),
            (F.col("lon_band") * 10 - 180).cast("bigint").alias("cell_lon"),
            "n_events",
            "sum_value",
        )
        .orderBy(F.desc("n_events"), "cell_lat", "cell_lon")
        .limit(20)
    )
