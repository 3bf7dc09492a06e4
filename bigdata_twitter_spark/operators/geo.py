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
#
# Ids are pre-reduced mod the cycle BEFORE the multiply:
# (a·x + b·y) mod m == (a·(x mod m) + b·(y mod m)) mod m, so the
# values are identical to the unreduced form — but the term bound
# drops from a·max(id) (which overflows int64 under ANSI once ids
# reach ~3.5e9, e.g. the ×30 probe's stride-offset ids or any
# snowflake-style production id) to a·(m-1) < 5e14.  The ×30 probe
# caught the unreduced form with ARITHMETIC_OVERFLOW.
_LAT_MILLI = (
    "((event_id % 180000) * 2654435761 + (user_id % 180000) * 40503)"
    " % 180000"
)
_LON_MILLI = (
    "((event_id % 360000) * 97 + (user_id % 360000) * 1009 + 7) % 360000"
)

# Landmark (supplier) positions — same integer milli-degree space.
_SLAT_MILLI = "((s_suppkey % 180000) * 2654435761 + 12345) % 180000"
_SLON_MILLI = "((s_suppkey % 360000) * 97 + 31) % 360000"

# Radius-join parameters: 10-degree cells, 5-degree radius.  Because
# RADIUS_MILLI <= CELL_MILLI, every point within the radius of a
# landmark lies in one of the landmark's 3x3 neighbouring cells, so a
# +-1 cell expansion is a complete candidate set.  The distance metric
# is squared Euclidean in integer milli-degrees (dlat^2 + dlon^2 —
# exact BIGINT, so the oracle compare is hash-grade; a production
# deployment would swap the fine filter to haversine, which changes
# only this one codegen expression, not the candidate structure).  No
# wraparound: positions live in [0,180000)x[0,360000) and the metric
# is defined on that flat strip in both engines identically.
_CELL_MILLI = 10000
_RADIUS_MILLI = 5000
_RADIUS_SQ = _RADIUS_MILLI * _RADIUS_MILLI


def _landmarks9(sup: DataFrame) -> DataFrame:
    """Supplier landmarks expanded to their 3x3 neighbour cells.

    One exploded row per (landmark, lat offset, lon offset); the probe
    cell ids are what the big side equi-joins on.  9x a small dim stays
    broadcast-sized by construction.
    """
    off = F.array([F.lit(i) for i in (-1, 0, 1)])
    return (
        sup.select(
            "s_suppkey",
            F.expr(_SLAT_MILLI).alias("slat"),
            F.expr(_SLON_MILLI).alias("slon"),
        )
        .withColumn("dlat_off", F.explode(off))
        .withColumn("dlon_off", F.explode(off))
        .select(
            "s_suppkey", "slat", "slon",
            (F.expr(f"slat div {_CELL_MILLI}") + F.col("dlat_off")).alias(
                "probe_lat_cell"
            ),
            (F.expr(f"slon div {_CELL_MILLI}") + F.col("dlon_off")).alias(
                "probe_lon_cell"
            ),
        )
    )


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


@query(
    "geo_distance_join",
    sql=f"""
    WITH lm AS (
        SELECT s_suppkey,
               ({_SLAT_MILLI}) AS slat, ({_SLON_MILLI}) AS slon
        FROM supplier
    ),
    pts AS (
        SELECT ({_LAT_MILLI}) AS elat, ({_LON_MILLI}) AS elon, value
        FROM events
    ),
    cand AS (
        SELECT lm.s_suppkey, pts.value,
               (pts.elat - lm.slat) AS dlat, (pts.elon - lm.slon) AS dlon
        FROM lm JOIN pts
          ON (pts.elat // {_CELL_MILLI})
                 BETWEEN (lm.slat // {_CELL_MILLI}) - 1
                     AND (lm.slat // {_CELL_MILLI}) + 1
         AND (pts.elon // {_CELL_MILLI})
                 BETWEEN (lm.slon // {_CELL_MILLI}) - 1
                     AND (lm.slon // {_CELL_MILLI}) + 1
    )
    SELECT s_suppkey,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS sum_value
    FROM cand
    WHERE dlat * dlat + dlon * dlon <= {_RADIUS_SQ}
    GROUP BY s_suppkey
    ORDER BY n_events DESC, s_suppkey
    """,
    tables=("events", "supplier"),
    scale_note=(
        "Radius join via grid bucketing: the landmark side is expanded "
        "9x (3x3 neighbour cells) and BROADCAST, so the event scan "
        "never shuffles — candidates come from a broadcast hash join "
        "on the cell id, the exact-distance fine filter runs in the "
        "same codegen stage, and the final groupBy is bounded by "
        "landmark cardinality.  At 100 TB with a landmark set too big "
        "to broadcast, the identical plan runs as a shuffle join still "
        "keyed on cells (salt hot cells); the candidate volume is "
        "O(points x avg cell occupancy of landmarks), never points x "
        "landmarks.  BIGINT dlat^2+dlon^2 keeps the filter exact."
    ),
)
def geo_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-within-radius per landmark (grid-bucketed radius join).

    Candidate generation is an equi-join on 10-degree cell ids after a
    +-1 cell expansion of the (broadcast) landmark side; the +-1
    expansion is complete because the radius does not exceed the cell
    size.  The DuckDB oracle expresses the same candidate set as a
    BETWEEN range join on the cell ids — identical semantics, since a
    cell within +-1 of the landmark's matches exactly one expansion
    offset.
    """
    lm9 = _landmarks9(load(spark, sf_dir, "supplier"))
    pts = load(spark, sf_dir, "events").select(
        F.expr(_LAT_MILLI).alias("elat"),
        F.expr(_LON_MILLI).alias("elon"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    ).select(
        "elat", "elon", "value_dec",
        F.expr(f"elat div {_CELL_MILLI}").alias("e_lat_cell"),
        F.expr(f"elon div {_CELL_MILLI}").alias("e_lon_cell"),
    )

    dlat = F.col("elat") - F.col("slat")
    dlon = F.col("elon") - F.col("slon")
    return (
        pts.join(
            F.broadcast(lm9),
            (F.col("e_lat_cell") == F.col("probe_lat_cell"))
            & (F.col("e_lon_cell") == F.col("probe_lon_cell")),
        )
        .where(dlat * dlat + dlon * dlon <= F.lit(_RADIUS_SQ))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        )
        .orderBy(F.desc("n_events"), "s_suppkey")
    )


@query(
    "geo_nearest_landmark",
    sql=f"""
    WITH lm AS (
        SELECT s_suppkey,
               ({_SLAT_MILLI}) AS slat, ({_SLON_MILLI}) AS slon
        FROM supplier
    ),
    pts AS (
        SELECT event_id,
               ({_LAT_MILLI}) AS elat, ({_LON_MILLI}) AS elon
        FROM events
    ),
    cand AS (
        SELECT pts.event_id, lm.s_suppkey,
               (pts.elat - lm.slat) * (pts.elat - lm.slat)
             + (pts.elon - lm.slon) * (pts.elon - lm.slon) AS d2
        FROM lm JOIN pts
          ON (pts.elat // {_CELL_MILLI})
                 BETWEEN (lm.slat // {_CELL_MILLI}) - 1
                     AND (lm.slat // {_CELL_MILLI}) + 1
         AND (pts.elon // {_CELL_MILLI})
                 BETWEEN (lm.slon // {_CELL_MILLI}) - 1
                     AND (lm.slon // {_CELL_MILLI}) + 1
        WHERE (pts.elat - lm.slat) * (pts.elat - lm.slat)
            + (pts.elon - lm.slon) * (pts.elon - lm.slon) <= {_RADIUS_SQ}
    ),
    best AS (
        SELECT event_id, MIN(d2) AS nearest_d2 FROM cand GROUP BY event_id
    )
    SELECT c.event_id,
           MIN(c.s_suppkey) AS nearest_suppkey,
           b.nearest_d2
    FROM cand c JOIN best b
      ON c.event_id = b.event_id AND c.d2 = b.nearest_d2
    GROUP BY c.event_id, b.nearest_d2
    ORDER BY c.event_id
    """,
    tables=("events", "supplier"),
    scale_note=(
        "Nearest-neighbour over the same broadcast 3x3 cell candidate "
        "structure as geo_distance_join, reduced with ONE partial-"
        "aggregating groupBy(event_id) of min(struct(d2, suppkey)) — "
        "no window, no self-join on the big side; the argmin rides the "
        "struct ordering so ties break deterministically on the lower "
        "suppkey.  The oracle spells the identical semantics as "
        "min-then-rejoin (DuckDB has no struct min); results agree "
        "exactly because both pick (min d2, then min suppkey).  Points "
        "with no landmark within the radius drop out (inner "
        "semantics), so output is bounded by the matched-point count."
    ),
)
def geo_nearest_landmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest landmark within the radius for every event (argmin join)."""
    lm9 = _landmarks9(load(spark, sf_dir, "supplier"))
    pts = load(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_LAT_MILLI).alias("elat"),
        F.expr(_LON_MILLI).alias("elon"),
    ).select(
        "event_id", "elat", "elon",
        F.expr(f"elat div {_CELL_MILLI}").alias("e_lat_cell"),
        F.expr(f"elon div {_CELL_MILLI}").alias("e_lon_cell"),
    )

    dlat = F.col("elat") - F.col("slat")
    dlon = F.col("elon") - F.col("slon")
    cand = (
        pts.join(
            F.broadcast(lm9),
            (F.col("e_lat_cell") == F.col("probe_lat_cell"))
            & (F.col("e_lon_cell") == F.col("probe_lon_cell")),
        )
        .select(
            "event_id", "s_suppkey",
            (dlat * dlat + dlon * dlon).alias("d2"),
        )
        .where(F.col("d2") <= F.lit(_RADIUS_SQ))
    )
    return (
        cand.groupBy("event_id")
        .agg(F.min(F.struct("d2", "s_suppkey")).alias("best"))
        .select(
            "event_id",
            F.col("best.s_suppkey").alias("nearest_suppkey"),
            F.col("best.d2").alias("nearest_d2"),
        )
        .orderBy("event_id")
    )


# ---- geohash encode + leaderboard (round 11 wave 3) -------------------
# The standard base-32 geohash (Niemeyer encoding: bit-interleaved
# lon/lat, MSB first, lon leads) over the derived positions — the cell
# id format every geo index/store in the genre speaks, next to the
# ten-degree grid's integer cells.  5 characters = 25 bits (13 lon,
# 12 lat).  The interleave is plain non-negative integer div/mod
# arithmetic, generated ONCE in Python and rendered per engine (Spark
# `div`, DuckDB `//`), so both engines evaluate the identical formula
# — no float, no bit-op dialect differences, hash-grade by
# construction.
_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH_TOPK = 20


def _geohash_code_expr(div: str) -> str:
    """25-bit interleaved code from (glon, glat) quantized ints.

    ``div`` is the engine's integer-division token ('div' for Spark
    SQL, '//' for DuckDB).  Bit i (MSB-first) of the code takes lon
    bits at even i, lat bits at odd i.
    """
    terms = []
    for i in range(13):  # lon bits: positions 0,2,..,24 (MSB first)
        weight = 1 << (24 - 2 * i)
        shift = 1 << (12 - i)
        terms.append(f"(((glon {div} {shift}) % 2) * {weight})")
    for i in range(12):  # lat bits: positions 1,3,..,23
        weight = 1 << (23 - 2 * i)
        shift = 1 << (11 - i)
        terms.append(f"(((glat {div} {shift}) % 2) * {weight})")
    return " + ".join(terms)


def _geohash_char_expr(substr_fn: str) -> str:
    """code → 5-char base32 string (both engines: 1-based substr)."""
    chars = [
        f"{substr_fn}('{_GEOHASH_ALPHABET}',"
        f" CAST((code {{div}} {1 << (20 - 5 * j)}) % 32 AS INT) + 1, 1)"
        for j in range(5)
    ]
    return " || ".join(chars)


@query(
    "geo_geohash_encode",
    sql=f"""
    WITH pos AS (
        SELECT value,
               (({_LAT_MILLI}) * 4096) // 180000 AS glat,
               (({_LON_MILLI}) * 8192) // 360000 AS glon
        FROM events
    ), coded AS (
        SELECT value, {_geohash_code_expr('//')} AS code FROM pos
    ), named AS (
        SELECT value,
               {_geohash_char_expr('substr').format(div='//')} AS geohash5
        FROM coded
    )
    SELECT geohash5,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM named GROUP BY 1
    ORDER BY n_events DESC, geohash5 LIMIT {_GEOHASH_TOPK}
    """,
    tables=("events",),
    scale_note=(
        "Geohash-5 leaderboard: the encode is a pure codegen map "
        "stage (25 integer mul/div/mod terms + 5 substr lookups — no "
        "UDF, no float), the rollup is a two-phase agg bounded by "
        "DISTINCT-HASH cardinality (<= 2^25 cells regardless of row "
        "count), and the top-20 is TakeOrdered with a total-order "
        "tie-break.  At 100 TB this is the same shape as "
        "geo_grid_hotspots with a finer, string-keyed cell id — the "
        "format geo indexes and stores actually exchange.  Quantized "
        "products stay < 3e9, far inside int64 under ANSI (the geo "
        "big-id overflow lesson: positions are already mod-reduced)."
    ),
)
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 geohash-5 cells by event count (standard base-32
    bit-interleaved encoding over the derived positions)."""
    pos = load(spark, sf_dir, "events").select(
        "value",
        F.expr(f"(({_LAT_MILLI}) * 4096) div 180000").alias("glat"),
        F.expr(f"(({_LON_MILLI}) * 8192) div 360000").alias("glon"),
    )
    coded = pos.select(
        "value", F.expr(_geohash_code_expr("div")).alias("code")
    )
    named = coded.select(
        "value",
        F.expr(_geohash_char_expr("substring").format(div="div")).alias(
            "geohash5"
        ),
    )
    from ..numerics import dec

    return (
        named.groupBy("geohash5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .orderBy(F.col("n_events").desc(), "geohash5")
        .limit(_GEOHASH_TOPK)
    )


# ---- per-user path length (round 11 wave 3) ----------------------------
# User mobility: total L1 distance travelled in integer milli-degrees
# over the time-ordered event sequence — the genre's "how far does a
# user move" analytic.  L1 keeps every step and sum EXACT BIGINT (the
# Euclidean swap is one codegen expression on the same lag structure).
_PATH_TOPK = 20


@query(
    "geo_user_pathlength",
    sql=f"""
    WITH pos AS (
        SELECT user_id, ts, event_id,
               {_LAT_MILLI} AS lat, {_LON_MILLI} AS lon
        FROM events
    ), steps AS (
        SELECT user_id,
               ABS(lat - lag(lat) OVER w) + ABS(lon - lag(lon) OVER w)
                   AS step
        FROM pos WINDOW w AS (PARTITION BY user_id
                              ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(SUM(step) AS BIGINT) AS path_milli,
           CAST(COUNT(step) AS BIGINT) AS n_moves
    FROM steps GROUP BY 1
    ORDER BY path_milli DESC, user_id LIMIT {_PATH_TOPK}
    """,
    tables=("events",),
    scale_note=(
        "Per-user travel distance: ONE user-partitioned lag window "
        "(ordered by (ts, event_id) — a total order, so ties cannot "
        "reorder between engines or retries) over the derived "
        "positions, then a users-sized two-phase agg and a "
        "TakeOrdered top-20.  The window partitions by user_id — "
        "state per task is one user's trace, never data-sized — and "
        "every step/sum is exact BIGINT milli-degrees (L1), so the "
        "compare is hash-grade with zero float discipline needed."
    ),
)
def geo_user_pathlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by total L1 milli-degree path length over their
    time-ordered events."""
    from pyspark.sql import Window

    pos = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_LAT_MILLI).alias("lat"),
        F.expr(_LON_MILLI).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = pos.select(
        "user_id",
        (
            F.abs(F.col("lat") - F.lag("lat").over(w))
            + F.abs(F.col("lon") - F.lag("lon").over(w))
        ).alias("step"),
    )
    return (
        steps.groupBy("user_id")
        .agg(
            F.sum("step").cast("bigint").alias("path_milli"),
            F.count("step").cast("bigint").alias("n_moves"),
        )
        .orderBy(F.col("path_milli").desc(), "user_id")
        .limit(_PATH_TOPK)
    )
