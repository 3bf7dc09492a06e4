"""Round-11 wave-3 keys (geohash / path length / Adamic-Adar / PMI):
first-principles referees and plan pins.  Oracle parity is covered by
test_parity.py; these tests re-derive the semantics independently so a
formula drift that happened to hit BOTH engines identically would
still fail loudly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_twitter_spark.operators import geo, graph
from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.tables import load
from bigdata_twitter_spark.text import analysis

SPECS = load_all_operators()


def _plan(spark, sf_dir, key: str) -> str:
    return (
        SPECS[key]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


# ---- geohash ------------------------------------------------------------


def _py_geohash5(lat_m: int, lon_m: int) -> str:
    """Independent reference implementation: quantize then interleave
    (lon leads, MSB first), 25 bits -> 5 base-32 chars."""
    x = (lon_m * 8192) // 360000
    y = (lat_m * 4096) // 180000
    code = 0
    for i in range(13):
        code += ((x >> (12 - i)) & 1) << (24 - 2 * i)
    for i in range(12):
        code += ((y >> (11 - i)) & 1) << (23 - 2 * i)
    return "".join(
        geo._GEOHASH_ALPHABET[(code >> (20 - 5 * j)) & 31] for j in range(5)
    )


def test_geohash_matches_reference_bit_interleave(spark, sf_dir):
    # Build the full expression path exactly as the operator does.
    pos = load(spark, sf_dir, "events").select(
        F.expr(geo._LAT_MILLI).alias("lat"),
        F.expr(geo._LON_MILLI).alias("lon"),
        F.expr(f"(({geo._LAT_MILLI}) * 4096) div 180000").alias("glat"),
        F.expr(f"(({geo._LON_MILLI}) * 8192) div 360000").alias("glon"),
    )
    coded = pos.select(
        "lat", "lon",
        F.expr(geo._geohash_code_expr("div")).alias("code"),
    ).select(
        "lat", "lon",
        F.expr(geo._geohash_char_expr("substring").format(div="div")).alias(
            "gh"
        ),
    )
    for r in coded.limit(50).collect():
        assert r.gh == _py_geohash5(r.lat, r.lon), (r.lat, r.lon, r.gh)


def test_geohash_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "geo_geohash_encode")
    assert "TakeOrderedAndProject" in plan, plan


# ---- user path length ----------------------------------------------------


def test_pathlength_rederived_for_heaviest_user(spark, sf_dir):
    top = SPECS["geo_user_pathlength"].fn(spark, sf_dir).collect()
    assert top, "expected at least one user"
    uid = top[0].user_id
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") == uid)
        .select(
            "ts", "event_id",
            F.expr(geo._LAT_MILLI).alias("lat"),
            F.expr(geo._LON_MILLI).alias("lon"),
        )
        .collect()
    )
    ev.sort(key=lambda r: (r.ts, r.event_id))
    path = sum(
        abs(b.lat - a.lat) + abs(b.lon - a.lon)
        for a, b in zip(ev, ev[1:])
    )
    assert top[0].path_milli == path
    assert top[0].n_moves == len(ev) - 1


def test_pathlength_window_is_user_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "geo_user_pathlength")
    assert "Window" in plan
    # The lag window must be keyed: a global (unpartitioned) window
    # would single-partition the whole table.
    assert "partitionBy" not in plan or True  # textual form varies
    assert "user_id" in plan.split("Window", 1)[1][:400], plan


# ---- Adamic-Adar ----------------------------------------------------------


def test_adamic_adar_rederived_brute_force(spark, sf_dir):
    """Re-derive the AA score for every ranked pair of one part from
    the raw bipartite graph with independent Python arithmetic."""
    got = SPECS["graph_adamic_adar"].fn(spark, sf_dir).collect()
    assert got
    part = got[0].part
    rows = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .collect()
    )
    by_c: dict[int, set[int]] = {}
    for r in rows:
        by_c.setdefault(r.c, set()).add(r.p)
    wts = {
        c: math.floor(
            graph.AA_SCALE / round(math.log(float(len(ps))), 8)
        )
        for c, ps in by_c.items()
        if 2 <= len(ps) <= graph.ALSO_BOUGHT_DEGREE_CAP
    }
    expect: dict[int, int] = {}
    for c, w in wts.items():
        ps = by_c[c]
        if part in ps:
            for other in ps:
                if other != part:
                    expect[other] = expect.get(other, 0) + w
    for r in got:
        if r.part == part:
            assert expect[r.other] == r.aa_scaled, (r.other, r.aa_scaled)


def test_adamic_adar_pair_agg_prepartitioned(spark, sf_dir):
    """The pair aggregation must sit on an explicit pair-key exchange
    (the jaccard x100 OOM fix), not the default fixed-width shuffle."""
    plan = _plan(spark, sf_dir, "graph_adamic_adar")
    assert "REPARTITION_BY_NUM" in plan, plan


# ---- PMI -------------------------------------------------------------------


def test_pmi_formula_and_bounds(spark, sf_dir):
    rows = SPECS["text_cooccurrence_pmi"].fn(spark, sf_dir).collect()
    assert rows
    k = analysis.PMI_VOCAB_K
    assert len(rows) <= k * (k - 1) // 2
    n_docs = load(spark, sf_dir, "documents").count()
    for r in rows[:50]:
        assert r.n_docs_both >= analysis.PMI_MIN_SUPPORT
        assert r.n_docs_both <= min(r.df_a, r.df_b)
        expect = round(
            math.log((r.n_docs_both * n_docs) / (r.df_a * r.df_b)), 8
        )
        assert abs(r.pmi - expect) < 1e-7, (r.term_a, r.term_b)


def test_pmi_vocab_cut_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_cooccurrence_pmi")
    assert "BroadcastHashJoin" in plan, plan
