"""Round-12 TPC-H suite completion (Q16 / Q20 analogs):
first-principles referees.  Oracle parity lives in test_parity.py;
these re-derive the semantics independently with pandas over the raw
parquet, so a defect mirrored into BOTH engines (the class the r11
MERGE 3VL bug belonged to) still fails."""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from bigdata_twitter_spark.operators import tpch
from bigdata_twitter_spark.registry import load_all_operators

SPECS = load_all_operators()


def _pdf(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


# ---- Q16: supplier count by part attributes ------------------------------


def _q16_expected(sf_dir: str) -> dict[tuple, int]:
    part = _pdf(sf_dir, "part")
    part = part[
        (part.p_brand != tpch.Q16_EXCL_BRAND)
        & (part.p_type != tpch.Q16_EXCL_TYPE)
        & (part.p_size.isin(tpch.Q16_SIZES))
    ][["p_partkey", "p_brand", "p_type", "p_size"]]
    bad = set(
        _pdf(sf_dir, "supplier").query("s_acctbal < 0.0").s_suppkey
    )
    li = _pdf(sf_dir, "lineitem")[["l_partkey", "l_suppkey"]]
    li = li[~li.l_suppkey.isin(bad)].merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )
    out = (
        li.groupby(["p_brand", "p_type", "p_size"])
        .l_suppkey.nunique()
        .to_dict()
    )
    return {(b, t, int(s)): int(c) for (b, t, s), c in out.items()}


def test_q16_counts_match_first_principles(spark, sf_dir):
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in SPECS["agg_q16_supplier_cnt"].fn(spark, sf_dir).collect()
    }
    assert got == _q16_expected(sf_dir)


def test_q16_excludes_complaint_suppliers(spark):
    """A negative-balance supplier's lineitems must never contribute.
    Pinned to sf0.01: the sf0.001 fixture has no negative-balance
    suppliers, so only sf0.01 exercises the exclusion path."""
    sf_dir = "/root/testdata/sf0.01"
    part = _pdf(sf_dir, "part")
    part = part[
        (part.p_brand != tpch.Q16_EXCL_BRAND)
        & (part.p_type != tpch.Q16_EXCL_TYPE)
        & (part.p_size.isin(tpch.Q16_SIZES))
    ][["p_partkey", "p_brand", "p_type", "p_size"]]
    bad = set(_pdf(sf_dir, "supplier").query("s_acctbal < 0.0").s_suppkey)
    li = _pdf(sf_dir, "lineitem")[["l_partkey", "l_suppkey"]].merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )
    assert bad & set(li.l_suppkey), (
        "fixture must exercise the exclusion path"
    )
    without_excl = {
        (b, t, int(s)): int(c)
        for (b, t, s), c in li.groupby(["p_brand", "p_type", "p_size"])
        .l_suppkey.nunique()
        .to_dict()
        .items()
    }
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in SPECS["agg_q16_supplier_cnt"].fn(spark, sf_dir).collect()
    }
    assert got == _q16_expected(sf_dir)
    assert got != without_excl  # the exclusion actually bites


def test_q16_plan_broadcasts_both_dims(spark, sf_dir):
    plan = (
        SPECS["agg_q16_supplier_cnt"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


# ---- Q20: excess-stock suppliers ------------------------------------------


def _q20_expected(sf_dir: str) -> set[str]:
    part = _pdf(sf_dir, "part")
    fam = set(
        part[part.p_name.str.startswith(tpch.Q20_NAME_PREFIX)].p_partkey
    )
    li = _pdf(sf_dir, "lineitem")[
        ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
    ]
    li = li[li.l_partkey.isin(fam)].copy()
    # Exact cents arithmetic, mirroring the DECIMAL(12,2) convention.
    li["q"] = li.l_quantity.map(
        lambda v: Decimal(str(v)).quantize(Decimal("0.01"))
    )
    y0, y1 = pd.Timestamp(tpch.Q20_Y0), pd.Timestamp(tpch.Q20_Y1)
    li["yq"] = li.q.where(
        (li.l_shipdate >= y0) & (li.l_shipdate < y1), Decimal("0.00")
    )
    per = li.groupby(["l_suppkey", "l_partkey"]).agg(
        all_qty=("q", "sum"), yr_qty=("yq", "sum")
    )
    excess = per[(per.yr_qty > 0) & (per.all_qty > per.yr_qty * 2)]
    winners = {s for s, _ in excess.index}
    sup = _pdf(sf_dir, "supplier").merge(
        _pdf(sf_dir, "nation").query(
            f"n_regionkey == {tpch.Q20_REGION_KEY}"
        ),
        left_on="s_nationkey",
        right_on="n_nationkey",
    )
    return set(sup[sup.s_suppkey.isin(winners)].s_name)


def test_q20_names_match_first_principles(spark, sf_dir):
    got = {
        r.s_name
        for r in SPECS["agg_q20_excess_suppliers"].fn(spark, sf_dir).collect()
    }
    assert got == _q20_expected(sf_dir)
    assert got, "fixture must exercise the excess path"


def test_q20_single_exchange(spark, sf_dir):
    """One (suppkey, partkey) aggregate shuffle; part / supplier /
    nation all ride broadcasts."""
    plan = (
        SPECS["agg_q20_excess_suppliers"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
