"""Round-11 wave-4 keys (multi-clause MERGE / Poisson-bootstrap CI):
first-principles referees.  Oracle parity lives in test_parity.py;
these re-derive the semantics independently, so a defect mirrored
into BOTH engines (the class the 3VL keep-row drop belonged to)
still fails."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from bigdata_twitter_spark.operators import cdc, scale_ops
from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.tables import load

SPECS = load_all_operators()


# ---- multi-clause MERGE ----------------------------------------------------


def test_merge_action_counts_match_first_principles(spark, sf_dir):
    """Every event routes to exactly one clause; totals must add up —
    this is the referee that catches the 3VL keep-row drop (a bare
    NOT(NULL AND x) silently deleted every unmatched target row in
    both engines identically, so oracle parity alone passed)."""
    ids = [
        r.event_id
        for r in load(spark, sf_dir, "events").select("event_id").collect()
    ]
    exp_del = sum(1 for i in ids if i % 5 == 0)
    exp_upd = sum(1 for i in ids if i % 5 != 0 and i % 3 == 0)
    exp_ins = sum(1 for i in ids if i % 11 == 0)
    exp_keep = len(ids) - exp_del - exp_upd

    got = {
        r["action"]: r["count"]
        for r in SPECS["cdc_merge_multi_clause"]
        .fn(spark, sf_dir)
        .groupBy("action")
        .count()
        .collect()
    }
    assert got.get("insert", 0) == exp_ins
    assert got.get("update", 0) == exp_upd
    assert got.get("keep", 0) == exp_keep
    assert "delete" not in got  # deletes are routed OUT


def test_merge_insert_keys_are_offset(spark, sf_dir):
    rows = (
        SPECS["cdc_merge_multi_clause"]
        .fn(spark, sf_dir)
        .where(F.col("action") == "insert")
        .select("event_id")
        .collect()
    )
    assert rows
    for r in rows:
        assert r.event_id >= cdc.MERGE_INSERT_OFFSET


def test_merge_single_key_shuffle(spark, sf_dir):
    """One full-outer join, no window, no extra exchange family."""
    plan = (
        SPECS["cdc_merge_multi_clause"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" in plan, plan
    assert "Window" not in plan, plan


# ---- Poisson bootstrap CI ---------------------------------------------------


def _weight(orderkey: int, rep: int) -> int:
    u = hashlib.md5(f"{orderkey}:{rep}".encode()).hexdigest()[:8]
    for k, t in enumerate(scale_ops._BOOT_T):
        if u < t:
            return k
    return 9


def test_bootstrap_weights_are_poisson_like(spark, sf_dir):
    """Mean draw weight over all (row, replicate) cells must be ~1
    (Poisson(1)) — a threshold-table typo would shift it."""
    keys = [
        r.o_orderkey
        for r in load(spark, sf_dir, "orders")
        .select("o_orderkey")
        .limit(500)
        .collect()
    ]
    ws = [
        _weight(k, rep)
        for k in keys
        for rep in range(scale_ops.BOOT_REPLICATES)
    ]
    mean = sum(ws) / len(ws)
    assert 0.95 < mean < 1.05, mean


def test_bootstrap_rederived_replicate_mean(spark, sf_dir):
    """Re-derive one (priority, replicate) mean from raw rows with
    independent Python md5 arithmetic and find it among the CI's
    source order statistics."""
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .collect()
    )
    pri = orders[0].o_orderpriority
    rep = 7
    num = den = 0
    for r in orders:
        if r.o_orderpriority != pri:
            continue
        w = _weight(r.o_orderkey, rep)
        num += w * math.floor(r.o_totalprice * 100)
        den += w
    expect = num / (den * 100.0)

    row = [
        r
        for r in SPECS["sample_bootstrap_ci"].fn(spark, sf_dir).collect()
        if r.o_orderpriority == pri
    ][0]
    assert row.n_reps == scale_ops.BOOT_REPLICATES
    assert row.ci_lo <= row.point_mean <= row.ci_hi
    # The re-derived replicate mean must lie inside [min, max] of the
    # replicate distribution the CI was cut from; with 32 reps the
    # 2nd/31st order statistics bracket it unless it IS an extreme.
    assert row.ci_lo <= expect <= row.ci_hi or (
        expect < row.ci_lo or expect > row.ci_hi
    )
    # Strong check: recompute the full replicate set and compare the
    # order statistics exactly.
    means = []
    for rr in range(scale_ops.BOOT_REPLICATES):
        num = den = 0
        for r in orders:
            if r.o_orderpriority != pri:
                continue
            w = _weight(r.o_orderkey, rr)
            num += w * math.floor(r.o_totalprice * 100)
            den += w
        if den > 0:
            means.append(num / (den * 100.0))
    means.sort()
    assert abs(means[1] - row.ci_lo) < 1e-9
    assert abs(means[len(means) - 2] - row.ci_hi) < 1e-9
