"""Round-11 TPC-H analog wave 2 — plan-property and semantics pins.

Correctness is covered by test_parity.py (every key is hash-grade vs
DuckDB); these tests pin the 100-TB-relevant PLAN properties each
analog exists to demonstrate, so a refactor that silently degrades the
physical strategy fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_twitter_spark.operators import tpch
from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.tables import load

SPECS = load_all_operators()


def _plan(spark, sf_dir, key: str) -> str:
    return (
        SPECS[key]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q14_q19_broadcast_part_dim(spark, sf_dir):
    """Part joins against the lineitem fact must be broadcast-hash,
    never a shuffled join of the fact side."""
    for key in ("agg_q14_promo_share", "agg_q19_disjunctive_revenue"):
        plan = _plan(spark, sf_dir, key)
        assert "BroadcastHashJoin" in plan, (key, plan)


def test_q14_ship_month_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_q14_promo_share")
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed, plan


def test_q19_quantity_bounds_pushed_to_fact_scan(spark, sf_dir):
    """Catalyst must extract the common l_quantity range (1..30) from
    the disjunction and push it to the lineitem scan."""
    plan = _plan(spark, sf_dir, "agg_q19_disjunctive_revenue")
    assert "PushedFilters" in plan
    # The extracted conjunct appears as pushed l_quantity bounds.
    pushed = [
        seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("l_quantity" in s for s in pushed), pushed


def test_q13_left_join_then_two_aggs(spark, sf_dir):
    """Q13's excluded orders must be filtered on the scan side of the
    left join (inside its right child), not post-join."""
    plan = _plan(spark, sf_dir, "agg_q13_custdist")
    pushed = [
        seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("o_orderpriority" in s for s in pushed), pushed


def test_q15_scalar_max_broadcasts(spark, sf_dir):
    """The MAX(total_rev) scalar must come back as a broadcast, so the
    winner filter never reshuffles the revenue frame."""
    plan = _plan(spark, sf_dir, "agg_q15_top_supplier")
    assert "BroadcastExchange" in plan, plan


def test_q15_ties_all_returned(spark, sf_dir):
    """Exact-DECIMAL max equality: every supplier at the max must
    surface (multiset semantics, like the spec)."""
    df = SPECS["agg_q15_top_supplier"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r.total_revenue for r in rows}) == 1


def test_q21_single_orderkey_shuffle_decorrelation(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair must decorrelate to ONE per-order
    aggregate — no extra lineitem self-joins in the plan."""
    plan = _plan(spark, sf_dir, "agg_q21_waiting_supplier")
    # lineitem is scanned exactly once.
    assert plan.count("lineitem.parquet") == 1, plan
    # The top-k cut is a bounded TakeOrdered, not global sort+limit.
    assert "TakeOrderedAndProject" in plan, plan


def test_q21_sole_late_supplier_semantics(spark, sf_dir):
    """Orders counted must have >1 distinct supplier and exactly one
    late one — re-derive a few from first principles."""
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").where(
                F.col("o_orderstatus") == "F"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("late"),
        )
    )
    per = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "nl"
        ),
    )
    expect = (
        per.where((F.col("ns") > 1) & (F.col("nl") == 1)).count()
    )
    got = sum(
        r.numwait
        for r in SPECS["agg_q21_waiting_supplier"]
        .fn(spark, sf_dir)
        .collect()
    )
    # Top-20 cut can drop tail suppliers; at test SF the supplier
    # count is small enough that the cut keeps everything IF the
    # number of distinct suppliers with waits is <= 20; otherwise the
    # kept counts must still be bounded by the principled total.
    assert got <= expect
    n_supp_with_waits = (
        SPECS["agg_q21_waiting_supplier"].fn(spark, sf_dir).count()
    )
    if n_supp_with_waits < tpch.Q21_TOPK:
        assert got == expect


def test_q22_anti_join_and_recency_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_q22_dormant_customers")
    assert "LeftAnti" in plan, plan
    pushed = [
        seg.split("]", 1)[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("o_orderdate" in s for s in pushed), pushed


def test_q2_min_cost_ties_return_all_winners(spark, sf_dir):
    """Every (part, supplier) row returned must carry that part's
    minimum cost — and every part appears at least once."""
    df = SPECS["agg_q2_min_cost_supplier"].fn(spark, sf_dir)
    rows = df.collect()
    if not rows:  # sf0.001 may filter to zero LARGE small parts
        return
    by_part: dict[int, set[int]] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.cost_cents)
    for part, costs in by_part.items():
        assert len(costs) == 1, (part, costs)


def test_q11_threshold_is_exact_decimal(spark, sf_dir):
    """The 0.1% threshold compare happens on DECIMAL, not double —
    the plan must not cast val to double before the filter."""
    df = SPECS["agg_q11_important_parts"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal" in plan.lower(), plan


def test_q8_share_bounded(spark, sf_dir):
    for r in SPECS["agg_q8_market_share"].fn(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0
        assert abs(r.nation_revenue / r.total_revenue - r.mkt_share) < 1e-12


def test_q12_partition_counts_are_complements(spark, sf_dir):
    rows = SPECS["agg_q12_priority_class"].fn(spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    total = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
            )
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == total
