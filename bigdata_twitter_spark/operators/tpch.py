"""TPC-H analog waves 2 (round 11: twelve keys) and 3 (round 12:
Q16/Q20, completing the full 22-query suite), adapted to the fixture
star schema (SURVEY.md §2 "aggregation" family; the fixture has no
partsupp / shipmode / commit-receipt dates, so each analog states its
adaptation inline).

Why these matter for a 100-TB engine: each query is the canonical
stress test for ONE Catalyst capability — disjunctive predicate
pushdown (Q19), correlated-subquery decorrelation (Q17/Q21/Q22),
global-scalar broadcast joins (Q11/Q15/Q22), conditional-aggregate
ratios (Q8/Q12/Q14), argmin-join (Q2/Q15), and left-join count
distributions (Q13).  All money math follows the house DECIMAL-exact
conventions (numerics.py) so every key is hash-grade against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..numerics import davg_sql, dec, dsum_sql, wide_dbl, wide_dbl_sql
from ..registry import query
from ..tables import load, persist_fresh

_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _rev() -> F.Column:
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# ---- Q12: late lineitems split by order priority class ---------------
Q12_Y0, Q12_Y1 = 1997, 1999


@query(
    "agg_q12_priority_class",
    sql=f"""
    SELECT l_returnflag AS return_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '{Q12_Y0}-01-01'
      AND l.l_shipdate <  TIMESTAMP '{Q12_Y1}-01-01'
    GROUP BY 1 ORDER BY 1
    """,
    tables=("orders", "lineitem"),
    scale_note=(
        "TPC-H Q12 analog (no l_shipmode in the fixture, so the "
        "receipt-mode split becomes a return-flag split and 'late' is "
        "shipped >30 days after order date).  The ship-year filter "
        "pushes to the lineitem scan; the ONE fact-fact shuffle on "
        "orderkey is the exact minimum (the lateness comparison needs "
        "o_orderdate, so neither side can prune it locally); the "
        "conditional counts are map-side partial aggregates and the "
        "output is return-flag-sized (3 rows at any SF)."
    ),
)
def agg_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: for late-shipped 1997-1998 lineitems, how many came
    from high- vs low-priority orders, per return flag."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(f"{Q12_Y0}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{Q12_Y1}-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        j.groupBy(F.col("l_returnflag").alias("return_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("return_class")
    )


# ---- Q13: customer distribution by order count ------------------------


@query(
    "agg_q13_custdist",
    sql="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
                   WHERE o_orderpriority <> '4-NOT SPECIFIED') o
               ON c.c_custkey = o.o_custkey
        GROUP BY 1
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY 1
    """,
    tables=("customer", "orders"),
    scale_note=(
        "TPC-H Q13 analog (the comment NOT-LIKE filter becomes a "
        "priority exclusion — same plan shape: the filter lands on the "
        "orders scan INSIDE the left join's right side, so excluded "
        "orders never shuffle).  Two aggregations: per-customer order "
        "counts shuffle once on custkey (the left join reuses that "
        "partitioning for the groupBy — one exchange serves both), "
        "then the distribution rollup reduces to at most "
        "max-order-count rows.  COUNT(o_orderkey) counts matches only, "
        "so no-order customers land in the c_count=0 bucket, exactly "
        "the left-join semantics the oracle mirrors."
    ),
)
def agg_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by number of non-default-
    priority orders (0-order customers included)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy(F.col("c_count").cast("bigint").alias("c_count")).agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# ---- Q14: promotion revenue share --------------------------------------
Q14_MONTH0, Q14_MONTH1 = "1997-09-01", "1997-10-01"


@query(
    "agg_q14_promo_share",
    sql=f"""
    SELECT (100.0 * COALESCE(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                           THEN {_REV} END) AS DOUBLE), 0.0))
           / CAST(SUM({_REV}) AS DOUBLE) AS promo_pct,
           COALESCE(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {_REV} END) AS DOUBLE), 0.0)
               AS promo_revenue,
           CAST(SUM({_REV}) AS DOUBLE) AS total_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_MONTH0}'
      AND l.l_shipdate <  TIMESTAMP '{Q14_MONTH1}'
    """,
    tables=("lineitem", "part"),
    scale_note=(
        "TPC-H Q14 analog: one ship-month of lineitem (filter pushed "
        "to the scan — month-partition pruning at 100 TB) broadcast-"
        "joined to the part dim, then a single two-phase conditional "
        "aggregate; zero shuffled fact rows beyond the one-row "
        "partials.  Both revenue legs accumulate as exact DECIMAL and "
        "cast to double once; the percentage is one identical IEEE "
        "multiply+divide in both engines."
    ),
)
def agg_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of September-1997 revenue from PROMO-type
    parts."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_MONTH0).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_MONTH1).cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.coalesce(
        F.sum(F.when(F.col("p_type") == "PROMO", _rev())).cast("double"),
        F.lit(0.0),
    )
    total = F.sum(_rev()).cast("double")
    return j.agg(
        ((F.lit(100.0) * promo) / total).alias("promo_pct"),
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---- Q15: top supplier by quarterly revenue ----------------------------
Q15_Q0, Q15_Q1 = "1998-01-01", "1998-04-01"


@query(
    "agg_q15_top_supplier",
    sql=f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_REV}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_Q0}'
          AND l_shipdate <  TIMESTAMP '{Q15_Q1}'
        GROUP BY 1
    ), m AS (SELECT MAX(total_rev) AS max_rev FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r, m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = m.max_rev
    """,
    tables=("lineitem", "supplier"),
    scale_note=(
        "TPC-H Q15 analog (the revenue view + MAX scalar subquery, "
        "decorrelated to a 1-row broadcast cross join).  The quarter "
        "filter pushes to the scan; per-supplier revenue is ONE "
        "two-phase agg (suppliers-sized); the global max re-aggregates "
        "that small frame and broadcasts one row back, so the "
        "winner-filter never shuffles.  The max comparison runs on the "
        "exact DECIMAL sums — double only at display — so ties are "
        "exact-arithmetic ties (all returned, as in the spec)."
    ),
)
def agg_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in 1998 Q1."""
    l = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_Q0).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_Q1).cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    m = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(m), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# ---- Q17: small-quantity-order revenue ---------------------------------
Q17_BRAND = "Brand#23"


@query(
    "agg_q17_small_qty_revenue",
    sql=f"""
    WITH li AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{Q17_BRAND}'
    ), avgq AS (
        SELECT l_partkey AS ap, {davg_sql('l_quantity')} AS avg_qty
        FROM li GROUP BY 1
    )
    SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM li JOIN avgq ON li.l_partkey = avgq.ap
    WHERE li.l_quantity < 0.2 * avgq.avg_qty
    """,
    tables=("lineitem", "part"),
    scale_note=(
        "TPC-H Q17 analog: the correlated per-part average-quantity "
        "subquery decorrelated to an aggregate + self-join.  The brand "
        "filter broadcasts into the lineitem scan FIRST (one brand = "
        "~1/25 of parts, so everything downstream is brand-sized); the "
        "per-part average is one two-phase agg whose output is "
        "parts-sized and broadcasts back onto the same filtered rows — "
        "the filtered frame is persisted (persist_fresh) so its two "
        "consumers share ONE fact scan; no fact-fact shuffle anywhere. "
        "The average uses the house "
        "exact-sum convention (DECIMAL sum / count) so the 0.2x "
        "threshold compare is the identical IEEE sequence in both "
        "engines."
    ),
)
def agg_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue that would be lost if Brand#23
    orders below 20% of the part's average quantity were not filled."""
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    # Persisted because BOTH the avg-quantity aggregate and the final
    # join consume it — Catalyst re-executes the fact scan + broadcast
    # join once per consumer otherwise (ADVICE r11).  Brand-sized
    # (~1/25 of the fact's rows, 3 narrow columns), so the cached
    # block is small relative to the scan it saves.
    li = persist_fresh(
        "q17_li",
        sf_dir,
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice"),
    )
    avgq = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    j = li.join(F.broadcast(avgq), F.col("l_partkey") == F.col("ap")).where(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return j.agg(
        (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---- Q19: disjunctive brand/size/quantity revenue ----------------------


@query(
    "agg_q19_disjunctive_revenue",
    sql=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tables=("lineitem", "part"),
    scale_note=(
        "TPC-H Q19 analog — the disjunctive-predicate stress test.  "
        "Catalyst extracts the common l_quantity bounds (1..30) and "
        "the part-side disjunction (brand x size) as pushable "
        "conjuncts: the quantity range reaches the lineitem scan and "
        "the brand/size disjunction prunes the broadcast part build "
        "side, so the OR of three branches never forces a full "
        "cross-evaluate.  Revenue DECIMAL-exact; output one row."
    ),
)
def agg_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three disjunctive brand/size/quantity
    branches."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(b1 | b2 | b3).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---- Q2: minimum-cost supplier per part --------------------------------
Q2_REGION = "EUROPE"
Q2_MAX_SIZE = 10
Q2_TYPE = "LARGE"
# Unit cost proxy (the fixture has no partsupp.ps_supplycost): the
# cheapest observed per-unit price this supplier ever charged for the
# part, in exact cents — FLOOR((price * 100) / qty) is one IEEE
# multiply+divide+floor, identical in both engines.
_COST_C = "CAST(FLOOR(l_extendedprice * 100 / l_quantity) AS BIGINT)"


@query(
    "agg_q2_min_cost_supplier",
    sql=f"""
    WITH supply AS (
        SELECT p.p_partkey, p.p_brand, p.p_size, l.l_suppkey,
               MIN({_COST_C}) AS cost_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= {Q2_MAX_SIZE} AND p.p_type = '{Q2_TYPE}'
        GROUP BY 1, 2, 3, 4
    ), eur AS (
        SELECT supply.*, s.s_name, n.n_name AS nation
        FROM supply
        JOIN supplier s ON s.s_suppkey = supply.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = '{Q2_REGION}'
    ), best AS (
        SELECT p_partkey AS bp, MIN(cost_cents) AS min_c
        FROM eur GROUP BY 1
    )
    SELECT e.p_partkey, e.p_brand, e.p_size, e.s_name, e.nation,
           e.cost_cents
    FROM eur e JOIN best b ON e.p_partkey = b.bp AND e.cost_cents = b.min_c
    """,
    tables=("lineitem", "part", "supplier", "nation", "region"),
    scale_note=(
        "TPC-H Q2 analog (no partsupp: the supply relation is DERIVED "
        "— distinct (part, supplier) pairs observed in lineitem, cost "
        "= cheapest per-unit cents ever charged).  The part filter "
        "broadcasts into the fact scan FIRST so the supply rollup is "
        "filtered-parts-sized; supplier/nation/region broadcast; the "
        "correlated MIN subquery decorrelates to a parts-sized "
        "aggregate re-joined by (partkey, cost) — broadcast again, so "
        "after the single supply-rollup shuffle NOTHING else "
        "shuffles.  Cost is exact integer cents; min-cost ties return "
        "every winning supplier, as in the spec."
    ),
)
def agg_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for small LARGE-type parts, the EUROPE supplier(s)
    offering the minimum derived unit cost."""
    p = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") <= Q2_MAX_SIZE) & (F.col("p_type") == Q2_TYPE))
        .select("p_partkey", "p_brand", "p_size")
    )
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = F.floor(
        F.col("l_extendedprice") * 100 / F.col("l_quantity")
    ).cast("bigint")
    supply = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_partkey", "p_brand", "p_size", "l_suppkey")
        .agg(F.min(cost).alias("cost_cents"))
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    eur = (
        supply.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            "s_name",
            F.col("n_name").alias("nation"),
            "cost_cents",
        )
    )
    best = eur.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("cost_cents").alias("min_c")
    )
    return eur.join(
        F.broadcast(best),
        (F.col("p_partkey") == F.col("bp"))
        & (F.col("cost_cents") == F.col("min_c")),
    ).select("p_partkey", "p_brand", "p_size", "s_name", "nation", "cost_cents")


# ---- Q8: national market share -----------------------------------------
Q8_NATION = "NATION_3"
Q8_REGION = "AMERICA"
Q8_TYPE = "ECONOMY"
Q8_Y0, Q8_Y1 = 1995, 1996


@query(
    "agg_q8_market_share",
    sql=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           COALESCE(CAST(SUM(CASE WHEN n1.n_name = '{Q8_NATION}'
                                  THEN {_REV} END) AS DOUBLE), 0.0)
           / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share,
           COALESCE(CAST(SUM(CASE WHEN n1.n_name = '{Q8_NATION}'
                                  THEN {_REV} END) AS DOUBLE), 0.0)
               AS nation_revenue,
           CAST(SUM({_REV}) AS DOUBLE) AS total_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{Q8_TYPE}'
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
                 AND r.r_name = '{Q8_REGION}'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q8_Y0}-01-01'
      AND o.o_orderdate <  TIMESTAMP '{Q8_Y1 + 1}-01-01'
    GROUP BY 1
    """,
    tables=(
        "lineitem", "part", "orders", "customer", "nation", "region",
        "supplier",
    ),
    scale_note=(
        "TPC-H Q8 analog — the 8-way join with nation in BOTH "
        "dimension roles (supplier's nation feeds the numerator, "
        "customer's nation+region restricts the market).  part/"
        "supplier/nation/region all broadcast; the type filter prunes "
        "the fact rows inside the broadcast join; orders carries the "
        "two-year filter to its scan before the one fact-fact "
        "shuffle.  The share is a conditional DECIMAL sum over the "
        "same rows as the total — one aggregate, two legs — and the "
        "output is years-sized (2 rows)."
    ),
)
def agg_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3 suppliers' share of ECONOMY-part revenue to
    AMERICA customers, per order year 1995-1996."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(f"{Q8_Y0}-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(f"{Q8_Y1 + 1}-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rk")
    )
    r = load(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    j = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n2_rk"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
    )
    nat = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == Q8_NATION, _rev())).cast("double"),
        F.lit(0.0),
    )
    tot = F.sum(_rev()).cast("double")
    return j.groupBy(F.year("o_orderdate").cast("int").alias("o_year")).agg(
        (nat / tot).alias("mkt_share"),
        nat.alias("nation_revenue"),
        tot.alias("total_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---- Q9: product-line profit by nation and year ------------------------
Q9_NAME_TOKEN = "gear"
# Profit proxy (no ps_supplycost): revenue minus a cost modeled as a
# tenth of the part's retail price per unit.  All three factors are
# exact DECIMAL, so the sum is exact and wide_dbl makes the final cast
# deterministic on both engines.
_PROFIT = (
    f"{_REV} - CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))"
)


@query(
    "agg_q9_product_profit",
    sql=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           {wide_dbl_sql(f'SUM({_PROFIT})')} AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
                AND p.p_name LIKE '%{Q9_NAME_TOKEN}%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
    tables=("lineitem", "part", "supplier", "nation", "orders"),
    scale_note=(
        "TPC-H Q9 analog (cost proxy: a tenth of retail per unit — "
        "the fixture has no ps_supplycost).  The name-token filter "
        "prunes the broadcast part side to ~1/8 of parts, which in "
        "turn prunes the fact rows inside the broadcast join BEFORE "
        "the one orders fact-fact shuffle; supplier/nation broadcast.  "
        "Profit accumulates as exact DECIMAL (products of 2-digit "
        "decimals — no rounding anywhere) and the wide sum casts "
        "through the house hi/lo split (numerics.wide_dbl) because "
        "its unscaled value can pass 2^53 at bench SF; output is "
        "nations x years."
    ),
)
def agg_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit from '*gear*' parts per supplier nation and
    order year."""
    l = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{Q9_NAME_TOKEN}%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _rev() - dec("p_retailprice") * dec("l_quantity") * F.expr(
        "CAST(0.1 AS DECIMAL(2,1))"
    )
    j = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(
        wide_dbl(F.sum(profit)).alias("profit"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---- Q11: important parts by inventory value ---------------------------
Q11_REGION_KEY = 3  # EUROPE
Q11_FRACTION = "CAST(0.001 AS DECIMAL(4,3))"


@query(
    "agg_q11_important_parts",
    sql=f"""
    WITH v AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS val
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = {Q11_REGION_KEY}
        GROUP BY 1
    ), t AS (SELECT SUM(val) * {Q11_FRACTION} AS thr FROM v)
    SELECT v.l_partkey AS p_partkey, CAST(v.val AS DOUBLE) AS part_value
    FROM v, t WHERE v.val > t.thr
    """,
    tables=("lineitem", "supplier", "nation"),
    scale_note=(
        "TPC-H Q11 analog (inventory value derived from lineitem — "
        "no partsupp).  supplier/nation broadcast and prune the fact "
        "scan to one region's suppliers; per-part value is ONE "
        "two-phase agg; the global threshold re-aggregates the "
        "parts-sized frame to one row and broadcasts it back (scalar "
        "subquery as 1-row cross join).  Both sides of the HAVING-"
        "style compare stay exact DECIMAL — no float enters until "
        "display — so the >-threshold cut is bit-identical in both "
        "engines."
    ),
)
def agg_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose EUROPE-supplied value exceeds 0.1% of the
    total."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == Q11_REGION_KEY
    )
    v = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    t = v.agg(
        (F.sum("val") * F.expr(Q11_FRACTION)).alias("thr")
    )
    return (
        v.join(F.broadcast(t))
        .where(F.col("val") > F.col("thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


# ---- Q21: suppliers who kept orders waiting -----------------------------
Q21_TOPK = 20


@query(
    "agg_q21_waiting_supplier",
    sql=f"""
    WITH li AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
                   AS n_late,
               MAX(CASE WHEN late = 1 THEN l_suppkey END) AS the_late
        FROM li GROUP BY 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order p JOIN supplier s ON s.s_suppkey = p.the_late
    WHERE p.n_supp > 1 AND p.n_late = 1
    GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT {Q21_TOPK}
    """,
    tables=("lineitem", "orders", "supplier"),
    scale_note=(
        "TPC-H Q21 analog ('late' = shipped >60 days after order "
        "date; the fixture has no receipt/commit dates).  The "
        "EXISTS (another supplier) AND NOT EXISTS (another LATE "
        "supplier) pair decorrelates into ONE per-order aggregate — "
        "distinct suppliers, distinct late suppliers, and the late "
        "supplier key via MAX-over-CASE (exact because the n_late=1 "
        "filter guarantees a single candidate) — so the whole query "
        "is one orderkey shuffle plus a suppliers-sized rollup, "
        "instead of the spec's two extra self-joins of lineitem.  "
        "Top-20 cut is tie-broken by name: deterministic."
    ),
)
def agg_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the sole late shipper on
    finished multi-supplier orders, top 20 by count."""
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("late"),
    )
    # Two-stage rollup instead of multi-countDistinct: Spark plans
    # two DISTINCT aggregates over one grouping as an Expand (3x the
    # fact rows into the shuffle), which turned mildly superlinear at
    # the x300 decade (54 s vs 12.7 s at x100 — r12 probe).  The
    # (orderkey, suppkey) pre-aggregate is expand-free, combines
    # map-side to distinct-pair volume, and makes the order-level
    # counts plain COUNT/SUM/MAX — same results exactly (suppliers
    # are unique after stage 1).
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("supp_late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late"),
        F.max(
            F.when(F.col("supp_late"), F.col("l_suppkey"))
        ).alias("the_late"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("the_late"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(Q21_TOPK)
    )


# ---- Q22: dormant high-balance customers --------------------------------
Q22_BUCKETS = 7
# "Dormant" = no orders on or after this date (the fixture's ~10
# orders per customer mean "no orders EVER" is an empty set — the
# spec's intent, lapsed valuable accounts, needs a recency window).
Q22_SINCE = "2000-01-01"


@query(
    "agg_q22_dormant_customers",
    sql=f"""
    WITH a AS (
        SELECT {davg_sql('c_acctbal')} AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey % {Q22_BUCKETS} AS INT) AS cntry_bucket,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {dsum_sql('c.c_acctbal')} AS totacctbal
    FROM customer c, a
    WHERE c.c_acctbal > a.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{Q22_SINCE}')
    GROUP BY 1
    """,
    tables=("customer", "orders"),
    scale_note=(
        "TPC-H Q22 analog (country code proxy: nationkey mod 7; "
        "'dormant' = no orders since 2000 — the fixture's order "
        "density makes no-orders-ever empty).  The global positive-"
        "balance average is a 1-row broadcast (scalar subquery "
        "decorrelated); the NOT EXISTS decorrelates to a LEFT ANTI "
        "join whose orders side carries the recency filter to its "
        "scan and projects ONLY o_custkey, so the shuffled volume is "
        "one bigint per recent order.  The average uses the "
        "exact-sum convention so the balance cut is the identical "
        "IEEE compare in both engines; output is bucket-sized "
        "(7 rows)."
    ),
)
def agg_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: per nationkey bucket, count and total balance of
    above-average-balance customers with no orders since 2000."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    a = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(Q22_SINCE).cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(a)).where(F.col("c_acctbal") > F.col("avg_bal"))
    dormant = rich.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy(
        (F.col("c_nationkey") % Q22_BUCKETS).cast("int").alias("cntry_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


# ---- Q16: supplier count by part attributes (round 12) -----------------
Q16_EXCL_BRAND = "Brand#17"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 9, 19, 29, 39, 49)


@query(
    "agg_q16_supplier_cnt",
    sql=f"""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> '{Q16_EXCL_BRAND}'
      AND p.p_type <> '{Q16_EXCL_TYPE}'
      AND p.p_size IN {Q16_SIZES}
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier
          WHERE s_acctbal < 0.0 AND s_suppkey IS NOT NULL)
    GROUP BY 1, 2, 3
    """,
    tables=("lineitem", "part", "supplier"),
    scale_note=(
        "TPC-H Q16 analog (the supply relation is DERIVED from "
        "lineitem — the fixture has no partsupp; 'complaint' "
        "suppliers proxied by negative account balance — no "
        "s_comment).  The brand/type/size exclusions prune the "
        "BROADCAST part build side before the fact scan joins it, so "
        "everything downstream is ~12%-of-parts-sized; the complaint "
        "exclusion is a KB-sized broadcast ANTI join (never a "
        "shuffle); the COUNT(DISTINCT supplier) is Spark's standard "
        "two-level agg — partial distinct on (brand, type, size, "
        "suppkey) map-side, exact count final — one exchange total.  "
        "Output is bounded by |brands|x|types|x|sizes| (aggregate-"
        "sized at any corpus size)."
    ),
)
def agg_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct non-complaint supplier count per
    (brand, type, size) over the filtered part attribute space."""
    p = (
        load(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & (F.col("p_type") != Q16_EXCL_TYPE)
            & F.col("p_size").isin(*Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
    )
    return li.groupBy(
        "p_brand", "p_type", F.col("p_size").cast("int").alias("p_size")
    ).agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))


# ---- Q20: suppliers with excess stock of a part family (round 12) ------
Q20_NAME_PREFIX = "red "
Q20_Y0, Q20_Y1 = "1997-01-01", "1998-01-01"
Q20_REGION_KEY = 1


@query(
    "agg_q20_excess_suppliers",
    sql=f"""
    WITH supply AS (
        SELECT l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS all_qty,
               SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '{Q20_Y0}'
                         AND l.l_shipdate <  TIMESTAMP '{Q20_Y1}'
                        THEN CAST(l.l_quantity AS DECIMAL(12,2))
                        ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS yr_qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '{Q20_NAME_PREFIX}%'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT DISTINCT s.s_name
    FROM supply v
    JOIN supplier s ON s.s_suppkey = v.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = {Q20_REGION_KEY}
      AND v.yr_qty > 0 AND v.all_qty > v.yr_qty * 2
    """,
    tables=("lineitem", "part", "supplier", "nation"),
    scale_note=(
        "TPC-H Q20 analog ('availqty' DERIVED from lineitem — no "
        "partsupp: a supplier has excess stock of a part when its "
        "all-time shipped quantity exceeds twice the target year's, "
        "i.e. the year used under half the demonstrated supply).  "
        "The name-prefix filter prunes the broadcast part side "
        "BEFORE the fact scan joins it (the family is ~1/8 of "
        "parts); both quantity legs come out of ONE two-phase "
        "(suppkey, partkey) aggregate — a single exchange, no "
        "self-join; the threshold compare stays exact DECIMAL end "
        "to end; supplier/nation broadcast onto the suppliers-sized "
        "survivor frame and the final DISTINCT name set is "
        "suppliers-bounded."
    ),
)
def agg_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers in one region holding excess stock of
    'red'-family parts relative to the 1997 ship year."""
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"{Q20_NAME_PREFIX}%"))
        .select("p_partkey")
    )
    in_year = (
        F.col("l_shipdate") >= F.lit(Q20_Y0).cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit(Q20_Y1).cast("timestamp"))
    supply = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(dec("l_quantity")).alias("all_qty"),
            F.sum(
                F.when(in_year, dec("l_quantity")).otherwise(
                    F.lit("0.00").cast("decimal(12,2)")
                )
            ).alias("yr_qty"),
        )
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").where(
                    F.col("n_regionkey") == Q20_REGION_KEY
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        supply.where(
            (F.col("yr_qty") > 0)
            & (F.col("all_qty") > F.col("yr_qty") * 2)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name")
        .distinct()
    )
