"""Join operators (SURVEY.md §2.C): equi/broadcast/outer/semi/anti/
cross/theta/interval/as-of/star.

Reference parity: the tweet-analytics genre enriches the activity log
with user/dimension attributes and correlates events in time
(SURVEY.md §2.C provenance; reference checkout empty — §0.1).

Scale posture per join is documented on each operator; the common
rules: broadcast every dimension that fits (region/nation/part/
supplier), let AQE pick sort-merge vs shuffled-hash for fact-fact
joins and split skewed partitions, and express non-equi joins with an
equi prefix (user_id) so they plan as hash/merge joins with a residual
filter rather than cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..numerics import dec
from ..registry import query
from ..tables import load, spread


@query(
    "join_inner_equi",
    sql="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tables=("orders", "customer"),
    scale_note=(
        "Fact-dim equi join; at sf scale customer broadcasts automatically, at "
        "100 TB AQE picks shuffled-hash/sort-merge on the key."
    ),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→customer enrichment (tweet→user-profile join analog)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_broadcast",
    sql="""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size > 25
    GROUP BY p_brand
    """,
    tables=("lineitem", "part"),
    scale_note=(
        "Explicit broadcast() of the part dim: map-side hash join, zero shuffle "
        "of the fact table; the groupBy then shuffles only 25 brand groups."
    ),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-fact × small-dim join with an explicit broadcast hint."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(dec("l_extendedprice")).cast("double").alias("total_price"),
        )
    )


@query(
    "join_outer_left",
    sql="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) big
      ON c_custkey = big.o_custkey
    """,
    tables=("customer", "orders"),
    scale_note="Left join preserves the dimension side; null padding for unmatched.",
)
def join_outer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their big orders, null-padded when none exist."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_outer_full",
    sql="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
    tables=("customer", "supplier"),
    scale_note=(
        "Full join of two pre-aggregated sides — aggregate first, join small "
        "results; COALESCE keeps the output schema non-nullable for hashing."
    ),
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation customer vs supplier presence, both-sides-preserved."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tables=("customer", "orders"),
    scale_note="Left-semi join: probe side streams, no row duplication, early out.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one large order (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    sql="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    tables=("part", "lineitem"),
    scale_note="Left-anti join (NOT EXISTS) — same hash plan as semi, negated.",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts that were never ordered (NOT EXISTS)."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "join_cross",
    sql="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tables=("region", "nation"),
    scale_note="Cartesian of two tiny dims (5×25); never cross-join facts at scale.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dimensions."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    sql="""
    SELECT a.event_id AS a_id, b.event_id AS b_id,
           a.user_id, a.value AS a_value, b.value AS b_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.value BETWEEN a.value - 5.0 AND a.value + 5.0
    """,
    tables=("events",),
    scale_note=(
        "Equi prefix on user_id makes this a hash/merge join with a residual "
        "band predicate — NOT a cartesian; pair blowup is bounded per user."
    ),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs with near-equal values (non-equi band join)."""
    e = load(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & F.col("b.value").between(F.col("a.value") - 5.0, F.col("a.value") + 5.0),
    ).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("a.value").alias("a_value"),
        F.col("b.value").alias("b_value"),
    )


@query(
    "join_interval_time",
    sql="""
    SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
           c.ts AS click_ts, e.ts AS error_ts
    FROM events c JOIN events e
      ON c.user_id = e.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL 1 HOUR
    """,
    tables=("events",),
    scale_note=(
        "Log-enrichment interval join: equi on user + bounded time band. At "
        "100 TB, bucketing both sides by (user_id, coarse time bucket) keeps "
        "the band check partition-local."
    ),
)
def join_interval_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within one hour after a click by the same user."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").alias("c")
    errors = e.filter(F.col("event_type") == "error").alias("e")
    return clicks.join(
        errors,
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") > F.col("c.ts"))
        & (F.col("e.ts") <= F.col("c.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("e.event_id").alias("error_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("e.ts").alias("error_ts"),
    )


@query(
    "join_asof",
    sql="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           (SELECT max(c.ts) FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
               AND c.ts <= e.ts) AS last_click_ts
    FROM events e
    """,
    tables=("events",),
    scale_note=(
        "As-of join via a range-frame window: one shuffle on user_id, one "
        "partition-local sort — no native asof needed and no self-join blowup. "
        "(DuckDB expresses the same thing as ASOF JOIN; the correlated-max "
        "oracle form is tie-deterministic.)"
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the most recent click time at-or-before it.

    Spark has no native ASOF JOIN; the idiomatic equivalent is a
    conditional running max over a RANGE frame ordered by event time
    (the RANGE frame includes ts-peers, matching the `c.ts <= e.ts`
    oracle semantics exactly).
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(click_ts).over(w).alias("last_click_ts"),
    )


@query(
    "join_star_3way",
    sql="""
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    """,
    tables=("customer", "orders", "lineitem"),
    scale_note=(
        "TPC-H Q3 shape: filters push below the joins (Catalyst), the "
        "customer side broadcasts, and orders⋈lineitem shuffles on orderkey "
        "once — the groupBy reuses that partitioning."
    ),
)
def join_star_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of building-segment orders still shipping after a date."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    # Single-split fixture scan → broadcast probes + decimal partial
    # agg on one core; filter at the scan, project, then spread (guide
    # §2.5, see agg_q1_pricing).  Exact DECIMAL sum: partitioning-
    # independent.
    l = spread(
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount"),
        sf_dir, "lineitem", "l_orderkey",
    )
    disc_price = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


RANGE_BIN_SECONDS = 3600  # bin width == range width ⇒ 2 bins per probe


@query(
    "join_range_binned",
    sql="""
    SELECT er.event_id AS error_id, er.ts AS error_ts,
           ev.event_id, ev.ts, ev.event_type, ev.user_id
    FROM events er JOIN events ev
      ON er.event_type = 'error'
     AND ev.ts > er.ts AND ev.ts <= er.ts + INTERVAL 1 HOUR
    """,
    tables=("events",),
    scale_note=(
        "Range join WITHOUT an equi key (any-user events within 1 h "
        "after each error): naively a BroadcastNestedLoopJoin — O(n·m) "
        "comparisons, the classic range-join scale-killer. Binning "
        "rewrites it as an EQUI join: each error explodes to its 2 "
        "covering hour-bins, each event maps to 1 bin, the join keys "
        "on the bin, and the residual range predicate filters within "
        "bins. Work becomes O(pairs sharing a bin) with a plain "
        "shuffle-hash join — the plan test pins that no nested-loop "
        "join survives (tests/test_layout.py)."
    ),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All events within the hour after each error event, computed as a
    bin-equi join + residual filter instead of a nested-loop range join."""
    e = load(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    # An (error_ts, error_ts + 1h] window spans exactly 2 hour bins.
    probe = errors.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.unix_micros("error_ts") / (RANGE_BIN_SECONDS * 1_000_000)),
                F.floor(F.unix_micros("error_ts") / (RANGE_BIN_SECONDS * 1_000_000))
                + 1,
            )
        ),
    )
    build = e.withColumn(
        "bin", F.floor(F.unix_micros("ts") / (RANGE_BIN_SECONDS * 1_000_000))
    )
    return (
        probe.join(build, "bin")
        .filter(
            (F.col("ts") > F.col("error_ts"))
            & (
                F.col("ts")
                <= F.col("error_ts") + F.expr("INTERVAL 1 HOUR")
            )
        )
        .select("error_id", "error_ts", "event_id", "ts", "event_type", "user_id")
    )


ASOF_TOLERANCE_SQL = "INTERVAL 1 HOUR"


@query(
    "join_asof_tolerance",
    sql=f"""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           (SELECT max(c.ts) FROM events c
             WHERE c.user_id = e.user_id AND c.event_type = 'click'
               AND c.ts <= e.ts
               AND c.ts >= e.ts - {ASOF_TOLERANCE_SQL}) AS last_click_ts
    FROM events e
    """,
    tables=("events",),
    scale_note=(
        "Tolerance-bounded as-of join (pandas merge_asof semantics): "
        "identical plan to join_asof — one user_id shuffle, one "
        "partition-local sort, a RANGE-frame running max — plus a "
        "row-local staleness comparison that NULLs matches older than "
        "the tolerance. No extra shuffle, no self-join; at 100 TB the "
        "tolerance also bounds state when the same shape runs as a "
        "watermarked stream-stream join."
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent click at-or-before each event, NULL if older than
    the 1-hour tolerance."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    last_click = F.max(click_ts).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(
            last_click >= F.col("ts") - F.expr(ASOF_TOLERANCE_SQL),
            last_click,
        ).alias("last_click_ts"),
    )


@query(
    "join_asof_nearest",
    sql="""
    SELECT event_id, user_id, ts, event_type,
           CASE
             WHEN prev_ts IS NULL THEN next_ts
             WHEN next_ts IS NULL THEN prev_ts
             WHEN epoch_us(ts) - epoch_us(prev_ts)
                  <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
             ELSE next_ts
           END AS nearest_click_ts
    FROM (
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               (SELECT max(c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts <= e.ts) AS prev_ts,
               (SELECT min(c.ts) FROM events c
                 WHERE c.user_id = e.user_id AND c.event_type = 'click'
                   AND c.ts >= e.ts) AS next_ts
        FROM events e
    )
    """,
    tables=("events",),
    scale_note=(
        "NEAREST-in-time as-of join (either direction, ties to the "
        "earlier side): the backward candidate is the same "
        "range-frame running max as join_asof, the forward candidate "
        "its mirror (running min over current..unbounded following), "
        "and the pick is a pure projection on microsecond distances "
        "— still ONE shuffle on user_id and one partition-local "
        "sort, never a self-join.  This completes the as-of family "
        "(backward = join_asof, bounded = join_asof_tolerance, "
        "nearest = here).  The oracle's correlated min/max pair is "
        "tie-deterministic by the same <=."
    ),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the NEAREST click time for its user —
    before or after — with equal distances resolved to the earlier."""
    e = load(spark, sf_dir, "events")
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    prev_ts = F.max(click_ts).over(back)
    next_ts = F.min(click_ts).over(fwd)
    d_prev = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    d_next = F.unix_micros(next_ts) - F.unix_micros(F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(prev_ts.isNull(), next_ts)
        .when(next_ts.isNull(), prev_ts)
        .when(d_prev <= d_next, prev_ts)
        .otherwise(next_ts)
        .alias("nearest_click_ts"),
    )


# ---- blocked fuzzy string matching (round 7) -------------------------
# Entity resolution's workhorse: near-duplicate NAME pairs by edit
# distance, with the two design rules that make it survive scale —
# (1) match on the distinct-value DICTIONARY, never the row stream (a
# hot name with 200 rows would otherwise contribute 200² candidate
# pairs for one string comparison), and (2) BLOCK candidates (shared
# last token here) so the pair space is Σ block² over dictionary
# blocks, not dictionary².  Levenshtein is the classic integer edit
# distance — identical definition in Spark and DuckDB, so the key is
# hash-grade.
FUZZY_MAX_LEV = 4


@query(
    "join_fuzzy_levenshtein",
    sql=f"""
    WITH names AS (
        SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    ),
    keyed AS (
        SELECT p_name, n_parts,
               list_extract(string_split(p_name, ' '), -1) AS blk
        FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_LEV}
    """,
    tables=("part",),
    scale_note=(
        "Dictionary-level blocked fuzzy join: the distinct-name "
        "aggregation collapses row multiplicity BEFORE any string "
        "comparison (one two-phase agg), the block key (last token) "
        "bounds candidates to Σ block² over the dictionary — "
        "dictionary-sized, not row-sized — and row counts ride along "
        "so downstream merge decisions know each cluster's weight.  "
        "Levenshtein evaluates only on block-local candidates, "
        "JVM-side codegen.  At 100 TB the dictionary is still "
        "vocabulary-sized; the same plan holds with a q-gram or LSH "
        "block key for longer strings (the text side's "
        "dedup_fuzzy_jaccard machinery)."
    ),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs (edit distance ≤ 4) via a
    last-token-blocked dictionary self-join."""
    p = load(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    keyed = names.withColumn(
        "blk", F.element_at(F.split("p_name", " "), -1)
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(lev <= FUZZY_MAX_LEV)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("int").alias("lev"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


# ---- TPC-H Q5 analog: local-supplier revenue (round 7) ---------------
# The canonical 6-table join (customer ⋈ orders ⋈ lineitem ⋈ supplier
# ⋈ nation ⋈ region) with the Q5 twist: the lineitem's supplier must
# share the customer's nation — the join-ORDER stress test the 3-way
# star key doesn't exercise.  Revenue accumulates as exact decimal
# l_extendedprice·(1−l_discount).
Q5_REGION = "ASIA"
Q5_YEAR = 1997


@query(
    "agg_q5_local_supplier",
    sql=f"""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{Q5_YEAR}-01-01'
      AND o.o_orderdate < TIMESTAMP '{Q5_YEAR + 1}-01-01'
    GROUP BY 1
    """,
    tables=("customer", "orders", "lineitem", "supplier", "nation", "region"),
    scale_note=(
        "The 6-way join-order stress test: region/nation/supplier "
        "are broadcast dims (Catalyst picks BHJ for all three), the "
        "orders date filter pushes to the scan BEFORE the "
        "fact-fact orders⋈lineitem shuffle (partition pruning at "
        "100 TB when orders is date-partitioned), and the local-"
        "supplier predicate (s_nationkey = c_nationkey) rides the "
        "supplier join rather than spawning a separate exchange.  "
        "Revenue is exact decimal, cast once per output row.  "
        "Output is nations-sized."
    ),
)
def agg_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 1997 revenue from ASIA customers served by
    same-nation suppliers, per nation."""
    from ..numerics import dec

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    j = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (s["s_suppkey"] == l["l_suppkey"])
            & (s["s_nationkey"] == c["c_nationkey"]),
        )
        .join(F.broadcast(n), n["n_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(r), r["r_regionkey"] == n["n_regionkey"])
        .filter(
            (F.col("r_name") == Q5_REGION)
            & (F.col("o_orderdate") >= F.lit(f"{Q5_YEAR}-01-01").cast("timestamp"))
            & (
                F.col("o_orderdate")
                < F.lit(f"{Q5_YEAR + 1}-01-01").cast("timestamp")
            )
        )
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


# ---- TPC-H Q18 analog: large-volume orders (round 7) -----------------
# The groupBy-HAVING semi-join shape: find orders whose total quantity
# exceeds a threshold, then join back for customer detail — the
# "build an ad-hoc dimension from an aggregate" pattern.
Q18_MIN_QTY = 150


@query(
    "agg_q18_large_orders",
    sql=f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {Q18_MIN_QTY}
    )
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tables=("lineitem", "orders", "customer"),
    scale_note=(
        "HAVING as a semi-join builder: the quantity rollup is one "
        "two-phase agg whose HAVING prunes to the heavy tail BEFORE "
        "any join (the aggregate side is selectivity-sized, so "
        "Catalyst broadcasts it against orders at real scale); "
        "customer attaches by key.  Exact decimal quantity sums; "
        "output is heavy-order-sized."
    ),
)
def agg_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog: orders with total quantity > 150, with
    customer name and order detail."""
    from ..numerics import dec

    # Spread on l_orderkey: the per-order quantity rollup reuses the
    # exchange (guide §2.4/2.5, see agg_q1_pricing); exact DECIMAL.
    l = spread(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity"),
        sf_dir, "lineitem", "l_orderkey",
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > Q18_MIN_QTY)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# ---- TPC-H Q7/Q10 analogs (round-7 continuation) ----------------------
# Two more canonical join-shape stress tests: Q7 (volume shipping
# between a nation PAIR — the dual-dimension-role join where nation
# joins BOTH sides of the fact) and Q10 (returned-item revenue top
# customers — agg-then-rank with a deterministic tie-break).

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"
Q7_Y0, Q7_Y1 = 1995, 1996


@query(
    "agg_q7_nation_volume",
    sql=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
        OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}'))
      AND l.l_shipdate >= TIMESTAMP '{Q7_Y0}-01-01'
      AND l.l_shipdate < TIMESTAMP '{Q7_Y1 + 1}-01-01'
    GROUP BY 1, 2, 3
    """,
    tables=("supplier", "lineitem", "orders", "customer", "nation"),
    scale_note=(
        "TPC-H Q7 shape: the nation dim joins BOTH fact sides "
        "(supplier's nation and customer's nation) under two "
        "aliases — both broadcast; the ship-date filter pushes to "
        "the lineitem scan BEFORE the orders fact-fact shuffle; "
        "the nation-pair disjunction prunes after the broadcasts "
        "(dimension-selective, so the shuffled volume is already "
        "date-pruned).  Revenue exact decimal, cast once per "
        "output row; output is pair x year sized."
    ),
)
def agg_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: shipping volume between NATION_1 and NATION_2
    per direction and ship year, 1995-1996."""
    from ..numerics import dec

    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q7_Y0}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{Q7_Y1 + 1}-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), s["s_suppkey"] == F.col("l_suppkey"))
        .join(o, o["o_orderkey"] == F.col("l_orderkey"))
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )


Q10_QTR_START = "1998-10-01"
Q10_QTR_END = "1999-01-01"
Q10_TOPK = 20


@query(
    "agg_q10_returned_topk",
    sql=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '{Q10_QTR_START}'
      AND o.o_orderdate < TIMESTAMP '{Q10_QTR_END}'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c.c_custkey
    LIMIT {Q10_TOPK}
    """,
    tables=("customer", "orders", "lineitem", "nation"),
    scale_note=(
        "TPC-H Q10 shape: date filter pushes to the orders scan and "
        "returnflag to the lineitem scan BEFORE the fact-fact "
        "shuffle; nation broadcasts; the customer-grain agg is "
        "two-phase; the final top-20 is a TakeOrdered (per-partition "
        "top-k then a K-row driver merge — never a global sort of "
        "the customer table), with the (revenue DESC, custkey) "
        "tie-break making the cut deterministic for the hash."
    ),
)
def agg_q10_returned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: top-20 customers by returned-item revenue in
    1998Q4 (deterministic custkey tie-break)."""
    from ..numerics import dec

    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    j = (
        c.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit(Q10_QTR_START).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(Q10_QTR_END).cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            l.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
    )
    agg = j.groupBy(
        "c_custkey", "c_name", F.col("n_name").alias("nation")
    ).agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("bigint").alias("n_lineitems"),
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(
        Q10_TOPK
    )


@query(
    "agg_q4_late_shipments",
    sql="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tables=("orders", "lineitem"),
    scale_note=(
        "TPC-H Q4 analog (EXISTS decorrelated to a LEFT SEMI join — "
        "the fixture has no commit/receipt dates, so 'late' is "
        "shipped >60 days after order date; the residual comparison "
        "rides the semi join as a non-equi condition).  The quarter "
        "filter is pushed to the orders scan BEFORE the join, so the "
        "semi join's build side is one quarter of orders; both sides "
        "shuffle once on l_orderkey/o_orderkey (the exact-EXISTS "
        "minimum at 100 TB — lineitem cannot broadcast), each order "
        "emits at most once regardless of its lineitem fan-out (semi "
        "short-circuit, no distinct needed), and the final agg is "
        "priorities-sized."
    ),
)
def agg_q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders per priority with at least one late-shipped
    line item, over one order-date quarter."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ),
        "leftsemi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )
