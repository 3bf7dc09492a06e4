"""Iterative graph analytics (SURVEY.md §2.N extras): PageRank over
the customer–part co-purchase graph — the representative of the
iterative-DataFrame-algorithm family.  The iteration count is FIXED,
so the loop is SQL-expressible after all: the DuckDB oracle unrolls
the same five steps (hash-grade since round 4), and
tests/test_weak_ops.py keeps the exact numpy power-iteration
cross-check.

Graph construction is deterministic from the fixtures: an undirected
bipartite edge (customer, part) exists where the customer ever ordered
the part.  Part vertices are offset by PART_OFFSET to disambiguate the
two id spaces.

Scale posture: each iteration is one edge-keyed join + one vertex-keyed
aggregation — the standard Pregel-as-DataFrame shape.  Ranks and the
(static) adjacency stay partitioned on vertex id across iterations, so
every iteration reuses the same hash partitioning; the edge list is
persisted once.  No collect, no driver-side graph.  ITERATIONS is
fixed (5) — at 100 TB convergence-checked loops add one tiny agg per
round (max |Δrank|), same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import query
from ..tables import load, persist_fresh

PART_OFFSET = 1_000_000_000
DAMPING = 0.85
ITERATIONS = 5
RANK_DP = 9  # output rounding: absorbs float-summation-order noise

# graph_triangle_count's persisted temps from the most recent call;
# released by the NEXT call (see the comment in the operator).
_TRIANGLE_LIVE_CACHES: list[DataFrame] = []
# (Spark partial-agg order vs DuckDB's) so the fixed-iteration result
# is hash-comparable; 1e-9 abs ≪ any rank gap at fixture scale.


def _pagerank_oracle_sql() -> str:
    """Unrolled ITERATIONS-step DuckDB power iteration — the same
    deterministic algebra as the engine loop (VERDICT r3 #5: a fixed
    iteration count IS SQL-expressible, it just needs the loop written
    out), promoting this key from rows-only to a hash-grade check."""
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e AS (SELECT c AS src, p AS dst FROM cp
          UNION ALL SELECT p AS src, c AS dst FROM cp),
    deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
    v AS (SELECT src AS v FROM deg),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
    r0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS rank FROM v)"""
    prev = "r0"
    for it in range(1, ITERATIONS + 1):
        sql += f""",
    r{it} AS (
        SELECT v.v,
               (1.0 - {DAMPING}) / (SELECT n FROM nn)
               + {DAMPING} * COALESCE(t.s, 0.0) AS rank
        FROM v LEFT JOIN (
            SELECT e.dst, SUM(r.rank / d.deg) AS s
            FROM e JOIN {prev} r ON e.src = r.v
                   JOIN deg d ON e.src = d.src
            GROUP BY e.dst
        ) t ON v.v = t.dst
    )"""
        prev = f"r{it}"
    sql += f"""
    SELECT CASE WHEN v >= {PART_OFFSET} THEN v - {PART_OFFSET}
           ELSE v END AS vertex,
           v >= {PART_OFFSET} AS is_part,
           round(rank, {RANK_DP}) AS rank
    FROM {prev}
    """
    return sql


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (customer, part) edges, both directions, distinct."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_partkey") + PART_OFFSET).alias("p"),
        )
        .distinct()
    )
    return cp.select(F.col("c").alias("src"), F.col("p").alias("dst")).unionAll(
        cp.select(F.col("p").alias("src"), F.col("c").alias("dst"))
    )


@query(
    "graph_pagerank",
    sql=_pagerank_oracle_sql(),  # fixed iteration count ⇒ the loop is
    # SQL-expressible unrolled (hash-grade since round 4); ranks are
    # rounded to RANK_DP on BOTH sides so partial-sum order can't
    # perturb the hash.  tests/test_weak_ops.py additionally
    # cross-checks every rank against an exact numpy power iteration.
    tables=("orders", "lineitem"),
    scale_note=(
        "PageRank as iterated DataFrame algebra: per-iteration cost is "
        "one join on src + one groupBy on dst — both hash-partitioned "
        "on vertex id, so the partitioning is reused across all 5 "
        "rounds; the edge list is computed once and persisted. No "
        "dangling mass (undirected construction ⇒ every vertex has "
        "out-degree ≥ 1). The Pregel-on-Spark shape that scales to "
        "billions of edges."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration damped PageRank over the co-purchase graph; returns
    (vertex, is_part, rank)."""
    edges = copurchase_edges(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    vertices = deg.select("src").withColumnRenamed("src", "v")
    n = vertices.count()  # scalar (vertex count), not data
    adj = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    # An edgeless graph (a 1-row order slice builds no co-purchase
    # pairs) has n = 0: the result is correctly EMPTY via the empty
    # `vertices` frame, but the seed literal 1/n must not raise a
    # driver-side ZeroDivisionError first (r10 one-row sweep).
    ranks = vertices.select("v", F.lit(1.0 / max(n, 1)).alias("rank"))
    for _ in range(ITERATIONS):
        contribs = (
            adj.join(ranks, adj["src"] == ranks["v"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = vertices.join(
            contribs, vertices["v"] == contribs["dst"], "left"
        ).select(
            "v",
            (
                F.lit((1.0 - DAMPING) / max(n, 1))
                + F.lit(DAMPING) * F.coalesce("s", F.lit(0.0))
            ).alias("rank"),
        )
    edges.unpersist()
    return ranks.select(
        F.when(F.col("v") >= PART_OFFSET, F.col("v") - PART_OFFSET)
        .otherwise(F.col("v"))
        .alias("vertex"),
        (F.col("v") >= PART_OFFSET).alias("is_part"),
        F.round("rank", RANK_DP).alias("rank"),
    )


@query(
    "graph_triangle_count",
    sql="""
    WITH pp AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1
        JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
    ), tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM pp e1
        JOIN pp e2 ON e2.a = e1.b
        JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b
    ), vx AS (
        SELECT a AS v FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT v AS p_partkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM vx GROUP BY v
    """,
    tables=("lineitem",),
    scale_note=(
        "Exact per-vertex triangle counts on the part co-purchase "
        "graph via DEGREE ORIENTATION (compact-forward): each "
        "undirected edge is oriented low-(degree,id) -> high, wedges "
        "are enumerated only between a vertex's OUT-neighbors (out-"
        "degree is bounded by ~sqrt(2E) under this orientation, so "
        "wedge count is O(E^1.5) instead of sum-of-deg^2), then closed "
        "with one edge-keyed join. The oracle enumerates naively by "
        "a<b<c — same triangle set, hash-identical counts. All joins "
        "are edge-keyed shuffles; the degree table is vertex-sized "
        "(broadcastable); no driver-side adjacency."
    ),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation counts in the co-purchase graph
    (parts are adjacent when they appear in the same order)."""
    # The returned plan references the persisted edge/orientation temps,
    # so they cannot be unpersisted here without forfeiting the reuse
    # they exist for (the caller materializes right after this returns).
    # Instead each invocation releases the PREVIOUS invocation's temps,
    # capping cached state at one call's working set instead of letting
    # bench loops / test suites accumulate edge-sized cache entries.
    # Unpersist only drops cached partitions — lineage recomputes if a
    # stale handle is ever re-executed, so this is a perf bound, not a
    # correctness hazard.
    for cached in _TRIANGLE_LIVE_CACHES:
        cached.unpersist()
    _TRIANGLE_LIVE_CACHES.clear()
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("b"),
    )
    edges = (
        li.join(
            l2,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") < F.col("b")),
        )
        .select(F.col("l_partkey").alias("a"), "b")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = edges.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    # Orient low (deg, id) -> high (deg, id); ties broken by id, and
    # a != b always, so the orientation is total and acyclic.
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "deg_dst"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    o1 = oriented.select(
        F.col("src").alias("ctr"), F.col("dst").alias("n1"),
        F.col("deg_dst").alias("d1"),
    )
    o2 = oriented.select(
        F.col("src").alias("ctr"), F.col("dst").alias("n2"),
        F.col("deg_dst").alias("d2"),
    )
    # Out-neighbor pairs ordered by the same (deg, id) key, so each
    # wedge (n1, n2) matches the oriented closing edge n1 -> n2.
    wedges = o1.join(o2, "ctr").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("n1") < F.col("n2")))
    )
    closing = oriented.select(
        F.col("src").alias("n1"), F.col("dst").alias("n2")
    )
    tri = wedges.join(closing, ["n1", "n2"]).select("ctr", "n1", "n2")
    vx = tri.select(
        F.explode(F.array("ctr", "n1", "n2")).alias("p_partkey")
    )
    out = vx.groupBy("p_partkey").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )
    _TRIANGLE_LIVE_CACHES.extend([edges, oriented])
    return out


@query(
    "graph_degree_distribution",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_OFFSET} AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), e AS (
        SELECT c AS src FROM cp UNION ALL SELECT p AS src FROM cp
    ), deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
    )
    SELECT CAST(floor(log2(deg)) AS INT) AS bucket,
           src >= {PART_OFFSET} AS is_part,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(MIN(deg) AS BIGINT) AS min_deg,
           CAST(MAX(deg) AS BIGINT) AS max_deg
    FROM deg
    GROUP BY 1, 2
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Degree distribution of the copurchase graph in log2 buckets "
        "— the skew diagnostic that decides whether PageRank/triangle "
        "jobs need hub mitigation (vertex-cut, high-degree splitting) "
        "before running.  Two shuffles total: one per-vertex count, "
        "one bucket-sized agg — the histogram output is O(log "
        "max_deg × 2) rows regardless of graph size.  log2 on a "
        "bigint degree is exact for deg < 2^53, so floor(log2(deg)) "
        "is engine-deterministic (both compute the same IEEE "
        "double)."
    ),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree histogram of the copurchase graph, split
    by vertex side (customer vs part)."""
    deg = (
        copurchase_edges(spark, sf_dir)
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    return (
        deg.select(
            F.floor(F.log2("deg")).cast("int").alias("bucket"),
            (F.col("src") >= PART_OFFSET).alias("is_part"),
            "deg",
        )
        .groupBy("bucket", "is_part")
        .agg(
            F.count("*").cast("bigint").alias("n_vertices"),
            F.min("deg").cast("bigint").alias("min_deg"),
            F.max("deg").cast("bigint").alias("max_deg"),
        )
    )


# Power-buyer cap for the co-occurrence self-join: a customer with c
# parts contributes c·(c−1)/2 pairs, so one mega-basket makes the
# join quadratic in that basket. Capped buyers are excluded from pair
# listing (same contract as the LSH hot-bucket caps).
ALSO_BOUGHT_DEGREE_CAP = 500
ALSO_BOUGHT_K = 3


@query(
    "graph_also_bought_topk",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), ok AS (
        SELECT c FROM cp GROUP BY c
        HAVING COUNT(*) <= {ALSO_BOUGHT_DEGREE_CAP}
    ), capped AS (
        SELECT cp.c, cp.p FROM cp JOIN ok ON cp.c = ok.c
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
        GROUP BY a.p, b.p
    ), sym AS (
        SELECT p1 AS part, p2 AS other, n_common FROM pairs
        UNION ALL
        SELECT p2 AS part, p1 AS other, n_common FROM pairs
    ), ranked AS (
        SELECT part, other, n_common,
               row_number() OVER (
                   PARTITION BY part
                   ORDER BY n_common DESC, other
               ) AS rnk
        FROM sym
    )
    SELECT part, CAST(rnk AS INT) AS rnk, other, n_common
    FROM ranked WHERE rnk <= {ALSO_BOUGHT_K}
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Item-item collaborative filtering ('also bought'): parts "
        "sharing a buyer are co-occurrence candidates, scored by "
        "common-buyer count, top-k per part.  The candidate join is "
        "an inverted-index self-join on the CUSTOMER key — cost is "
        "Σ deg(c)² over buyers, so the degree cap excludes "
        "mega-basket buyers from pair LISTING (their pairs are "
        "dominated by noise anyway — the standard CF preprocessing "
        "step) and bounds the worst bucket at cap²/2.  One (customer) "
        "shuffle for candidates, one (pair) shuffle for counts, one "
        "(part) shuffle for top-k; all linear in true co-occurrence "
        "volume at 100 TB.  Fixture never reaches the cap, so the "
        "oracle states the same capped semantics exactly."
    ),
)
def graph_also_bought_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 'also bought' parts per part by common-buyer count over
    the co-purchase bipartite graph (degree-capped CF primitive)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ok = (
        cp.groupBy("c")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") <= ALSO_BOUGHT_DEGREE_CAP)
        .select("c")
    )
    capped = persist_fresh("also_bought_cp", sf_dir, cp.join(ok, "c"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sym = pairs.select(
        F.col("p1").alias("part"), F.col("p2").alias("other"), "n_common"
    ).unionByName(
        pairs.select(
            F.col("p2").alias("part"), F.col("p1").alias("other"), "n_common"
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.col("n_common").desc(), F.col("other")
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= ALSO_BOUGHT_K)
        .select("part", "rnk", "other", "n_common")
    )


KHOP_SOURCE = 1  # customer vertex the BFS starts from
KHOP_K = 3


def _khop_oracle_sql() -> str:
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e AS (SELECT c AS src, p AS dst FROM cp
          UNION ALL SELECT p AS src, c AS dst FROM cp),
    f0 AS (SELECT CAST({KHOP_SOURCE} AS BIGINT) AS v)"""
    for k in range(1, KHOP_K + 1):
        sql += f""",
    f{k} AS (SELECT DISTINCT e.dst AS v
             FROM e JOIN f{k - 1} ON e.src = f{k - 1}.v)"""
    unions = "\n        UNION ALL ".join(
        f"SELECT v, {k} AS h FROM f{k}" for k in range(KHOP_K + 1)
    )
    sql += f"""
    SELECT v AS vertex, CAST(MIN(h) AS INT) AS hops
    FROM ({unions})
    GROUP BY v
    """
    return sql


@query(
    "graph_khop_reach",
    sql=_khop_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "k-hop BFS reachability (the neighborhood/blast-radius query "
        "PageRank's module lacked): frontier expansion as K fixed "
        "iterations of one edge-keyed join + distinct each — the "
        "Pregel-as-DataFrame shape with the edge list persisted once "
        "and every iteration reusing the src hash partitioning; "
        "min-hop resolution is one grouped MIN over the stacked "
        "frontiers.  PURE INTEGER end to end — no float anywhere, so "
        "the unrolled-CTE oracle is exact by construction.  At 100 TB "
        "frontier joins are the bounded cost: each hop touches "
        "edges(frontier), never edges(graph), and the bipartite "
        "degree cap bounds fan-out per hop."
    ),
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices within 3 hops of customer 1 on the co-purchase graph,
    with their minimum hop distance."""
    edges = copurchase_edges(spark, sf_dir).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    frontier = spark.createDataFrame(
        [(KHOP_SOURCE,)], "v bigint"
    )
    layers = [frontier.withColumn("h", F.lit(0))]
    for k in range(1, KHOP_K + 1):
        frontier = (
            edges.join(frontier, edges["src"] == frontier["v"])
            .select(F.col("dst").alias("v"))
            .distinct()
        )
        layers.append(frontier.withColumn("h", F.lit(k)))
    stacked = layers[0]
    for layer in layers[1:]:
        stacked = stacked.unionAll(layer)
    out = stacked.groupBy(F.col("v").alias("vertex")).agg(
        F.min("h").cast("int").alias("hops")
    )
    edges.unpersist()
    return out


# ---- label propagation (round 7) -------------------------------------
# Community detection over the co-purchase graph: synchronous LPA with
# a deterministic update (most-frequent neighbor label, ties to the
# smallest label).  A FIXED iteration count makes the loop
# SQL-expressible — the oracle unrolls the same K steps — and pure
# integer labels make it exact by construction (the graph_khop_reach
# argument).  Distinct from dedup_components' min-label propagation:
# min-label converges to connected components, frequency voting finds
# DENSE communities inside one component.
LPA_ITERATIONS = 4


def _lpa_oracle_sql() -> str:
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e AS (SELECT c AS src, p AS dst FROM cp
          UNION ALL SELECT p AS src, c AS dst FROM cp),
    v AS (SELECT DISTINCT src AS v FROM e),
    l0 AS (SELECT v, v AS lab FROM v)"""
    prev = "l0"
    for it in range(1, LPA_ITERATIONS + 1):
        sql += f""",
    n{it} AS (
        SELECT e.dst AS v, p.lab, COUNT(*) AS cnt
        FROM e JOIN {prev} p ON e.src = p.v
        GROUP BY e.dst, p.lab
    ),
    l{it} AS (
        SELECT v, lab FROM n{it}
        QUALIFY row_number() OVER (PARTITION BY v
                                   ORDER BY cnt DESC, lab ASC) = 1
    )"""
        prev = f"l{it}"
    sql += f"""
    SELECT CASE WHEN v >= {PART_OFFSET} THEN v - {PART_OFFSET}
           ELSE v END AS vertex,
           v >= {PART_OFFSET} AS is_part,
           CAST(lab AS BIGINT) AS community
    FROM {prev}
    """
    return sql


@query(
    "graph_label_propagation",
    sql=_lpa_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "Synchronous label propagation, K fixed iterations: each step "
        "is one edge-keyed join + one (vertex, label) count agg + one "
        "vertex-keyed top-1 window — the Pregel-as-DataFrame shape "
        "PageRank established, with labels staying INTEGER end to end "
        "so the unrolled-CTE oracle is exact, not approximate.  Edges "
        "persist once and every iteration reuses the vertex hash "
        "partitioning; state is one label per vertex (persisted per "
        "round, previous round unpersisted — the components.py "
        "discipline; labels appear ONCE in each round's lineage so "
        "the plan grows linearly, and bounding STORAGE is what "
        "matters: the r14 localCheckpoint variant pinned every "
        "round's checkpoint blocks and OOM'd the ×300 probe the "
        "persist+unpersist loop survives), never a driver-side "
        "graph.  The "
        "deterministic tie-break (max count, then min label) removes "
        "the RNG real LPA uses, so results are reproducible across "
        "engines and executor counts.  An early-fixpoint exit "
        "(labels unchanged -> later rounds are no-ops) guards the "
        "loop; measured honestly: THIS bipartite co-purchase graph "
        "settles into a period-2 oscillation (every vertex flips "
        "every round at every sf), so the exit never fires here and "
        "all K rounds are real work — the ~K-linear ×300 wall is the "
        "true cost, not a no-op tail (round-14 negative result)."
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels after 4 synchronous LPA rounds (most-frequent
    neighbor label, deterministic smallest-label tie-break)."""
    edges = persist_fresh(
        "lpa_edges", sf_dir, copurchase_edges(spark, sf_dir)
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("lab", F.col("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top1 = Window.partitionBy("v").orderBy(
        F.col("cnt").desc(), F.col("lab").asc()
    )
    # Early fixpoint exit (VERDICT r13 #5 — the k-core discipline):
    # synchronous LPA's next state is a deterministic function of the
    # current labels, so labels_k == labels_{k-1} makes every later
    # round a no-op and breaking is result-identical to running all K
    # rounds.  Each round persists the vertex-sized label table and
    # UNPERSISTS the previous round's (the components.py loop
    # discipline) — the changed-count job both materializes the new
    # cache and pays for the exit test in one pass.  persist, not
    # localCheckpoint: labels appear exactly ONCE in each round's
    # lineage (the changed-count join is an action, not lineage), so
    # the plan grows linearly and lineage truncation buys nothing,
    # while localCheckpoint blocks CANNOT be unpersisted through the
    # DataFrame API — the r14 checkpoint variant pinned all K rounds'
    # label tables and OOM'd the 16g ×300 probe that this loop (and
    # r13's) survives.
    # Caveat measured on the fixtures: this CO-PURCHASE graph is
    # bipartite and synchronous LPA on bipartite graphs can settle
    # into a period-2 oscillation instead of a fixpoint — when it
    # does, the break never fires and the loop honestly runs all K
    # rounds (the exit is an optimization, never a semantics change).
    for _ in range(LPA_ITERATIONS):
        votes = (
            edges.join(labels, edges["src"] == labels["v"])
            .groupBy(F.col("dst").alias("v"), "lab")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            votes.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("lab", "prev"), "v"
            )
            .where(F.col("lab") != F.col("prev"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.when(F.col("v") >= PART_OFFSET, F.col("v") - PART_OFFSET)
        .otherwise(F.col("v"))
        .alias("vertex"),
        (F.col("v") >= PART_OFFSET).alias("is_part"),
        F.col("lab").cast("bigint").alias("community"),
    )


# ---- k-core peeling (round 7) ----------------------------------------
# Dense-subgraph extraction: the k-core is the maximal subgraph where
# every vertex keeps degree ≥ k (here k=20) — the standard spam/influencer filter
# before community detection.  Computed by iterative PEELING (drop
# sub-k vertices, recompute degrees, repeat): a FIXED round count
# makes it SQL-expressible (unrolled CTEs) and pure integer makes it
# exact; at fixture scale the peel converges well inside the budget
# and the referee proves the fixpoint (one more round changes
# nothing).
# K chosen so peeling BITES on the fixture graph (K=20: 10%/5%/4% of
# vertices peeled at sf0.001/0.01/0.1, fixpoint in 5/3/4 rounds — all
# inside the 6-round budget; K≤15 peels almost nothing, K=25 empties
# the core).
KCORE_K = 20
KCORE_ROUNDS = 6


def _kcore_oracle_sql() -> str:
    # Every e{it} is referenced twice by the next round (directly and
    # through its degree table) — inlined CTEs re-evaluate per
    # reference, doubling work per round (measured 33.5 s → 0.0 s at
    # sf0.001 with MATERIALIZED; the SQL twin of the persist() the
    # Spark loop needs for the same reason).
    sql = f"""
    WITH cp AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e0 AS MATERIALIZED (SELECT c AS src, p AS dst FROM cp
           UNION ALL SELECT p AS src, c AS dst FROM cp)"""
    prev = "e0"
    for it in range(1, KCORE_ROUNDS + 1):
        sql += f""",
    k{it} AS MATERIALIZED (
        SELECT src AS v FROM {prev}
        GROUP BY src HAVING COUNT(*) >= {KCORE_K}
    ),
    e{it} AS MATERIALIZED (
        SELECT e.src, e.dst FROM {prev} e
        WHERE e.src IN (SELECT v FROM k{it})
          AND e.dst IN (SELECT v FROM k{it})
    )"""
        prev = f"e{it}"
    sql += f"""
    SELECT CASE WHEN src >= {PART_OFFSET} THEN src - {PART_OFFSET}
           ELSE src END AS vertex,
           src >= {PART_OFFSET} AS is_part,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM {prev} GROUP BY 1, 2
    """
    return sql


@query(
    "graph_kcore_peel",
    sql=_kcore_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "Iterative peeling, R fixed rounds: each round is one degree "
        "agg (two-phase, map-side combine) + two vertex-keyed semi-"
        "joins restricting the edge set — the monotone-shrinking "
        "cousin of the PageRank loop (every round's input is a subset "
        "of the last, so cost only falls).  Vertex partitioning is "
        "reused across rounds; survivors + their in-core degrees are "
        "the output, never a driver-side graph.  Integer end to end ⇒ "
        "the unrolled-CTE oracle is exact; the referee runs one extra "
        "round to prove the fixture fixpoint was reached, so the "
        "fixed R is the converged k-core, not an approximation."
    ),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices of the 20-core of the co-purchase graph (after 6 peel
    rounds — converged at every fixture scale) with their in-core
    degrees."""
    # Each round references the previous edge set TWICE (directly and
    # through its degree table).  persist() alone is NOT enough here:
    # it reuses cached DATA but Catalyst still re-analyzes a logical
    # plan that doubles per round — measured 3 s at 4 rounds but 29 s
    # at 6 (analysis cost, not execution).  localCheckpoint truncates
    # the lineage each round, so plan size stays constant and each
    # round is one small eager job (the standard Spark idiom for
    # iterative algorithms whose rounds branch).
    #
    # Checkpoint blocks are stored SERIALIZED with disk spill
    # (MEMORY_AND_DISK; the localCheckpoint default is the
    # DESERIALIZED level): deserialized InternalRows kept every
    # round's edge set as heap objects until the async ContextCleaner
    # caught up, and the ×30 probe OOM'd the 8 GB local JVM exactly
    # that way (the Cleaner thread itself died allocating).
    # Serialized blocks are ~5-10× smaller and evict to disk under
    # pressure, so the heap profile is flat in the number of rounds;
    # measured at ×30 edges: OOM → 64.6 s (DISK_ONLY ran 83.2 s —
    # the serialized-memory tier wins when it fits).
    edges = persist_fresh(
        "kcore_edges", sf_dir, copurchase_edges(spark, sf_dir)
    )
    # Early fixpoint exit (round-13 ×300 probe finding): the fixture
    # converges at round 3-4 at every measured scale, so the fixed-R
    # loop was paying 2-3 full no-op rounds (~3 shuffles + a
    # checkpoint write over the full edge set EACH) purely to match
    # the oracle's unrolled round count.  Peeling is monotone — the
    # semi joins only remove edges — so an unchanged edge count means
    # the degree table, hence every later round, is identical:
    # breaking there is result-identical to running all R rounds.
    # The count is one job over the just-checkpointed (cached) edge
    # set; at ×300 (360M edges) the exit saved ~1/3 of wall time.
    prev = edges.count()
    for _ in range(KCORE_ROUNDS):
        keep = (
            edges.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select(F.col("src").alias("v"))
        )
        edges = (
            edges.join(keep, edges["src"] == keep["v"], "left_semi")
            .join(
                keep.select(F.col("v").alias("w")),
                F.col("dst") == F.col("w"),
                "left_semi",
            )
            .localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        cur = edges.count()
        if cur == prev:
            break
        prev = cur
    return (
        edges.groupBy("src")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .select(
            F.when(F.col("src") >= PART_OFFSET, F.col("src") - PART_OFFSET)
            .otherwise(F.col("src"))
            .alias("vertex"),
            (F.col("src") >= PART_OFFSET).alias("is_part"),
            "core_degree",
        )
    )


# ---- Jaccard neighbor similarity / link prediction (round 7) ---------
# also_bought ranks by RAW common-buyer count, which favors globally
# popular parts; the standard link-prediction correction normalizes by
# neighborhood size: J(p1,p2) = |N∩| / |N∪| over buyer sets.  Same
# degree-capped candidate machinery, plus two part-keyed degree joins;
# the Jaccard score is one division of exact integers, so the ranking
# (score desc, common desc, other asc) is engine-deterministic.
JACCARD_NEIGH_K = 3

# Target distinct pair keys per final-agg task in the jaccard pair
# count — bounds each task's aggregation hash map (~100 B/entry →
# ~100 MB/task) independently of corpus size.
_PAIR_KEYS_PER_TASK = 1_000_000


def _capped_pair_rows(capped: DataFrame) -> int:
    """Exact row count of the a<b co-occurrence pair stream,
    Σ_c deg·(deg-1)/2 over the (already degree-capped, already
    PERSISTED) bipartite rows — the width driver for the pair-key
    pre-partitioning (an upper bound on DISTINCT pair keys, and the
    true shuffled row volume).  One cheap two-agg job on the cached
    frame."""
    row = (
        capped.groupBy("c")
        .agg(F.count("*").cast("bigint").alias("deg"))
        .agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("n")
        )
        .collect()[0]
    )
    return int(row.n or 0)


@query(
    "graph_jaccard_neighbors",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), ok AS (
        SELECT c FROM cp GROUP BY c
        HAVING COUNT(*) <= {ALSO_BOUGHT_DEGREE_CAP}
    ), capped AS (
        SELECT cp.c, cp.p FROM cp JOIN ok ON cp.c = ok.c
    ), deg AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM capped GROUP BY p
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
        GROUP BY a.p, b.p
    ), sym AS (
        SELECT p1 AS part, p2 AS other, n_common FROM pairs
        UNION ALL
        SELECT p2 AS part, p1 AS other, n_common FROM pairs
    ), scored AS (
        SELECT s.part, s.other, s.n_common, dp.d AS deg_part,
               do_.d AS deg_other,
               CAST(s.n_common AS DOUBLE)
                   / CAST(dp.d + do_.d - s.n_common AS DOUBLE) AS jaccard
        FROM sym s
        JOIN deg dp ON dp.p = s.part
        JOIN deg do_ ON do_.p = s.other
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY part
                   ORDER BY jaccard DESC, n_common DESC, other
               ) AS rnk
        FROM scored
    )
    SELECT part, CAST(rnk AS INT) AS rnk, other, n_common,
           deg_part, deg_other, jaccard
    FROM ranked WHERE rnk <= {JACCARD_NEIGH_K}
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Link prediction by neighborhood Jaccard: candidate pairs "
        "come from the SAME degree-capped inverted-index self-join as "
        "graph_also_bought_topk (cost Σ deg(c)², mega-baskets "
        "excluded from pair listing), never all part pairs — zero-"
        "common pairs have J=0 and are unrankable above any "
        "candidate, so skipping them is exact, not approximate.  Two "
        "extra part-keyed broadcast-or-shuffle joins attach |N(p)|; "
        "the score is ONE correctly-rounded IEEE division of exact "
        "bigints, so the (jaccard, n_common, other) ranking is "
        "deterministic on both engines; one part-keyed window for "
        "top-k.  All shuffles keyed and linear in true co-occurrence "
        "volume at 100 TB.  The pair-count aggregation is explicitly "
        "pre-partitioned on the pair key at 8x parallelism width: "
        "distinct-pair cardinality grows with the corpus while the "
        "default shuffle width stays fixed, so the per-task hash map "
        "in the final agg otherwise grows UNBOUNDED with data (the "
        "r10 x100 probe OOM-killed it at 32 partitions); groupBy on "
        "the same keys reuses the partitioning, so this adds no "
        "extra exchange."
    ),
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-similar parts per part by buyer-set Jaccard over the
    degree-capped co-purchase graph (link-prediction primitive)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ok = (
        cp.groupBy("c")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") <= ALSO_BOUGHT_DEGREE_CAP)
        .select("c")
    )
    capped = persist_fresh("jaccard_neigh_cp", sf_dir, cp.join(ok, "c"))
    deg = capped.groupBy("p").agg(F.count("*").cast("bigint").alias("d"))
    a, b = capped.alias("a"), capped.alias("b")
    # Pre-partition the raw pair stream on the PAIR key before the
    # count: distinct-pair cardinality scales with the corpus, so at a
    # fixed shuffle width the final agg's per-task hash map grows
    # without bound (the r10 ×100 probe OOM-killed it at width 32).
    # groupBy on the same keys reuses this hash partitioning — no
    # second exchange — and each task's map is pairs/width-sized.
    #
    # Tradeoff (ADVICE r10, documented): planning the repartition
    # UNDER the aggregation puts both partial and final agg above the
    # exchange, so the shuffle carries raw per-co-occurrence pair
    # rows, not map-side-combined (pair, count) rows — roughly
    # avg(n_common)x more volume.  Accepted deliberately: same-pair
    # rows come from DIFFERENT customers and so almost never co-reside
    # in one map task of the customer-joined stream, meaning map-side
    # combine buys ~nothing here, while the key-partitioned exchange
    # bounds the agg hash map — the thing that actually OOMs.
    #
    # Width scales with the capped co-occurrence volume (not just
    # cluster parallelism — data-independent width was the residual
    # r10 gap), computed from the EXACT pair-stream row count
    # Σ_c deg·(deg-1)/2 — the r11 wave-3 ×30 probe showed the earlier
    # rows×(cap-1) bound overestimating ~13× (avg degree ≪ cap),
    # which over-partitioned the reduce side into thousands of tiny
    # tasks whose scheduling overhead made the wall mildly
    # SUPERLINEAR.  One cheap job on the already-persisted frame.
    pair_rows = _capped_pair_rows(capped)
    width = int(
        min(
            32768,
            max(
                64,
                spark.sparkContext.defaultParallelism * 8,
                pair_rows // _PAIR_KEYS_PER_TASK,
            ),
        )
    )
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .repartition(width, "p1", "p2")
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sym = pairs.select(
        F.col("p1").alias("part"), F.col("p2").alias("other"), "n_common"
    ).unionAll(
        pairs.select(
            F.col("p2").alias("part"), F.col("p1").alias("other"), "n_common"
        )
    )
    dp = deg.select(F.col("p").alias("part"), F.col("d").alias("deg_part"))
    do = deg.select(F.col("p").alias("other"), F.col("d").alias("deg_other"))
    scored = (
        sym.join(dp, "part")
        .join(do, "other")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("deg_part") + F.col("deg_other") - F.col("n_common")).cast(
                "double"
            ),
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.col("jaccard").desc(), F.col("n_common").desc(), F.col("other")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= JACCARD_NEIGH_K)
        .select(
            "part", "rnk", "other", "n_common",
            "deg_part", "deg_other", "jaccard",
        )
    )


# ---- deterministic random-walk sampling (round 7) --------------------
# The graph-embedding prep step (DeepWalk/node2vec corpus generation)
# with the house reproducibility contract: the "random" successor at
# step t from vertex u is the neighbor minimizing md5(u || '/' || v
# || '/' || t) — a deterministic, layout-independent choice that
# plays the role of the RNG (the same md5-as-permutation stand-in the
# sampling keys use), so walks are identical on any cluster, any
# partitioning, any retry.  K steps = K edge-keyed join rounds over a
# walker frontier; every step is a co-shuffled join + two-phase
# min_by, never a per-walker collect.
WALK_STEPS = 4
WALK_START_MOD = 50  # walkers: part vertices with part id ≡ 0 (mod 50)


def _walk_oracle_sql() -> str:
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT c AS src, p AS dst FROM cp
              UNION ALL SELECT p AS src, c AS dst FROM cp),
    w0 AS (
        SELECT DISTINCT p AS walker, p AS v FROM cp
        WHERE (p - {PART_OFFSET}) % {WALK_START_MOD} = 0
    )"""
    for t in range(WALK_STEPS):
        sql += f""",
    w{t + 1} AS (
        SELECT walker, min_by(dst, h) AS v FROM (
            SELECT w.walker, e.dst,
                   md5(CAST(w.v AS VARCHAR) || '/'
                       || CAST(e.dst AS VARCHAR) || '/{t}') AS h
            FROM w{t} w JOIN edges e ON e.src = w.v
        ) GROUP BY walker
    )"""
    steps = "\nUNION ALL\n".join(
        f"SELECT walker, {t} AS step, v FROM w{t}"
        for t in range(WALK_STEPS + 1)
    )
    sql += f"""
    SELECT CAST(walker - {PART_OFFSET} AS BIGINT) AS walker_part,
           CAST(step AS INT) AS step,
           CAST(CASE WHEN v >= {PART_OFFSET} THEN v - {PART_OFFSET}
                ELSE v END AS BIGINT) AS vertex,
           v >= {PART_OFFSET} AS is_part
    FROM ({steps})
    """
    return sql


@query(
    "graph_random_walk_deterministic",
    sql=_walk_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "DeepWalk-style corpus generation with md5-deterministic "
        "successor choice (the RNG stand-in — reproducible across "
        "clusters, partitionings, and retries, the property an "
        "embedding-training corpus needs for exact re-runs).  Each "
        "of the K steps is one frontier⋈edges equi-join on the "
        "CURRENT-vertex key followed by a two-phase min_by per "
        "walker — shuffle ∝ Σ deg(frontier), never a per-walker "
        "collect, and the frontier never exceeds the walker count.  "
        "Walkers here are a fixed 1/50 part-vertex sample; at 100 TB "
        "the walker set is the full vertex table and the same K "
        "rounds apply (the PageRank loop shape with min instead of "
        "sum).  md5 keys are unique per (u, v, t) so min_by has no "
        "tie to break."
    ),
)
def graph_random_walk_deterministic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """K=4-step deterministic (md5-guided) walks from every 50th part
    vertex over the co-purchase graph; emits (walker, step, vertex)."""
    edges = persist_fresh(
        "walk_edges", sf_dir, copurchase_edges(spark, sf_dir)
    )
    w = (
        edges.filter(
            (F.col("src") >= PART_OFFSET)
            & ((F.col("src") - PART_OFFSET) % WALK_START_MOD == 0)
        )
        .select(F.col("src").alias("walker"))
        .distinct()
        .withColumn("v", F.col("walker"))
    )
    out = [w.withColumn("step", F.lit(0))]
    for t in range(WALK_STEPS):
        h = F.md5(
            F.concat(
                F.col("v").cast("string"),
                F.lit("/"),
                F.col("dst").cast("string"),
                F.lit(f"/{t}"),
            )
        )
        w = (
            w.join(edges, F.col("src") == F.col("v"))
            .select("walker", "dst", h.alias("h"))
            .groupBy("walker")
            .agg(F.min_by("dst", "h").alias("v"))
        )
        out.append(w.withColumn("step", F.lit(t + 1)))
    allsteps = out[0]
    for df in out[1:]:
        allsteps = allsteps.unionAll(df)
    return allsteps.select(
        (F.col("walker") - PART_OFFSET).cast("bigint").alias("walker_part"),
        F.col("step").cast("int").alias("step"),
        F.when(F.col("v") >= PART_OFFSET, F.col("v") - PART_OFFSET)
        .otherwise(F.col("v"))
        .cast("bigint")
        .alias("vertex"),
        (F.col("v") >= PART_OFFSET).alias("is_part"),
    )


# ---- HITS hubs & authorities (round 7) -------------------------------
# Kleinberg's HITS on the directed customer→part purchase graph:
# authorities = parts bought by strong hubs, hubs = customers buying
# strong authorities.  R=3 UNNORMALIZED rounds: every score stays an
# EXACT INTEGER (h₀=1; aᵢ = Σ_in hᵢ₋₁; hᵢ = Σ_out aᵢ), so the
# iteration is hash-grade with no per-round float normalization to
# diverge (normalization only rescales — the RANKING, which is the
# output, is identical; magnitudes stay ≤ (max deg)^(2R) ≪ 2⁶³ here
# and a production run rescales by a power of two per round, which is
# exact in binary floating point, to extend the budget).
HITS_ROUNDS = 3
HITS_TOPK = 20


def _hits_oracle_sql() -> str:
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    h0 AS (SELECT DISTINCT c, CAST(1 AS BIGINT) AS h FROM cp)"""
    prev_h = "h0"
    for r in range(1, HITS_ROUNDS + 1):
        sql += f""",
    a{r} AS (
        SELECT cp.p, CAST(SUM(h.h) AS BIGINT) AS a
        FROM cp JOIN {prev_h} h ON h.c = cp.c GROUP BY cp.p
    ),
    h{r} AS (
        SELECT cp.c, CAST(SUM(a.a) AS BIGINT) AS h
        FROM cp JOIN a{r} a ON a.p = cp.p GROUP BY cp.c
    )"""
        prev_h = f"h{r}"
    return sql + f"""
    SELECT 'authority' AS side, p AS vertex, a AS score,
           CAST(row_number() OVER (ORDER BY a DESC, p) AS INT) AS rnk
    FROM a{HITS_ROUNDS}
    QUALIFY rnk <= {HITS_TOPK}
    UNION ALL
    SELECT 'hub' AS side, c AS vertex, h AS score,
           CAST(row_number() OVER (ORDER BY h DESC, c) AS INT) AS rnk
    FROM h{HITS_ROUNDS}
    QUALIFY rnk <= {HITS_TOPK}
    """


@query(
    "graph_hits_topk",
    sql=_hits_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "HITS with the PageRank loop economics: each round is two "
        "edge-keyed equi-joins + two-phase SUMs (map-side combine), "
        "edge-linear per round, vertex partitioning reused; no "
        "driver-side graph ever.  Integer-exact scores make the "
        "unrolled-CTE oracle exact and the ranking engine-"
        "deterministic (ties → lowest vertex id); top-20 per side "
        "via TakeOrderedAndProject.  The unnormalized-integer "
        "contract is declared: magnitudes ≤ (max deg)^(2R), and a "
        "power-of-two per-round rescale (exact in IEEE) extends the "
        "budget at any scale."
    ),
)
def graph_hits_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 hubs (customers) and authorities (parts) after 3
    integer-exact HITS rounds on the purchase graph."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = persist_fresh(
        "hits_cp",
        sf_dir,
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct(),
    )
    h = cp.select("c").distinct().withColumn("h", F.lit(1).cast("bigint"))
    a = None
    for _ in range(HITS_ROUNDS):
        a = (
            cp.join(h, "c")
            .groupBy("p")
            .agg(F.sum("h").cast("bigint").alias("a"))
        )
        h = (
            cp.join(a, "p")
            .groupBy("c")
            .agg(F.sum("a").cast("bigint").alias("h"))
        )
    # TakeOrdered-then-rank (the trending_decayed_topk /
    # limit_topk_global contract, VERDICT r8 #3): orderBy().limit(K)
    # compiles to TakeOrderedAndProject — per-partition top-K then a
    # K-row driver merge — so the rank window only ever sees K rows,
    # never a vertex-sized single partition.
    wa = Window.orderBy(F.col("a").desc(), F.col("p"))
    wh = Window.orderBy(F.col("h").desc(), F.col("c"))
    top_a = (
        a.orderBy(F.col("a").desc(), F.col("p"))
        .limit(HITS_TOPK)
        .withColumn("rnk", F.row_number().over(wa).cast("int"))
        .select(
            F.lit("authority").alias("side"),
            F.col("p").alias("vertex"),
            F.col("a").alias("score"),
            "rnk",
        )
    )
    top_h = (
        h.orderBy(F.col("h").desc(), F.col("c"))
        .limit(HITS_TOPK)
        .withColumn("rnk", F.row_number().over(wh).cast("int"))
        .select(
            F.lit("hub").alias("side"),
            F.col("c").alias("vertex"),
            F.col("h").alias("score"),
            "rnk",
        )
    )
    return top_a.unionAll(top_h)


# ---- association rules + local clustering (round-7 continuation) -----
# Two classical readouts over graphs this module already builds:
# support/confidence/lift association rules on the ORDER-basket
# item-pair graph (the statistical layer above graph_also_bought_topk's
# raw co-occurrence counts), and the per-vertex local clustering
# coefficient (the normalized form of graph_triangle_count).  Both are
# exact-integer until one final float expression per row.

ASSOC_MIN_PAIR = 2  # min co-occurrence count for an emitted rule


@query(
    "graph_assoc_rules_lift",
    sql=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
    ic AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY p
    ),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS cab
        FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
        GROUP BY a.p, b.p
        HAVING COUNT(*) >= {ASSOC_MIN_PAIR}
    )
    SELECT pairs.pa AS part_a, pairs.pb AS part_b,
           pairs.cab AS n_both, ia.c AS n_a, ib.c AS n_b, nb.n AS n_baskets,
           CAST(pairs.cab AS DOUBLE) / CAST(ia.c AS DOUBLE) AS conf_ab,
           CAST(pairs.cab AS DOUBLE) / CAST(ib.c AS DOUBLE) AS conf_ba,
           CAST(nb.n AS DOUBLE) * CAST(pairs.cab AS DOUBLE)
           / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)) AS lift
    FROM pairs
    JOIN ic ia ON ia.p = pairs.pa
    JOIN ic ib ON ib.p = pairs.pb
    CROSS JOIN nb
    """,
    tables=("lineitem",),
    scale_note=(
        "Market-basket association rules: pair candidates come from a "
        "basket-keyed self-join (cost Sigma deg(basket)^2 — order "
        "baskets are size-bounded by the data model, ~7 items, so "
        "per-basket work is constant; a degree cap like "
        "also_bought's guards pathological baskets), pair counts and "
        "item counts are two-phase hash aggs, the min-support HAVING "
        "prunes the rule table BEFORE the stats joins, item counts "
        "join broadcast-sized sides, and the basket total is a 1-row "
        "broadcast.  Confidence and lift are per-row IEEE "
        "expressions over exact BIGINTs."
    ),
)
def graph_assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (support >= 2 baskets) over order baskets:
    confidence both directions and lift per item pair."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
    ).distinct()
    items = persist_fresh("assoc_items", sf_dir, li)
    nb = items.agg(
        F.countDistinct("ok").cast("bigint").alias("n_baskets")
    )
    ic = items.groupBy("p").agg(F.count("*").cast("bigint").alias("c"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .filter(F.col("n_both") >= ASSOC_MIN_PAIR)
    )
    ia = ic.select(F.col("p").alias("pa"), F.col("c").alias("n_a"))
    ib = ic.select(F.col("p").alias("pb"), F.col("c").alias("n_b"))
    j = (
        pairs.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(nb))
    )
    cab, na_, nb_, n = (
        F.col("n_both").cast("double"),
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
        F.col("n_baskets").cast("double"),
    )
    return j.select(
        F.col("pa").alias("part_a"),
        F.col("pb").alias("part_b"),
        "n_both",
        "n_a",
        "n_b",
        "n_baskets",
        (cab / na_).alias("conf_ab"),
        (cab / nb_).alias("conf_ba"),
        (n * cab / (na_ * nb_)).alias("lift"),
    )


@query(
    "graph_clustering_coeff",
    sql="""
    WITH pp AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM lineitem l1
        JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey
         AND l1.l_partkey < l2.l_partkey
    ),
    deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS v FROM pp UNION ALL SELECT b AS v FROM pp
        ) GROUP BY v
    ),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM pp e1
        JOIN pp e2 ON e2.a = e1.b
        JOIN pp e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tv AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
            SELECT a AS v FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY v
    )
    SELECT deg.v AS p_partkey, deg.d AS degree,
           CAST(COALESCE(tv.t, 0) AS BIGINT) AS n_triangles,
           2.0 * CAST(COALESCE(tv.t, 0) AS DOUBLE)
           / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0))
               AS clustering_coeff
    FROM deg LEFT JOIN tv ON tv.v = deg.v
    WHERE deg.d >= 2
    """,
    tables=("lineitem",),
    scale_note=(
        "Local clustering coefficient cc(v) = 2T(v)/(d(v)(d(v)-1)) "
        "on the part co-purchase graph: COMPOSES graph_triangle_count "
        "(degree-oriented compact-forward wedge enumeration, "
        "O(E^1.5) — the probed scale path) with the vertex-degree "
        "table (one edge-keyed agg), one left join, one float "
        "expression per vertex.  Degree-1 vertices are excluded by "
        "contract (cc undefined — no wedge exists); zero-triangle "
        "vertices coalesce to 0.  The oracle recomputes triangles "
        "naively by a<b<c — same set, hash-identical."
    ),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient over the co-purchase
    graph, composed from graph_triangle_count's oriented enumeration
    plus a degree table."""
    tv = graph_triangle_count(spark, sf_dir).select(
        F.col("p_partkey").alias("v"), F.col("n_triangles").alias("t")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("b"),
    )
    edges = (
        li.join(
            l2,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") < F.col("b")),
        )
        .select(F.col("l_partkey").alias("a"), "b")
        .distinct()
    )
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("d"))
        .filter(F.col("d") >= 2)
    )
    j = deg.join(tv, "v", "left").select(
        F.col("v").alias("p_partkey"),
        F.col("d").alias("degree"),
        F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_triangles"),
    )
    d, t = F.col("degree"), F.col("n_triangles")
    return j.select(
        "p_partkey",
        "degree",
        "n_triangles",
        (
            F.lit(2.0) * t.cast("double")
            / (d.cast("double") * (d.cast("double") - F.lit(1.0)))
        ).alias("clustering_coeff"),
    )


# ---- power-law slope of the degree distribution (round-7 cont.) -------
# The quantitative readout over graph_degree_distribution's log2
# histogram: OLS of log(vertex count) vs log(representative degree)
# per vertex side — the scale-free exponent estimate that decides hub
# mitigation.  Composes the registered histogram (its two shuffles,
# O(log max_deg) output), then folds over the <=64 buckets with the
# ANOVA order-pinning; logs rounded 8dp (the ln-ulp discipline).


@query(
    "graph_powerlaw_slope",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey + {PART_OFFSET} AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), e AS (
        SELECT c AS src FROM cp UNION ALL SELECT p AS src FROM cp
    ), deg AS (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
    ), h AS (
        SELECT CAST(floor(log2(deg)) AS INT) AS bucket,
               src >= {PART_OFFSET} AS is_part,
               CAST(COUNT(*) AS BIGINT) AS n_vertices
        FROM deg GROUP BY 1, 2
    ), pts AS (
        SELECT is_part, bucket,
               round(ln(pow(2.0, CAST(bucket AS DOUBLE))), 8) AS x,
               round(ln(CAST(n_vertices AS DOUBLE)), 8) AS y
        FROM h
    ), s AS (
        SELECT is_part,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               list_reduce(list(x ORDER BY bucket), (a, b) -> a + b) AS sx,
               list_reduce(list(y ORDER BY bucket), (a, b) -> a + b) AS sy,
               list_reduce(list(x * y ORDER BY bucket),
                           (a, b) -> a + b) AS sxy,
               list_reduce(list(x * x ORDER BY bucket),
                           (a, b) -> a + b) AS sxx
        FROM pts GROUP BY is_part
    )
    SELECT is_part, n_buckets,
           (CAST(n_buckets AS DOUBLE) * sxy - sx * sy)
           / (CAST(n_buckets AS DOUBLE) * sxx - sx * sx)
               AS powerlaw_slope
    FROM s WHERE n_buckets >= 2
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Power-law exponent estimate per vertex side: composes "
        "graph_degree_distribution's probed two-shuffle histogram "
        "(O(log max_deg) rows regardless of graph size), then an "
        "OLS over <=64 bucket points via bucket-ORDER-PINNED folds "
        "with 8dp-rounded logs — constant reduce-side work at any "
        "scale.  Degenerate sides (<2 buckets) are excluded by "
        "contract (no slope exists)."
    ),
)
def graph_powerlaw_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope of log(count) vs log(2^bucket) over the log2 degree
    histogram per vertex side (scale-free exponent estimate)."""
    h = graph_degree_distribution(spark, sf_dir).select(
        "is_part", "bucket", "n_vertices"
    )
    pts = h.select(
        "is_part",
        "bucket",
        F.round(
            F.log(F.pow(F.lit(2.0), F.col("bucket").cast("double"))), 8
        ).alias("x"),
        F.round(F.log(F.col("n_vertices").cast("double")), 8).alias("y"),
    )

    def fold(term):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("bucket", "x", "y"))),
                term,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    s = pts.groupBy("is_part").agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        fold(lambda r: r["x"]).alias("sx"),
        fold(lambda r: r["y"]).alias("sy"),
        fold(lambda r: r["x"] * r["y"]).alias("sxy"),
        fold(lambda r: r["x"] * r["x"]).alias("sxx"),
    )
    nd = F.col("n_buckets").cast("double")
    sx, sy, sxy, sxx = F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
    return s.where(F.col("n_buckets") >= 2).select(
        "is_part",
        "n_buckets",
        ((nd * sxy - sx * sy) / (nd * sxx - sx * sx)).alias(
            "powerlaw_slope"
        ),
    )


# ---- modularity of the LPA partition (round-7 continuation) -----------
# The community-quality eval over graph_label_propagation (the
# ann_recall_eval pattern applied to communities): Newman modularity
# Q = Σ_c [e_c/m − (d_c/2m)²], kept EXACT by clearing denominators —
# q_num = Σ_c (4·m·e_c − d_c²) is pure BIGINT arithmetic and
# Q = q_num / (4m²) is the single float.  The oracle restates the
# whole unrolled LPA chain plus the modularity arithmetic, so the
# quality metric is hash-verified end to end.


def _modularity_oracle_sql() -> str:
    sql = f"""
    WITH cp AS (
        SELECT DISTINCT o_custkey AS c, l_partkey + {PART_OFFSET} AS p
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e AS (SELECT c AS src, p AS dst FROM cp
          UNION ALL SELECT p AS src, c AS dst FROM cp),
    v AS (SELECT DISTINCT src AS v FROM e),
    l0 AS (SELECT v, v AS lab FROM v)"""
    prev = "l0"
    for it in range(1, LPA_ITERATIONS + 1):
        sql += f""",
    n{it} AS (
        SELECT e.dst AS v, p.lab, COUNT(*) AS cnt
        FROM e JOIN {prev} p ON e.src = p.v
        GROUP BY e.dst, p.lab
    ),
    l{it} AS (
        SELECT v, lab FROM n{it}
        QUALIFY row_number() OVER (PARTITION BY v
                                   ORDER BY cnt DESC, lab ASC) = 1
    )"""
        prev = f"l{it}"
    sql += f""",
    mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM cp),
    deg AS (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d
            FROM e GROUP BY src),
    dc AS (
        SELECT p.lab AS community, CAST(SUM(deg.d) AS BIGINT) AS d_c
        FROM deg JOIN {prev} p ON p.v = deg.v
        GROUP BY p.lab
    ),
    ec AS (
        SELECT a.lab AS community, CAST(COUNT(*) AS BIGINT) AS e_c
        FROM cp
        JOIN {prev} a ON a.v = cp.c
        JOIN {prev} b ON b.v = cp.p
        WHERE a.lab = b.lab
        GROUP BY a.lab
    ),
    terms AS (
        SELECT dc.community,
               4 * mm.m * COALESCE(ec.e_c, 0) - dc.d_c * dc.d_c AS t
        FROM dc LEFT JOIN ec ON ec.community = dc.community
        CROSS JOIN mm
    )
    SELECT mm.m,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM dc) AS n_communities,
           (SELECT CAST(SUM(t) AS BIGINT) FROM terms) AS q_num,
           CAST((SELECT CAST(SUM(t) AS BIGINT) FROM terms) AS DOUBLE)
           / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE))
               AS modularity
    FROM mm
    """
    return sql


@query(
    "graph_modularity_eval",
    sql=_modularity_oracle_sql(),
    tables=("lineitem", "orders"),
    scale_note=(
        "Newman modularity of the LPA communities, denominators "
        "cleared: q_num = Sigma_c (4*m*e_c - d_c^2) is pure BIGINT "
        "(exact until 4m*e_c ~ 2^63, i.e. m ~ 1.5e9 edges — the "
        "HUGEINT/DECIMAL(38,0) swap is the noted scale path), and "
        "Q = q_num/(4m^2) is the ONE float.  Work on top of the "
        "probed LPA plan: a degree agg, two label joins keyed on "
        "vertex (reusing LPA's partitioning), a communities-sized "
        "reduce.  The oracle restates the whole unrolled LPA chain "
        "+ the modularity arithmetic end to end."
    ),
)
def graph_modularity_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Newman modularity of the 4-round LPA partition
    of the copurchase graph (one float: the final division)."""
    labs = graph_label_propagation(spark, sf_dir).select(
        F.when(F.col("is_part"), F.col("vertex") + PART_OFFSET)
        .otherwise(F.col("vertex"))
        .alias("v"),
        F.col("community").alias("lab"),
    )
    edges = copurchase_edges(spark, sf_dir)
    und = edges.where(F.col("src") < F.col("dst")).select(
        F.col("src").alias("c"), F.col("dst").alias("p")
    )
    mm = und.agg(F.count("*").cast("bigint").alias("m"))
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    dc = (
        deg.join(labs, labs["v"] == deg["src"])
        .groupBy(F.col("lab").alias("community"))
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    la = labs.select(F.col("v").alias("c"), F.col("lab").alias("lab_a"))
    lb = labs.select(F.col("v").alias("p"), F.col("lab").alias("lab_b"))
    ec = (
        und.join(la, "c")
        .join(lb, "p")
        .where(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count("*").cast("bigint").alias("e_c"))
    )
    terms = (
        dc.join(ec, "community", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            (
                4 * F.col("m") * F.coalesce(F.col("e_c"), F.lit(0))
                - F.col("d_c") * F.col("d_c")
            ).alias("t"),
            "m",
        )
    )
    out = terms.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_communities"),
        F.sum("t").cast("bigint").alias("q_num"),
    )
    md = F.col("m").cast("double")
    return out.select(
        "m",
        "n_communities",
        "q_num",
        (
            F.col("q_num").cast("double") / (F.lit(4.0) * md * md)
        ).alias("modularity"),
    )


# ---- approximate neighbor-Jaccard via MinHash (round 11) --------------
# The exact graph_jaccard_neighbors is probe-pinned sublinear but is
# the graph family's most expensive key at ×100 (41.9× wall — true
# pair-volume growth of the degree-capped inverted-index self-join).
# This is the approximate twin VERDICT r10 called for: MinHash the
# NEIGHBOR SETS so candidate pairs come from banded signatures (cost
# ∝ parts × bands) instead of listing every co-occurrence pair
# (cost ∝ Σ deg(c)²), and the similarity estimate is signature
# agreement instead of an exact intersection count.  The md5 hash
# family keeps it driver-hash-verifiable end to end (the
# dedup_minhash_md5 discipline applied to graph neighborhoods).
JACCMH_SEEDS = 16
JACCMH_BANDS = 4
JACCMH_ROWS = JACCMH_SEEDS // JACCMH_BANDS
JACCMH_BUCKET_CAP = 200
JACCMH_K = 3


@query(
    "graph_jaccard_minhash",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), ok AS (
        SELECT c FROM cp GROUP BY c HAVING COUNT(*) <= {ALSO_BOUGHT_DEGREE_CAP}
    ), capped AS (
        SELECT cp.c, cp.p FROM cp JOIN ok ON cp.c = ok.c
    ), hh AS (
        SELECT p, u.seed AS seed,
               min(md5(CAST(u.seed AS VARCHAR) || ':' || CAST(c AS VARCHAR)))
                   AS mh
        FROM capped, UNNEST(range(0, {JACCMH_SEEDS})) AS u(seed)
        GROUP BY p, u.seed
    ), sig AS (
        SELECT p, list(mh ORDER BY seed) AS sig FROM hh GROUP BY p
    ), bands AS (
        SELECT p, u.band AS band,
               md5(array_to_string(
                   list_slice(sig, u.band * {JACCMH_ROWS} + 1,
                              u.band * {JACCMH_ROWS} + {JACCMH_ROWS}),
                   ',')) AS band_sig
        FROM sig, UNNEST(range(0, {JACCMH_BANDS})) AS u(band)
    ), keep AS (
        SELECT p, band, band_sig FROM bands
        QUALIFY COUNT(*) OVER (PARTITION BY band, band_sig)
                <= {JACCMH_BUCKET_CAP}
    ), cand AS (
        SELECT DISTINCT a.p AS p1, b.p AS p2
        FROM keep a JOIN keep b
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.p < b.p
    ), scored AS (
        SELECT c.p1, c.p2,
               CAST(len(list_filter(range(1, {JACCMH_SEEDS} + 1),
                        i -> sa.sig[i] = sb.sig[i])) AS BIGINT) AS n_match
        FROM cand c
        JOIN sig sa ON sa.p = c.p1
        JOIN sig sb ON sb.p = c.p2
    ), sym AS (
        SELECT p1 AS part, p2 AS other, n_match FROM scored
        UNION ALL
        SELECT p2 AS part, p1 AS other, n_match FROM scored
    ), ranked AS (
        SELECT part, other, n_match,
               CAST(n_match AS DOUBLE) / {JACCMH_SEEDS}.0 AS est_jaccard,
               row_number() OVER (
                   PARTITION BY part
                   ORDER BY n_match DESC, other
               ) AS rnk
        FROM sym
    )
    SELECT part, CAST(rnk AS INT) AS rnk, other, n_match, est_jaccard
    FROM ranked WHERE rnk <= {JACCMH_K}
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Approximate twin of graph_jaccard_neighbors (VERDICT r10 "
        "watch item): ONE pass over the degree-capped (customer, "
        "part) bipartite computes all 16 md5-minima per part inside "
        "a single partial-aggregating groupBy (min is algebraic — "
        "map-side combine collapses each task to parts × 16 cells, "
        "NO 16× row explosion), signatures are parts-sized, banding "
        "is parts × 4 rows, and candidates come from occupancy-"
        "capped bucket equi-joins — shuffle never carries the "
        "Σ deg(c)² co-occurrence pair stream that makes the exact "
        "key 41.9× at ×100.  Signature agreement (n_match/16) "
        "estimates Jaccard; two parts-keyed joins attach signatures "
        "to candidates; one part-keyed top-k window.  md5 end to "
        "end ⇒ the oracle replays the IDENTICAL algorithm, so "
        "banding, capping, estimation and ranking are all "
        "hash-verified."
    ),
)
def graph_jaccard_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 similar parts per part by ESTIMATED buyer-set Jaccard —
    banded md5-MinHash over neighbor sets (the scale path beside the
    exact graph_jaccard_neighbors)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ok = (
        cp.groupBy("c")
        .agg(F.count("*").alias("deg"))
        .filter(F.col("deg") <= ALSO_BOUGHT_DEGREE_CAP)
        .select("c")
    )
    capped = cp.join(ok, "c")
    # All 16 minima in ONE aggregation pass (no seed explosion).
    hashes = capped.withColumn(
        "h",
        F.expr(
            f"transform(sequence(0, {JACCMH_SEEDS - 1}),"
            " i -> md5(concat(cast(i as string), ':', cast(c as string))))"
        ),
    )
    sig = hashes.groupBy("p").agg(
        F.array(
            *[F.min(F.col("h")[i]) for i in range(JACCMH_SEEDS)]
        ).alias("sig")
    )
    sig = persist_fresh("jaccard_mh_sig", sf_dir, sig)
    bands = sig.select(
        "p",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {JACCMH_BANDS - 1}),"
                f" b -> md5(concat_ws(',',"
                f" slice(sig, b * {JACCMH_ROWS} + 1, {JACCMH_ROWS}))))"
            )
        ).alias("band", "band_sig"),
    )
    bands = persist_fresh("jaccard_mh_bands", sf_dir, bands)
    occ = bands.groupBy("band", "band_sig").agg(F.count("*").alias("occ"))
    keep = bands.join(
        occ.filter(F.col("occ") <= JACCMH_BUCKET_CAP).select(
            "band", "band_sig"
        ),
        ["band", "band_sig"],
    )
    a, b = keep.alias("a"), keep.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
    )
    sa = sig.select(F.col("p").alias("p1"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("p").alias("p2"), F.col("sig").alias("sig_b"))
    scored = (
        cand.join(sa, "p1")
        .join(sb, "p2")
        .select(
            "p1",
            "p2",
            F.expr(
                "cast(size(filter(arrays_zip(sig_a, sig_b),"
                " x -> x.sig_a = x.sig_b)) as bigint)"
            ).alias("n_match"),
        )
    )
    sym = scored.select(
        F.col("p1").alias("part"), F.col("p2").alias("other"), "n_match"
    ).unionAll(
        scored.select(
            F.col("p2").alias("part"), F.col("p1").alias("other"), "n_match"
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.col("n_match").desc(), F.col("other")
    )
    return (
        sym.withColumn(
            "est_jaccard",
            F.col("n_match").cast("double") / F.lit(float(JACCMH_SEEDS)),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= JACCMH_K)
        .select("part", "rnk", "other", "n_match", "est_jaccard")
    )


# ---- Adamic-Adar link prediction (round 11 wave 3) ---------------------
# The third classical link-prediction score beside raw co-occurrence
# (graph_also_bought_topk) and neighborhood Jaccard: common neighbors
# weighted INVERSELY by their degree — a shared niche buyer is stronger
# evidence of part similarity than a shared mega-basket.
# AA(p1,p2) = Σ_{c ∈ N(p1)∩N(p2)} 1/ln(deg(c)).
#
# Determinism: the per-customer weight is computed ONCE per customer as
# an integer — floor(1e8 / round(ln(deg), 8)) — so the per-pair score
# is a BIGINT sum (order-independent, retry-stable, identical on both
# engines); deg ∈ [2, cap] is a tiny fixed domain, and the 8dp-rounded
# ln (the house ln-ulp discipline) makes the two engines' weights
# byte-identical before any accumulation.  deg >= 2 on every pair row
# by construction (a customer contributing a pair has >= 2 parts), so
# ln never sees 1 and the division never sees 0.
AA_SCALE = 100_000_000
AA_TOPK = 3


@query(
    "graph_adamic_adar",
    sql=f"""
    WITH cp AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), cdeg AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM cp GROUP BY c
    ), wts AS (
        SELECT c,
               CAST(FLOOR({AA_SCALE}.0
                          / round(ln(CAST(d AS DOUBLE)), 8)) AS BIGINT)
                   AS w
        FROM cdeg WHERE d >= 2 AND d <= {ALSO_BOUGHT_DEGREE_CAP}
    ), capped AS (
        SELECT cp.c, cp.p, wts.w FROM cp JOIN wts ON cp.c = wts.c
    ), pairs AS (
        SELECT a.p AS p1, b.p AS p2,
               CAST(SUM(a.w) AS BIGINT) AS aa_scaled,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM capped a JOIN capped b ON a.c = b.c AND a.p < b.p
        GROUP BY a.p, b.p
    ), sym AS (
        SELECT p1 AS part, p2 AS other, aa_scaled, n_common FROM pairs
        UNION ALL
        SELECT p2, p1, aa_scaled, n_common FROM pairs
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY part
                   ORDER BY aa_scaled DESC, n_common DESC, other
               ) AS rnk
        FROM sym
    )
    SELECT part, CAST(rnk AS INT) AS rnk, other, n_common, aa_scaled,
           CAST(aa_scaled AS DOUBLE) / {AA_SCALE}.0 AS adamic_adar
    FROM ranked WHERE rnk <= {AA_TOPK}
    """,
    tables=("lineitem", "orders"),
    scale_note=(
        "Adamic–Adar top-3 per part: the SAME degree-capped "
        "inverted-index self-join as graph_jaccard_neighbors (cost "
        "Σ deg(c)², never all part pairs — zero-common pairs score 0 "
        "and are unrankable, so skipping them is exact), with the "
        "1/ln(deg) weight attached to each customer row BEFORE the "
        "pair listing — the pair aggregate is then a plain BIGINT "
        "sum, order-independent at any parallelism.  The pair "
        "aggregation pre-partitions on the pair key at "
        "volume-scaled width (the jaccard r10 ×100 OOM fix — "
        "per-task hash map bounded at any corpus size); one "
        "part-keyed window ranks the top-3."
    ),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 link-prediction candidates per part by Adamic-Adar score
    (common buyers weighted by 1/ln of their basket breadth)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cdeg = cp.groupBy("c").agg(F.count("*").cast("bigint").alias("d"))
    wts = cdeg.where(
        (F.col("d") >= 2) & (F.col("d") <= ALSO_BOUGHT_DEGREE_CAP)
    ).select(
        "c",
        F.floor(
            F.lit(float(AA_SCALE)) / F.round(F.log(F.col("d").cast("double")), 8)
        )
        .cast("bigint")
        .alias("w"),
    )
    capped = persist_fresh("adamic_adar_cp", sf_dir, cp.join(wts, "c"))
    a, b = capped.alias("a"), capped.alias("b")
    # Same pair-key pre-partitioning as graph_jaccard_neighbors: the
    # distinct-pair cardinality scales with the corpus while shuffle
    # width is fixed, so the final agg's hash map must be bounded by
    # width ∝ capped co-occurrence volume (r10 ×100 OOM lesson) —
    # sized from the EXACT pair-row count Σ deg·(deg-1)/2, not the
    # rows×cap bound that over-partitioned ~13× (r11 ×30 probe).
    pair_rows = _capped_pair_rows(capped)
    width = int(
        min(
            32768,
            max(
                64,
                spark.sparkContext.defaultParallelism * 8,
                pair_rows // _PAIR_KEYS_PER_TASK,
            ),
        )
    )
    pairs = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p")))
        .select(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("a.w").alias("w"),
        )
        .repartition(width, "p1", "p2")
        .groupBy("p1", "p2")
        .agg(
            F.sum("w").cast("bigint").alias("aa_scaled"),
            F.count("*").cast("bigint").alias("n_common"),
        )
    )
    sym = pairs.select(
        F.col("p1").alias("part"), F.col("p2").alias("other"),
        "aa_scaled", "n_common",
    ).unionAll(
        pairs.select(
            F.col("p2").alias("part"), F.col("p1").alias("other"),
            "aa_scaled", "n_common",
        )
    )
    w = Window.partitionBy("part").orderBy(
        F.col("aa_scaled").desc(), F.col("n_common").desc(), F.col("other")
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= AA_TOPK)
        .select(
            "part", "rnk", "other", "n_common", "aa_scaled",
            (F.col("aa_scaled").cast("double") / F.lit(float(AA_SCALE))).alias(
                "adamic_adar"
            ),
        )
    )
