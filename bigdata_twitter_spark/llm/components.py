"""Near-duplicate cluster resolution (SURVEY.md §2.N): connected
components over the exact-Jaccard pair graph, with a deterministic
keeper per cluster — the final step of a production dedup pipeline
(pairs alone don't dedup anything; clusters + keepers do).

Algorithm: min-label propagation to fixpoint.  Every vertex starts
labeled with itself; each round every vertex takes the minimum label
among itself and its neighbors; at fixpoint the label is the component
minimum (= the keeper).  Convergence needs O(component diameter)
rounds — near-dup clusters are shallow (pairs of rewrites), so this
terminates in a handful of rounds; the loop still checks an explicit
fixpoint rather than assuming a bound.

The DuckDB oracle computes exact reachability with WITH RECURSIVE, so
the iterative Spark result is hash-verified against a closed-form
answer.

Scale posture: the working set is the PAIR graph (dup candidates), not
the corpus — orders of magnitude smaller than the input; it is
persisted once (MEMORY_AND_DISK) because every propagation round
re-reads it.  Each round is one shuffle keyed on vertex id.  The
per-round driver round-trip is a single count (the standard
Pregel-style convergence check), never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..registry import query
from .params import JACCARD_THRESHOLD, SHINGLE_DF_CAP

MAX_ROUNDS = 20  # diameter backstop; fixture clusters converge in ≤3


# The edge set is dedup_fuzzy_jaccard's pair list — restated here as a
# CTE so the oracle is self-contained.
_EDGES_SQL = f"""
    WITH RECURSIVE sh_all AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(lower(text), ' ')) - 1),
                   i -> string_split(lower(text), ' ')[i] || ' ' ||
                        string_split(lower(text), ' ')[i + 1] || ' ' ||
                        string_split(lower(text), ' ')[i + 2]))) AS s
        FROM documents
    ),
    sh AS (
        SELECT doc_id, s FROM sh_all
        QUALIFY COUNT(*) OVER (PARTITION BY s) <= {SHINGLE_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT a_id, b_id
        FROM pairs
        JOIN sizes sa ON sa.doc_id = a_id
        JOIN sizes sb ON sb.doc_id = b_id
        WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter)
              >= {JACCARD_THRESHOLD}
    )
"""


@query(
    "dedup_components",
    sql=_EDGES_SQL
    + """,
    verts AS (SELECT a_id AS id FROM edges UNION SELECT b_id FROM edges),
    sym AS (SELECT a_id AS u, b_id AS v FROM edges
            UNION ALL SELECT b_id, a_id FROM edges),
    reach(id, lbl) AS (
        SELECT id, id FROM verts
        UNION
        SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS component_id
             FROM reach GROUP BY id)
    SELECT doc_id, component_id,
           doc_id = component_id AS is_keeper,
           COUNT(*) OVER (PARTITION BY component_id) AS component_size
    FROM comp
    """,
    tables=("documents",),
    scale_note=(
        "Min-label propagation over the (small) duplicate-pair graph, "
        "persisted once; one vertex-keyed shuffle per round, O(cluster "
        "diameter) rounds with an explicit fixpoint check (one scalar "
        "count to the driver per round — Pregel-style, never row data). "
        "Oracle = exact WITH RECURSIVE reachability in DuckDB."
    ),
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters (connected components of Jaccard ≥ 0.8 pairs)
    with a deterministic keeper (= minimum doc_id) per cluster."""
    # Imported lazily: a module-level import would register the whole
    # dedup family at this module's registry position.
    from .dedup import dedup_fuzzy_jaccard

    edges = (
        dedup_fuzzy_jaccard(spark, sf_dir)
        .select("a_id", "b_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sym = edges.union(
        edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).toDF("u", "v")
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(MAX_ROUNDS):
        # Each vertex adopts min(own label, neighbors' labels).
        neighbor_min = (
            sym.join(labels, sym["u"] == labels["id"])
            .select(F.col("v").alias("id"), F.col("lbl"))
            .groupBy("id")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("lbl"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    w = F.count("*").over(Window.partitionBy("component_id"))
    out = labels.select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("component_id"),
        (F.col("id") == F.col("lbl")).alias("is_keeper"),
    ).withColumn("component_size", w)
    edges.unpersist()
    return out
