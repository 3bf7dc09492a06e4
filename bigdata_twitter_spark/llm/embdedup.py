"""Embedding-cosine near-duplicate dedup (SURVEY.md §2.N) — the third
dedup modality next to shingle-Jaccard (``dedup_fuzzy_jaccard``) and
MinHash/SimHash: two documents are near-dups when their embedding
vectors are cosine-similar, which catches paraphrases that share no
n-grams at all.

The operator emits a KEEP/DROP decision per embedded document — the
keep-first rule (drop a doc iff a similar doc with a smaller id
exists), which is the stateless decision a 100-TB dedup pass actually
applies; cluster-exact resolution is ``dedup_components``'s job.

Candidate pairs are mined HYBRID by corpus size, the same way AQE
picks a join strategy from stats: at or below ``EXACT_PAIRS_MAX``
vectors the exact thresholded self-join runs (O(n²) but trivially
affordable, and the DuckDB oracle is exact BY CONSTRUCTION — no
recall precondition to expire); above it, the SRP-LSH bucketed miner
(``sim_pairs_bucketed``, shuffle ∝ vectors × bands) takes over as the
production path.  The cutover matters because the miner's band width
now ADAPTS to corpus size (llm/bucketed.py): at the τ = 0.4 mining
threshold wider bands trade recall below 100%, which would silently
invalidate an exact oracle — the hybrid keeps the oracle-checked
regime exact and the at-scale regime honest (where the driver oracle
never runs; recall there is governed by the declared LSH contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, persist_fresh
from .vectors import PAIR_COSINE_THRESHOLD, duck_cosine

# Exact pair mining at or below this many vectors; LSH-bucketed above.
# 1500 (r4, was 4000): keeps the driver/parity scales (n ≤ 1000) on
# the exact path — where the exact all-pairs oracle is a trivial
# identity — while sf0.1 (n = 2000, the bench scale) exercises the
# bucketed SCALE path, so the bench tracks the plan that actually
# runs on a big corpus instead of the deliberately-expensive twin.
EXACT_PAIRS_MAX = 1500

# Set by a harness that intends to hash-compare this operator's output
# against the registered EXACT all-pairs oracle (tests/parity.py sets
# it around every oracle-attached run).  The runtime guard below turns
# the silent oracle/path regime mismatch into a named fail-fast error.
EXPECT_EXACT_ORACLE_ENV = "BDT_EXPECT_EXACT_ORACLE"


class ExactOracleRegimeExceeded(RuntimeError):
    """The corpus routed dedup_embedding onto the probabilistic LSH
    path while the caller declared (via BDT_EXPECT_EXACT_ORACLE) that
    it will compare against the exact all-pairs oracle — that compare
    would test the oracle's expired precondition, not the operator
    (ADVICE r4/r5).  Callers must downgrade to a rows-only check."""


@query(
    "dedup_embedding",
    sql=f"""
    WITH p AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND {duck_cosine('a.embedding', 'b.embedding')}
              >= {PAIR_COSINE_THRESHOLD}
    ),
    sym AS (
        SELECT a_id AS id, b_id AS nb FROM p
        UNION ALL
        SELECT b_id, a_id FROM p
    ),
    n AS (SELECT id, COUNT(*) AS n_dups, MIN(nb) AS mn FROM sym GROUP BY 1)
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(n.n_dups, 0) AS BIGINT) AS n_dups,
           (n.mn IS NULL OR n.mn > d.doc_id) AS is_kept
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    LEFT JOIN n ON n.id = d.doc_id
    """,
    tables=("documents", "embeddings"),
    scale_note=(
        "Embedding near-dup keep/drop, hybrid by corpus stats: exact "
        "thresholded self-join at/below EXACT_PAIRS_MAX vectors (the "
        "oracle-checked regime — exact by construction), SRP-LSH "
        "buckets above (shuffle ∝ vectors × bands, declared-recall "
        "LSH contract; the driver oracle never runs there). Then one "
        "groupBy over the pair list for the keep-first rule and one "
        "key-equi join back to documents."
    ),
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEP/DROP per embedded document under embedding-cosine ≥ 0.4
    near-duplication with the deterministic keep-first (min doc_id)
    rule; ``n_dups`` counts each doc's near-duplicate neighbors."""
    # Lazily imported: module-level imports must not re-anchor the
    # miners' registry positions.
    from .bucketed import sim_pairs_bucketed
    from .similarity import sim_pairs_threshold

    n = load(spark, sf_dir, "embeddings").count()  # catalog stats at scale
    if n > EXACT_PAIRS_MAX and os.environ.get(EXPECT_EXACT_ORACLE_ENV):
        raise ExactOracleRegimeExceeded(
            f"{n} embeddings > EXACT_PAIRS_MAX={EXACT_PAIRS_MAX}: the "
            "LSH path is selected, so the registered exact all-pairs "
            "oracle is not valid at this scale — downgrade to a "
            "rows-only check or run at n <= EXACT_PAIRS_MAX"
        )
    # The bucketed miner reuses this invocation's count (one fewer
    # scalar job); the exact miner needs no corpus stats.
    mined = (
        sim_pairs_threshold(spark, sf_dir)
        if n <= EXACT_PAIRS_MAX
        else sim_pairs_bucketed(spark, sf_dir, n)
    )
    # The symmetrization union consumes the mined pair list twice;
    # persist it (result-sized) so the whole mining pipeline runs
    # once, not once per union branch.
    pairs = persist_fresh(
        "embdedup_pairs",
        sf_dir,
        mined.select("a_id", "b_id"),
    )
    sym = pairs.select(
        F.col("a_id").alias("id"), F.col("b_id").alias("nb")
    ).unionAll(pairs.select(F.col("b_id").alias("id"), F.col("a_id").alias("nb")))
    neigh = sym.groupBy("id").agg(
        F.count("*").alias("n_dups"), F.min("nb").alias("mn")
    )
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings").select(F.col("vec_id").alias("doc_id"))
    return (
        d.join(e, "doc_id")
        .join(neigh, d["doc_id"] == neigh["id"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_dups", F.lit(0).cast("bigint")).alias("n_dups"),
            (F.col("mn").isNull() | (F.col("mn") > F.col("doc_id"))).alias(
                "is_kept"
            ),
        )
    )
