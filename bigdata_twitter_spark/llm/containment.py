"""Shingle-containment near-duplicate detection (SURVEY.md §2.N
extras): Jaccard misses SUBSET duplication — a short document wholly
quoted inside a long one scores low Jaccard (union is large) but
containment |A∩B| / min(|A|,|B|) ≈ 1.  Training-data curation needs
both signals: Jaccard for symmetric near-dups, containment for
quote/excerpt inclusion.

Same scale shape as dedup_fuzzy_jaccard: df-capped inverted-index
self-join (bounded buckets), sizes joined back, one threshold filter —
only the denominator differs.  At 100 TB this re-scores MinHash/LSH
candidates rather than mining raw pairs, like every exact scorer here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .dedup import _doc_shingles
from .params import SHINGLE_DF_CAP

CONTAINMENT_THRESHOLD = 0.8


@query(
    "dedup_containment",
    sql=f"""
    WITH sh_all AS (
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
    )
    SELECT a_id, b_id, inter,
           CAST(least(sa.n, sb.n) AS BIGINT) AS n_small,
           CAST(inter AS DOUBLE) / least(sa.n, sb.n) AS containment
    FROM pairs
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE CAST(inter AS DOUBLE) / least(sa.n, sb.n)
          >= {CONTAINMENT_THRESHOLD}
    """,
    tables=("documents",),
    scale_note=(
        "Containment catches subset duplication Jaccard cannot (short "
        "doc quoted in long doc). Identical bounded-bucket inverted-"
        "index plan as dedup_fuzzy_jaccard — df cap bounds the worst "
        "join bucket; at 100 TB it re-scores LSH candidates only."
    ),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs whose smaller shingle set is ≥ 80% contained in the other."""
    sh = _doc_shingles(spark, sf_dir)
    df_ok = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= SHINGLE_DF_CAP)
        .select("s")
    )
    # Not persisted — same measured decision as dedup_fuzzy_jaccard:
    # the capped index is data-sized strings and caching it lost to
    # recomputation at memory scale.
    capped = sh.join(df_ok, "s")
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("inter"))
    )
    n_small = F.least(F.col("sa.n"), F.col("sb.n"))
    cont = F.col("inter").cast("double") / n_small
    return (
        pairs.join(sizes.alias("sa"), F.col("a_id") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            "inter",
            n_small.cast("bigint").alias("n_small"),
            cont.alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )
