"""Composed end-to-end curation pipeline (SURVEY.md §2.N extras): the
full training-data pass — quality gate → language gate → exact dedup →
token accounting → per-source corpus stats — as ONE declarative plan.

This is the operator that shows the engine's pieces COMPOSE: the same
filters, window dedup, and two-phase aggregation used individually
elsewhere chain into a single Catalyst plan with no materialization
barriers between stages (filters push into the scan; the only wide
exchanges are the dedup hash and the final source agg).

Scale posture: stage order is chosen so selectivity drops early —
per-row gates (lang, length) run scan-side BEFORE the dedup shuffle,
so the expensive exchange sees only surviving documents.  At 100 TB
exact dedup would be preceded by the MinHash/SimHash candidate passes
(dedup_minhash_lsh / dedup_embedding) — same downstream shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

MIN_CHARS = 100
MAX_CHARS = 400


@query(
    "doc_pipeline_e2e",
    sql=f"""
    WITH gated AS (
        SELECT * FROM documents
        WHERE lang = 'en' AND n_chars BETWEEN {MIN_CHARS} AND {MAX_CHARS}
    ),
    kept AS (
        SELECT * FROM gated
        QUALIFY row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) = 1
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(string_split(text, ' '),
                                    x -> x <> ''))) AS BIGINT)
               AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM kept
    GROUP BY source
    """,
    tables=("documents",),
    scale_note=(
        "Whole curation pass in one plan: per-row gates (lang, length) "
        "evaluate scan-side before any exchange, the md5 keep-first "
        "dedup is the single data-sized shuffle, and the source rollup "
        "is a two-phase agg over survivors. Selectivity-ordered stages "
        "mean the 100-TB cost is dominated by the scan, not the dedup."
    ),
)
def doc_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality+language gate → exact dedup (keep lowest doc_id per
    content hash) → per-source token/char accounting."""
    d = load(spark, sf_dir, "documents")
    gated = d.filter(
        (F.col("lang") == "en")
        & F.col("n_chars").between(MIN_CHARS, MAX_CHARS)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc_id"),
    )
