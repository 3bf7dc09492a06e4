"""Incremental (cross-snapshot) dedup (SURVEY.md §2.N, round 4): the
re-crawl pass — a new batch of documents is deduplicated against the
already-ingested corpus by content hash, then within itself.

The fixture has no physical corpus/batch pair, so both are derived
deterministically from documents (corpus = even doc_ids, batch = odd),
keeping the operator fully DuckDB-oracle-checkable — same derivation
trick as merge_upsert / cdc_snapshot_diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "dedup_incremental_snapshot",
    sql="""
    WITH corpus AS (
        SELECT DISTINCT md5(lower(text)) AS content_hash
        FROM documents WHERE doc_id % 2 = 0
    ), batch AS (
        SELECT doc_id, md5(lower(text)) AS content_hash
        FROM documents WHERE doc_id % 2 = 1
    ), ranked AS (
        SELECT b.doc_id, b.content_hash,
               c.content_hash IS NOT NULL AS in_corpus,
               row_number() OVER (
                   PARTITION BY b.content_hash ORDER BY b.doc_id
               ) AS rn
        FROM batch b LEFT JOIN corpus c USING (content_hash)
    )
    SELECT doc_id, content_hash,
           CASE WHEN in_corpus THEN 'dup_of_corpus'
                WHEN rn > 1 THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM ranked
    """,
    tables=("documents",),
    scale_note=(
        "Re-crawl dedup: the corpus side is ONLY its distinct content "
        "hashes (a fraction of corpus bytes; on a lakehouse this is a "
        "materialized hash index, never a re-scan of 100 TB), the "
        "batch probes it with one hash-keyed left join, and in-batch "
        "dups fall out of the same shuffle via a keyed window. Batch-"
        "sized work against a hash-index-sized build side — the only "
        "shape that keeps continuous ingestion affordable."
    ),
)
def dedup_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify each new-batch document as new / dup-of-corpus /
    dup-in-batch by exact content hash."""
    d = load(spark, sf_dir, "documents")
    chash = F.md5(F.lower(F.col("text")))
    corpus = (
        d.filter(F.col("doc_id") % 2 == 0)
        .select(chash.alias("content_hash"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    batch = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", chash.alias("content_hash")
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    ranked = (
        batch.join(corpus, "content_hash", "left")
        .withColumn("rn", F.row_number().over(w))
    )
    status = (
        F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
        .when(F.col("rn") > 1, F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return ranked.select("doc_id", "content_hash", status.alias("status"))
