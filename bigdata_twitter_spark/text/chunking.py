"""Document chunking for RAG / embedding prep (SURVEY.md §2.N growth,
LLM-pipeline family; VERDICT r6 "What's missing" #4).

The one common LLM-pipeline shape the registry lacked: fixed-size
overlapping token-window chunking with per-chunk provenance — the step
between curation (text_* quality keys) and embedding (sim_*/embed_*
keys).  Two operators:

- ``text_chunk_sliding`` — explode each document into overlapping
  token windows (window ``CHUNK_WINDOW``, stride ``CHUNK_STRIDE``),
  each chunk carrying (doc_id, chunk_id, start_offset, n_chunk_tokens,
  chunk_text).  Offsets are exact token indices so a downstream span
  lookup can map any chunk back into its source document.
- ``embed_chunk_pool`` — pool per-chunk vectors back to document
  level.  The chunk "encoder" is a deterministic 16-bucket hashed
  bag-of-words (md5 first hex nibble — the portable hash family the
  md5 dedup twins established), standing in for a real embedding
  model the way the multimodal keys stub their decoders: the tested
  part is the Spark-side pooling plumbing, which is exactly what a
  real encoder's output would flow through.  Mean pooling divides an
  EXACT integer per-dim sum by the chunk count (one IEEE division,
  bit-identical cross-engine); max pooling stays integer end to end.

Scale posture: chunking is pure per-row codegen (explode, no shuffle);
output is ∝ docs × chunks/doc, i.e. linear in corpus tokens.  Pooling
shuffles (doc_id, pos) rows — POOL_DIMS per chunk — with partial
aggregation, so the exchange carries docs × 16 rows regardless of
chunk fan-out.  Both survive 100 TB: no window, no all-pairs, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Token window / stride (25% overlap).  Real RAG pipelines use
# 256/512-token windows; the plan shape is size-independent and the
# fixture docs run 10-99 tokens, so 32/24 exercises the 1..4-chunk
# range including the tail-chunk and single-chunk cases.
CHUNK_WINDOW = 32
CHUNK_STRIDE = 24

# Hashed bag-of-words dimensionality for the stand-in chunk encoder:
# one bucket per md5 hex nibble.
POOL_DIMS = 16

# Shared Spark/DuckDB tokenization (the curation-module idiom):
# lowercase, split on single spaces, drop empties.
_SPARK_TOKS = "filter(split(lower(text), ' '), x -> x <> '')"
_DUCK_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

# Chunk count for an n-token doc: 0 for empty docs, 1 when the doc
# fits one window, else 1 + ceil((n - W) / S) — integer arithmetic on
# both engines (`div` / `//`), never float division.
_SPARK_NCHUNKS = (
    "CASE WHEN n = 0 THEN 0 WHEN n <= {w} THEN 1"
    " ELSE (n - {w} + {s} - 1) div {s} + 1 END"
).format(w=CHUNK_WINDOW, s=CHUNK_STRIDE)
_DUCK_NCHUNKS = (
    "CASE WHEN n = 0 THEN 0 WHEN n <= {w} THEN 1"
    " ELSE (n - {w} + {s} - 1) // {s} + 1 END"
).format(w=CHUNK_WINDOW, s=CHUNK_STRIDE)


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_offset, chunk_toks) — one row per
    overlapping token window; pure codegen, no shuffle."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.expr(_SPARK_TOKS).alias("toks")
    ).withColumn("n", F.size("toks"))
    t = t.withColumn("n_chunks", F.expr(_SPARK_NCHUNKS))
    # sequence(0, -1) would DESCEND, so empty docs get an explicit
    # empty id array (the text_ngrams guard, same engine quirk).
    ids = F.expr(
        "CASE WHEN n_chunks > 0 THEN sequence(0, n_chunks - 1)"
        " ELSE CAST(array() AS array<int>) END"
    )
    return (
        t.select("doc_id", "toks", F.explode(ids).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            (F.col("chunk_id").cast("bigint") * CHUNK_STRIDE).alias(
                "start_offset"
            ),
            F.expr(
                f"slice(toks, chunk_id * {CHUNK_STRIDE} + 1, {CHUNK_WINDOW})"
            ).alias("chunk_toks"),
        )
    )


@query(
    "text_chunk_sliding",
    sql=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks,
               len({_DUCK_TOKS}) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, toks, {_DUCK_NCHUNKS} AS n_chunks FROM t
    )
    SELECT doc_id,
           CAST(u.cid AS BIGINT) AS chunk_id,
           CAST(u.cid * {CHUNK_STRIDE} AS BIGINT) AS start_offset,
           CAST(len(list_slice(toks, u.cid * {CHUNK_STRIDE} + 1,
                               u.cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}))
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, u.cid * {CHUNK_STRIDE} + 1,
                                      u.cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}),
                           ' ') AS chunk_text
    FROM c, UNNEST(range(0, n_chunks)) AS u(cid)
    """,
    tables=("documents",),
    scale_note=(
        "Overlapping token-window chunking with exact provenance "
        "(doc_id, chunk_id, start token offset): tokenize + explode, "
        "all whole-stage codegen — zero shuffles, output linear in "
        "corpus tokens (× the W/S overlap factor).  At 100 TB this is "
        "a map-only stage that preserves the input partitioning for "
        "the downstream encoder; chunk boundaries never cross rows, "
        "so no window or state is needed."
    ),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunks (W=32, S=24) with per-chunk
    (doc_id, chunk_id, start_offset) provenance — the RAG/embedding
    prep step between curation and encoding."""
    return _chunks(spark, sf_dir).select(
        "doc_id",
        "chunk_id",
        "start_offset",
        F.size("chunk_toks").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


@query(
    "embed_chunk_pool",
    sql=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks,
               len({_DUCK_TOKS}) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, toks, {_DUCK_NCHUNKS} AS n_chunks FROM t
    ), ch AS (
        SELECT doc_id,
               list_transform(
                   list_slice(toks, u.cid * {CHUNK_STRIDE} + 1,
                              u.cid * {CHUNK_STRIDE} + {CHUNK_WINDOW}),
                   tk -> strpos('0123456789abcdef', substr(md5(tk), 1, 1)) - 1
               ) AS bkts
        FROM c, UNNEST(range(0, n_chunks)) AS u(cid)
    ), v AS (
        SELECT doc_id, u.j AS pos,
               len(list_filter(bkts, b -> b = u.j)) AS val
        FROM ch, UNNEST(range(0, {POOL_DIMS})) AS u(j)
    )
    SELECT doc_id,
           CAST(pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           round(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) AS mean_val,
           CAST(MAX(val) AS BIGINT) AS max_val
    FROM v
    GROUP BY doc_id, pos
    """,
    tables=("documents",),
    scale_note=(
        "Chunk-to-document pooling: each chunk gets a deterministic "
        "16-dim hashed bag-of-words (md5 nibble buckets — the portable "
        "hash family of the md5 dedup twins), then mean + max pool per "
        "(doc_id, dim).  The only shuffle keys on (doc_id, pos) with "
        "partial aggregation — the exchange carries docs × 16 rows no "
        "matter how many chunks a doc explodes into.  Mean = exact "
        "integer sum ÷ chunk count (one IEEE division, rounded 6dp); "
        "max stays integer.  Swapping the stand-in encoder for a real "
        "model changes ONE select (chunk → vector); the pooling plan "
        "is encoder-agnostic."
    ),
)
def embed_chunk_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/max-pool per-chunk hashed-BoW vectors to document level,
    one row per (doc_id, dimension) — the pooling half of a
    chunk-encode-pool embedding pipeline."""
    ch = _chunks(spark, sf_dir).withColumn(
        "bkts",
        F.expr(
            "transform(chunk_toks,"
            " tk -> instr('0123456789abcdef', substring(md5(tk), 1, 1)) - 1)"
        ),
    )
    dims = ch.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, {POOL_DIMS - 1})")).alias("pos"),
        "bkts",
    ).select(
        "doc_id",
        "pos",
        F.expr("size(filter(bkts, b -> b = pos))").alias("val"),
    )
    return dims.groupBy("doc_id", "pos").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.round(
            F.sum("val").cast("double") / F.count("*"), 6
        ).alias("mean_val"),
        F.max("val").cast("bigint").alias("max_val"),
    )
