"""Audio chunking seam (SURVEY.md §2.N extras — the audio half of the
multimodal mandate next to ``multimodal_decode_stub`` (image) and
``multimodal_frame_sample`` (video)).

Audio feature extraction frames a signal into OVERLAPPING windows
(window/hop, the STFT shape) — unlike video frame sampling's disjoint
stride.  The payload is the document text standing in for PCM bytes;
the plumbing — Arrow-batched ``mapInPandas`` fan-out of one row into
ceil((n-window)/hop)+1 chunk rows, a typed schema, per-chunk content
hashing — is the real production shape.  A real resampler/torchaudio
loader replaces the inner slicing only.

Scale posture: fan-out is executor-side in Arrow batches; output rows
∝ input length / hop with ``arrow.maxRecordsPerBatch`` bounding batch
memory; chunk hashes key downstream near-dup joins exactly like frame
hashes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

CHUNK_CHARS = 200  # fake "window" length
HOP_CHARS = 100  # 50% overlap, the standard STFT hop

AUDIO_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, chunk_start bigint, "
    "chunk_len bigint, chunk_sha string"
)


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched overlapped chunker: row → ⌈(n−w)/h⌉+1 chunk rows."""
    for pdf in batches:
        doc, idx, start, length, sha = [], [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n == 0:
                continue
            pos, i = 0, 0
            while pos < n:
                chunk = text[pos : pos + CHUNK_CHARS]
                doc.append(doc_id)
                idx.append(i)
                start.append(pos)
                length.append(len(chunk))
                sha.append(
                    hashlib.sha256(chunk.encode("utf-8")).hexdigest()
                )
                if pos + CHUNK_CHARS >= n:
                    break
                pos += HOP_CHARS
                i += 1
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "chunk_idx": pd.Series(idx, dtype="int64"),
                "chunk_start": pd.Series(start, dtype="int64"),
                "chunk_len": pd.Series(length, dtype="int64"),
                "chunk_sha": pd.Series(sha, dtype="object"),
            }
        )


@query(
    "multimodal_audio_chunk",
    sql=f"""
    WITH c AS (
        SELECT doc_id, text,
               unnest(range(0,
                   CASE WHEN len(text) <= {CHUNK_CHARS} THEN 1
                        ELSE CAST(ceil((len(text) - {CHUNK_CHARS})
                                       / {HOP_CHARS}.0) AS BIGINT) + 1
                   END)) AS chunk_idx
        FROM documents
        WHERE len(text) > 0
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {HOP_CHARS} AS chunk_start,
           CAST(len(substr(text, chunk_idx * {HOP_CHARS} + 1, {CHUNK_CHARS}))
                AS BIGINT) AS chunk_len,
           sha256(substr(text, chunk_idx * {HOP_CHARS} + 1, {CHUNK_CHARS}))
               AS chunk_sha
    FROM c
    """,
    tables=("documents",),
    scale_note=(
        "Overlapped window/hop chunking (the STFT framing shape) as an "
        "Arrow mapInPandas fan-out — executor-side, batch-bounded, "
        "typed schema; per-chunk sha keys downstream dedup. Swap the "
        "text slicing for a PCM windower on a real cluster; the Spark "
        "plumbing is unchanged."
    ),
)
def multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping window/hop chunks per document payload with
    per-chunk hashes (audio-framing stand-in)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_chunk_batches, schema=AUDIO_SCHEMA)
