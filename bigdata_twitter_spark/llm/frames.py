"""Frame sampling over multimodal payloads (SURVEY.md §2.L extras —
the video half of the decode/feature-extract/resize/frame-sample
mandate).

Like ``multimodal_decode_stub``, the payload is the document text
standing in for a video blob: the PLUMBING — one input row fanning out
to N sampled-frame rows through an Arrow-batched ``mapInPandas``, a
typed output schema, per-frame content hashing — is the real
production shape; only the innermost "frame" extraction is a
deterministic fake (fixed-width substring "frames", every 4th one
sampled).  A real ffmpeg/pyav reader replaces the inner loop only.

Scale posture: fan-out happens executor-side inside Arrow batches
(never a driver loop); output rows ∝ input frames with
``arrow.maxRecordsPerBatch`` bounding peak batch memory; downstream
dedup joins key on the per-frame hash.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

FRAME_CHARS = 256  # fake "frame" width in characters
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_len bigint, frame_sha string"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampler: row → N sampled frame rows."""
    for pdf in batches:
        out_doc, out_idx, out_len, out_sha = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n = len(text)
            if n == 0:
                continue
            n_frames = -(-n // FRAME_CHARS)  # ceil
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = text[idx * FRAME_CHARS : (idx + 1) * FRAME_CHARS]
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_len.append(len(frame))
                out_sha.append(hashlib.sha256(frame.encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int64"),
                "frame_len": pd.Series(out_len, dtype="int64"),
                "frame_sha": pd.Series(out_sha, dtype="object"),
            }
        )


@query(
    "multimodal_frame_sample",
    sql=f"""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(len(text) / {FRAME_CHARS}.0) AS BIGINT),
                            {FRAME_STRIDE})) AS frame_idx
        FROM documents
        WHERE len(text) > 0
    )
    SELECT doc_id, frame_idx,
           len(substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
               AS frame_len,
           sha256(substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
               AS frame_sha
    FROM f
    """,
    tables=("documents",),
    scale_note=(
        "mapInPandas frame-sampling seam: executor-side row fan-out in "
        "Arrow batches with a typed schema — the video-frame analog of "
        "the decode stub. Swap the substring fake for an ffmpeg reader; "
        "schema, batching, and hashing stay as-is."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled fixed-width 'frames' per document with per-frame hashes."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)
