"""Multimodal binary-column handling (SURVEY.md §2.L).

The fixtures carry no true image/audio blobs, so the binary payload is
the UTF-8 encoding of document text: every Spark-side mechanism that a
real multimodal pipeline needs — BinaryType columns, content hashing,
base64 transport encoding, Arrow-batched mapInPandas feature
extraction with a typed output schema — is exercised for real; only
the innermost pixel/sample decode is a deterministic fake (the
image/audio libraries are not in this container, and a real decoder
would slot into exactly the same mapInPandas seam).

Scale posture: binary payloads ride the normal columnar path (parquet
BYTE_ARRAY); decode/feature-extract runs in Arrow batches with
spark.sql.execution.arrow.maxRecordsPerBatch bounding peak memory, and
partitioning by size class keeps batch memory predictable when blobs
vary 1000x.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width int, fake_height int, "
    "fake_channels int, format string"
)


@query(
    "multimodal_bytes",
    sql="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha_hex,
           substring(base64(encode(text)), 1, 48) AS b64_prefix,
           decode(from_base64(base64(encode(text)))) = text AS roundtrip_ok
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "BinaryType stays JVM-side: encode/hash/base64 are codegen "
        "expressions; content hash is the multimodal dedup key."
    ),
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column toolkit: encode, byte length, sha-256, base64 round-trip."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("sha_hex"),
        F.substring(F.base64(payload), 1, 48).alias("b64_prefix"),
        (
            F.decode(F.unbase64(F.base64(payload)), "utf-8") == F.col("text")
        ).alias("roundtrip_ok"),
    )


def _fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for an image decoder over Arrow batches.

    A real decoder (PIL/ffmpeg/torchvision) would replace the body of
    this loop only — schema, batching, and partitioning are the real
    production plumbing.  The fake derives metadata purely from the
    payload so the oracle can state the expected values in SQL.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "fake_width": (64 + n_bytes % 512).astype("int32"),
                "fake_height": (64 + (n_bytes * 3) % 512).astype("int32"),
                "fake_channels": 3,
                "format": "fake/rgb8",
            }
        )


@query(
    "multimodal_decode_stub",
    sql="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 512 AS INT) AS fake_width,
           CAST(64 + (octet_length(encode(text)) * 3) % 512 AS INT) AS fake_height,
           3 AS fake_channels,
           'fake/rgb8' AS format
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "mapInPandas decode seam: Arrow batches in/out, typed schema, no "
        "driver involvement. Swap the fake body for PIL/ffmpeg on a real "
        "cluster; everything else is unchanged."
    ),
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract plumbing with a deterministic fake."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(_fake_decode_batches, schema=DECODE_SCHEMA)
