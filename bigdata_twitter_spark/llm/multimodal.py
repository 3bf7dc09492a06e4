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


TARGET_W, TARGET_H = 224, 224  # the standard vision-model input square

RESIZE_SCHEMA = (
    "doc_id bigint, src_width int, src_height int, "
    "out_width int, out_height int, scale double, letterbox boolean, "
    "resized_checksum bigint"
)


def _fake_resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Aspect-preserving resize-to-224² plumbing over Arrow batches.

    A real implementation swaps the checksum line for PIL/torchvision
    ``resize``; source dims, scale math, letterbox decision and the
    typed output schema are the production plumbing.  The fake
    checksum is a pure function of (payload bytes, output dims) so the
    oracle can restate it in SQL.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        src_w = (64 + n_bytes % 512).astype("int64")
        src_h = (64 + (n_bytes * 3) % 512).astype("int64")
        # floor() on the double ratio in BOTH engines (least/CAST in SQL).
        scale = pd.concat(
            [TARGET_W / src_w, TARGET_H / src_h], axis=1
        ).min(axis=1)
        import numpy as np

        out_w = np.floor(src_w * scale).astype("int64").clip(upper=TARGET_W)
        out_h = np.floor(src_h * scale).astype("int64").clip(upper=TARGET_H)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_width": src_w.astype("int32"),
                "src_height": src_h.astype("int32"),
                "out_width": out_w.astype("int32"),
                "out_height": out_h.astype("int32"),
                "scale": scale,
                "letterbox": out_w != out_h,
                "resized_checksum": n_bytes * 1_000_003 + out_w * 1_003 + out_h,
            }
        )


@query(
    "multimodal_image_resize",
    sql=f"""
    WITH m AS (
        SELECT doc_id,
               64 + octet_length(encode(text)) % 512 AS src_w,
               64 + (octet_length(encode(text)) * 3) % 512 AS src_h,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT doc_id,
           CAST(src_w AS INT) AS src_width,
           CAST(src_h AS INT) AS src_height,
           CAST(least(CAST(floor(src_w * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                         {TARGET_H} / CAST(src_h AS DOUBLE)))
                           AS BIGINT), {TARGET_W}) AS INT) AS out_width,
           CAST(least(CAST(floor(src_h * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                         {TARGET_H} / CAST(src_h AS DOUBLE)))
                           AS BIGINT), {TARGET_H}) AS INT) AS out_height,
           least({TARGET_W} / CAST(src_w AS DOUBLE),
                 {TARGET_H} / CAST(src_h AS DOUBLE)) AS scale,
           least(CAST(floor(src_w * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                    {TARGET_H} / CAST(src_h AS DOUBLE)))
                      AS BIGINT), {TARGET_W})
             <> least(CAST(floor(src_h * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                         {TARGET_H} / CAST(src_h AS DOUBLE)))
                           AS BIGINT), {TARGET_H}) AS letterbox,
           n_bytes * 1000003
             + least(CAST(floor(src_w * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                        {TARGET_H} / CAST(src_h AS DOUBLE)))
                          AS BIGINT), {TARGET_W}) * 1003
             + least(CAST(floor(src_h * least({TARGET_W} / CAST(src_w AS DOUBLE),
                                        {TARGET_H} / CAST(src_h AS DOUBLE)))
                          AS BIGINT), {TARGET_H}) AS resized_checksum
    FROM m
    """,
    tables=("documents",),
    scale_note=(
        "The third multimodal seam the brief names: aspect-preserving "
        "resize-to-model-input (224²) as Arrow-batched mapInPandas — "
        "scale math, letterbox decision and typed schema are real; only "
        "the pixel op is a deterministic fake a PIL/torchvision call "
        "replaces. Batch memory is bounded by "
        "arrow.maxRecordsPerBatch × target dims, independent of source "
        "blob size — the property that keeps 100-TB image preprocessing "
        "OOM-free."
    ),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: fake-decoded source dims → aspect-preserving
    224² scale/letterbox metadata + deterministic resized checksum."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(_fake_resize_batches, schema=RESIZE_SCHEMA)
