"""Perceptual image hashing + image near-dup mining over REAL decoded
pixels (SURVEY.md §2.N growth, multimodal × dedup families).

Training corpora dedup images as aggressively as text; the standard
tool is a perceptual hash (pHash family) that is stable under
re-encoding while text-style byte hashes are not.  Two operators:

- ``multimodal_image_phash`` — binaryFile scan of the PNG fixtures →
  CRC-verified decode (the multimodal_image_resize seam) → 8×8
  nearest-neighbor downsample → 64-bit median hash: bit i set iff
  sample i exceeds the corpus-free LOWER MEDIAN of the 64 samples
  (integer-exact everywhere, so the hash is deterministic down to the
  bit — the pHash-family variant with no float DCT to diverge on).
- ``dedup_image_phash`` — near-dup image pairs at hamming ≤ 7 via the
  8-band × 8-bit pigeonhole join (the dedup_simhash geometry applied
  to image hashes): band-equality candidates, exact popcount verify.

Verification mirrors multimodal_jpeg_decode's disjoint-route design:
the oracle computes the same hash from the fixture generator's
closed-form pixels at SQL-build time (never touching PNG bytes),
while Spark reaches it through chunk-walk + inflate + unfilter of the
real files — agreement proves the decode path bit-for-bit.

Scale posture: hashing is a map-only Arrow pass (batch memory bounded
by decoded size × maxRecordsPerBatch); the pair join shuffles
images × 8 band rows — never images² — with the same economics as the
SimHash text path.  At 100 TB the decode swaps to PIL/libjpeg behind
the same seam and the band join is unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import persist_fresh

PHASH_GRID = 8  # 8×8 samples → 64-bit hash
PHASH_BANDS = 8
PHASH_MAX_HAMMING = PHASH_BANDS - 1  # pigeonhole: ≤7 ⇒ some band equal

PHASH_SCHEMA = (
    "doc_id bigint, width int, height int, phash bigint, n_ones int"
)


def phash64(w: int, h: int, get) -> tuple[int, int]:
    """64-bit median hash of an w×h grayscale image given a pixel
    accessor ``get(x, y) -> int``.  Pure integer arithmetic: nearest
    8×8 downsample, threshold at the lower median (32nd smallest),
    bit i (= y*8+x) set iff sample > threshold.  Returns (int64
    two's-complement hash, popcount)."""
    xs = [(x * w) // PHASH_GRID for x in range(PHASH_GRID)]
    ys = [(y * h) // PHASH_GRID for y in range(PHASH_GRID)]
    samples = [get(x, y) for y in ys for x in xs]
    thresh = sorted(samples)[PHASH_GRID * PHASH_GRID // 2 - 1]
    hv = 0
    for i, s in enumerate(samples):
        if s > thresh:
            hv |= 1 << i
    ones = bin(hv).count("1")
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv, ones


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..binfixtures import decode_png

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, pix = decode_png(bytes(payload))
            img = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
            hv, ones = phash64(w, h, lambda x, y: int(img[y, x]))
            rows.append((int(doc_id), w, h, hv, ones))
        yield pd.DataFrame(
            rows, columns=["doc_id", "width", "height", "phash", "n_ones"]
        ).astype(
            {
                "doc_id": "int64",
                "width": "int32",
                "height": "int32",
                "phash": "int64",
                "n_ones": "int32",
            }
        )


def _oracle_facts_sql() -> str:
    """(doc_id, width, height, phash, n_ones) VALUES computed from the
    generator's closed-form pixels — the forward route that never
    touches PNG bytes (the multimodal_jpeg_decode oracle pattern)."""
    from ..binfixtures import N_FILES, pixel, png_height, png_width

    rows = []
    for d in range(N_FILES):
        w, h = png_width(d), png_height(d)
        hv, ones = phash64(w, h, lambda x, y: pixel(x, y, d))
        rows.append(f"({d}, {w}, {h}, CAST({hv} AS BIGINT), {ones})")
    return "(VALUES " + ", ".join(rows) + ")"


def _scan_phash(spark: SparkSession) -> DataFrame:
    from ..binfixtures import ensure_png_dir

    root = ensure_png_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(root)
    )
    doc_id = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.png$", 1
    ).cast("bigint")
    d = files.select(doc_id.alias("doc_id"), F.col("content").alias("payload"))
    return d.mapInPandas(_phash_batches, schema=PHASH_SCHEMA)


@query(
    "multimodal_image_phash",
    sql="""
    WITH facts(doc_id, width, height, phash, n_ones) AS
         __FACTS__
    SELECT doc_id, CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           CAST(phash AS BIGINT) AS phash,
           CAST(n_ones AS INT) AS n_ones
    FROM facts
    """,
    tables=(),
    scale_note=(
        "Perceptual (median) image hash over REAL decoded pixels: one "
        "map-only Arrow pass per image, zero shuffles; the hash is "
        "pure integer arithmetic so it is reproducible across engines "
        "and re-runs.  The oracle recomputes the identical hash from "
        "the fixture generator's closed-form pixels at SQL-build time "
        "— decode route (chunk walk + inflate + unfilter) and oracle "
        "route share no I/O or decompression code, so hash equality "
        "certifies the full decode stack.  At 100 TB: same seam, "
        "PIL-decoded pixels, unchanged hash definition."
    ),
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit integer-exact median pHash per fixture PNG, from
    CRC-verified decoded pixels (dims + hash + popcount)."""
    return _scan_phash(spark)


@query(
    "dedup_image_phash",
    sql=f"""
    WITH facts(doc_id, width, height, phash, n_ones) AS
         __FACTS__,
    q AS (
        SELECT doc_id, phash, u.q AS q,
               (phash >> (u.q * 8)) & 255 AS qval
        FROM facts, UNNEST(range(0, {PHASH_BANDS})) AS u(q)
    )
    SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM q a JOIN q b
      ON a.q = b.q AND a.qval = b.qval AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
    """,
    tables=(),
    scale_note=(
        "Image near-dup pairs at hamming ≤ 7: the dedup_simhash "
        "band-join geometry (8 bands × 8 bits; pigeonhole makes the "
        "candidate set complete at this radius) applied to decoded-"
        "pixel pHashes.  Shuffle = images × 8 band rows, candidates "
        "per bucket bounded by band-value collisions — never images². "
        "Exact popcount verify on candidates only.  Arithmetic note: "
        "(phash >> q*8) & 255 extracts the band identically under "
        "arithmetic OR logical shift because the mask discards every "
        "sign-extended bit — safe for negative int64 hashes in both "
        "engines."
    ),
)
def dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs (hamming ≤ 7 over 64-bit pHashes)
    mined with a banded self-join over real decoded pixels."""
    sh = _scan_phash(spark).select("doc_id", "phash")
    bands = sh.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}),"
                " q -> (phash >> (q * 8)) & 255)"
            )
        ).alias("q", "qval"),
    )
    bands = persist_fresh("phash_bands", sf_dir, bands)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.q") == F.col("b.q"))
            & (F.col("a.qval") == F.col("b.qval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.phash").alias("a_hash"),
            F.col("b.phash").alias("b_hash"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("a_hash").bitwiseXOR(F.col("b_hash"))).cast(
        "int"
    )
    return pairs.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= PHASH_MAX_HAMMING
    )


def _inject_facts() -> None:
    """Replace the __FACTS__ placeholder in both oracle SQL strings
    with the build-time VALUES table (kept out of the decorator so the
    closed-form computation runs once, at import)."""
    from ..registry import REGISTRY

    facts = _oracle_facts_sql()
    for key in ("multimodal_image_phash", "dedup_image_phash"):
        REGISTRY[key].sql = REGISTRY[key].sql.replace("__FACTS__", facts)


_inject_facts()


# ---- intensity histogram (round-7 continuation) -----------------------
# The standard image-stats primitive next to the hash: a 16-bin
# intensity histogram per image over the SAME CRC-verified decode.
# Integer-exact (bin = pixel // 16, counts are BIGINTs); the oracle
# recomputes every bin from the generator's closed-form pixels via
# unnest ranges — the disjoint-route pattern, fully in SQL.

HIST_BINS = 16
HIST_SCHEMA = "doc_id bigint, bin int, n_pixels bigint"


def _hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow pass: decode each PNG for real, bincount intensities."""
    import numpy as np

    from ..binfixtures import decode_png

    for pdf in batches:
        doc, bins, counts = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, pix = decode_png(bytes(payload))
            arr = np.frombuffer(pix, dtype=np.uint8)
            bc = np.bincount(arr >> 4, minlength=HIST_BINS)
            for b in range(HIST_BINS):
                if bc[b]:
                    doc.append(doc_id)
                    bins.append(b)
                    counts.append(int(bc[b]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "bin": pd.Series(bins, dtype="int32"),
                "n_pixels": pd.Series(counts, dtype="int64"),
            }
        )


@query(
    "multimodal_image_histogram",
    sql="""
    WITH ids AS (SELECT unnest(range(0, 100)) AS doc_id),
    dims AS (
        SELECT doc_id,
               16 + (doc_id * 7) % 49 AS w,
               16 + (doc_id * 11) % 49 AS h
        FROM ids
    ),
    px AS (
        SELECT doc_id, w, unnest(range(h)) AS y FROM dims
    ),
    p AS (
        SELECT doc_id, y, unnest(range(w)) AS x FROM px
    )
    SELECT doc_id,
           CAST(((3 * x + 7 * y + doc_id) % 256) // 16 AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_pixels
    FROM p GROUP BY 1, 2
    """,
    tables=(),
    scale_note=(
        "Per-image 16-bin intensity histogram over REAL decoded "
        "pixels: one map-only Arrow pass (numpy bincount per image, "
        "batch memory bounded), zero shuffles, integer-exact.  The "
        "oracle recomputes every bin from the generator's "
        "closed-form pixel formula via unnest ranges — decode route "
        "and oracle route share no code, so bin equality proves the "
        "chunk-walk + inflate + unfilter path pixel-for-pixel (the "
        "pHash verification pattern, extended to the full pixel "
        "distribution)."
    ),
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin intensity histogram per fixture PNG from CRC-verified
    decoded pixels (integer-exact; empty bins omitted)."""
    from ..binfixtures import ensure_png_dir

    root = ensure_png_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(root)
    )
    doc_id = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.png$", 1
    ).cast("bigint")
    d = files.select(doc_id.alias("doc_id"), F.col("content").alias("payload"))
    return d.mapInPandas(_hist_batches, schema=HIST_SCHEMA)
