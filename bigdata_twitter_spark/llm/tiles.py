"""ViT-style patch (tile) extraction over REAL decoded pixels
(SURVEY.md §2.N growth, multimodal family; reference checkout empty —
§0.1).

Vision-transformer pipelines consume images as a grid of fixed-size
patches; the data-engineering half of that step is: decode → tile →
per-tile features, distributed, with provenance (doc_id, tile_row,
tile_col).  This operator emits integer per-tile statistics (sum,
min, max over the 16×16 pixel block) rather than raw bytes so the
result is bounded and hash-comparable; the downstream embed stage
would consume the same grid.

Verification mirrors multimodal_image_phash's disjoint-route design:
the oracle recomputes every tile statistic from the fixture
generator's CLOSED-FORM pixels at SQL-build time (no PNG bytes, no
inflate), while Spark reaches the same integers through the real
chunk-walk + inflate + unfilter decode — agreement certifies the
decode and the tiling geometry bit-for-bit.

Tiling contract: non-overlapping TILE×TILE tiles anchored at the
origin; ragged right/bottom edges are DROPPED (the resize-to-multiple
step a production ViT preprocessor runs first is
multimodal_image_resize's seam).  Every image in the fixture set is
≥16 px per side, so every image yields ≥1 tile.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import REGISTRY, query

TILE = 16

TILES_SCHEMA = (
    "doc_id bigint, tile_row int, tile_col int, "
    "pix_sum bigint, pix_min int, pix_max int"
)


def _tile_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ..binfixtures import decode_png

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, pix = decode_png(bytes(payload))
            img = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
            for tr in range(h // TILE):
                for tc in range(w // TILE):
                    t = img[
                        tr * TILE : (tr + 1) * TILE,
                        tc * TILE : (tc + 1) * TILE,
                    ]
                    rows.append(
                        (
                            int(doc_id),
                            tr,
                            tc,
                            int(t.sum(dtype=np.int64)),
                            int(t.min()),
                            int(t.max()),
                        )
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "tile_row", "tile_col",
                "pix_sum", "pix_min", "pix_max",
            ],
        ).astype(
            {
                "doc_id": "int64",
                "tile_row": "int32",
                "tile_col": "int32",
                "pix_sum": "int64",
                "pix_min": "int32",
                "pix_max": "int32",
            }
        )


def _tile_facts_sql() -> str:
    from ..binfixtures import N_FILES, pixel, png_height, png_width

    rows = []
    for d in range(N_FILES):
        w, h = png_width(d), png_height(d)
        for tr in range(h // TILE):
            for tc in range(w // TILE):
                vals = [
                    pixel(x, y, d)
                    for y in range(tr * TILE, (tr + 1) * TILE)
                    for x in range(tc * TILE, (tc + 1) * TILE)
                ]
                rows.append(
                    f"({d}, {tr}, {tc}, {sum(vals)}, "
                    f"{min(vals)}, {max(vals)})"
                )
    return "(VALUES " + ", ".join(rows) + ")"


@query(
    "multimodal_image_tiles",
    sql="""
    WITH facts(doc_id, tile_row, tile_col, pix_sum, pix_min, pix_max) AS
         __TILE_FACTS__
    SELECT doc_id, CAST(tile_row AS INT) AS tile_row,
           CAST(tile_col AS INT) AS tile_col,
           CAST(pix_sum AS BIGINT) AS pix_sum,
           CAST(pix_min AS INT) AS pix_min,
           CAST(pix_max AS INT) AS pix_max
    FROM facts
    """,
    tables=(),
    scale_note=(
        "Patch extraction is a map-only Arrow pass (one decode per "
        "image, tile loop in numpy slices — no per-pixel Python), "
        "zero shuffles; output rows = Σ tiles with (doc, row, col) "
        "provenance, the grid an embedding stage consumes.  All tile "
        "statistics are exact integers, so the key is hash-grade and "
        "the disjoint-route oracle (closed-form pixels, no PNG "
        "bytes) certifies decode + tiling geometry bit-for-bit.  At "
        "100 TB the decode swaps to PIL behind the same seam; tiling "
        "stays numpy slicing inside the same batch."
    ),
)
def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-overlapping 16×16 tiles of every fixture PNG with exact
    per-tile integer statistics and grid provenance."""
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
    return d.mapInPandas(_tile_batches, schema=TILES_SCHEMA)


def _inject_tile_facts() -> None:
    """Replace the __TILE_FACTS__ placeholder with the closed-form
    VALUES table (computed once at import)."""
    REGISTRY["multimodal_image_tiles"].sql = REGISTRY[
        "multimodal_image_tiles"
    ].sql.replace("__TILE_FACTS__", _tile_facts_sql())


_inject_tile_facts()
