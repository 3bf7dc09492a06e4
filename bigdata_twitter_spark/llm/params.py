"""Shared dedup tuning constants.

Kept in a registration-free module so operators that only need the
*parameters* (e.g. ``components.py``'s oracle SQL) can import them
without triggering ``dedup.py``'s operator registration as a side
effect — registry *order* is the driver's check order, so import
graphs must not reorder keys accidentally.
"""

from __future__ import annotations

JACCARD_THRESHOLD = 0.8
MINHASH_SEEDS = 32
# 8-band × 8-bit SimHash banding only guarantees candidate generation
# for hamming ≤ 7 (pigeonhole); keep the filter inside the guarantee.
SIMHASH_MAX_HAMMING = 7
LSH_BANDS = 8  # 8 bands x 4 rows
LSH_ROWS = MINHASH_SEEDS // LSH_BANDS
# Inverted-index join guard: shingles appearing in more than this many
# docs are stop-shingles — dropped BEFORE the self-join so the worst
# bucket contributes at most cap·(cap−1)/2 pairs. Mirrored in the
# oracle SQL so Jaccard semantics (over the capped shingle universe)
# stay identical on both engines.
SHINGLE_DF_CAP = 64
