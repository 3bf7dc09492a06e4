"""Deduplication operators (SURVEY.md §2.L) — the LLM-pipeline mandate:
exact hash dedup, exact n-gram Jaccard, MinHash-LSH, SimHash.

The driver's documents fixture contains planted near-duplicate pairs
(token-trigram Jaccard ≈ 0.98, differing by an inserted rare token),
so these operators have real positives to find.

Scale posture (100 TB): exact dedup is a single hash shuffle; exact
Jaccard's inverted-index self-join is quadratic in hot-shingle bucket
size, so at scale it runs ONLY on LSH candidates — dedup_minhash_lsh
is the scale path (shuffle ∝ docs × bands, never docs²), and the exact
Jaccard re-scores its candidates.  All hash families are value-derived
and seed-fixed (xxhash64 with literal seeds): partition-order
independent by construction, never monotonically_increasing_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

JACCARD_THRESHOLD = 0.8
MINHASH_SEEDS = 32
SIMHASH_MAX_HAMMING = 10
LSH_BANDS = 8  # 8 bands x 4 rows
LSH_ROWS = MINHASH_SEEDS // LSH_BANDS


def _shingles_expr() -> F.Column:
    """Distinct token 3-gram shingles per document (text pre-lowered)."""
    return F.array_distinct(
        F.expr(
            "transform(sequence(1, size(toks) - 2),"
            " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
            "                element_at(toks, i + 2)))"
        )
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.lower(F.col("text")), " ")
    )
    return d.select("doc_id", F.explode(_shingles_expr()).alias("s"))


@query(
    "dedup_exact",
    sql="""
    SELECT md5(lower(text)) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tables=("documents",),
    scale_note=(
        "Exact dedup = one hash-partitioned aggregate on the content hash; "
        "no sort, no driver state. The canonical 100 TB first-pass dedup."
    ),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by normalized-content hash, deterministic keeper."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.md5(F.lower(F.col("text"))))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "dedup_fuzzy_jaccard",
    sql=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(string_split(lower(text), ' ')) - 1),
                   i -> string_split(lower(text), ' ')[i] || ' ' ||
                        string_split(lower(text), ' ')[i + 1] || ' ' ||
                        string_split(lower(text), ' ')[i + 2]))) AS s
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id, inter,
           sa.n + sb.n - inter AS uni,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = a_id
    JOIN sizes sb ON sb.doc_id = b_id
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= {JACCARD_THRESHOLD}
    """,
    tables=("documents",),
    scale_note=(
        "Exact 3-gram Jaccard via inverted-index self-join. Quadratic in "
        "hot-shingle bucket size — at 100 TB run it only on LSH candidate "
        "pairs (dedup_minhash_lsh) and drop stop-shingles above a doc-freq cap."
    ),
)
def dedup_fuzzy_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with exact token-3-gram Jaccard ≥ 0.8."""
    sh = _doc_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("inter")
    )
    return (
        pairs.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            "inter",
            (F.col("sa.n") + F.col("sb.n") - F.col("inter")).alias("uni"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@query(
    "dedup_minhash_lsh",
    sql=None,  # hash-family specific — rows-only for the driver; the local
    # test suite cross-validates candidates ⊇ planted Jaccard pairs.
    tables=("documents",),
    scale_note=(
        "THE scale path for near-dedup: 32 minhashes → 8 bands × 4 rows; "
        "candidate generation is a groupBy on (band, signature) — shuffle "
        "∝ docs × bands, never docs². Hash family is xxhash64(shingle, seed) "
        "with literal seeds: deterministic and partition-order independent."
    ),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate near-duplicate pairs (banded signatures)."""
    sh = _doc_shingles(spark, sf_dir)
    # minhash per (doc, seed): min over shingles of xxhash64(shingle # seed)
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(MINHASH_SEEDS - 1))
    ).alias("seed")
    mh = (
        sh.select("doc_id", "s", seeds)
        .withColumn(
            "h", F.xxhash64(F.col("s"), F.col("seed"))
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    # signature array ordered by seed, then banded
    sig = mh.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("seed", "mh"))),
            lambda x: x["mh"],
        ).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {LSH_BANDS - 1}),"
                f" b -> xxhash64(concat_ws(',', slice(sig, b * {LSH_ROWS} + 1, {LSH_ROWS}))))"
            )
        ).alias("band", "band_sig"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )


@query(
    "dedup_simhash",
    sql=None,  # hash-family specific — rows-only; locally cross-validated.
    tables=("documents",),
    scale_note=(
        "64-bit SimHash per doc computed entirely with nested higher-order "
        "functions (no Python); near-dup candidates via 8-bit band "
        "matching, verified by hamming distance ≤ 10. 8-bit banding keeps "
        "the self-join linear in band-bucket sizes."
    ),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate candidate pairs with hamming distance."""
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.lower(F.col("text")), " ")
    )
    # Per-token 64-bit hashes, then per-bit majority vote → simhash bits.
    hashed = d.withColumn("th", F.expr("transform(toks, t -> xxhash64(t))"))
    simhash = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, b) -> acc + "
        " (CASE WHEN aggregate(th, 0L,"
        "       (a, h) -> a + (CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)"
        "      ) > 0 THEN shiftleft(1L, b) ELSE 0L END))"
    )
    sh = hashed.select("doc_id", simhash.alias("simhash"))
    # Band on 8-bit chunks: docs sharing any chunk are candidates
    # (pigeonhole: hamming <= 7 always leaves one of 8 bands intact).
    quarters = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 7),"
                " q -> (simhash >> (q * 8)) & 255)"
            )
        ).alias("q", "qval"),
    )
    a = quarters.alias("a")
    b = quarters.alias("b")
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
            F.col("a.simhash").alias("a_hash"),
            F.col("b.simhash").alias("b_hash"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("a_hash").bitwiseXOR(F.col("b_hash")))
    return pairs.select(
        "a_id", "b_id", hamming.alias("hamming")
    ).filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
