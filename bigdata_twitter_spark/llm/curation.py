"""Training-data curation operators: sequence packing, benchmark
decontamination, and boilerplate scoring (SURVEY.md §2.N growth,
LLM-pipeline family).

All three are the batch shapes a 100-TB pretraining pipeline actually
runs between dedup and tokenization:

- ``pack_token_budget``   — concatenate-then-chunk sequence packing:
  assign every document a packed-sequence id from its global token
  start offset.  The global running sum is computed DISTRIBUTED
  (fixed-width doc_id buckets → per-bucket window cumsum + a tiny
  broadcast bucket-offset table), never as one unpartitioned window.
- ``text_contamination_overlap`` — n-gram overlap screening of the
  corpus against a held-out eval split; the eval shingle set is
  dim-sized and broadcast, the corpus side streams map-side.
- ``text_boilerplate_ngrams`` — corpus-frequent 5-gram boilerplate
  fraction per doc (the remove-template-text cousin of the rare-bigram
  fluency score): two-phase distinct-doc counts, broadcast frequent
  set, one doc-keyed agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, persist_fresh

# Tokens-per-packed-sequence budget (a context-window stand-in; real
# pipelines use 2k/4k/8k — the plan shape is budget-independent).
PACK_BUDGET = 512

# Fixed doc_id bucket width for the distributed running sum.  At 100 TB
# pick width so each bucket holds ~1 task's worth of docs; correctness
# does not depend on the choice.
PACK_BUCKET_WIDTH = 100

# Eval split membership for contamination screening (every 23rd doc).
EVAL_MOD = 23

NGRAM_N = 5

# A 5-gram is boilerplate when it appears in at least this many
# DISTINCT documents.
BOILERPLATE_MIN_DOCS = 3

# Shared Spark/DuckDB tokenization: lowercase, split on single spaces,
# drop empties — identical semantics on both engines.
_SPARK_TOKS = "filter(split(lower(text), ' '), x -> x <> '')"
_DUCK_TOKS = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

# Word 5-grams over the token list; empty below NGRAM_N tokens.  The
# size guard matters on the Spark side: sequence(1, n) with n <= 0
# would generate a DESCENDING sequence, not an empty one.
_SPARK_NGRAMS = (
    "CASE WHEN size(toks) >= {n} THEN"
    " transform(sequence(1, size(toks) - {n1}),"
    "           i -> concat_ws(' ', slice(toks, i, {n})))"
    " ELSE CAST(array() AS array<string>) END"
).format(n=NGRAM_N, n1=NGRAM_N - 1)

_DUCK_NGRAMS = (
    "list_transform(range(1, greatest(len(toks) - {n2} + 1, 1)),"
    " i -> array_to_string(list_slice(toks, i, i + {n2}), ' '))"
).format(n2=NGRAM_N - 1)


@query(
    "pack_token_budget",
    sql=f"""
    WITH t AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS n_tokens FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_offset
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(start_offset AS BIGINT) AS start_offset,
           CAST(start_offset // {PACK_BUDGET} AS BIGINT) AS seq_id
    FROM c
    """,
    tables=("documents",),
    scale_note=(
        "Sequence packing (concatenate-then-chunk): every doc gets its "
        "global token start offset and seq_id = offset // budget.  The "
        "running sum is distributed: fixed-width doc_id buckets give a "
        "bucket-local window cumsum (each bucket one partition's work) "
        "plus a bucket-totals table that is tiny (n_docs / width rows), "
        "cumsum'd and broadcast back.  No unpartitioned window "
        "anywhere, so the plan parallelizes to any executor count; the "
        "oracle states the same arithmetic as one global window, which "
        "DuckDB can afford at sf."
    ),
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign docs to packed training sequences by global token offset.

    Distributed exact running sum: bucket = doc_id // width; within-
    bucket cumsum via a bucket-partitioned window; bucket start offsets
    via a cumsum over the (tiny) per-bucket totals, broadcast-joined
    back. Identical to the oracle's single global window by associativity
    of addition.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(f"size({_SPARK_TOKS})").cast("bigint").alias("n_tokens"),
        # Integer `div`, not float '/' + cast: beyond 2^53 the double
        # quotient loses precision and would misassign buckets/seq_ids
        # (the DuckDB oracle uses exact integer '//').
        F.expr(f"doc_id div {PACK_BUCKET_WIDTH}").alias("bucket"),
    )
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id")
    local = t.withColumn(
        "local_end", F.sum("n_tokens").over(in_bucket)
    )
    totals = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    over_buckets = Window.orderBy("bucket")
    offsets = totals.withColumn(
        "bucket_offset",
        F.sum("bucket_total").over(over_buckets) - F.col("bucket_total"),
    ).select("bucket", "bucket_offset")
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("bucket_offset") + F.col("local_end") - F.col("n_tokens"))
            .alias("start_offset"),
            F.expr(
                f"(bucket_offset + local_end - n_tokens) div {PACK_BUDGET}"
            ).alias("seq_id"),
        )
    )


@query(
    "text_contamination_overlap",
    sql=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest({_DUCK_NGRAMS}) AS gram FROM t
        WHERE len(toks) >= {NGRAM_N}
    ),
    eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
    ),
    corpus AS (
        SELECT DISTINCT doc_id, gram FROM grams
        WHERE doc_id % {EVAL_MOD} <> 0
    )
    SELECT corpus.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN eval_grams.gram IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           CAST(SUM(CASE WHEN eval_grams.gram IS NOT NULL
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS contamination_frac
    FROM corpus LEFT JOIN eval_grams USING (gram)
    GROUP BY corpus.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Benchmark decontamination: score every training doc by the "
        "fraction of its distinct 5-grams that also occur in the eval "
        "split.  The eval shingle set is eval-sized (benchmarks are "
        "MBs, not TBs) — deduplicated once and BROADCAST, so the "
        "corpus side is a map-side probe: no shuffle of corpus grams "
        "by gram key, one doc-keyed agg.  Integer counts until the "
        "final division."
    ),
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinct-5-gram overlap fraction vs the eval split
    (docs with doc_id % EVAL_MOD == 0)."""
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(_SPARK_TOKS)
    )
    # Both branches (eval set + corpus) consume the tokenize/explode
    # subtree — the dominant cost; persist it once (few machine words
    # per gram row; MEMORY_AND_DISK on a cluster cache tier at scale).
    grams = persist_fresh(
        "contamination_grams",
        sf_dir,
        d.select("doc_id", F.explode(F.expr(_SPARK_NGRAMS)).alias("gram")),
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("gram").distinct()
    corpus = grams.filter(~is_eval).distinct()
    hit = F.when(F.col("eg").isNotNull(), 1).otherwise(0)
    return (
        corpus.join(
            F.broadcast(eval_grams.withColumn("eg", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(hit).alias("n_overlap"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_grams")).alias(
                "contamination_frac"
            ),
        )
    )


@query(
    "text_boilerplate_ngrams",
    sql=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest({_DUCK_NGRAMS}) AS gram FROM t
        WHERE len(toks) >= {NGRAM_N}
    ),
    freq AS (
        SELECT gram FROM grams
        GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    )
    SELECT grams.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN freq.gram IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           CAST(SUM(CASE WHEN freq.gram IS NOT NULL
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS boiler_frac
    FROM grams LEFT JOIN freq USING (gram)
    GROUP BY grams.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Boilerplate detection: 5-grams present in >= K distinct docs "
        "are template text; each doc is scored by its boilerplate-gram "
        "occurrence fraction.  Distinct-doc counting is a two-phase "
        "agg on (gram, doc_id) then gram; the surviving frequent set "
        "is heavy-hitter-sized, so it broadcasts and the re-score pass "
        "is map-side.  At 100 TB the HAVING threshold scales with "
        "corpus size (frac-of-docs, not absolute) and the frequent set "
        "stays bounded by Zipf — same shape, one constant changed."
    ),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of 5-gram occurrences that are corpus-frequent
    (appear in >= BOILERPLATE_MIN_DOCS distinct docs)."""
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(_SPARK_TOKS)
    )
    # The frequent-set pass and the re-score pass both consume the
    # gram explode; persist it once (same argument as contamination).
    grams = persist_fresh(
        "boilerplate_grams",
        sf_dir,
        d.select("doc_id", F.explode(F.expr(_SPARK_NGRAMS)).alias("gram")),
    )
    freq = (
        grams.distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
        .select("gram")
    )
    hit = F.when(F.col("fg").isNotNull(), 1).otherwise(0)
    return (
        grams.join(
            F.broadcast(freq.withColumn("fg", F.lit(1))), "gram", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(hit).alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_boiler",
            (F.col("n_boiler").cast("double") / F.col("n_grams")).alias(
                "boiler_frac"
            ),
        )
    )


# PII scrubbing: conservative patterns that parse identically under
# Java regex (Spark) and RE2 (DuckDB) — lowercase alphabetics, explicit
# classes, no lookaround.
EMAIL_RE = r"[a-z0-9.]+@[a-z0-9-]+\.[a-z][a-z]+"
PHONE_RE = r"\+1-555-[0-9][0-9][0-9][0-9]"

_AUGMENT_SQL = (
    "concat(text, ' reach user', CAST(doc_id AS VARCHAR), "
    "'@example.com or +1-555-', "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))"
)
_AUGMENT_SPARK = (
    "concat(text, ' reach user', CAST(doc_id AS STRING), "
    "'@example.com or +1-555-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
)


@query(
    "text_pii_scrub",
    sql="""
    WITH aug AS (SELECT doc_id, {aug} AS text FROM documents),
    s AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT)
                   AS n_phones,
               regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                              '{phone}', '<PHONE>', 'g') AS scrubbed
        FROM aug
    )
    SELECT doc_id, n_emails, n_phones,
           CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
           md5(scrubbed) AS scrubbed_md5
    FROM s
    """.format(aug=_AUGMENT_SQL, email=EMAIL_RE, phone=PHONE_RE),
    tables=("documents",),
    scale_note=(
        "PII redaction (emails + phone numbers, per-type audit "
        "counts): two chained whole-stage-codegen regexp passes, zero "
        "shuffles, row-local — fuses with the feeding scan at 100 TB. "
        "The fixture corpus carries no organic PII, so deterministic "
        "doc_id-derived PII is injected identically on both engines "
        "first; the scrubbed text is asserted by md5, keeping the "
        "checked row narrow. Patterns are chosen to parse identically "
        "under Java regex and RE2 (no lookaround, explicit classes)."
    ),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact injected emails/phones; per-type counts + md5 of result."""
    d = load(spark, sf_dir, "documents").withColumn(
        "text", F.expr(_AUGMENT_SPARK)
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# Contrastive negative sampling: strides through the md5-ordered
# permutation of documents.  Pairwise-coprime-ish fixed offsets; k
# negatives per anchor.
NEG_STRIDES = (37, 101, 257)


@query(
    "sample_negative_pairs",
    sql=f"""
    WITH r AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
                    - 1 AS BIGINT) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM documents
    )
    SELECT a.doc_id,
           s.k,
           b.doc_id AS neg_doc_id
    FROM r a
    CROSS JOIN (VALUES {", ".join(f"({i + 1}, {s})" for i, s in enumerate(NEG_STRIDES))})
         AS s(k, stride)
    JOIN r b ON b.rk = (a.rk + s.stride) % a.n
    WHERE b.doc_id <> a.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Contrastive negatives (training-pair assembly): each anchor "
        "gets 3 pseudo-random negatives at fixed strides through the "
        "md5-ordered permutation — deterministic across runs/layouts "
        "(md5 of the stringified key is byte-equal on both engines), "
        "no RNG state, uniform-in-expectation pairing. The global rank "
        "is computed DISTRIBUTED (16 md5-nibble buckets → bucket-local "
        "row_number + broadcast bucket-count offsets, the "
        "pack_token_budget idiom — no unpartitioned window); the "
        "negative lookup is one rank-keyed self-join shuffle. Strides "
        "wrap modulo n, so every anchor gets exactly 3 negatives "
        "(self-collisions are impossible while n > max stride)."
    ),
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 deterministic contrastive negatives per document via fixed
    strides in the md5 permutation."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    d = d.withColumn(
        "bucket", F.conv(F.substring("h", 1, 1), 16, 10).cast("int")
    )
    in_bucket = Window.partitionBy("bucket").orderBy("h")
    local = d.withColumn("lrk", F.row_number().over(in_bucket))
    sizes = d.groupBy("bucket").agg(F.count("*").alias("bn"))
    over_buckets = Window.orderBy("bucket")
    offsets = sizes.withColumn(
        "boff", F.sum("bn").over(over_buckets) - F.col("bn")
    ).select("bucket", "boff")
    n_total = d.count()  # one scalar (catalog stats at 100 TB)
    ranked = (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            (F.col("boff") + F.col("lrk") - 1).cast("bigint").alias("rk"),
        )
    )
    strides = F.array(*[F.lit(s) for s in NEG_STRIDES])
    anchors = ranked.select(
        "doc_id",
        "rk",
        F.posexplode(strides).alias("k0", "stride"),
    ).select(
        "doc_id",
        ((F.col("rk") + F.col("stride")) % F.lit(n_total)).alias("neg_rk"),
        (F.col("k0") + 1).cast("int").alias("k"),
    )
    negs = ranked.select(
        F.col("rk").alias("neg_rk"), F.col("doc_id").alias("neg_doc_id")
    )
    return (
        anchors.join(negs, "neg_rk")
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select("doc_id", "k", "neg_doc_id")
    )


# --- span-level corpus dedup (round 5) ------------------------------

# A "span" is a 10-token chunk (the fixture corpus has no newlines, so
# chunks play the role lines play in C4/RefinedWeb line-dedup).
SPAN_TOKENS = 10

# A span is corpus-duplicated when it appears in >= this many DISTINCT
# documents.
SPAN_DUP_MIN_DOCS = 2

_SPARK_SPANS = (
    "CASE WHEN size(toks) >= 1 THEN"
    " transform(sequence(1, CAST(ceil(size(toks) / {w}.0) AS INT)),"
    "           j -> concat_ws(' ', slice(toks, (j - 1) * {w} + 1, {w})))"
    " ELSE CAST(array() AS array<string>) END"
).format(w=SPAN_TOKENS)

_DUCK_SPANS = (
    "list_transform(range(1, CAST(ceil(len(toks) / {w}.0) AS BIGINT) + 1),"
    " j -> array_to_string("
    "list_slice(toks, (j - 1) * {w} + 1, (j - 1) * {w} + {w}), ' '))"
).format(w=SPAN_TOKENS)


@query(
    "text_span_dedup",
    sql=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ), c AS (
        SELECT doc_id, {_DUCK_SPANS} AS spans FROM t
    ), s AS (
        SELECT doc_id, u.idx AS idx, spans[u.idx] AS span
        FROM c, UNNEST(range(1, len(spans) + 1)) AS u(idx)
    ), dup AS (
        SELECT span FROM (SELECT DISTINCT doc_id, span FROM s)
        GROUP BY span HAVING COUNT(*) >= {SPAN_DUP_MIN_DOCS}
    )
    SELECT s.doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN dup.span IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           COALESCE(string_agg(
               CASE WHEN dup.span IS NULL THEN s.span END,
               ' ' ORDER BY s.idx), '') AS clean_text
    FROM s LEFT JOIN dup ON s.span = dup.span
    GROUP BY s.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "C4/RefinedWeb-style span (line) dedup as a REWRITE, not just "
        "a score: spans occurring in >= K distinct docs are cut and "
        "the document is reassembled from the survivors in order. "
        "Distinct-doc counting is the boilerplate op's two-phase agg; "
        "the duplicated-span set is Zipf-bounded so it broadcasts, "
        "making the cut itself map-side; reassembly is one doc-keyed "
        "agg (collect_list of (idx, span) survivors -> array_sort -> "
        "concat).  The whole plan shuffles (span) once and (doc_id) "
        "once — both linear in corpus size at 100 TB."
    ),
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove corpus-duplicated 10-token spans from every document and
    emit the cleaned text with per-doc removal accounting."""
    d = load(spark, sf_dir, "documents").withColumn(
        "toks", F.expr(_SPARK_TOKS)
    )
    spans = d.select(
        "doc_id",
        F.posexplode(F.expr(_SPARK_SPANS)).alias("idx", "span"),
    )
    dup = (
        spans.select("doc_id", "span")
        .distinct()
        .groupBy("span")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= SPAN_DUP_MIN_DOCS)
        .select("span", F.lit(1).alias("dup"))
    )
    joined = spans.join(F.broadcast(dup), "span", "left")
    keep = F.when(
        F.col("dup").isNull(), F.struct(F.col("idx"), F.col("span"))
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("dup") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(keep)), lambda x: x["span"]
            ),
        ).alias("clean_text"),
    )


# ---- packing-efficiency eval (round-7 continuation) -------------------
# The eval layer over pack_token_budget (the ann_recall_eval pattern):
# per packed sequence, how full is the budget and how much of the
# LAST doc spills past the boundary (concatenate-then-chunk splits
# it into the next sequence)?  Everything is exact integer arithmetic
# over the packer's own offsets, so the oracle is the same window
# restated — and a fill_rate > 1 row would prove the packer broke.


@query(
    "train_packing_efficiency",
    sql=f"""
    WITH t AS (
        SELECT doc_id, len({_DUCK_TOKS}) AS n_tokens FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_offset
        FROM t
    ),
    p AS (
        SELECT doc_id, n_tokens, start_offset,
               start_offset // {PACK_BUDGET} AS seq_id
        FROM c
    )
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_assigned,
           CAST(greatest(MAX(start_offset + n_tokens)
                         - (seq_id + 1) * {PACK_BUDGET}, 0)
                AS BIGINT) AS spill_tokens,
           CAST(least(MAX(start_offset + n_tokens)
                      - seq_id * {PACK_BUDGET}, {PACK_BUDGET})
                AS DOUBLE) / {PACK_BUDGET}.0 AS fill_rate
    FROM p GROUP BY seq_id
    """,
    tables=("documents",),
    scale_note=(
        "Packing QA: one seq_id-keyed two-phase agg over "
        "pack_token_budget's probed distributed-cumsum output — "
        "integer min/max/sum per sequence, one division per output "
        "row.  Output is sequences-sized (corpus_tokens/budget); "
        "fill_rate <= 1 and spill accounting are the invariants a "
        "packer regression would break first, which is why this is "
        "registered as its own eval key."
    ),
)
def train_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence fill/spill accounting over pack_token_budget's
    assignments (integer-exact packing QA)."""
    p = pack_token_budget(spark, sf_dir)
    end = F.max(F.col("start_offset") + F.col("n_tokens"))
    g = p.groupBy("seq_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens_assigned"),
        F.greatest(
            end - (F.col("seq_id") + 1) * PACK_BUDGET, F.lit(0)
        )
        .cast("bigint")
        .alias("spill_tokens"),
        (
            F.least(
                end - F.col("seq_id") * PACK_BUDGET, F.lit(PACK_BUDGET)
            ).cast("double")
            / F.lit(float(PACK_BUDGET))
        ).alias("fill_rate"),
    )
    return g


# ---- corpus dataset card (round-7 continuation, key #300) --------------
# The one-row datasheet every published training corpus ships: size,
# token volume, language spread, duplicate exposure, and quality-gate
# pass rate — each number the head of a certified pipeline key
# (tokenizer = text_tokenize's, quality rule = text_quality_score's,
# dup grouping = dedup_exact's full-text identity).  All integers
# until three final ratios.


@query(
    "train_dataset_card",
    sql="""
    WITH t AS (
        SELECT doc_id, lang, text, n_chars,
               len(list_filter(string_split(text, ' '), x -> x != ''))
                   AS n_tokens,
               (CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1 ELSE 0 END
                + CASE WHEN CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) / len(string_split(text, ' ')) > 0.2
                       THEN 1 ELSE 0 END
                + CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                                 x -> x IN ('the', 'a')))
                            AS DOUBLE) / len(string_split(text, ' ')) < 0.5
                       THEN 1 ELSE 0 END) AS quality
        FROM documents
    ),
    dup AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
               CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_redundant_docs
        FROM (SELECT text, COUNT(*) AS c FROM documents
              GROUP BY text HAVING COUNT(*) > 1)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT t.lang) AS INT) AS n_langs,
           CAST(SUM(CASE WHEN t.quality >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality_pass,
           dup.n_dup_groups,
           dup.n_redundant_docs,
           CAST(SUM(t.n_tokens) AS DOUBLE) / COUNT(*) AS mean_doc_tokens,
           CAST(SUM(CASE WHEN t.quality >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS quality_pass_rate,
           CAST(dup.n_redundant_docs AS DOUBLE) / COUNT(*)
               AS redundancy_rate
    FROM t CROSS JOIN dup
    GROUP BY dup.n_dup_groups, dup.n_redundant_docs
    """,
    tables=("documents",),
    scale_note=(
        "The corpus datasheet: one documents scan computing tokens "
        "and the quality rule per row (pure codegen), one full-text "
        "identity agg for duplicate exposure (dedup_exact's shuffle "
        "— at 100 TB the md5-of-text key, not the text itself, is "
        "the shuffle key), a 1-row broadcast combine, three exact-"
        "int ratios.  Every number is the head of a certified key "
        "(tokenizer/quality/dup semantics shared by construction), "
        "so the card can never drift from the pipeline it "
        "describes."
    ),
)
def train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet: docs, tokens, langs, quality pass
    rate, duplicate exposure — the numbers a dataset card publishes."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(F.filter(toks, lambda x: x != ""))
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("double")
        / F.size(toks)
    )
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    quality = (
        F.when(F.col("n_chars").between(50, 5000), 1).otherwise(0)
        + F.when(uniq_ratio > 0.2, 1).otherwise(0)
        + F.when(stop_ratio < 0.5, 1).otherwise(0)
    )
    t = d.select(
        "lang", n_tokens.alias("n_tokens"), quality.alias("quality")
    )
    dup = (
        d.groupBy("text")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .agg(
            F.count("*").cast("bigint").alias("n_dup_groups"),
            F.coalesce(F.sum(F.col("c") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_redundant_docs"),
        )
    )
    qpass = F.sum(F.when(F.col("quality") >= 2, 1).otherwise(0))
    card = t.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        qpass.cast("bigint").alias("n_quality_pass"),
    ).crossJoin(F.broadcast(dup))
    return card.select(
        "n_docs",
        "n_tokens",
        "n_langs",
        "n_quality_pass",
        "n_dup_groups",
        "n_redundant_docs",
        (F.col("n_tokens").cast("double") / F.col("n_docs")).alias(
            "mean_doc_tokens"
        ),
        (F.col("n_quality_pass").cast("double") / F.col("n_docs")).alias(
            "quality_pass_rate"
        ),
        (F.col("n_redundant_docs").cast("double") / F.col("n_docs")).alias(
            "redundancy_rate"
        ),
    )
