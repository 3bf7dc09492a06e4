"""Inverted-index construction and deny-list scrubbing (SURVEY.md §2.N
extras) — the retrieval-side and the safety-side of a text corpus
pipeline.

``inverted_index`` builds the classic term → (document-frequency,
posting-list head) table; with per-token partial aggregation the
shuffle carries one row per (partition × term), so stopword skew is
absorbed map-side exactly as in trending_topk_terms.

``text_scrub_denylist`` is the shape of every PII / banned-term
redaction pass: one codegen ``regexp_replace`` over the corpus, no
shuffle at all, with per-document hit accounting so the curation run
is auditable.  (Fixture text has no emails/URLs — the deny-list is
drawn from the fixture vocabulary; the operator shape is identical
for real PII patterns.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Redaction targets drawn from the fixture vocabulary (stand-ins for
# PII/banned-term patterns; word-boundary semantics are identical).
DENY_PATTERN = r"\b(dup|slow)\b"
REDACTION = "[X]"
POSTINGS_HEAD = 10

_DUCK_TOKENS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'),"
    " ' '), x -> x <> '')"
)


@query(
    "inverted_index",
    sql=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, t.token AS token
        FROM documents, unnest({_DUCK_TOKENS}) AS t(token)
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(
               list_slice(list(doc_id ORDER BY doc_id), 1, {POSTINGS_HEAD}),
               ',') AS postings_head
    FROM tok
    GROUP BY token
    """,
    tables=("documents",),
    scale_note=(
        "Inverted index: explode → per-doc distinct → one token-keyed "
        "two-phase agg. Map-side combine reduces each partition to "
        "vocab-sized output before the shuffle, so stopword skew never "
        "concentrates; posting lists are emitted as bounded heads "
        "(full postings at 100 TB live partitioned BY term prefix, same "
        "plan + partitionBy at the sink)."
    ),
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term → (document frequency, first-10 sorted posting ids)."""
    d = load(spark, sf_dir, "documents")
    clean = F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(clean, " "), lambda x: x != "")
        ).alias("token"),
    ).distinct()
    postings = F.array_join(
        F.transform(
            F.slice(
                F.sort_array(F.collect_list("doc_id")), 1, POSTINGS_HEAD
            ),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    return toks.groupBy("token").agg(
        F.count("*").alias("df"), postings.alias("postings_head")
    )


@query(
    "text_scrub_denylist",
    sql=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{DENY_PATTERN}'))
                AS BIGINT) AS n_hits,
           regexp_replace(text, '{DENY_PATTERN}', '{REDACTION}', 'g')
               AS scrubbed,
           CAST(length(regexp_replace(text, '{DENY_PATTERN}', '{REDACTION}',
                                      'g')) AS BIGINT) AS scrubbed_len
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "Deny-list redaction: one whole-stage-codegen regexp_replace "
        "pass, zero shuffles, per-document hit counts for audit. The "
        "identical plan handles real PII patterns (emails/phones) — "
        "only the pattern constant changes; at 100 TB this fuses with "
        "whatever scan feeds it (no extra pass over the corpus)."
    ),
)
def text_scrub_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact deny-listed terms; report hits and scrubbed text/length."""
    d = load(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(F.col("text"), DENY_PATTERN, REDACTION)
    return d.select(
        "doc_id",
        # Column-function form: the pattern must NOT pass through the
        # SQL literal parser, which would eat the \b word boundaries.
        F.size(F.regexp_extract_all(F.col("text"), F.lit(DENY_PATTERN)))
        .cast("bigint")
        .alias("n_hits"),
        scrubbed.alias("scrubbed"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )
