"""Pretraining-corpus quality filters (SURVEY.md §2.N, round 4):
Gopher-style rule composites, within-document repetition signals, and
corpus-LM perplexity scoring — the standard public filtering recipes
(Gopher, Rae et al. 2021 arXiv:2112.11446 §A1.1; CCNet, Wenzek et al.
2019 arXiv:1911.00359) re-expressed as pure DataFrame plans.

All three are oracle-checkable: rules are per-row codegen, repetition
is a (doc, gram) aggregate, and perplexity is a two-phase aggregate
plus a broadcast-sized vocabulary join.  Double accumulations round to
6dp on both engines (SURVEY.md §1.4 landmine 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Gopher-style bounds, scaled to the fixture corpus (docs are 10-99
# whitespace tokens over a ~31-token vocabulary; SURVEY.md §1.3).  The
# *shape* of the rules is the published recipe; the constants are
# corpus-calibrated the way any deployment recalibrates them.
MIN_WORDS = 20
MAX_WORDS = 80
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 8.0
MIN_DISTINCT_RATIO = 0.25  # Gopher's duplicate-content proxy
STOPWORDS = ("the", "a")  # presence-of-stopwords rule ("the"/"a"/...)


@query(
    "text_gopher_quality",
    sql=f"""
    WITH t AS (
        SELECT doc_id, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ), m AS (
        SELECT doc_id, lang,
               CAST(len(toks) AS BIGINT) AS n_words,
               round(CAST(len(array_to_string(toks, '')) AS DOUBLE)
                     / greatest(len(toks), 1), 6) AS mean_word_len,
               round(CAST(len(list_distinct(toks)) AS DOUBLE)
                     / greatest(len(toks), 1), 6) AS distinct_ratio,
               CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r}))
                    AS BIGINT) AS stopword_hits
        FROM t
    )
    SELECT doc_id, lang, n_words, mean_word_len, distinct_ratio,
           stopword_hits,
           (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
            AND mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}
            AND distinct_ratio >= {MIN_DISTINCT_RATIO}
            AND stopword_hits >= 1) AS keep
    FROM m
    """,
    tables=("documents",),
    scale_note=(
        "Gopher-rule quality gate: every signal (word count, mean word "
        "length, distinct-token ratio, stopword presence) is a per-row "
        "higher-order-function expression — zero shuffle, whole-stage "
        "codegen, filter-pushdown-friendly. At 100 TB this runs as a "
        "map-only pass fused into the scan; the boolean keep column "
        "feeds the downstream corpus filter without a second read."
    ),
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules per document: token stats + keep flag."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n_words = F.size(toks).cast("bigint")
    mean_len = F.round(
        F.length(F.array_join(toks, "")).cast("double")
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    distinct_ratio = F.round(
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(F.size(toks), F.lit(1)),
        6,
    )
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    ).cast("bigint")
    m = d.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        distinct_ratio.alias("distinct_ratio"),
        stop_hits.alias("stopword_hits"),
    )
    keep = (
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & F.col("mean_word_len").between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        & (F.col("stopword_hits") >= 1)
    )
    return m.withColumn("keep", keep)


@query(
    "text_repetition_stats",
    sql="""
    WITH g AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1])) AS gram
        FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ), c AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY doc_id, gram
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(cnt - 1) AS DOUBLE) / SUM(cnt), 6)
               AS dup_bigram_frac,
           round(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6)
               AS top_bigram_frac
    FROM c GROUP BY doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Gopher repetition signals (duplicate-bigram and top-bigram "
        "fractions): explode bigrams, ONE (doc_id, gram) partial-agg "
        "shuffle, then a map-side doc_id re-agg (same key prefix, "
        "Catalyst keeps it in the same exchange). Shuffle volume is "
        "bounded by tokens-per-doc x docs — linear in corpus size, no "
        "cross-document joins. High-dup docs are the boilerplate/spam "
        "cut every pretraining pipeline applies first."
    ),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate/top bigram fractions (repetition cut)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = d.filter(F.size(toks) >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
                " (t, i) -> concat(t, ' ', split(text, ' ')[i + 1]))"
            )
        ).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("cnt") - 1).cast("double") / F.sum("cnt"), 6
        ).alias("dup_bigram_frac"),
        F.round(F.max("cnt").cast("double") / F.sum("cnt"), 6).alias(
            "top_bigram_frac"
        ),
    )


@query(
    "text_perplexity_unigram",
    sql="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ), cnt AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM cnt
    ), lp AS (
        SELECT t, round(-ln(CAST(c + 1 AS DOUBLE) / (n + v)), 8) AS nll
        FROM cnt, tot
    )
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(AVG(nll), 6) AS avg_nll
    FROM tok JOIN lp USING (t)
    GROUP BY tok.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "CCNet-style LM scoring with the corpus's own unigram model "
        "(add-one smoothing): phase 1 is a token-count aggregate whose "
        "output is VOCABULARY-sized (KBs even at 100 TB), phase 2 "
        "broadcast-joins that tiny model back onto the exploded tokens "
        "— so the only full-data shuffle is the per-doc re-agg. "
        "Per-token NLL is rounded to 8dp before the per-doc mean "
        "(rounded 6dp) so both engines' fold orders agree."
    ),
)
def text_perplexity_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus
    unigram model (add-one smoothed) — the standard LM quality score."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
    cnt = tok.groupBy("t").agg(F.count("*").cast("bigint").alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("v"),
    )
    lp = cnt.join(F.broadcast(tot)).select(
        "t",
        F.round(
            -F.log((F.col("c") + 1).cast("double") / (F.col("n") + F.col("v"))),
            8,
        ).alias("nll"),
    )
    return (
        tok.join(F.broadcast(lp), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_nll"),
        )
    )
