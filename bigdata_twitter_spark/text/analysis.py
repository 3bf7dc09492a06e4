"""Text analysis (SURVEY.md §2.K): tokenize, n-grams, TF-IDF,
lexicon sentiment, language stats, plus language-ID, quality scoring,
token counting and fingerprinting for the LLM-pipeline mandate.

Reference parity: the reference genre's sentiment pipeline is
clean → tokenize → features → score → aggregate (SURVEY.md §3.1,
EDBT'16-shaped per PAPERS.md; reference checkout empty — §0.1).
Sentiment here is a lexicon join (broadcast), which keeps a strong SQL
oracle; TF-IDF is pure DataFrame algebra (no MLlib).

Scale posture: every operator is explode → two-phase agg → (broadcast)
join; the only wide shuffles key on token or doc_id.  Token-frequency
skew (stopwords) is the classic hot-key here — partial map-side
aggregation already absorbs it because the pre-shuffle combine reduces
each partition to vocab-sized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

# Deterministic scoring lexicon over the fixture vocabulary (stands in
# for e.g. the AFINN/VADER word lists of the reference genre).
LEXICON: list[tuple[str, int]] = [
    ("fast", 2),
    ("slow", -2),
    ("big", 1),
    ("small", -1),
    ("spark", 2),
    ("dup", -3),
]


def _tokens(col: str = "text") -> F.Column:
    return F.split(F.lower(F.col(col)), " ")


@query(
    "text_tokenize",
    sql="""
    SELECT doc_id,
           len(list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                           x -> x <> '')) AS n_tokens,
           len(list_distinct(list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                                         x -> x <> ''))) AS n_uniq,
           array_to_string(list_slice(list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' '),
                                                  x -> x <> ''), 1, 5), ' ') AS head5
    FROM documents
    """,
    tables=("documents",),
    scale_note="Per-row codegen normalization+tokenization; no shuffle at all.",
)
def text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize (lower, strip non-letters) and tokenize each document."""
    d = load(spark, sf_dir, "documents")
    clean = F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", "")
    toks = F.filter(F.split(clean, " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("head5"),
    )


@query(
    "text_ngrams",
    sql="""
    WITH t AS (SELECT string_split(lower(text), ' ') AS toks FROM documents)
    SELECT bigram, COUNT(*) AS n
    FROM (SELECT unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
          FROM t)
    GROUP BY bigram
    """,
    tables=("documents",),
    scale_note=(
        "Bigrams built per-row with a sequence transform (no positional "
        "self-join); count is a two-phase agg over ~vocab^2 keys."
    ),
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram counts."""
    d = load(spark, sf_dir, "documents").withColumn("toks", _tokens())
    # Guarded for 0/1-token docs: sequence(1, size-1) DESCENDS when
    # size(toks) < 2 and element_at(toks, 0) throws; DuckDB's range()
    # yields empty for the same doc, so emit an empty array to match.
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        "           i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
        " ELSE CAST(array() AS array<string>) END"
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_tf_idf",
    sql="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> ''
           GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df
           FROM (SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
           GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tf_idf
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
    tables=("documents",),
    scale_note=(
        "Pure DataFrame TF-IDF: two aggs + one broadcast join (df table is "
        "vocab-sized) + one broadcast scalar (N). No MLlib, no collect."
    ),
)
def text_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term): tf × ln(N/df), rounded 6dp for ln stability."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # tf is already distinct on (doc_id, term), so document frequency
    # derives from it directly instead of a second distinct() pass over
    # the token explosion (Catalyst prunes the unused tf count from the
    # df branch, so the plans stay independent but equivalent-cost).
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tf_idf"),
        )
    )


@query(
    "text_sentiment_lexicon",
    sql="""
    WITH lex(term, score) AS (VALUES ('fast', 2), ('slow', -2), ('big', 1),
                                     ('small', -1), ('spark', 2), ('dup', -3)),
    toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             FROM documents),
    scored AS (
        SELECT t.doc_id, CAST(SUM(l.score) AS BIGINT) AS score_sum,
               COUNT(*) AS n_scored
        FROM toks t JOIN lex l ON t.term = l.term
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_scored, 0) AS n_scored,
           COALESCE(s.score_sum, 0) AS score_sum,
           CASE WHEN COALESCE(s.n_scored, 0) > 0
                THEN CAST(s.score_sum AS DOUBLE) / s.n_scored
                ELSE 0.0 END AS sentiment
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Lexicon is broadcast (KBs); per-doc aggregation shuffles doc-sized "
        "groups once. This is the reference's sentiment pipeline re-expressed "
        "with an exact integer lexicon (strong oracle, unlike a trained model)."
    ),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average lexicon sentiment per document (token-multiplicity weighted)."""
    d = load(spark, sf_dir, "documents")
    lex = spark.createDataFrame(LEXICON, ["term", "score"])
    toks = d.select("doc_id", F.explode(_tokens()).alias("term"))
    scored = (
        toks.join(F.broadcast(lex), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("score").cast("long").alias("score_sum"),
            F.count("*").alias("n_scored"),
        )
    )
    return d.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
        F.coalesce("score_sum", F.lit(0)).alias("score_sum"),
        F.when(
            F.coalesce("n_scored", F.lit(0)) > 0,
            F.col("score_sum").cast("double") / F.col("n_scored"),
        )
        .otherwise(0.0)
        .alias("sentiment"),
    )


@query(
    "text_lang_stats",
    sql="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tables=("documents",),
    scale_note="5-group agg; the lang filter analog of the reference's lang=='en'.",
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document count and size stats per language."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_quality_score",
    sql="""
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a')))
                AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS uniq_ratio,
           (CASE WHEN n_chars BETWEEN 50 AND 5000 THEN 1 ELSE 0 END
            + CASE WHEN CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')) > 0.2 THEN 1 ELSE 0 END
            + CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                             x -> x IN ('the', 'a'))) AS DOUBLE)
                        / len(string_split(text, ' ')) < 0.5 THEN 1 ELSE 0 END)
               AS quality
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "LLM-pretraining quality heuristics (length / stopword ratio / "
        "lexical diversity) as pure per-row codegen — the shape of a C4/Gopher "
        "quality filter, zero shuffles."
    ),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality scoring for training-data curation."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.isin("the", "a"))).cast("double")
        / n_tokens
    )
    uniq_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    quality = (
        F.when(F.col("n_chars").between(50, 5000), 1).otherwise(0)
        + F.when(uniq_ratio > 0.2, 1).otherwise(0)
        + F.when(stop_ratio < 0.5, 1).otherwise(0)
    )
    return d.select(
        "doc_id",
        "n_chars",
        n_tokens.alias("n_tokens"),
        (F.col("n_chars").cast("double") / n_tokens).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        quality.cast("int").alias("quality"),
    )


@query(
    "text_lang_id",
    sql="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(lower(text), ' '),
                               x -> x IN ('the', 'a'))) AS en_markers,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN CAST(en_markers AS DOUBLE) / n_tokens >= 0.05
                THEN 'en' ELSE 'other' END AS lang_pred,
           CAST(en_markers AS DOUBLE) / n_tokens AS marker_ratio
    FROM scored
    """,
    tables=("documents",),
    scale_note=(
        "N-gram/markers language-ID heuristic per row (the fixture corpus "
        "shares one vocabulary, so markers are illustrative); a real fastText "
        "LID would ride the same mapInPandas plumbing as multimodal_decode."
    ),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language identification heuristic."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    markers = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    ratio = markers.cast("double") / F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        "lang",
        F.when(ratio >= 0.05, "en").otherwise("other").alias("lang_pred"),
        ratio.alias("marker_ratio"),
    )


@query(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(lower(text)) AS full_hash,
           md5(array_to_string(list_slice(string_split(lower(text), ' '), 1, 8), ' '))
               AS prefix_hash,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "Content fingerprints (full + prefix) per row; the join key for "
        "exact dedup and incremental re-crawl diffing."
    ),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints (full-text and 8-token prefix)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("full_hash"),
        F.md5(F.array_join(F.slice(toks, 1, 8), " ")).alias("prefix_hash"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


# GPT-2-style pre-tokenizer shape, ASCII-simplified so Java regex
# (Spark) and RE2 (DuckDB) agree byte-for-byte: letter runs, digit
# runs, single non-alphanumeric marks. Whitespace separates, never
# counts.  Deliberately passed through the column API (F.lit), not an
# SQL literal, so backslash classes survive both engines' escaping.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@query(
    "text_token_count_bpe",
    sql=r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
               AS n_bpe_tokens,
           len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
               AS n_ws_tokens,
           round(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS DOUBLE)
                 / greatest(len(list_filter(string_split(lower(text), ' '), x -> x <> '')), 1), 6)
               AS bpe_per_word
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "Per-row regex token counting (the LLM-pipeline budget/pricing "
        "column): pure codegen, no shuffle; the BPE-ish rate per "
        "whitespace word is the standard tokens-per-word cost estimate."
    ),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish regex token counts per document."""
    d = load(spark, sf_dir, "documents")
    bpe = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_ISH_PATTERN), F.lit(0))
    )
    ws = F.size(F.filter(_tokens(), lambda x: x != ""))
    return d.select(
        "doc_id",
        bpe.cast("long").alias("n_bpe_tokens"),
        ws.cast("long").alias("n_ws_tokens"),
        F.round(
            bpe.cast("double") / F.greatest(ws, F.lit(1)).cast("double"), 6
        ).alias("bpe_per_word"),
    )


KEYWORDS_TOPK = 3


@query(
    "text_keywords_topk",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> ''
           GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df
           FROM (SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
           GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                   AS tf_idf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, tf_idf,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf_idf DESC, term ASC)
                AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tf_idf DESC, term ASC)
            <= {KEYWORDS_TOPK}
    """,
    tables=("documents",),
    scale_note=(
        "Per-document keyword extraction: text_tf_idf's plan (two aggs "
        "+ broadcast vocab join) plus ONE doc-keyed rank window — "
        "ranking on the 6dp-ROUNDED score with a term tiebreak keeps "
        "the cut deterministic on both engines. Tagging every doc with "
        "its top terms is the per-item twin of corpus-level trending."
    ),
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (deterministic tiebreak)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_tokens()).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tf_idf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf_idf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= KEYWORDS_TOPK)
    )


RARE_BIGRAM_MIN_COUNT = 2


@query(
    "text_bigram_familiarity",
    sql=f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bigram
        FROM t
    ),
    counts AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN counts.n < {RARE_BIGRAM_MIN_COUNT}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare,
           CAST(SUM(CASE WHEN counts.n < {RARE_BIGRAM_MIN_COUNT}
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS rare_frac
    FROM bg JOIN counts USING (bigram)
    GROUP BY bg.doc_id
    """,
    tables=("documents",),
    scale_note=(
        "Corpus-LM fluency proxy (the n-gram cousin of perplexity "
        "filtering): score each doc by the fraction of its bigrams that "
        "are RARE corpus-wide — gibberish and boilerplate-mangled text "
        "scores high, fluent text low. Shapes: per-row bigram transform "
        "(no positional self-join), a vocab²-keyed two-phase count agg, "
        "one broadcast-joinable count table, one doc-keyed agg. All "
        "integer counts until a single final division, so the score is "
        "order-independent and engine-exact — no ln(), no float "
        "accumulation."
    ),
)
def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rare-bigram fraction against corpus bigram counts
    (docs with <2 tokens have no bigrams and drop out, same as oracle)."""
    d = load(spark, sf_dir, "documents").withColumn("toks", _tokens())
    bigrams = F.expr(
        "CASE WHEN size(toks) >= 2 THEN"
        " transform(sequence(1, size(toks) - 1),"
        "           i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
        " ELSE CAST(array() AS array<string>) END"
    )
    bg = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = bg.groupBy("bigram").agg(F.count("*").alias("n"))
    rare = F.when(F.col("n") < RARE_BIGRAM_MIN_COUNT, 1).otherwise(0)
    return (
        bg.join(F.broadcast(counts), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(rare).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_rare",
            (F.col("n_rare").cast("double") / F.col("n_bigrams")).alias(
                "rare_frac"
            ),
        )
    )


@query(
    "text_lang_id_eval",
    sql="""
    WITH scored AS (
        SELECT lang = 'en' AS label_en,
               CAST(len(list_filter(string_split(lower(text), ' '),
                                    x -> x IN ('the', 'a'))) AS DOUBLE)
               / len(string_split(text, ' ')) >= 0.05 AS pred_en
        FROM documents
    ),
    conf AS (
        SELECT label_en, pred_en, COUNT(*) AS n
        FROM scored GROUP BY label_en, pred_en
    )
    SELECT label_en, pred_en, CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
                 / (SELECT SUM(n) FROM conf), 6) AS share
    FROM conf
    """,
    tables=("documents",),
    scale_note=(
        "Classifier evaluation as an operator (the ann_recall_eval "
        "pattern for the text side): confusion matrix of the marker "
        "lang-id heuristic against the corpus's labeled lang column.  "
        "One map-side scoring pass + a two-phase count agg over ≤4 "
        "cells + a 1-row broadcast total — output size is constant at "
        "any corpus scale, so the quality gate a curation pipeline "
        "runs before trusting a filter costs one scan."
    ),
)
def text_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (counts + corpus shares) of the heuristic
    lang-id against the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    markers = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    ratio = markers.cast("double") / F.size(F.split(F.col("text"), " "))
    conf = (
        d.select(
            (F.col("lang") == "en").alias("label_en"),
            (ratio >= 0.05).alias("pred_en"),
        )
        .groupBy("label_en", "pred_en")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    total = conf.agg(F.sum("n").alias("tot"))
    return conf.join(F.broadcast(total)).select(
        "label_en",
        "pred_en",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
    )
