"""Scalar function families (SURVEY.md §2.H): string, date, math,
conditional, array (incl. higher-order), map, JSON.

Reference parity: tweet-text cleaning (lower/replace/regexp), created_at
bucketing, and raw-JSON field extraction are the genre's scalar layer
(SURVEY.md §2.H; reference checkout empty — §0.1).

All functions here are JVM-side built-ins inside whole-stage codegen —
no Python in the hot path. Oracle alignment notes are inline where the
DuckDB dialect differs (day-of-week numbering, list slicing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load, spread


@query(
    "fn_string",
    sql="""
    SELECT doc_id,
           upper(lang) AS lang_uc,
           length(text) AS text_len,
           substring(text, 1, 12) AS prefix,
           replace(substring(text, 1, 40), ' ', '_') AS snake40,
           concat(lang, ':', source) AS lang_source,
           trim(concat(' ', source, ' ')) AS trimmed,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word
    FROM documents
    """,
    tables=("documents",),
    scale_note="Pure codegen string expressions; no UDF, no Python.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String cleaning toolkit (tweet-text normalization analog)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 12).alias("prefix"),
        F.replace(F.substring("text", 1, 40), F.lit(" "), F.lit("_")).alias(
            "snake40"
        ),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.trim(F.concat(F.lit(" "), F.col("source"), F.lit(" "))).alias("trimmed"),
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
    )


@query(
    "fn_date",
    sql="""
    SELECT event_id,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
           CAST(year(ts) AS INT) AS yr,
           CAST(month(ts) AS INT) AS mon,
           CAST(isodow(ts) AS INT) AS dow_iso,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           ts + INTERVAL 1 DAY AS ts_plus_day
    FROM events
    """,
    tables=("events",),
    scale_note="Timestamp bucketing/extraction in codegen; µs-exact epoch.",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction and interval arithmetic on event time.

    Day-of-week numbering differs across engines: Spark ``weekday`` is
    Monday=0, DuckDB ``isodow`` Monday=1 — aligned as weekday+1.
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        F.year("ts").alias("yr"),
        F.month("ts").alias("mon"),
        (F.weekday("ts") + F.lit(1)).cast("int").alias("dow_iso"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day"),
    )


@query(
    "fn_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0) AS abs_dev,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(l_quantity / 2.0, 0) AS half_qty_rounded,
           sqrt(l_quantity) AS qty_sqrt,
           round(ln(l_quantity), 6) AS qty_ln,
           l_quantity * l_quantity AS qty_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem
    """,
    tables=("lineitem",),
    scale_note="Codegen math; sqrt is IEEE-correctly-rounded so engine-stable.",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math toolkit. round() is exercised on exactly-representable halves
    (quantity/2) where HALF_UP and half-away-from-zero agree."""
    l = load(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 30000.0).alias("abs_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.col("l_quantity") / 2.0, 0).alias("half_qty_rounded"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_quantity")), 6).alias("qty_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "fn_conditional",
    sql="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           greatest(o_totalprice, 100000.0) AS floored_price,
           least(o_totalprice, 250000.0) AS capped_price
    FROM orders
    """,
    tables=("orders",),
    scale_note="CASE/COALESCE/NULLIF/GREATEST fold into codegen branches.",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression toolkit."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floored_price"),
        F.least("o_totalprice", F.lit(250000.0)).alias("capped_price"),
    )


@query(
    "fn_array",
    sql="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_uniq,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           len(list_filter(string_split(text, ' '), x -> length(x) > 5))
               AS n_long_tokens,
           array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
               AS first3,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        x -> length(x))) AS BIGINT) AS total_len
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "Higher-order array functions run per-row in codegen — the scalable "
        "alternative to explode+reaggregate when no cross-row state is needed."
    ),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops + higher-order functions over tokenized text (hashtag-array analog)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_len"),
    )


@query(
    "fn_map",
    sql="""
    WITH m AS (
        SELECT event_id,
               MAP {'kind': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m
        FROM events
    )
    SELECT event_id,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_csv,
           m['kind'][1] AS kind_val,
           m['uid'][1] AS uid_val,
           CAST(cardinality(m) AS INT) AS n_keys
    FROM m
    """,
    tables=("events",),
    scale_note="MapType stays columnar (keys/values arrays) in Tungsten rows.",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/extraction, computed as map ops on BOTH engines
    (DuckDB MAP extraction returns a LIST — ``[1]`` unwraps it to the
    scalar, so the oracle exercises construction, key listing,
    extraction, and cardinality rather than restating literals)."""
    e = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("kind"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        m["kind"].alias("kind_val"),
        m["uid"].alias("uid_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "fn_json",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled,
           CAST(json_extract(props, '$.missing') AS INT) AS k_missing
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "get_json_object for single paths; from_json to a declared struct when "
        "multiple fields are needed (parse once, not per path)."
    ),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attr-bag extraction from the props column (raw-tweet-JSON analog)."""
    # Map-only plan over a single-split fixture scan: all three JSON
    # parses per row would run on one core.  Spread the projected scan
    # (guide §2.5; measured 0.77 → 0.36 s best-of-3 at sf0.1) — no-op
    # at real scan widths, and a map-only projection is
    # partitioning-independent.
    e = spread(
        load(spark, sf_dir, "events").select("event_id", "props"),
        sf_dir, "events", "event_id",
    )
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        (parsed["k"] * 2).alias("k_doubled"),
        F.get_json_object("props", "$.missing").cast("int").alias("k_missing"),
    )


@query(
    "fn_struct",
    sql="""
    WITH s AS (
        SELECT doc_id,
               struct_pack(lang := lang, src := source, nc := n_chars) AS st
        FROM documents
    )
    SELECT doc_id,
           st.lang AS lang_val,
           upper(st.src) AS src_up,
           st.nc + 1 AS nc_next,
           to_json(st) AS st_json
    FROM s
    """,
    tables=("documents",),
    scale_note=(
        "StructType stays columnar in Tungsten rows (field access is a "
        "pure projection, no shuffle, codegen end-to-end) — the nested "
        "tweet-object shape (user.*, entities.*) from SURVEY §1.2 "
        "exercised as construction, field access, and JSON "
        "serialization. Both engines build the struct and extract from "
        "it, so the oracle checks the nested round-trip, not restated "
        "literals."
    ),
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, and to_json round-trip over
    documents (nested tweet-object analog)."""
    d = load(spark, sf_dir, "documents")
    st = F.struct(
        F.col("lang").alias("lang"),
        F.col("source").alias("src"),
        F.col("n_chars").alias("nc"),
    )
    return d.select(
        "doc_id",
        st["lang"].alias("lang_val"),
        F.upper(st["src"]).alias("src_up"),
        (st["nc"] + 1).alias("nc_next"),
        F.to_json(st).alias("st_json"),
    )


@query(
    "fn_url",
    sql="""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || lang || '/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang
               || '&len=' || CAST(n_chars AS VARCHAR)
               || '#s' || CAST(doc_id % 10 AS VARCHAR) AS url,
           source || '.example.com' AS host,
           '/docs/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&len=' || CAST(n_chars AS VARCHAR)
               AS query,
           lang AS q_lang,
           CAST(n_chars AS VARCHAR) AS q_len,
           's' || CAST(doc_id % 10 AS VARCHAR) AS fragment
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "parse_url is a JVM-side codegen expression (java.net.URI "
        "under the hood) — URL canonicalization/host extraction over "
        "a 100-TB crawl is a pure map stage with zero shuffle, and "
        "the projection prunes to the three source columns at the "
        "scan. DuckDB has no parse_url, so the oracle CONSTRUCTS the "
        "expected components directly from the base columns, which "
        "makes the check a build→parse round-trip proof rather than "
        "a restatement of the same parser."
    ),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (crawl-pipeline analog): build a URL from
    document fields, then recover host / path / query / named query
    param / fragment with ``parse_url`` — the round trip must land
    exactly on the directly-constructed oracle components."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&len="),
        F.col("n_chars").cast("string"),
        F.lit("#s"),
        (F.col("doc_id") % 10).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url("url", F.lit("QUERY"), F.lit("len")).alias("q_len"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
    )


@query(
    "fn_bitwise",
    sql="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT) AS band,
           CAST(event_id | 4096 AS BIGINT) AS bor,
           CAST(xor(event_id, user_id) AS BIGINT) AS bxor,
           CAST((event_id & 255) << 3 AS BIGINT) AS shl,
           CAST(event_id >> 4 AS BIGINT) AS shr,
           CAST(bit_count(CAST(event_id AS BIGINT)) AS INT) AS nbits,
           CAST(~(event_id & 1023) AS BIGINT) AS bnot
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "Bitwise function family — the primitive layer under every "
        "hash/bitmap operator in the tree (Bloom word tests, SimHash "
        "band extraction, HLL register packing).  Pure codegen map "
        "stage, zero shuffle.  Dialect note: DuckDB's ^ is "
        "exponentiation, so the oracle uses xor(a, b) while Spark "
        "uses the ^ operator — same two's-complement bigint "
        "semantics on both engines, which is exactly what the hash "
        "check proves (incl. sign behavior of ~ and >> on negatives)."
    ),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/XOR/shift/popcount/NOT over event ids (bit-packing
    primitives exercised end-to-end against the oracle)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("event_id & 255").cast("bigint").alias("band"),
        F.expr("event_id | 4096").cast("bigint").alias("bor"),
        F.expr("event_id ^ user_id").cast("bigint").alias("bxor"),
        F.expr("shiftleft(event_id & 255, 3)").cast("bigint").alias("shl"),
        F.expr("shiftright(event_id, 4)").cast("bigint").alias("shr"),
        F.bit_count("event_id").cast("int").alias("nbits"),
        F.expr("~(event_id & 1023)").cast("bigint").alias("bnot"),
    )


@query(
    "fn_variant",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) * 3 AS k_tripled,
           CAST(json_extract(props, '$.missing') AS INT) AS k_missing,
           json_extract(props, '$')::VARCHAR AS props_roundtrip,
           CAST(json_extract(props, '$.k') AS INT) IS NULL AS k_is_null
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "Spark 4 VariantType path for semi-structured attr bags "
        "(SURVEY §1.2's raw-tweet JSON mapping): parse_json once per "
        "row into a binary variant, then variant_get per path — "
        "O(paths) binary probes instead of O(paths) string re-parses "
        "that get_json_object costs.  At 100 TB the variant parse is a "
        "pure codegen map stage (no shuffle); storing the variant "
        "column in parquet amortizes the parse across every downstream "
        "query.  Oracle: DuckDB json_extract casts; both engines "
        "minify the JSON round-trip so the text compare is exact."
    ),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType over the events.props attr bag.

    ``try_parse_json`` (not ``parse_json``) so malformed bags degrade
    to NULL instead of failing a 100-TB scan; ``variant_get`` with a
    typed path does the binary extraction; ``to_json`` round-trips the
    variant for the oracle's minified-JSON compare.
    """
    e = load(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_val"),
        (F.variant_get(v, "$.k", "bigint") * 3).alias("k_tripled"),
        F.variant_get(v, "$.missing", "int").alias("k_missing"),
        F.to_json(v).alias("props_roundtrip"),
        F.variant_get(v, "$.k", "int").isNull().alias("k_is_null"),
    )
