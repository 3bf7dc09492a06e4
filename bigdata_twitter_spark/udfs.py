"""UDF / UDAF / UDTF surface (SURVEY.md §2.M).

Reference parity: the genre computes sentiment and text features in
row-at-a-time Python (SURVEY.md §2.M; reference checkout empty — §0.1).
This engine keeps Python OFF the hot path: the row-at-a-time UDF exists
to demonstrate the escape hatch (and its cost), the pandas variants are
the sanctioned Python seams (Arrow-batched, 10-100x faster), and every
UDF here mirrors SQL-expressible logic so the oracle stays strong.

Numeric stability: the grouped UDAF accumulates in exact
``decimal.Decimal`` (via the shortest-repr string of each float, which
recovers the intended 2dp values) and converts to double only at the
final division — reproducing bit-for-bit what the DECIMAL-cast oracle
SQL computes, independent of pandas partition/group order.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType

from .registry import query
from .tables import load


def _quality_score_py(n_chars: int) -> float:
    return (n_chars % 97) / 97.0


@query(
    "udf_python_scalar",
    sql="""
    SELECT doc_id, n_chars,
           (n_chars % 97) / CAST(97 AS DOUBLE) AS py_score
    FROM documents
    """,
    tables=("documents",),
    scale_note=(
        "Row-at-a-time Python UDF: one Python round-trip PER ROW — the slow "
        "path, kept only as the API-compat escape hatch. The pandas variants "
        "below are the sanctioned form."
    ),
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (exact integer arithmetic → strong oracle)."""
    d = load(spark, sf_dir, "documents")
    score = udf(_quality_score_py, returnType=DoubleType())
    return d.select("doc_id", "n_chars", score("n_chars").alias("py_score"))


def _adjusted_value(value: pd.Series, user_mod: pd.Series) -> pd.Series:
    # Vectorized: identical IEEE ops to the SQL `value * 1.1 + (user_id % 7)`.
    return value * 1.1 + user_mod


@query(
    "udf_pandas_vectorized",
    sql="""
    SELECT event_id, value,
           value * 1.1 + (user_id % 7) AS adjusted
    FROM events
    """,
    tables=("events",),
    scale_note=(
        "Arrow-batched scalar pandas UDF: columnar transfer, numpy-vectorized "
        "body — the correct shape for unavoidable Python math."
    ),
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF computing an adjusted value."""
    e = load(spark, sf_dir, "events")
    adjusted = pandas_udf(_adjusted_value, returnType=DoubleType())
    return e.select(
        "event_id",
        "value",
        adjusted(F.col("value"), (F.col("user_id") % 7).cast("double")).alias(
            "adjusted"
        ),
    )


def _weighted_mean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact decimal accumulation: str(float) is the shortest repr, which
    # for the 2dp fixture values recovers the intended decimal exactly —
    # so the sums equal the oracle's DECIMAL sums bit-for-bit.
    wsum = sum(
        (Decimal(str(p)) * Decimal(str(q))
         for p, q in zip(pdf["l_extendedprice"], pdf["l_quantity"])),
        Decimal(0),
    )
    qsum = sum((Decimal(str(q)) for q in pdf["l_quantity"]), Decimal(0))
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "weighted_mean_price": [float(wsum) / float(qsum)],
            "n": [len(pdf)],
        }
    )


@query(
    "udaf_grouped_agg",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
               AS weighted_mean_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tables=("lineitem",),
    scale_note=(
        "applyInPandas grouped UDAF: one shuffle on the group key, whole "
        "group per Arrow batch. Groups must fit executor memory — fine for "
        "bounded keys; use salted two-stage aggregation for giant groups."
    ),
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom weighted mean via applyInPandas with exact decimal accumulation."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").applyInPandas(
        _weighted_mean_group,
        schema="l_returnflag string, weighted_mean_price double, n long",
    )


@query(
    "udtf_table_fn",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    e AS (SELECT doc_id, toks,
                 unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS c
          FROM t)
    SELECT doc_id,
           CAST(c AS INT) AS chunk_no,
           array_to_string(list_slice(toks, 10 * c + 1, 10 * c + 10), ' ')
               AS chunk_text,
           CAST(len(list_slice(toks, 10 * c + 1, 10 * c + 10)) AS INT)
               AS chunk_len
    FROM e
    """,
    tables=("documents",),
    scale_note=(
        "Python UDTF (Spark 4 @udtf) exploding docs into fixed-size token "
        "chunks — the LLM-context chunking primitive; runs per-row in the "
        "Python worker with no cross-row state."
    ),
)
def udtf_table_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF chunking each document into 10-token windows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_no int, chunk_text string, chunk_len int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str):  # noqa: ANN202
            toks = text.split(" ")
            for i in range(0, len(toks), 10):
                chunk = toks[i : i + 10]
                yield doc_id, i // 10, " ".join(chunk), len(chunk)

    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("documents_for_udtf")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM documents_for_udtf d, "
        "LATERAL chunk_doc(d.doc_id, d.text) c"
    )
