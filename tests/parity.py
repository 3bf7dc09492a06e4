"""Local emulation of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row multisets order-insensitively
with exact value equality (floats compared bitwise, NaN==NaN).  This is
deliberately *stricter* than any plausible driver hash: if we pass
here, value-hash equality follows.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from bigdata_twitter_spark.tables import TABLE_NAMES

_MISSING = object()


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def norm_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return ("nan",) if math.isnan(f) else f
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("date", v.isoformat())
    if isinstance(v, bytes):
        return ("bytes", v)
    return v


def to_multiset(pdf: pd.DataFrame) -> Counter:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = Counter()
    for row in pdf.itertuples(index=False, name=None):
        rows[tuple(norm_cell(v) for v in row)] += 1
    return rows


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{key}: column sets differ: spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: row counts differ: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s, o = to_multiset(spark_pdf), to_multiset(oracle_pdf)
    if s != o:
        only_s = list((s - o).items())[:5]
        only_o = list((o - s).items())[:5]
        raise AssertionError(
            f"{key}: value mismatch (cols={sorted(spark_pdf.columns)})\n"
            f"  spark-only rows (≤5): {only_s}\n"
            f"  oracle-only rows (≤5): {only_o}"
        )


def _oracle_valid_at_scale(spark, sf_dir: str, key: str) -> bool:
    """Some oracles are exact only in a declared input regime; outside
    it the hash compare would test the oracle's precondition, not the
    operator.  dedup_embedding's all-pairs oracle is exact only while
    the operator dispatches to the exact miner (n ≤ EXACT_PAIRS_MAX
    embeddings); above that the probabilistic LSH path runs and sf0.1+
    is bench-only for this key (ADVICE r4)."""
    if key == "dedup_embedding":
        from bigdata_twitter_spark.llm.embdedup import EXACT_PAIRS_MAX
        from bigdata_twitter_spark.tables import load

        return load(spark, sf_dir, "embeddings").count() <= EXACT_PAIRS_MAX
    return True


def check_query(spark, sf_dir: str, key: str) -> None:
    from bigdata_twitter_spark.registry import REGISTRY

    spec = REGISTRY[key]
    sdf = spec.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if spec.sql is None or not _oracle_valid_at_scale(spark, sf_dir, key):
        assert len(spark_pdf) >= 0  # rows-only check (driver-weak parity)
        return
    with duckdb_connect(sf_dir) as con:
        oracle_pdf = con.sql(spec.sql).df()
    compare_frames(spark_pdf, oracle_pdf, key)
