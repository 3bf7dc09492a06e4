"""Local emulation of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet fixtures, then compares row multisets order-insensitively
with exact value equality (floats compared bitwise, NaN==NaN).  This is
deliberately *stricter* than any plausible driver hash: if we pass
here, value-hash equality follows.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import pickle
from collections import Counter
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from bigdata_twitter_spark.tables import TABLE_NAMES

_MISSING = object()

# Oracle-result disk cache (VERDICT r7 "Next round" #4): the full
# 307-key parity sweep was dominated by a handful of DuckDB oracles
# with unrolled/recursive CTEs (ts_forecast_backtest 119 s,
# graph_khop_reach 87 s at sf0.01).  The fixtures are driver-generated
# and immutable, so the oracle side is a pure function of
# (key, oracle SQL, fixture bytes) — cache its NORMALIZED MULTISET
# (not the DataFrame: pickling the post-norm_cell Counter avoids any
# dtype round-trip hazard that could mask or invent a mismatch).
# Only stable fixture dirs are cached; tmp_path fixtures in tests
# regenerate per run and would only pollute the cache.
# Disable with BDT_ORACLE_CACHE=0.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".parity_cache"
)


# Sibling cache entries younger than this survive eviction — long
# enough to cover any concurrent pytest/parity run's lifetime, short
# enough that superseded revisions still age out the next day.
_EVICT_MIN_AGE_S = 6 * 3600


def _stable_fixture_root() -> str:
    """Root under which fixtures are immutable (⇒ cacheable).

    Derived from SPARK_GRAFT_TEST_SF_DIR's parent when set (ADVICE r8:
    a hardcoded /root/testdata/ silently disabled the cache on any
    other fixture root), defaulting to the driver's testdata tree.
    """
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR")
    if sf:
        return os.path.dirname(os.path.realpath(sf.rstrip("/"))) + "/"
    return "/root/testdata/"


def _cache_enabled(sf_dir: str) -> bool:
    if os.environ.get("BDT_ORACLE_CACHE", "1") == "0":
        return False
    return os.path.realpath(sf_dir).startswith(_stable_fixture_root())


def _fixture_sig(sf_dir: str) -> str:
    parts = []
    for name in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
        except FileNotFoundError:
            parts.append(f"{name}:missing")
    return "|".join(parts)


def _norm_version() -> str:
    """Fingerprint of the normalization code baked into cached values.

    Cached entries embed the behavior of :func:`norm_cell` /
    :func:`to_multiset` at write time (ADVICE r8): if either changes,
    a stale entry would compare fresh-normalized Spark output against
    stale-normalized oracle multisets.  Hashing their source into the
    cache key rolls the cache over automatically on any edit.
    """
    import inspect

    return hashlib.md5(
        (inspect.getsource(norm_cell) + inspect.getsource(to_multiset)).encode()
    ).hexdigest()


def oracle_multiset(sf_dir: str, key: str, sql: str):
    """Oracle result as ``(sorted_cols, n_rows, Counter)``, disk-cached."""
    cache_path = None
    if _cache_enabled(sf_dir):
        h = hashlib.md5(
            f"{key}\x00{sql}\x00{_fixture_sig(sf_dir)}\x00{_norm_version()}".encode()
        ).hexdigest()
        cache_path = os.path.join(_CACHE_DIR, f"{key}.{h}.pkl")
        if os.path.exists(cache_path):
            with open(cache_path, "rb") as fh:
                return pickle.load(fh)
    with duckdb_connect(sf_dir) as con:
        pdf = con.sql(sql).df()
    result = (sorted(pdf.columns), len(pdf), to_multiset(pdf))
    if cache_path is not None:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        # One entry per key: evict siblings from older SQL/fixture/
        # normalization revisions so the cache dir stays bounded
        # (ADVICE r8).  Only entries older than _EVICT_MIN_AGE_S are
        # removed (ADVICE r9): a sibling written seconds ago is likely
        # a CONCURRENT test process on a different revision — deleting
        # it would just thrash both caches (correctness unaffected
        # either way; a miss recomputes from the oracle).
        import glob as _glob
        import time as _time

        for stale in _glob.glob(os.path.join(_CACHE_DIR, f"{key}.*.pkl")):
            if stale == cache_path:
                continue
            try:
                if _time.time() - os.path.getmtime(stale) > _EVICT_MIN_AGE_S:
                    os.remove(stale)
            except OSError:
                pass  # concurrent sweep already removed it
        tmp = f"{cache_path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(result, fh)
        os.replace(tmp, cache_path)
    return result


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
    compare_to_oracle(
        spark_pdf,
        (sorted(oracle_pdf.columns), len(oracle_pdf), to_multiset(oracle_pdf)),
        key,
    )


def compare_to_oracle(spark_pdf: pd.DataFrame, oracle, key: str) -> None:
    oracle_cols, oracle_n, o = oracle
    assert sorted(spark_pdf.columns) == oracle_cols, (
        f"{key}: column sets differ: spark={sorted(spark_pdf.columns)} "
        f"oracle={oracle_cols}"
    )
    assert len(spark_pdf) == oracle_n, (
        f"{key}: row counts differ: spark={len(spark_pdf)} oracle={oracle_n}"
    )
    s = to_multiset(spark_pdf)
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
        compare_to_oracle(spark_pdf, oracle_multiset(sf_dir, key, spec.sql), key)
        return
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    assert len(spark_pdf) >= 0  # rows-only check (driver-weak parity)
