"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bigdata_twitter_spark``; this module is a
thin projection of its operator registry (one key per implemented
SURVEY.md §2 operator).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    specs = load_all_operators()
    return specs["agg_q1_pricing"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_operators().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; omitted ⇒ rows-only check."""
    return {
        name: spec.sql
        for name, spec in load_all_operators().items()
        if spec.sql is not None
    }
