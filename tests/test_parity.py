"""Every registered operator vs its DuckDB oracle (driver-gate mirror)."""

from __future__ import annotations

import pytest

from bigdata_twitter_spark.registry import load_all_operators

from .parity import check_query

ALL_KEYS = sorted(load_all_operators().keys())


@pytest.mark.parametrize("key", ALL_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    check_query(spark, sf_dir, key)
