"""Stateful streaming under both state-store providers.

The VERDICT-r2 gap: streaming ops documented the RocksDB posture but
every local run used Spark's default (HDFS-backed, in-heap) store.
This pins the conf wiring end-to-end: ``stream_stateful_running`` (an
``applyInPandasWithState`` operator — real per-key GroupState) must
produce oracle-identical results under BOTH providers, proving state
semantics don't depend on the backend and the RocksDB provider actually
loads in this Spark build.
"""

from __future__ import annotations

import os

import pytest

from bigdata_twitter_spark.registry import load_all_operators
from bigdata_twitter_spark.streaming.ops import (
    STATE_STORE_PROVIDERS,
    apply_state_store_conf,
)

from .parity import check_query

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def _restore_provider(spark):
    before = os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    yield
    if before is None:
        os.environ.pop("SPARK_GRAFT_STATE_STORE", None)
    else:
        os.environ["SPARK_GRAFT_STATE_STORE"] = before
    spark.conf.unset(PROVIDER_CONF)


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_stateful_running_under_provider(spark, sf_dir, provider, _restore_provider):
    load_all_operators()
    os.environ["SPARK_GRAFT_STATE_STORE"] = provider
    # check_query triggers _stream_events → apply_state_store_conf,
    # which must route the conf through; assert the wiring explicitly.
    check_query(spark, sf_dir, "stream_stateful_running")
    assert spark.conf.get(PROVIDER_CONF) == STATE_STORE_PROVIDERS[provider]


def test_env_unset_keeps_spark_default(spark, _restore_provider):
    spark.conf.unset(PROVIDER_CONF)
    apply_state_store_conf(spark)
    assert spark.conf.get(PROVIDER_CONF, None) in (
        None,
        STATE_STORE_PROVIDERS["hdfs"],  # Spark's own default
    )
