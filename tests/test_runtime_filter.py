"""Runtime bloom-filter injection (Spark's InjectRuntimeFilter rule).

At 100 TB the fact-side scan of a selective dim⋈fact shuffle join is
the dominant cost; Spark can derive a bloom filter from the filtered
creation side and push `might_contain` onto the fact scan, skipping
rows (and with parquet, row groups) that cannot join.  The fixtures sit
below the default size thresholds, so this pins the *capability* with
thresholds tuned down: the rule fires, the plan carries
bloom_filter_agg + might_contain, and results are unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_twitter_spark.tables import load

TUNED = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
}


@pytest.fixture()
def tuned_confs(spark):
    before = {k: spark.conf.get(k, None) for k in TUNED}
    for k, v in TUNED.items():
        spark.conf.set(k, v)
    yield
    for k, v in before.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _joined(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir, tuned_confs):
    df = _joined(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan, "runtime filter rule did not fire"
    assert "might_contain" in plan, "fact side not pruned by bloom filter"
    with_bloom = {(r["o_orderstatus"], r["n"]) for r in df.collect()}

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    plain = _joined(spark, sf_dir)
    assert "might_contain" not in plain._jdf.queryExecution().optimizedPlan().toString()
    assert with_bloom == {(r["o_orderstatus"], r["n"]) for r in plain.collect()}
