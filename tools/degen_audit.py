#!/usr/bin/env python
"""Degenerate-domain crash audit (round 10).

The hill_alpha ANSI ``DIVIDE_BY_ZERO`` (found by the r10 ×100 probe:
an all-ties tail) is a CLASS, not a one-off: any operator that divides
by a variance / range / weight-total / vector-norm crashes the whole
job at runtime on a constant domain instead of returning NULL — and a
constant domain is exactly what a partition-pruned slice of a 100-TB
corpus (one price-capped product, one fixed-bid campaign) looks like.

This tool builds TWO boundary fixtures from sf0.001 and executes
every BATCH registry key against each; any exception is a finding
and the tool exits non-zero:

1. CONSTANT domain — every double column the same constant, every
   document the same text, every embedding the same vector.  First
   sweep found 10 crashers (agg_stats, agg_histogram,
   embed_quantize_int8, agg_regression_per_group,
   agg_covariance_matrix, agg_mann_whitney_u, agg_welch_ttest,
   agg_spearman_rank_corr, sample_stratified_neyman,
   embed_pca_power_exact).
2. ONE ROW per table — the other boundary next to the empty-inputs
   suite: n = 1 zeroes every Bessel (n-1) denominator and empties
   derived structures.  First sweep found 10 more (agg_stats again,
   win_ntile_pctrank_dist, graph_pagerank, sort_range_boundaries,
   ts_anomaly_zscore, text_burstiness_dispersion,
   scan_partition_evolution, ts_changepoint_cusum,
   ts_anova_hour_of_day, agg_mann_whitney_u again).

All fixed with NULL-on-degenerate (or defined-fallback) guards
mirrored in their DuckDB oracles; tests/test_degenerate_domain.py
keeps them crash-free in CI.

Usage: ``python tools/degen_audit.py [src_sf_dir]``.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402
from bigdata_twitter_spark.tables import TABLE_NAMES, load  # noqa: E402

OUT = "/tmp/bdt_degen_sf"
ONEROW_OUT = "/tmp/bdt_onerow_sf"
SKIP_PREFIXES = ("stream_", "source_stream", "sink_stream")


def build_degen_fixture(spark, src: str, out: str = OUT) -> str:
    """Constant-domain copy of every table: doubles → 42.0, text →
    one shared sentence, embeddings → one shared vector; keys, ints,
    strings and timestamps keep their real values so joins and
    calendar logic stay live."""
    os.makedirs(out, exist_ok=True)
    for name in TABLE_NAMES:
        df = load(spark, src, name)
        for f in df.schema.fields:
            if isinstance(f.dataType, T.DoubleType):
                df = df.withColumn(f.name, F.lit(42.0))
            elif isinstance(f.dataType, T.FloatType):
                df = df.withColumn(f.name, F.lit(42.0).cast("float"))
            elif f.name == "text":
                df = df.withColumn(
                    f.name,
                    F.lit("the very same text in every document row"),
                )
            elif f.name == "embedding" and isinstance(
                f.dataType, T.ArrayType
            ):
                et = f.dataType.elementType.simpleString()
                df = df.withColumn(
                    f.name,
                    F.transform(f.name, lambda _: F.lit(0.5).cast(et)),
                )
        df.write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


def build_onerow_fixture(spark, src: str, out: str = ONEROW_OUT) -> str:
    """One row per table — the n=1 boundary next to the empty-inputs
    suite's n=0."""
    os.makedirs(out, exist_ok=True)
    for name in TABLE_NAMES:
        load(spark, src, name).limit(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    return out


def sweep(spark, specs, fixture: str, tag: str) -> list:
    fails = []
    for key, spec in specs.items():
        if key.startswith(SKIP_PREFIXES):
            continue
        try:
            spec.fn(spark, fixture).collect()
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            fails.append((key, type(e).__name__, msg))
            print(f"{tag}_FAIL {key}: {type(e).__name__}: {msg}", flush=True)
    return fails


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(
        app_name="bdt-degen-audit", master="local[8]", shuffle_partitions=8
    )
    specs = load_all_operators()
    n_keys = sum(1 for k in specs if not k.startswith(SKIP_PREFIXES))
    const_fails = sweep(
        spark, specs, build_degen_fixture(spark, src), "DEGEN"
    )
    onerow_fails = sweep(
        spark, specs, build_onerow_fixture(spark, src), "ONEROW"
    )
    print(
        f"SUMMARY keys_audited={n_keys} degen_fails={len(const_fails)} "
        f"onerow_fails={len(onerow_fails)}"
    )
    spark.stop()
    sys.exit(1 if const_fails or onerow_fails else 0)


if __name__ == "__main__":
    main()
