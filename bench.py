#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line for the driver.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.  Each query is materialized via the noop
sink (full execution, no driver-side result transfer).  One warmup of
the flagship query first so JVM/codegen startup is not charged to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402

# Headline set: one representative per operator family; grows as the
# registry grows.  Keys absent from the registry are skipped so bench
# never breaks mid-build.
HEADLINE = [
    "agg_q1_pricing",
    "join_star_3way",
    "join_broadcast",
    "win_rank_topk_per_group",
    "ts_tumbling_counts",
    "ts_sessionize_batch",
    "trending_topk_terms",
    "text_tf_idf",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "agg_pivot",
    "agg_stats",
    "join_asof",
    "fn_json",
]

# Streaming keys (added r4 per VERDICT r3 #7): each runs a real
# Structured Streaming query (availableNow file replay + sink
# read-back), so streaming regressions become visible round-over-round.
# Timed ONCE each (microbatch + checkpoint machinery dominates; there
# is no plan-vs-noise ambiguity to median away) and reported under
# separate keys so ``value`` stays comparable with the r01–r03
# batch-only bar.
HEADLINE_STREAMING = [
    "stream_tumbling_agg",
    "stream_stream_join",
    "stream_topk_per_window",
]

# LLM-pipeline keys (added r4): the bucketed-LSH / semantic-dedup /
# curation-composite family got its scale machinery rewritten this
# round (bucket-local Arrow verification); timing them under separate
# JSON keys makes regressions in that family visible without touching
# the batch total's comparability with the r01-r03 bar.  Best-of-3
# since r8 (was single-run): the r7 driver capture read 25.0 s where
# the builder's quiet-host best-of-5 read 17.8 s on byte-identical
# code — a single sample on this noisy host measures hypervisor
# weather, not the plan (VERDICT r7 "Next round" #3).  ``value_llm``
# is the sum of per-query minima — a DOWNWARD-BIASED estimator vs the
# r4-r7 single-run values (ADVICE r8: part of any r7→r8 delta in
# ``value_llm`` is methodology, not the plan).  Cross-round
# comparisons from r8 on should use ``value_llm_median_of_3``.
HEADLINE_LLM = [
    "sim_pairs_bucketed",
    "dedup_embedding",
    "dedup_semantic_cluster",
    "train_pipeline_e2e",
]

# TPC-H analog power run (added r11 when wave 2 completed the
# 20-query suite): every TPC-H-shaped key, timed under its own JSON
# section so the suite total is a recognizable cross-engine yardstick
# without disturbing ``value``'s comparability with the r01 bar.
# q1 also appears in HEADLINE; here it is re-timed inside the suite
# so ``value_tpch`` is self-contained.
HEADLINE_TPCH = [
    "agg_q1_pricing",
    "agg_q2_min_cost_supplier",
    "agg_q3_shipping",
    "agg_q4_late_shipments",
    "agg_q5_local_supplier",
    "agg_q6_forecast_revenue",
    "agg_q7_nation_volume",
    "agg_q8_market_share",
    "agg_q9_product_profit",
    "agg_q10_returned_topk",
    "agg_q11_important_parts",
    "agg_q12_priority_class",
    "agg_q13_custdist",
    "agg_q14_promo_share",
    "agg_q15_top_supplier",
    "agg_q16_supplier_cnt",
    "agg_q17_small_qty_revenue",
    "agg_q18_large_orders",
    "agg_q19_disjunctive_revenue",
    "agg_q20_excess_suppliers",
    "agg_q21_waiting_supplier",
    "agg_q22_dormant_customers",
]


def materialize(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_session(app_name="bdt-bench")
    specs = load_all_operators()
    keys = [k for k in HEADLINE if k in specs]

    # Warmup: JVM + codegen + parquet footer caches.
    materialize(specs[keys[0]].fn(spark, sf_dir))

    # Three runs per query: this sandbox shares a host and single runs
    # swing up to 5x on untouched queries (BASELINE.md "Measurement
    # caveat").  ``value``/``queries`` stay best-of-runs (minimum —
    # measures the plan, comparable with BENCH_r01/r02); the median-of-3
    # is reported alongside so host-noise swings are visible instead of
    # reading as plan regressions.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for key in keys:
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(specs[key].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        timings[key] = round(min(runs), 4)
        medians[key] = round(sorted(runs)[1], 4)
    total = round(sum(timings.values()), 4)
    total_median = round(sum(medians.values()), 4)

    # Streaming warmup, mirroring the batch warmup's intent: the first
    # streaming query in a process pays one-time costs that are not the
    # operator — materializing the shared replay directory (~4.5 s at
    # sf0.1) and streaming-engine/Python-worker startup.  One untimed
    # run of the lightest streaming key absorbs both so the section
    # measures the queries, not the harness.
    stream_keys = [k for k in HEADLINE_STREAMING if k in specs]
    if stream_keys:
        materialize(specs[stream_keys[-1]].fn(spark, sf_dir))

    # Streaming was single-run through BENCH_r09 — which is exactly why
    # the r8→r9 "drift" (5.95→7.37 s on untouched code) could not be
    # told apart from host noise without a manual median-of-5.  Same
    # 3-run best/median discipline as the batch and LLM sections now;
    # pre-r10 streaming numbers are single-run and read ≥ best-of-3.
    stream_timings: dict[str, float] = {}
    stream_medians: dict[str, float] = {}
    for key in stream_keys:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(specs[key].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        stream_timings[key] = round(min(runs), 4)
        stream_medians[key] = round(sorted(runs)[1], 4)

    llm_timings: dict[str, float] = {}
    llm_medians: dict[str, float] = {}
    for key in (k for k in HEADLINE_LLM if k in specs):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(specs[key].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        llm_timings[key] = round(min(runs), 4)
        llm_medians[key] = round(sorted(runs)[1], 4)

    tpch_timings: dict[str, float] = {}
    tpch_medians: dict[str, float] = {}
    for key in (k for k in HEADLINE_TPCH if k in specs):
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(specs[key].fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        tpch_timings[key] = round(min(runs), 4)
        tpch_medians[key] = round(sorted(runs)[1], 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "value_median_of_3": total_median,
                "queries_median_of_3": medians,
                "queries_streaming": stream_timings,
                "value_streaming": round(sum(stream_timings.values()), 4),
                "queries_streaming_median_of_3": stream_medians,
                "value_streaming_median_of_3": round(
                    sum(stream_medians.values()), 4
                ),
                "queries_llm": llm_timings,
                "value_llm": round(sum(llm_timings.values()), 4),
                "queries_llm_median_of_3": llm_medians,
                "value_llm_median_of_3": round(sum(llm_medians.values()), 4),
                "queries_tpch": tpch_timings,
                "value_tpch": round(sum(tpch_timings.values()), 4),
                "queries_tpch_median_of_3": tpch_medians,
                "value_tpch_median_of_3": round(
                    sum(tpch_medians.values()), 4
                ),
            }
        )
    )
    # The driver archives only the LAST 2000 chars of stdout; the full
    # JSON line above outgrew that in round 11 (BENCH_r11.json captured
    # a mid-line tail, losing the headline totals — VERDICT r11 #2).
    # Emit a compact totals-only line LAST so the tail capture always
    # retains the headline numbers regardless of how many per-query
    # sections the big line grows.  Every `value*` total comes AFTER
    # the per-query `queries` dict (ADVICE r12): if the headline set
    # ever grows this line past 2000 chars, the tail capture truncates
    # the line's FRONT, so the totals must occupy its final bytes.
    print(
        json.dumps(
            {
                "metric": "bench_summary",
                "unit": "sec",
                "sf": sf,
                "queries": timings,
                "value": total,
                "value_median_of_3": total_median,
                "value_streaming": round(sum(stream_timings.values()), 4),
                "value_streaming_median_of_3": round(
                    sum(stream_medians.values()), 4
                ),
                "value_llm": round(sum(llm_timings.values()), 4),
                "value_llm_median_of_3": round(sum(llm_medians.values()), 4),
                "value_tpch": round(sum(tpch_timings.values()), 4),
                "value_tpch_median_of_3": round(
                    sum(tpch_medians.values()), 4
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
