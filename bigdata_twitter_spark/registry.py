"""Central operator registry — the SURVEY.md §2 contract in code.

Every operator registers itself with :func:`query`; the driver-facing
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin projections of
this registry.  Keeping (Spark implementation, oracle SQL, scale notes)
adjacent in one decorator call is what keeps the two sides' column
aliases aligned — the driver's compare hashes values after sorting
columns by name, so a single alias drift is a correctness failure.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None ⇒ rows-only check
    tables: tuple[str, ...] = ()
    scale_note: str = ""  # how this survives 100 TB / 1000 executors
    doc: str = field(default="", repr=False)


REGISTRY: dict[str, QuerySpec] = {}

# The driver evaluates exactly the first 50 ``queries()`` keys per
# round (every round so far cut at key #50 in registration order).
#
# == Certification plan (VERDICT r7 "Next round" #1/#2) ============
# The registry is FROZEN at 307 keys until the never-checked backlog
# drains.  After round 7, 92 keys had no driver row yet (all round-7
# additions, all local-parity hash_pass in PARITY_r07.json) and 16
# keys carried r3-latest rows.  The drain schedule, so no key
# silently ages out:
#
#   r8 window (this tuple, 50 keys): the highest-traffic 50 of the 92
#     never-checked — TPC-H-shaped aggs, quantized-ANN chain, image
#     pHash/dedup + LSH recall gate, the stream trio, the full
#     statistics wave, graph metrics, image/audio features, CDC +
#     lakehouse scan/table keys.
#
#   r9 window (50 keys): the remaining 42 never-checked —
#     embed_mmr_diverse, embed_centroid_confusion,
#     embed_silhouette_centroid, embed_contamination_eval,
#     train_curriculum_schedule, train_packing_efficiency,
#     train_dataset_card, join_fuzzy_levenshtein, agg_share_of_parent,
#     agg_abc_classification, agg_trimmed_mean, win_running_distinct,
#     sort_range_boundaries, agg_skyline_pareto, ts_burst_hysteresis,
#     ts_rolling_median, ts_attribution_last_touch,
#     ts_sequence_regex_match, ts_markov_transitions,
#     trending_decayed_topk, ts_anomaly_mad, ts_weighted_moving_avg,
#     ts_bollinger_bands, ts_rsi_wilder, ts_drawdown_max,
#     ts_entropy_daily, ts_rolling_correlation, ts_bounce_rate_daily,
#     ts_new_vs_returning_daily, ts_cohort_ltv, ts_dow_hod_heatmap,
#     text_lang_id_eval, text_vocab_growth, text_readability_flesch,
#     text_zipf_fit, text_burstiness_dispersion,
#     text_js_divergence_langs, sample_stratified_neyman,
#     sample_balanced_classes, agg_gini_impurity, agg_benford_digits,
#     agg_tukey_fences — plus the first 8 of the 16 r3-stale keys
#     (fn_json, fn_struct, text_tf_idf, inverted_index, profile_table,
#     sample_hash_stratified, sample_exact_k_stratified,
#     agg_mode_per_group).
#
#   r10 window: the remaining 8 r3-stale keys (trending_topk_terms,
#     tweet_hashtag_topk, win_session_paths, win_streak_longest,
#     ts_ewma, ts_downsample_ohlc, text_bigram_familiarity,
#     text_scrub_denylist), then oldest-r4 keys to fill 50.
#
# After r10: every key's latest driver row is r4+ and the
# never-checked backlog is 0; normal freshness rotation resumes.
# ==================================================================
_R8_WINDOW = (
    # -- TPC-H-shaped join/agg composites --
    "agg_q5_local_supplier", "agg_q7_nation_volume",
    "agg_q10_returned_topk", "agg_q18_large_orders",
    # -- quantized-ANN chain --
    "embed_pq_adc_topk", "embed_ivfpq_topk", "embed_binary_quantize",
    # -- image dedup + LSH recall gate --
    "dedup_image_phash", "dedup_lsh_recall_eval",
    # -- stream trio --
    "stream_backfill_union", "stream_quarantine_split",
    "stream_distinct_users_window",
    # -- statistics wave (operators/statistics.py round-7 additions) --
    "agg_spearman_rank_corr", "agg_welch_ttest", "agg_mann_whitney_u",
    "agg_ks_two_sample", "agg_chi2_independence",
    "agg_gini_coefficient", "agg_lorenz_curve", "agg_hill_tail_index",
    "agg_hhi_concentration", "agg_runs_test", "agg_covariance_matrix",
    "ab_test_proportions", "ts_mann_kendall", "ts_theil_sen",
    "ts_holt_winters", "ts_cross_correlation", "ts_survival_km",
    "ts_anova_hour_of_day",
    # -- graph metrics wave --
    "graph_label_propagation", "graph_kcore_peel",
    "graph_jaccard_neighbors", "graph_random_walk_deterministic",
    "graph_hits_topk", "graph_assoc_rules_lift",
    "graph_clustering_coeff", "graph_powerlaw_slope",
    "graph_modularity_eval",
    # -- image/audio feature keys --
    "multimodal_image_phash", "multimodal_image_histogram",
    "multimodal_image_tiles", "multimodal_audio_vad",
    "multimodal_audio_zcr",
    # -- CDC + lakehouse scan/table keys --
    "cdc_debezium_apply", "scan_bloom_pruned",
    "scan_partition_evolution", "table_analyze_stats",
    "table_restore_version", "table_schema_evolution_versioned",
)

assert len(_R8_WINDOW) == 50, len(_R8_WINDOW)

def query(
    name: str,
    sql: str | None = None,
    tables: tuple[str, ...] = (),
    scale_note: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator key: {name}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            sql=sql,
            tables=tables,
            scale_note=scale_note,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all_operators() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration).

    Imports only POPULATE the registry; the explicit ``_R8_WINDOW``
    tuple below defines the check-order prefix the driver evaluates
    (the harness checks the first 50 ``queries()`` keys per round).
    Keys outside the window follow in registration order.
    """
    from .operators import windows  # noqa: F401
    from .operators import sort_limit  # noqa: F401
    from .operators import setops  # noqa: F401
    from .operators import skew  # noqa: F401  (new this round)
    from .operators import timeseries  # noqa: F401
    from .text import analysis  # noqa: F401
    from .llm import bucketed  # noqa: F401  (new this round)
    from .llm import frames  # noqa: F401  (new this round)
    from .llm import components, ivf  # noqa: F401  (new this round)
    from .llm import embdedup  # noqa: F401  (new this round)
    from .operators import scale_ops  # noqa: F401  (new this round)
    from .sources import formats  # noqa: F401  (new this round)
    from .sources import scans  # noqa: F401
    from .streaming import ops  # noqa: F401

    # Round-2 batch 2 (registered after the keys above so they queue
    # behind the 50 operators still awaiting their first driver row).
    from .operators import cdc, profiling  # noqa: F401  (new this round)
    from .sources import layout  # noqa: F401  (new this round)
    from .text import indexing  # noqa: F401  (new this round)
    from .llm import quantize  # noqa: F401  (new this round)
    from .operators import graph  # noqa: F401  (new this round)
    from .text import pipeline  # noqa: F401  (new this round)
    from .llm import containment  # noqa: F401  (new this round)
    from .llm import curation, kmeans, semdedup  # noqa: F401  (round 3)
    from .llm import pca  # noqa: F401  (round 3)
    from .llm import audio  # noqa: F401  (new this round)
    from .sources import binaryfiles  # noqa: F401  (new this round)

    # Round-4 additions (first driver rows landed in round 4).
    from .text import quality_rules  # noqa: F401  (round 4)
    from .llm import incremental, knngraph, sharding  # noqa: F401  (round 4)
    from .llm import recall  # noqa: F401  (round 4)
    from .sources import versioned  # noqa: F401  (round 4)
    from .llm import trainprep  # noqa: F401  (round 4)

    # Round-5 additions (queue behind the explicit window).
    from .llm import orchestration  # noqa: F401  (round 5)
    from .operators import bloomjoin  # noqa: F401  (round 5)
    from .llm import embpipeline  # noqa: F401  (round 5)

    # Round-6 additions (queue behind the explicit window).
    from .llm import bucketjobs  # noqa: F401  (round 6)
    from .operators import statistics  # noqa: F401  (round 6)
    from .llm import pcapower  # noqa: F401  (round 6)
    from .sources import deletionvectors  # noqa: F401  (round 6)

    # Round-7 additions (chunking pair is window-listed; the rest
    # queue behind the window for their first driver rows in round 8).
    from .text import chunking  # noqa: F401  (round 7)
    from .llm import phash  # noqa: F401  (round 7)
    from .llm import mmr  # noqa: F401  (round 7)
    from .llm import pq  # noqa: F401  (round 7)
    from .llm import ivfpq  # noqa: F401  (round 7)
    from .llm import tiles  # noqa: F401  (round 7)
    # (quantize/timeseries round-7 keys register via their family imports)

    # Families fully hash-verified by the round-1 driver run; scalars
    # lead because fn_map's oracle was strengthened this round.
    from .functions import scalars  # noqa: F401
    from . import udfs  # noqa: F401
    from .llm import dedup, multimodal, similarity  # noqa: F401
    from .operators import aggregates, filters, joins  # noqa: F401

    # Final check order: the explicit 50-key round-5 window first, then
    # every remaining key in registration order.
    missing = [k for k in _R8_WINDOW if k not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_R8_WINDOW names unregistered operator keys: {missing}; "
            "a window key was renamed or its module was dropped"
        )
    ordered: dict[str, QuerySpec] = {}
    for key in _R8_WINDOW:
        ordered[key] = REGISTRY.pop(key)
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    return REGISTRY
