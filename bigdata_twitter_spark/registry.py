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
# Round-7 window per SURVEY §P9 / VERDICT r6 "Next round" #1:
#
#   * the 17 round-6 additions, never driver-checked (all local-parity
#     hash_pass in PARITY_r06.json), in P9's order;
#
#   * the 2 round-7 additions (text_chunk_sliding / embed_chunk_pool,
#     the RAG chunking pair VERDICT r6 "What's missing" #4 asked for)
#     so their first driver rows land the round they are written;
#
#   * stream_transform_with_state early (VERDICT r6 "Next round" #5:
#     it carries the vendored-protobuf seam, the one dependency-
#     sensitive path — a fresh row certifies it against the current
#     container; its last row is r4);
#
#   * 30 of the 46 r3-cohort keys (latest driver row = round 3, code
#     unchanged since but the r4/r5 loader/session machinery moved
#     under them), riskiest first: streaming/checkpoint, the
#     dedup/sim/embed families, sinks and CDC, then the agg tail.
#     The 16 remaining r3 keys (pure-SQL scalar/agg/text shapes)
#     queue for round 8.
_R7_WINDOW = (
    # -- 17 round-6 additions, never driver-checked --
    "sim_pairs_bucket_jobs", "multimodal_jpeg_decode",
    "agg_regression_per_group", "ts_changepoint_cusum",
    "ts_autocorr_lag", "sample_weighted_pps", "ts_holt_linear",
    "scan_text_lines", "agg_percentile_binned", "ts_funnel_sequence",
    "sink_zorder_clustered", "agg_heavy_hitters_cms",
    "embed_pca_power_exact", "table_deletion_vectors",
    "scan_manifest_pruned", "ts_forecast_backtest", "graph_khop_reach",
    # -- round-7 additions: RAG chunking pair --
    "text_chunk_sliding", "embed_chunk_pool",
    # -- dependency-sensitive refresh (vendored-protobuf seam) --
    "stream_transform_with_state",
    # -- 30 r3-cohort keys, riskiest machinery first --
    "stream_checkpoint_resume", "stream_topk_per_window",
    "doc_pipeline_e2e", "dedup_exact", "dedup_components",
    "dedup_containment", "dedup_embedding", "dedup_minhash_lsh",
    "sim_cosine_topk", "sim_ivf_topk", "sim_batch_queries_topk",
    "sim_pairs_bucketed", "embed_pca_project", "embed_quantize_int8",
    "multimodal_frame_sample", "sink_compact_small_files",
    "sink_partitioned_parquet", "sink_sorted_clustered",
    "scan_schema_evolution", "merge_upsert", "cdc_scd2_intervals",
    "join_asof", "join_star_3way", "join_range_binned",
    "join_broadcast", "agg_q1_pricing", "agg_stats", "agg_hll_sketch",
    "agg_approx_percentile", "agg_histogram",
)

assert len(_R7_WINDOW) == 50, len(_R7_WINDOW)

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

    Imports only POPULATE the registry; the explicit ``_R7_WINDOW``
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
    missing = [k for k in _R7_WINDOW if k not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_R7_WINDOW names unregistered operator keys: {missing}; "
            "a window key was renamed or its module was dropped"
        )
    ordered: dict[str, QuerySpec] = {}
    for key in _R7_WINDOW:
        ordered[key] = REGISTRY.pop(key)
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    return REGISTRY
