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
# Round-6 window = the ENTIRE remaining staleness ledger, which is
# exactly 50 keys (VERDICT r5 "Next round" #1):
#
#   * the 7 keys added late in round 5 that have never had a driver
#     row at all (all local-parity hash_pass in PARITY_r05.json) —
#     agg_kmv_union_intersect goes in only AFTER its single-partition
#     global-k-min window was replaced this round with the two-level
#     nibble-bucket cut (VERDICT r5 "What's wrong" #1), so the
#     driver's first row certifies the fixed plan, never the weak one;
#
#   * the 43 keys whose latest driver row is round 2 — including the
#     whole streaming family, whose r2 evidence describes code that
#     no longer exists (round 5 changed the state-store partition
#     sizing under every streaming key).  After this window closes,
#     every key in the registry has a driver row from round-3 code or
#     later.
_R6_WINDOW = (
    # -- 7 keys never driver-checked (round-5 late additions) --
    "agg_bitmap_distinct", "agg_kmv_union_intersect",
    "agg_ratio_wilson_ci", "graph_also_bought_topk", "join_pit_scd2",
    "table_clone_shallow", "ts_sliding_distinct_kmv",
    # -- 43 keys whose latest driver row is round 2 --
    # streaming family first: its machinery changed most recently
    "stream_tumbling_agg", "stream_sliding_agg",
    "stream_session_window", "stream_dedup", "stream_late_data",
    "stream_stateful_running", "stream_stream_join",
    "source_stream_file", "source_stream_rate",
    "sink_stream_foreachbatch",
    # scan/sink format keys
    "scan_csv", "scan_json_lines", "scan_parquet",
    "sink_json_lines", "sink_parquet", "join_bucketed_colocated",
    # batch timeseries / windows / sets / sort
    "ts_tumbling_counts", "ts_sliding_counts", "ts_sessionize_batch",
    "ts_gap_fill", "ts_interpolate", "ts_retention_cohort",
    "ts_anomaly_zscore", "top_active_users", "error_rate_per_day",
    "funnel_conversion", "win_dedup_latest", "win_ntile_pctrank",
    "limit_topk_global", "sort_multikey", "set_intersect",
    "set_except", "join_skew_salted", "agg_percentiles",
    # text family
    "text_tokenize", "text_ngrams", "text_sentiment_lexicon",
    "text_lang_stats", "text_quality_score", "text_lang_id",
    "text_fingerprint", "text_token_count_bpe", "text_keywords_topk",
)

assert len(_R6_WINDOW) == 50, len(_R6_WINDOW)

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

    Imports only POPULATE the registry; the explicit ``_R6_WINDOW``
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

    # Families fully hash-verified by the round-1 driver run; scalars
    # lead because fn_map's oracle was strengthened this round.
    from .functions import scalars  # noqa: F401
    from . import udfs  # noqa: F401
    from .llm import dedup, multimodal, similarity  # noqa: F401
    from .operators import aggregates, filters, joins  # noqa: F401

    # Final check order: the explicit 50-key round-5 window first, then
    # every remaining key in registration order.
    missing = [k for k in _R6_WINDOW if k not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_R6_WINDOW names unregistered operator keys: {missing}; "
            "a window key was renamed or its module was dropped"
        )
    ordered: dict[str, QuerySpec] = {}
    for key in _R6_WINDOW:
        ordered[key] = REGISTRY.pop(key)
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    return REGISTRY
