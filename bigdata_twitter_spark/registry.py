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

# The driver evaluates exactly the first 50 ``queries()`` keys per round
# (rounds 1-3 all cut at key #50 in registration order).  This is the
# round-4 window: EVERY key with no driver CORRECTNESS row in any round
# leads — the 12 added mid-round-3 plus the 15 added in round 4 (26 of
# the 27 oracle-SQL-backed; cluster_kmeans_lloyd and
# dedup_semantic_cluster were promoted to hash-grade CTE oracles this
# round) — so after this round's check every registry key has at least
# one driver row.  The remaining 23 slots hold the oldest-verified
# cohort (keys whose only driver row is round 1).  Left out (still
# r1-verified): the rest of the r1 cohort, agg_approx_count_distinct +
# dedup_simhash (rows-only by contract, a re-check re-records the same
# weak grade) and multimodal_decode_stub (deterministic stub).
_R4_WINDOW = (
    # -- 12 keys added mid-round-3, never driver-checked --
    "agg_argmax_minby", "agg_unpivot_melt", "join_asof_tolerance",
    "scan_orc", "pack_token_budget", "text_contamination_overlap",
    "text_boilerplate_ngrams", "text_pii_scrub",
    "sample_negative_pairs", "embed_matryoshka_truncate",
    "cluster_kmeans_lloyd", "dedup_semantic_cluster",
    # -- 15 keys added in round 4, never driver-checked --
    "stream_transform_with_state",
    "text_gopher_quality", "text_repetition_stats",
    "text_perplexity_unigram", "cdc_snapshot_diff",
    "graph_triangle_count", "train_shuffle_shard",
    "data_mixture_sample", "dedup_incremental_snapshot",
    "knn_graph_topk", "embed_dim_stats", "agg_q3_shipping",
    "ann_recall_eval", "table_time_travel", "train_pipeline_e2e",
    # -- 23 keys whose only driver row is round 1 (second driver row) --
    "project_select", "filter_predicate", "filter_in_between_null",
    "filter_regex", "distinct_rows",
    "join_inner_equi", "join_outer_left", "join_outer_full",
    "join_semi", "join_anti", "join_cross", "join_theta_range",
    "join_interval_time",
    "agg_global", "agg_count_distinct", "agg_having", "agg_rollup",
    "agg_cube", "agg_grouping_sets", "agg_collect_sorted", "agg_pivot",
    "set_union_all", "set_union_distinct",
)

assert len(_R4_WINDOW) == 50, len(_R4_WINDOW)

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

    Imports only POPULATE the registry; the explicit ``_R4_WINDOW``
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

    # Round-4 additions (all 15 hold leading _R4_WINDOW slots above, so
    # their FIRST driver row lands in this round's check).
    from .text import quality_rules  # noqa: F401  (round 4)
    from .llm import incremental, knngraph, sharding  # noqa: F401  (round 4)
    from .llm import recall  # noqa: F401  (round 4)
    from .sources import versioned  # noqa: F401  (round 4)
    from .llm import trainprep  # noqa: F401  (round 4)

    # Families fully hash-verified by the round-1 driver run; scalars
    # lead because fn_map's oracle was strengthened this round.
    from .functions import scalars  # noqa: F401
    from . import udfs  # noqa: F401
    from .llm import dedup, multimodal, similarity  # noqa: F401
    from .operators import aggregates, filters, joins  # noqa: F401

    # Final check order: the explicit 50-key round-4 window first, then
    # every remaining key in registration order.
    missing = [k for k in _R4_WINDOW if k not in REGISTRY]
    if missing:
        raise RuntimeError(
            f"_R4_WINDOW names unregistered operator keys: {missing}; "
            "a window key was renamed or its module was dropped"
        )
    ordered: dict[str, QuerySpec] = {}
    for key in _R4_WINDOW:
        ordered[key] = REGISTRY.pop(key)
    ordered.update(REGISTRY)
    REGISTRY.clear()
    REGISTRY.update(ordered)

    return REGISTRY
