#!/usr/bin/env python
"""Repo-wide unpartitioned-window audit (round 9; classified round 10).

VERDICT r8 found 10 keys whose plans ran data-sized cumulatives in a
single WindowExec partition — by reading bench logs.  This tool makes
that check systematic: capture the executed plan of every BATCH
registry key (streaming keys execute on capture and audit their plans
in test_plans.py instead) and report every Window operator with an
EMPTY partition spec.  An unpartitioned window is NOT automatically a
bug — it is fine exactly when its input is bounded by something other
than the data size (a fixed top-K cut, a NB-bucket offsets table, a
calendar-sized aggregate, a fixed-size sketch).  ``ALLOWED`` below
records, per key, why every unpartitioned window in its plan is
input-bounded; any hit at a key NOT in the table is a finding and the
tool exits non-zero.  tests/test_plans.py runs the same classifier
over the whole registry so the zero-finding state is CI-pinned.

A Window line in ``executedPlan().toString()`` renders as
``Window [funcs], [partSpec], [orderSpec]`` when partitioned and
``Window [funcs], [orderSpec]`` when not; we detect the unpartitioned
form by the windowspecdefinition argument list carrying no partition
columns before the first sort direction token.

Usage: ``python tools/window_audit.py [sf_dir]`` — prints one line per
(key, unpartitioned-window) hit with its classification and a summary.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402

# Streaming keys execute their replay on plan capture — audited via
# their dedicated test_plans.py pins instead.
SKIP_PREFIXES = ("stream_", "source_stream", "sink_stream")

# Why every unpartitioned window at this key is input-bounded (audited
# by hand against the implementation, round 10).  Vocabulary:
#   offsets table — distcum.py / _md5_global_rank level-2 per-bucket
#     totals: NB × groups rows (NB = fixed bucket count), never data;
#   top-K cut    — row_number over the output of a global
#     orderBy().limit(K) / TakeOrderedAndProject (K fixed);
#   calendar     — input pre-aggregated to one row per hour/day, so
#     cardinality is the corpus time horizon, not the row count;
#   sketch       — input is fixed-size sketch state (K minima);
#   declared     — data-sized BY CONTRACT with a registered
#     distributed twin (VERDICT r8 #4 precedent).
ALLOWED: dict[str, str] = {
    # distcum.py offsets tables (__tlc_* columns in the hit line)
    "sort_range_boundaries": (
        "offsets table (sum __tlc_cnt) + row_number over the "
        "rank_limit-pruned RANGE_SAMPLE rows (top-K cut)"
    ),
    "agg_skyline_pareto": "offsets table (max __tlc_bm prevmax chain)",
    "agg_mann_whitney_u": "offsets table (sum __tlc_tot_c)",
    "agg_ks_two_sample": "offsets table (sum __tlc_tot_c1/c2)",
    # _md5_global_rank-family offsets tables (sum(bn)/bucket_total/sn)
    "text_vocab_growth": "offsets table (per-range bucket totals)",
    "train_shuffle_shard": "offsets table (per-bucket totals)",
    "train_pipeline_e2e": "offsets table (per-bucket totals, shard stage)",
    "sample_negative_pairs": "offsets tables (both rank passes)",
    "pack_token_budget": "offsets table (per-bucket token totals)",
    "train_packing_efficiency": "offsets table (per-bucket token totals)",
    "train_curriculum_schedule": "offsets table (per-bucket score totals)",
    "win_ntile_pctrank_dist": "offsets table (per-bucket counts)",
    # calendar-sized inputs (pre-aggregated to hour/day grain)
    "ts_survival_km": "calendar (day-grain KM table, reverse cumsum)",
    "ts_rolling_correlation": "calendar (hour-grain series)",
    "ts_cross_correlation": "calendar (hour-grain rn spine, 3 reuses)",
    # top-K cuts (row_number AFTER a global limit/TakeOrdered)
    "trending_decayed_topk": "top-K cut (limit 20 before rank)",
    "graph_hits_topk": "top-K cut (TakeOrdered 20 before rank, both)",
    "profile_join_skew": "top-K cut (TakeOrdered 10 before rank)",
    "embed_pq_adc_topk": (
        "top-K cut (21-row seed prefix via global limit; plan repeats "
        "the seed subtree)"
    ),
    "embed_ivfpq_topk": (
        "top-K cut (constant seed prefix via global limit; plan "
        "repeats the seed subtree)"
    ),
    # sketch-sized inputs
    "agg_kmv_union_intersect": "sketch (union of two K-minima sets)",
    # declared data-sized contract key
    "win_ntile_pctrank": (
        "declared: exact SQL ntile/percent_rank semantics BY CONTRACT "
        "(VERDICT r8 #4); distributed twin win_ntile_pctrank_dist is "
        "the scale path"
    ),
}


class TruncatedSpec(Exception):
    """windowspecdefinition() rendered with a '...' ellipsis — the
    toString cut the argument list (spark.sql.debug.maxToStringFields),
    so partitioned-vs-not CANNOT be classified from this line."""


def unpartitioned_windows(plan: str) -> list[str]:
    hits = []
    for ln in plan.splitlines():
        if "windowspecdefinition(" not in ln:
            continue
        spec = ln.split("windowspecdefinition(", 1)[1]
        if "..." in spec:
            raise TruncatedSpec(ln.strip()[:240])
        # partition columns (if any) precede the first "<col> ASC/DESC"
        # sort token inside the spec argument list.
        first_sort = re.search(r"[A-Za-z0-9_#]+ (ASC|DESC) NULLS", spec)
        prefix = spec[: first_sort.start()] if first_sort else spec
        if prefix.strip() in ("", "specifiedwindowframe("):
            hits.append(ln.strip()[:240])
    return hits


# Expand operators (round 12, after the q21 probe finding): Spark
# plans several surfaces through Expand, which multiplies the rows
# entering the next exchange by the expand arity.  That is the
# OPERATOR ITSELF for rollup/cube/grouping-sets/unpivot, the window
# duplication inherent to sliding windows, and the standard exact
# multi-column-NDV plan for the profiling keys (whose scale_notes
# declare the HLL/KMV sketch swap as the 100-TB path).  Anywhere
# else it is the q21 hazard class — a multi-DISTINCT aggregate that
# should be a pre-aggregate — and a finding.
EXPAND_ALLOWED = {
    "agg_rollup": "Expand IS the rollup operator (grouping-set copies)",
    "agg_cube": "Expand IS the cube operator",
    "agg_grouping_sets": "Expand IS the grouping-sets operator",
    "agg_unpivot_melt": "Expand IS the unpivot (one copy per column)",
    "ts_sliding_counts": (
        "sliding-window semantics: each event belongs to "
        "window/slide overlapping windows by definition"
    ),
    "table_analyze_stats": (
        "exact multi-column NDV in one pass (declared; scale_note "
        "names the HLL/KMV swap at 100 TB)"
    ),
    "profile_table": (
        "exact multi-column NDV in one pass (declared; scale_note "
        "names the HLL swap at 100 TB)"
    ),
}


def audit(spark, sf_dir: str, specs) -> tuple[list, list, list, list, list]:
    """Classify every batch key's unpartitioned windows and Expand
    operators.

    Returns ``(allowed, findings, capture_fails, expand_findings,
    expand_allowed)`` where each element is a list of ``(key, detail)``
    tuples; a clean repo has ``findings == capture_fails ==
    expand_findings == []``.  ``expand_allowed`` carries the live
    Expand hits at EXPAND_ALLOWED keys so the allowlist can be
    rot-checked exactly like ALLOWED (ADVICE r12): an allowlisted key
    that stops producing Expand must leave the table, or it would
    silently mask a future Expand regression at that key.
    """
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    allowed: list[tuple[str, str]] = []
    findings: list[tuple[str, str]] = []
    capture_fails: list[tuple[str, str]] = []
    expand_findings: list[tuple[str, str]] = []
    expand_allowed: list[tuple[str, str]] = []
    for key, spec in specs.items():
        if key.startswith(SKIP_PREFIXES):
            continue
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # capture failure is itself a finding
            capture_fails.append((key, str(e)[:160]))
            continue
        try:
            lns = unpartitioned_windows(plan)
        except TruncatedSpec as e:  # unclassifiable ≠ clean
            capture_fails.append((key, f"truncated windowspec: {e}"))
            continue
        for ln in lns:
            if key in ALLOWED:
                allowed.append((key, ln))
            else:
                findings.append((key, ln))
        for ln in plan.splitlines():
            # The codegen marker `*(N) ` may precede the operator name
            # (round-13 finding: `*(1) Expand` lines evaded the
            # original `[\s+:*-]*Expand` class entirely — a
            # whole-stage-codegen'd Expand was invisible to BOTH the
            # findings list and the allowlist rot check).
            if re.match(r"^[\s+:*-]*(\*\(\d+\)\s*)?Expand\b", ln):
                if key in EXPAND_ALLOWED:
                    expand_allowed.append((key, ln.strip()[:240]))
                else:
                    expand_findings.append((key, ln.strip()[:240]))
    return allowed, findings, capture_fails, expand_findings, expand_allowed


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(
        app_name="bdt-window-audit", master="local[8]", shuffle_partitions=8
    )
    specs = load_all_operators()
    n_batch = sum(1 for k in specs if not k.startswith(SKIP_PREFIXES))
    allowed, findings, capture_fails, expand_findings, expand_allowed = (
        audit(spark, sf_dir, specs)
    )
    for key, why in sorted(set((k, ALLOWED[k]) for k, _ in allowed)):
        print(f"ALLOWED {key}: {why}")
    for key, ln in allowed:
        print(f"  hit {key}: {ln}")
    for key, why in sorted(
        set((k, EXPAND_ALLOWED[k]) for k, _ in expand_allowed)
    ):
        print(f"EXPAND_ALLOWED {key}: {why}")
    for key, ln in expand_allowed:
        print(f"  expand-hit {key}: {ln}")
    for key, msg in capture_fails:
        print(f"CAPTURE_FAIL {key}: {msg}")
    for key, ln in findings:
        print(f"FINDING {key}: {ln}")
    for key, ln in expand_findings:
        print(f"EXPAND_FINDING {key}: {ln}")
    print(
        f"SUMMARY keys_audited={n_batch} "
        f"allowed_hits={len(allowed)} findings={len(findings)} "
        f"capture_fails={len(capture_fails)} "
        f"expand_findings={len(expand_findings)} "
        f"expand_allowed_hits={len(expand_allowed)}"
    )
    spark.stop()
    sys.exit(1 if findings or capture_fails or expand_findings else 0)


if __name__ == "__main__":
    main()
