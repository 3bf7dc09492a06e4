#!/usr/bin/env python
"""Repo-wide unpartitioned-window audit (round 9).

VERDICT r8 found 10 keys whose plans ran data-sized cumulatives in a
single WindowExec partition — by reading bench logs.  This tool makes
that check systematic: capture the executed plan of every BATCH
registry key (streaming keys execute on capture and audit their plans
in test_plans.py instead) and report every Window operator with an
EMPTY partition spec, plus the input columns it runs over, so each hit
can be classified metadata-sized (fine) or data-sized (a bug).

A Window line in ``executedPlan().toString()`` renders as
``Window [funcs], [partSpec], [orderSpec]`` when partitioned and
``Window [funcs], [orderSpec]`` when not; we detect the unpartitioned
form by the windowspecdefinition argument list carrying no partition
columns before the first sort direction token.

Usage: ``python tools/window_audit.py [sf_dir]`` — prints one line per
(key, unpartitioned-window) hit and a summary.
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(
        app_name="bdt-window-audit", master="local[8]", shuffle_partitions=8
    )
    # Long windowspecdefinition argument lists truncate to '...' at the
    # default maxToStringFields=25, which would hide partition columns
    # from the classifier; raise the cap AND (belt-and-braces) treat
    # any surviving '...' inside a spec as CAPTURE_FAIL below.
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    specs = load_all_operators()
    n_keys = n_hits = 0
    for key, spec in specs.items():
        if key.startswith(SKIP_PREFIXES):
            continue
        n_keys += 1
        try:
            plan = (
                spec.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # capture failure is itself a finding
            print(f"CAPTURE_FAIL {key}: {str(e)[:120]}")
            continue
        try:
            lns = unpartitioned_windows(plan)
        except TruncatedSpec as e:  # unclassifiable ≠ clean
            print(f"CAPTURE_FAIL {key}: truncated windowspec: {e}")
            continue
        for ln in lns:
            n_hits += 1
            print(f"UNPART {key}: {ln}")
    print(f"SUMMARY keys_audited={n_keys} unpartitioned_window_lines={n_hits}")
    spark.stop()


if __name__ == "__main__":
    main()
