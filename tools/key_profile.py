#!/usr/bin/env python
"""Time individual registry keys with the bench's methodology (noop
sink, best/median of N) plus Spark job/stage counts per run — the
optimization round's measurement harness.

Usage::

    python tools/key_profile.py [-n 3] key [key ...]

Runs at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default local[*]), exactly like bench.py.
Prints one line per key: best, median, all runs, and the number of
Spark jobs the last run scheduled (driver-loop operators schedule many
jobs per call; that count is the fixed-overhead multiplier).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="key-profile")
    sc = spark.sparkContext
    specs = load_all_operators()
    # Warmup (JVM/codegen/parquet footers), same as bench.py.
    specs[args[0]].fn(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    tracker = sc.statusTracker()
    for key in args:
        runs = []
        jobs_last = 0
        for _ in range(n):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobGroup(f"kp_{key}", key)
            t0 = time.perf_counter()
            specs[key].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(time.perf_counter() - t0)
            jobs_last = len(tracker.getJobIdsForGroup(f"kp_{key}") or [])
            sc.setJobGroup(None, None)
        runs_s = sorted(runs)
        print(
            f"{key}: best={runs_s[0]:.3f} median={runs_s[len(runs_s)//2]:.3f}"
            f" runs={[round(r, 3) for r in runs]} jobs/run~{jobs_last // n}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
