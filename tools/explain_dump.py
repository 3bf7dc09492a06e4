#!/usr/bin/env python
"""Dump the full ``explain('formatted')`` of selected queries to
``plans/r{N}/<key>_<suffix>.txt`` — the optimization round's
before/after plan evidence.

Usage::

    python tools/explain_dump.py <round> <suffix> key [key ...]
    python tools/explain_dump.py 14 before agg_q1_pricing dedup_exact

Plans are captured (not executed) at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1).  Streaming keys are skipped: their
state-machinery plan only exists on a run (see PLANS_r{N}.md, which
executes them).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402


def main() -> None:
    rnd, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", f"r{rnd}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="explain-dump")
    specs = load_all_operators()
    for key in keys:
        df = specs[key].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
