#!/usr/bin/env python
"""BPE round-count scaling probe (round 14, VERDICT r13 #4).

The batched trainer exists so a ~30k-merge production tokenizer costs
~30k/M pair-count rounds instead of 30k; this probe measures how wall
time actually scales with ROUND COUNT (the axis the ×300 corpus probe
does not exercise).  It runs ``text_bpe_vocab_train_batched`` at the
base sf with ``BPE_BATCH_ROUNDS`` monkeypatched across a doubling
ladder and reports sec-per-merge per rung: flat sec/merge = linear in
rounds (what a 30k-round extrapolation needs); growing sec/merge =
quadratic replay (each round re-applies every prior rewrite from the
persisted base vocab).

Only the Spark fn is exercised — the registered oracle SQL is bound
to the module constants at import time and is NOT regenerated here,
so certification is untouched by the monkeypatch.

Usage: ``python tools/bpe_rounds_probe.py [rounds ...]`` (default
2 4 8 16).  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bigdata_twitter_spark.session import get_session  # noqa: E402
from bigdata_twitter_spark.text import analysis  # noqa: E402


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="bdt-bpe-rounds-probe")
    orig = analysis.BPE_BATCH_ROUNDS
    out = {}
    try:
        for r in rungs:
            analysis.BPE_BATCH_ROUNDS = r
            t0 = time.perf_counter()
            rows = analysis.text_bpe_vocab_train_batched(
                spark, sf_dir
            ).collect()
            wall = time.perf_counter() - t0
            merges = len(rows)
            out[f"rounds_{r}"] = {
                "sec": round(wall, 2),
                "merges": merges,
                "sec_per_merge": round(wall / merges, 3) if merges else None,
            }
    finally:
        analysis.BPE_BATCH_ROUNDS = orig
    print(
        json.dumps(
            {
                "metric": "bpe_rounds_probe",
                "sf_dir": sf_dir,
                "batch_m": analysis.BPE_BATCH_M,
                "rungs": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
