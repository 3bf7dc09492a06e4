"""Semantic invariants for the round-5 additions (oracle parity is
covered by test_parity.py)."""

from __future__ import annotations

import glob
import os

import pytest

from bigdata_twitter_spark.registry import load_all_operators


@pytest.fixture(scope="module")
def specs():
    return load_all_operators()


def test_sharded_jobs_equals_single_job_exact_miner(specs, spark, sf_dir):
    """The union of shard-pair jobs must equal the single-job exact
    all-pairs answer BITWISE (ids and 6dp cosines), and the parquet
    handoff must show one directory per shard-pair job."""
    from bigdata_twitter_spark.llm.orchestration import N_SHARDS, _RUN_BASE

    sharded = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in specs["sim_pairs_sharded_jobs"].fn(spark, sf_dir).collect()
    }
    exact = {
        (r["a_id"], r["b_id"], r["cosine"])
        for r in specs["sim_pairs_threshold"].fn(spark, sf_dir).collect()
    }
    assert sharded == exact
    assert sharded, "fixture should contain pairs at the threshold"
    # Handoff layout: S(S+1)/2 independent job directories.
    job_dirs = glob.glob(os.path.join(_RUN_BASE, "*", "job_*_*"))
    assert len(job_dirs) == N_SHARDS * (N_SHARDS + 1) // 2, job_dirs
    # Each unordered pair must land in exactly ONE job (no dedup step):
    # re-read every job dir separately and check disjointness.
    seen: set[tuple[int, int]] = set()
    for d in sorted(job_dirs):
        rows = spark.read.parquet(d).collect()
        ids = {(r["a_id"], r["b_id"]) for r in rows}
        assert not (ids & seen), f"pair duplicated across jobs: {d}"
        seen |= ids
    assert seen == {(a, b) for a, b, _ in exact}


def test_decode_error_channel_quarantines_not_kills(specs, spark, sf_dir):
    """10 of the 100 mixed PNGs are deterministically corrupted; the
    decode pass must survive, quarantine exactly those ids with a CRC
    triage message, and decode the rest for real."""
    from bigdata_twitter_spark.binfixtures import (
        N_FILES, is_corrupt, pixel, png_height, png_width,
    )

    out = specs["multimodal_decode_errors"].fn(spark, sf_dir).toPandas()
    assert len(out) == N_FILES
    by_id = out.set_index("doc_id")
    for i in range(N_FILES):
        row = by_id.loc[i]
        if is_corrupt(i):
            assert row.status == "corrupt" and "CRC" in row.error
            assert row.pixel_sum is None or row.isna().pixel_sum
        else:
            assert row.status == "ok"
            w, h = png_width(i), png_height(i)
            assert (row.src_width, row.src_height) == (w, h)
            want = sum(
                pixel(x, y, i) for x in range(w) for y in range(h)
            )
            assert int(row.pixel_sum) == want
    assert (out.status == "corrupt").sum() == N_FILES // 10


def test_sharded_jobs_resume_recomputes_only_missing(spark, sf_dir, tmp_path):
    """Kill one job of a completed run and resume: only that job may be
    recomputed (completed jobs' outputs untouched — checked by file
    mtimes), and the resumed union equals the original answer."""
    import shutil
    import time

    from bigdata_twitter_spark.llm.orchestration import run_shard_jobs

    run_dir = str(tmp_path / "run")
    run_shard_jobs(spark, sf_dir, run_dir)
    before = {
        r["a_id"]: r
        for r in spark.read.parquet(f"{run_dir}/job_*_*").collect()
    }
    mtimes = {
        d: os.path.getmtime(os.path.join(run_dir, d, "_SUCCESS"))
        for d in os.listdir(run_dir)
    }
    shutil.rmtree(os.path.join(run_dir, "job_1_2"))
    time.sleep(0.05)
    run_shard_jobs(spark, sf_dir, run_dir)  # resume
    for d, old in mtimes.items():
        got = os.path.getmtime(os.path.join(run_dir, d, "_SUCCESS"))
        if d == "job_1_2":
            assert got > old  # recomputed
        else:
            assert got == old, d  # never touched
    after = {
        r["a_id"]: r
        for r in spark.read.parquet(f"{run_dir}/job_*_*").collect()
    }
    assert set(before) == set(after)


def test_stream_upsert_versioned_exactly_once_replay(specs, spark, sf_dir):
    """A replayed micro-batch (same batchId, at-least-once delivery)
    must be a NO-OP: its delta is already committed in some manifest,
    so table state and the version chain are unchanged — idempotent
    commit + at-least-once = exactly-once."""
    import json

    from bigdata_twitter_spark.streaming.ops import LAST_UPSERT_INFO

    first = (
        specs["stream_upsert_versioned"].fn(spark, sf_dir)
        .toPandas().sort_values("user_id").reset_index(drop=True)
    )
    info = dict(LAST_UPSERT_INFO)
    man_dir, committed = info["man_dir"], info["committed"]
    versions = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir) if f.endswith(".json")
    )
    assert versions == list(range(len(versions)))  # dense CAS chain
    assert len(committed) == len(versions)  # one delta per commit
    # Replay batch 0 with a POISONED frame: if the replay branch ever
    # writes, the poison rows would corrupt the table.
    poison = spark.createDataFrame(
        [(999999, 999999, None, 1e9)],
        "user_id bigint, event_id bigint, ts timestamp, value double",
    )
    info["write_batch"](poison, 0)
    after_versions = sorted(
        int(f[1:-5]) for f in os.listdir(man_dir) if f.endswith(".json")
    )
    assert after_versions == versions  # no new commit
    for f in os.listdir(man_dir):
        if f.endswith(".json"):
            with open(os.path.join(man_dir, f)) as fh:
                assert json.load(fh)["files"][0] in committed
    # A fresh batch id DOES commit (the branch is id-keyed, not frozen).
    info["write_batch"](poison, len(versions) + 100)
    n_manifests = len(
        [f for f in os.listdir(man_dir) if f.endswith(".json")]
    )
    assert n_manifests == len(versions) + 1
