"""ANN build/serve split contracts (round 13, VERDICT r12 #5):

1. build is idempotent — a fresh index is reused, never rebuilt;
2. serve reads ONLY probed bucket dirs (a strict subset), passed as
   explicit paths, so non-probed buckets are physically unreachable;
3. the staleness pin works — a manifest whose corpus row count no
   longer matches forces a rebuild as version N+1 before serving;
4. serve agrees with the brute-force exact top-k restricted to the
   probed buckets (the ANN contract: exact WITHIN the probed cells).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from bigdata_twitter_spark.llm import annindex
from bigdata_twitter_spark.registry import load_all_operators

SPECS = load_all_operators()


@pytest.fixture()
def own_sf_dir(sf_dir, tmp_path):
    """A private copy of the fixture dir so staleness/version tests
    can never bump the version of the SHARED sf_dir's index (the
    build oracle pins index_version = 0 there)."""
    d = tmp_path / "sf_copy"
    d.mkdir()
    for t in ("embeddings",):
        shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    yield str(d)
    shutil.rmtree(annindex._index_root(str(d)), ignore_errors=True)


def test_build_is_idempotent(spark, own_sf_dir):
    SPECS["ann_index_build"].fn(spark, own_sf_dir).collect()
    first = dict(annindex.LAST_RUN_INFO)
    SPECS["ann_index_build"].fn(spark, own_sf_dir).collect()
    second = dict(annindex.LAST_RUN_INFO)
    assert first["version"] == 0
    assert second["version"] == 0
    assert second["rebuilt"] is False
    assert second["root"] == first["root"]


def test_serve_reads_only_probed_buckets(spark, own_sf_dir):
    rows = SPECS["ann_index_search"].fn(spark, own_sf_dir).collect()
    info = dict(annindex.LAST_RUN_INFO)
    assert rows, "fixture corpus must produce results"
    assert info["op"] == "search"
    n_probed = len(info["probed_dirs"])
    assert n_probed == min(annindex.ANN_PROBES, info["bucket_dirs_total"])
    assert n_probed < info["bucket_dirs_total"], (
        "probing must touch a strict subset of buckets on the fixture"
    )
    # Every path handed to the reader is a probed bucket dir — the
    # non-probed buckets are not in the read path at all.
    for d in info["probed_dirs"]:
        assert os.path.basename(d).startswith("clabel=")
    # Serving reused the fresh index (no rebuild on the second call
    # within this test session's first ensure either way).
    assert info["version"] == 0


def test_stale_manifest_forces_rebuild_as_next_version(spark, own_sf_dir):
    SPECS["ann_index_build"].fn(spark, own_sf_dir).collect()
    root = annindex.LAST_RUN_INFO["root"]
    man = os.path.join(root, "manifests", "v0.json")
    with open(man) as fh:
        manifest = json.load(fh)
    meta_rel = next(f for f in manifest["files"] if f.endswith("meta.json"))
    meta_path = os.path.join(root, meta_rel)
    with open(meta_path) as fh:
        meta = json.load(fh)
    meta["n_vectors"] += 1  # simulate a corpus the pin no longer matches
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)

    rows = SPECS["ann_index_search"].fn(spark, own_sf_dir).collect()
    info = dict(annindex.LAST_RUN_INFO)
    assert info["rebuilt"] is True
    assert info["version"] == 1
    assert rows
    # And the rebuilt index is immediately fresh again.
    SPECS["ann_index_search"].fn(spark, own_sf_dir).collect()
    assert annindex.LAST_RUN_INFO["rebuilt"] is False
    assert annindex.LAST_RUN_INFO["version"] == 1


def test_serve_is_exact_within_probed_buckets(spark, sf_dir):
    """The served top-k must equal brute-force exact cosine top-k
    restricted to vectors whose assignment lands in the probed
    buckets — i.e. the ONLY approximation is the probe restriction."""
    import pandas as pd
    import numpy as np

    got = [
        (r.vec_id, r.label, r.cosine)
        for r in SPECS["ann_index_search"].fn(spark, sf_dir).collect()
    ]
    info = dict(annindex.LAST_RUN_INFO)
    probed = pd.concat(
        [
            pd.read_parquet(d).assign(
                clabel=int(os.path.basename(d).split("=")[1])
            )
            for d in info["probed_dirs"]
        ]
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = np.array(
        emb.loc[emb.vec_id == annindex.ANN_QUERY_ID, "embedding"].iloc[0],
        dtype=np.float64,
    )

    def cos(v):
        v = np.array(v, dtype=np.float64)
        return round(
            float(v @ qv)
            / (float(np.sqrt(v @ v)) * float(np.sqrt(qv @ qv))),
            6,
        )

    cand = probed[probed.vec_id != annindex.ANN_QUERY_ID]
    scored = sorted(
        (
            (cos(r.embedding), r.vec_id, r.label)
            for r in cand.itertuples(index=False)
        ),
        key=lambda t: (-t[0], t[1]),
    )[: annindex.ANN_TOP_K]
    expected = [(v, lab, c) for c, v, lab in scored]
    assert got == expected
