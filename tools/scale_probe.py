#!/usr/bin/env python
"""sf1-equivalent scale probe (VERDICT-r2 item 2).

Every number so far is sf0.1 on one node; the 100-TB claims in the
operators' ``scale_note``s are design arguments.  This probe
manufactures a 10× dataset from sf0.1 and measures the headline
queries at both scales, so "wall-time grows ≤~10× and nothing breaks
on the driver" becomes evidence instead of argument.

Replication is NOT naive row duplication — that would distort the
workload superlinearly:

* key columns get a per-copy stride offset (``+ i × 10^10``) so join
  fan-out and group cardinality scale linearly (orders⋈lineitem stays
  1:N, never N×M across copies);
* ``documents.text`` gets a per-copy token RENAMING (``t -> t_<copy>``
  for copy > 0) — an isomorphism on token sequences, so every
  intra-copy Jaccard/shingle/MinHash relation is preserved EXACTLY
  while cross-copy shingle universes are disjoint (no cross-copy LSH
  collisions, and vocabulary grows with the corpus as real scale-ups
  do).  The previous approach (sort tokens by ``xxhash64(token,
  copy)``) was a bug the round-5 ×100 probe exposed: sorting by one
  per-copy key CANONICALIZES token order corpus-wide, turning every
  doc into a sorted bag of words — docs sharing vocabulary became
  near-identical sequences and formed giant genuine near-dup cliques
  (81M candidate pairs at ×100 vs ~180k expected), a workload
  distortion, not an operator quadratic;
* unreplicated dimension tables (region/nation/supplier/part) are
  copied as-is, mirroring real scale-ups where dims grow slower than
  facts;
* ``embeddings.embedding`` is deterministically ROTATED per copy
  (``i*7 mod 64`` positions) — rotation preserves norms and intra-copy
  geometry but breaks cross-copy sign-projection collisions, so each
  vector does not gain 9 exact twins that would inflate every LSH
  bucket 10× and the candidate count 100× (a different workload, not a
  bigger one — same argument as the document token shuffle).

Usage: ``python tools/scale_probe.py [copies]`` (default 10).  Prints
one JSON line: per-query seconds at sf0.1 and sfN, plus the ratio.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import HEADLINE, materialize  # noqa: E402
from bigdata_twitter_spark.registry import load_all_operators  # noqa: E402
from bigdata_twitter_spark.session import get_session  # noqa: E402

KEY_STRIDE = 10_000_000_000  # far above any fixture key at any sf

# table → key columns that take the per-copy stride offset
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation", "supplier", "part"]


def rotated_embedding_expr():
    """Deterministic per-copy rotation of the embedding vector,
    driven by the ``__c`` copy column (copy 0 must be the identity —
    shift = (7·__c) mod 64, and slice(v, 65, 0) is empty so the
    concat degenerates correctly at shift 0)."""
    return F.expr(
        "CASE WHEN (__c * 7) % 64 = 0 THEN embedding ELSE "
        "concat(slice(embedding, CAST((__c * 7) % 64 AS INT) + 1, "
        "             64 - CAST((__c * 7) % 64 AS INT)), "
        "       slice(embedding, 1, CAST((__c * 7) % 64 AS INT))) END"
    )


def suffixed_text_expr():
    """Per-copy token renaming driven by the ``__c`` copy column: an
    isomorphism on the token sequence (order untouched), so intra-copy
    similarity structure is exact and cross-copy token/shingle
    universes are disjoint.  Copy 0 keeps the original text."""
    return F.expr(
        "CASE WHEN __c = 0 THEN text ELSE "
        "concat_ws(' ', transform(split(text, ' '), "
        "t -> concat(t, '_', CAST(__c AS STRING)))) END"
    )


def build(
    spark, src_dir: str, out_dir: str, copies: int,
    replicate: set[str] | None = None,
) -> None:
    """Materialize the scaled dataset.  ``replicate`` limits which fact
    tables get the ×copies treatment (default: all) — a family probe
    (e.g. the document/shingle family at ×100) only pays to build the
    tables its queries actually read; everything else is copied as-is
    so the loaders still find a complete schema."""
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY_AS_IS:
        df = spark.read.parquet(f"{src_dir}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in OFFSET_KEYS.items():
        base = spark.read.parquet(f"{src_dir}/{name}.parquet")
        out = f"{out_dir}/{name}.parquet"
        if replicate is not None and name not in replicate:
            base.write.mode("overwrite").parquet(out)
            continue
        # ONE job per table (round 12): repartition BEFORE exploding a
        # copies column, then apply the per-copy stride/isomorphisms
        # from that column.  The old per-copy append loop cost ~1.4 s
        # per (table, copy) pair — 433 s at ×300 — and its parallelism
        # was capped by the SOURCE's split count (a 3-split fixture
        # exploded ×1000 in 3 tasks).  Measured: ×1000 lineitem+orders
        # in 54 s.  Same stride and isomorphisms, same result modulo
        # file layout.
        df = base.repartition(64).withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
        )
        for k in keys:
            df = df.withColumn(
                k, F.col(k) + F.col("__c").cast("long") * F.lit(KEY_STRIDE)
            )
        if name == "documents":
            df = df.withColumn("text", suffixed_text_expr())
        if name == "embeddings":
            df = df.withColumn("embedding", rotated_embedding_expr())
        df.drop("__c").write.mode("overwrite").parquet(out)


def probe_keys(specs) -> list[str]:
    """HEADLINE by default; override with $SPARK_GRAFT_PROBE_KEYS
    (comma-separated registry keys) to probe another family."""
    env = os.environ.get("SPARK_GRAFT_PROBE_KEYS")
    wanted = [k.strip() for k in env.split(",") if k.strip()] if env else HEADLINE
    keys = [k for k in wanted if k in specs]
    unknown = [k for k in wanted if k not in specs]
    if unknown:
        print(f"warning: unknown probe keys skipped: {unknown}", file=sys.stderr)
    if not keys:
        raise SystemExit(
            f"no valid probe keys (requested {wanted!r}); "
            "check SPARK_GRAFT_PROBE_KEYS against the registry"
        )
    return keys


def time_headline(spark, specs, sf_dir: str, runs: int = 2) -> dict[str, float]:
    keys = probe_keys(specs)
    materialize(specs[keys[0]].fn(spark, sf_dir))  # warmup
    out: dict[str, float] = {}
    for key in keys:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            materialize(specs[key].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        out[key] = round(best, 3)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = os.path.join(tempfile.gettempdir(), f"bdt_scale_x{copies}")
    # Probe-JVM sizing: replication probes run 32 concurrent tasks
    # over 30-100x data in ONE driver JVM; a production executor has
    # >= 0.5 GB execution memory per core, so an 8g/32-core probe JVM
    # (~144 MB/task) is TIGHTER than any real deployment and turns
    # task-concurrency pressure into probe-only OOMs.  16g (~0.3
    # GB/task) keeps the probe at the stingy end of production sizing
    # without masking genuine per-task unboundedness (the hash-map
    # and width defects this ladder caught were >> 2x effects).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_session(app_name="bdt-scale-probe")
    specs = load_all_operators()

    # Family probes (SPARK_GRAFT_PROBE_KEYS) only replicate the tables
    # their queries read; the default full-headline probe scales all.
    replicate = None
    if os.environ.get("SPARK_GRAFT_PROBE_KEYS"):
        replicate = {
            t for k in probe_keys(specs) for t in specs[k].tables
        } & set(OFFSET_KEYS)

    t0 = time.perf_counter()
    build(spark, src, out, copies, replicate)
    build_sec = round(time.perf_counter() - t0, 1)

    base = time_headline(spark, specs, src)
    scaled = time_headline(spark, specs, out)
    report = {
        k: {
            "sf0.1_sec": base[k],
            f"x{copies}_sec": scaled[k],
            "ratio": round(scaled[k] / base[k], 2) if base[k] else None,
        }
        for k in base
    }
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "copies": copies,
                "build_sec": build_sec,
                "total_sf0.1": round(sum(base.values()), 2),
                f"total_x{copies}": round(sum(scaled.values()), 2),
                "total_ratio": round(sum(scaled.values()) / sum(base.values()), 2),
                "queries": report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
