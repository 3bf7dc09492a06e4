"""PCA projection over the embeddings corpus (SURVEY.md §2.N extras) —
the dimensionality-reduction pass an embedding-heavy training pipeline
runs before clustering/visualization/ANN-compression.

Scale shape (the whole point): NEVER ship vectors to the driver.  The
covariance of a d-dim corpus factors into per-partition partial sums —
``mapInPandas`` computes each partition's (n, Σx, ΣxxT) with one numpy
pass (d=64 ⇒ 4,097 doubles per partition, metadata-sized), a
d²-key aggregate folds them, and only the d×d covariance matrix (32 KB)
reaches the driver for the eigendecomposition.  The top-k components
are then broadcast back and the projection is a pure HOF dot product —
codegen, no Python in the per-row path.  At 100 TB the driver still
sees exactly one 64×64 matrix.

Oracle: eigendecomposition is not expressible in DuckDB SQL, so the
driver check is rows-only by declared contract; the local suite
(tests/test_weak_ops.py) pins every projected coordinate against an
exact numpy PCA of the same rows to ≤1e-6 — including sign
canonicalization, the classic eigenvector ambiguity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

N_COMPONENTS = 2
DIM = 64


def _partial_moments(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition (n, Σx, flattened ΣxxT) in one numpy pass."""
    import numpy as np

    n = 0
    sx = np.zeros(DIM)
    sxx = np.zeros((DIM, DIM))
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        n += x.shape[0]
        sx += x.sum(axis=0)
        sxx += x.T @ x
    if n:
        yield pd.DataFrame(
            {"n": [n], "sx": [sx.tolist()], "sxx": [sxx.ravel().tolist()]}
        )


@query(
    "embed_pca_project",
    sql=None,  # eigendecomposition has no DuckDB twin; numpy-exact pin
    # (≤1e-6 per coordinate, sign-canonicalized) in tests/test_weak_ops.py.
    tables=("embeddings",),
    scale_note=(
        "Distributed PCA without a distributed eigensolver: per-partition "
        "(n, Σx, ΣxxT) via one Arrow/numpy pass (4k doubles per "
        "partition), folded by an array aggregate — the driver receives "
        "ONE 64×64 covariance (32 KB) regardless of corpus size, "
        "eigendecomposes it, and broadcasts the top-2 components; the "
        "projection itself is a codegen HOF dot product over every row. "
        "The exact shape LSA/PCA whitening takes at 100 TB."
    ),
)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the corpus's top-2 principal
    components (per-partition moment aggregation, driver sees only d×d)."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    partials = emb.select("embedding").mapInPandas(
        _partial_moments, schema="n long, sx array<double>, sxx array<double>"
    )
    # Fold partition partials: elementwise array sums (zip_with chains
    # inside a tree-reduce agg — result is one metadata-sized row).
    folded = partials.agg(
        F.sum("n").alias("n"),
        F.aggregate(
            F.collect_list("sx"),
            F.array_repeat(F.lit(0.0), DIM),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("sx"),
        F.aggregate(
            F.collect_list("sxx"),
            F.array_repeat(F.lit(0.0), DIM * DIM),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("sxx"),
    ).first()  # ONE row: n + d + d² doubles — metadata, not data.

    n = folded["n"]
    sx = np.array(folded["sx"])
    sxx = np.array(folded["sxx"]).reshape(DIM, DIM)
    mu = sx / n
    cov = (sxx - np.outer(sx, mu) - np.outer(mu, sx) + n * np.outer(mu, mu)) / (
        n - 1
    )
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:N_COMPONENTS]
    comps = eigvecs[:, order]
    # Canonical sign: largest-|coord| entry of each component positive —
    # removes the ±v eigenvector ambiguity so results are deterministic.
    for j in range(comps.shape[1]):
        pivot = comps[np.argmax(np.abs(comps[:, j])), j]
        if pivot < 0:
            comps[:, j] = -comps[:, j]

    mu_col = F.array(*[F.lit(float(v)) for v in mu])
    centered = F.zip_with("embedding", mu_col, lambda a, b: a - b)
    projections = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(v)) for v in comps[:, j]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias(f"pc{j + 1}")
        for j in range(N_COMPONENTS)
    ]
    return emb.select("vec_id", "label", *projections)
