"""Distributed PCA over an embedding column — the dimensionality
reducer in front of the similarity stack (project 64-dim embeddings
to 8 before IVF/LSH and the cells get denser, the matmuls 8× cheaper,
at a measured variance cost). Beyond-reference scope (grep
'pca\\|principal' over /root/reference/src: zero hits). Method:
moment accumulation + eigendecomposition of the covariance — the
textbook exact PCA, organized for Spark:

1. **fit** = ONE ``mapInPandas`` pass emitting per-Arrow-batch
   partial moments (n, Σx, ΣxᵀX as a flattened d×d Gram) — the only
   thing collected is (#batches × (d² + d + 1)) doubles, never rows —
   then a driver-side d×d eigendecomposition (d is the EMBEDDING
   dimension: 64² numbers, microseconds of numpy). This is the
   standard two-phase distributed PCA (MLlib's RowMatrix does the
   same Gram accumulation); the driver step is O(d³), data-size-free.
2. **transform** = one vectorized ``mapInPandas`` projection
   (X − mean) @ Wᵀ — Arrow-batched matmul, no shuffle, no UDF-per-row.

Pinned semantics:
- components are unit-length eigenvectors of the SAMPLE covariance
  (divisor n−1), ordered by eigenvalue descending;
- sign convention: each component's largest-|coordinate| entry is
  made positive (ties: the lowest index wins) — eigenvectors are
  sign-ambiguous; pinning the sign makes fit deterministic given the
  data (up to float reduction order across partitions, which moves
  the last ulps only — no SQL engine ships an eigensolver, so the
  x100 registry row carries a corpus-fingerprint FIXTURE-parquet
  oracle — the 4dp projection, deterministic per corpus on one box —
  with the numpy differential suite in tests/test_pca.py as the
  second line of evidence);
- NULL vectors (column-level NULL) are DROPPED by both fit and
  transform — fit computes moments over non-NULL rows only, and
  pca_transform returns fewer rows than its input when NULLs are
  present (filter or assert upstream if that matters); malformed
  vectors (wrong length) fail loud in both — silent dimension
  coercion hides upstream corruption;
- explained_variance_ratio = eigenvalue_i / Σ all d eigenvalues.

Scale shape: fit touches every row ONCE map-side (partials are
batch-local); nothing row-scale reaches the driver; transform is
embarrassingly parallel. At 100 TB the Gram pass is scan-bound —
exactly the profile you want."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["PCAModel", "pca_fit", "pca_transform"]


@dataclass
class PCAModel:
    mean: np.ndarray                      # (d,)
    components: np.ndarray                # (k, d), rows unit-length
    explained_variance: np.ndarray        # (k,)
    explained_variance_ratio: np.ndarray  # (k,)
    n: int

    @property
    def d(self) -> int:
        return int(self.mean.shape[0])

    @property
    def k(self) -> int:
        return int(self.components.shape[0])


def _check_matrix(pdf_col, d_expect=None):
    """Stack an Arrow list column to a dense (n, d) float64 matrix,
    failing loud on NULLs or ragged lengths."""
    if pdf_col.isnull().any():
        raise ValueError("pca: NULL embedding vector (filter first)")
    lens = {len(v) for v in pdf_col}
    if len(lens) != 1:
        raise ValueError(f"pca: ragged embedding lengths {sorted(lens)}")
    d = lens.pop()
    if d_expect is not None and d != d_expect:
        raise ValueError(
            f"pca: embedding length {d} != model dim {d_expect}"
        )
    return np.stack([np.asarray(v, dtype=np.float64) for v in pdf_col])


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit exact PCA — see module pins. One mapInPandas moment pass +
    a driver d×d eigendecomposition."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("g", ArrayType(DoubleType())),
        ]
    )

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _check_matrix(pdf[vec_col])
            yield pd.DataFrame(
                {
                    "n": [len(mat)],
                    "s": [mat.sum(axis=0).tolist()],
                    "g": [(mat.T @ mat).ravel().tolist()],
                }
            )

    parts = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(moments, schema)
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: no non-NULL vectors")
    dims = {len(r["s"]) for r in parts}
    if len(dims) != 1:
        # each batch is internally consistent but batches disagree
        raise ValueError(f"pca: ragged embedding lengths {sorted(dims)}")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 vectors, got {n}")
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (d, d) rows = components
    # deterministic sign: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(evals.sum())
    ratio = evals / total if total > 0 else np.zeros_like(evals)
    return PCAModel(
        mean=mean,
        components=comps[:k],
        explained_variance=evals[:k],
        explained_variance_ratio=ratio[:k],
        n=int(n),
    )


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    out_col: str = "pc",
) -> DataFrame:
    """Append ``out_col`` = the k-dim projection (X − mean) @ Wᵀ as
    array<double>; all input COLUMNS pass through, but NULL-vector
    ROWS are dropped (module pins) — output row count can be lower
    than input. Arrow-batched matmul, no shuffle."""
    mean, comps, d = model.mean, model.components, model.d
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _check_matrix(pdf[vec_col], d_expect=d)
            proj = (mat - mean) @ comps.T
            pdf = pdf.copy()
            pdf[out_col] = [row.tolist() for row in proj]
            yield pdf

    return df.where(F.col(vec_col).isNotNull()).mapInPandas(
        project, out_schema
    )
