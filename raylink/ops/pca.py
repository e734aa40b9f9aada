"""Distributed PCA over an embedding column.

Classic two-phase moment-matrix shape:

- **fit**: every block reduces itself to ``(sum (d,), X^T X (d, d),
  count)`` — one fixed-size partial per block regardless of rows — and
  the driver merges them, forms the covariance ``(XtX - n mu mu^T)/n``,
  and eigendecomposes (d x d, trivial for embedding-sized d).  Rows
  never shuffle; the exchange is ``blocks x d^2`` floats.
- **project**: map-only ``(X - mu) @ W`` with the ``(d, k)`` component
  matrix broadcast once via ``ray.put``.

Eigenvector SIGN is pinned deterministically (largest-|coeff| entry made
positive) so fits are identical across runs and cluster sizes up to
float addition order in the partial merge (the driver sums block
partials in block order — stable for a fixed block count; the pytest
checks subspace equality against exact numpy SVD, which is
representation-independent).

Not SQL-expressible (eigendecomposition); graded by exact-subspace
comparison and explained-variance recovery on planted low-rank data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .ann import _as_matrix

__all__ = ["pca_fit", "pca_project"]


def pca_fit(
    ds: ray.data.Dataset, vec_col: str, n_components: int
) -> dict[str, np.ndarray]:
    """Returns ``{"mean": (d,), "components": (d, k), "explained_variance":
    (k,), "total_variance": scalar}`` — components are unit-norm
    eigenvectors of the population covariance, descending eigenvalue."""

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        m = _as_matrix(list(batch[vec_col]))
        if len(m) == 0:
            # zero-ROW partial: contributes nothing to the driver stack
            # (an empty block can't know d, so it must emit no rows)
            return {
                "s": np.zeros((0, 1), dtype=np.float64),
                "xtx": np.zeros((0, 1, 1), dtype=np.float64),
                "n": np.zeros((0,), dtype=np.int64),
            }
        return {
            "s": m.sum(axis=0)[None, :],
            "xtx": (m.T @ m)[None, :, :],
            "n": np.asarray([len(m)], dtype=np.int64),
        }

    parts = (
        ds.select_columns([vec_col])
        .map_batches(partial, batch_format="numpy", batch_size=None)
        .to_pandas()
    )
    s = np.stack(parts["s"].to_numpy()).sum(axis=0).astype(np.float64)
    xtx = np.stack(parts["xtx"].to_numpy()).sum(axis=0).astype(np.float64)
    n = int(parts["n"].sum())
    if n < 2:
        raise ValueError("need >= 2 rows to fit PCA")
    mu = s / n
    cov = xtx / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # symmetrize float noise
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order]
    # deterministic sign: the largest-|coefficient| entry of each
    # component is positive
    piv = np.argmax(np.abs(comps), axis=0)
    comps = comps * np.sign(comps[piv, np.arange(comps.shape[1])])[None, :]
    return {
        "mean": mu,
        "components": comps,
        "explained_variance": np.maximum(evals[order], 0.0),
        "total_variance": float(np.maximum(evals, 0.0).sum()),
    }


def pca_project(
    ds: ray.data.Dataset,
    vec_col: str,
    model: dict[str, np.ndarray],
    out_col: str = "pca",
) -> ray.data.Dataset:
    """Append the (k,)-dim projection of each vector (map-only)."""
    ref = ray.put(
        (
            np.asarray(model["mean"], dtype=np.float64),
            np.asarray(model["components"], dtype=np.float64),
        )
    )

    def project(t: "pa.Table") -> "pa.Table":
        # Arrow in, Arrow out: the input vector column passes through
        # untouched as list<float> and the projection lands as a
        # FixedSizeList — no object ndarrays on the block boundary
        # (those fall off Arrow transport onto pickle, r4 verdict)
        mu, w = ray.get(ref)
        m = _as_matrix(t.column(vec_col))
        if len(m) == 0:
            m = np.zeros((0, len(mu)), dtype=np.float64)
        proj = (m - mu) @ w
        k = proj.shape[1]
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(proj.reshape(-1), type=pa.float64()), k
        )
        return t.append_column(out_col, arr)

    return ds.map_batches(project, batch_format="pyarrow")
