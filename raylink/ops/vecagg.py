"""Grouped vector aggregates: per-label embedding sums / centroids.

The centroid-computation primitive behind IVF coarse quantizers, class
prototypes, and embedding-drift monitoring.  Combiner-first over
FIXED-POINT integers:

- each block zero-copies its embedding column to an (n, d) matrix
  (``ann._as_matrix``), quantizes to e``scale`` int64 and reduces to one
  ``(label, dim) -> (sum, count)`` partial per label present — so the
  shuffle carries ``labels x d`` ints per block, never vectors;
- partials merge on the driver (labels x d is tiny for real label
  cardinalities) into the long-format result.

Integer sums make the result EXACT: float vector accumulation order
differs between engines and cluster sizes, but int64 sums of quantized
components are associative — the DuckDB oracle (zipped ``unnest`` of the
list column) matches bit-for-bit.  Callers derive float centroids as
``s / (count * scale)`` downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .ann import _as_matrix

__all__ = ["group_vector_sums"]


def group_vector_sums(
    ds: ray.data.Dataset,
    label_col: str,
    vec_col: str,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """Long-format per-(label, dim) fixed-point vector sums: columns
    ``(label, dim, s, n)`` with ``s = sum(floor(v*scale + 0.5))`` and
    ``n`` the vector count.  Requires uniform dimensionality."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # empty block: zero-row partial, pinned types
            return pa.table(
                {
                    label_col: pa.array(
                        [], type=batch.schema.field(label_col).type
                    ),
                    "dim": pa.array([], type=pa.int64()),
                    "s": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        m = _as_matrix(batch.column(vec_col))
        vc = np.floor(m * scale + 0.5).astype(np.int64)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = vc.shape[1]
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, vc)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                label_col: pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(counts, d)),
            }
        )

    parts = ds.select_columns([label_col, vec_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    # driver merge: one row per (label, dim) per block — tiny
    df = parts.to_pandas()
    out = (
        df.groupby([label_col, "dim"], sort=True)[["s", "n"]]
        .sum()
        .reset_index()
    )
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                label_col: out[label_col],
                "dim": out["dim"].astype(np.int64),
                "s": out["s"].astype(np.int64),
                "n": out["n"].astype(np.int64),
            }
        )
    )
