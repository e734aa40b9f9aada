"""Distribution drift between two corpus snapshots: binned PSI.

The data-quality family's distribution-level member (``ops/diff.py``
diffs ROWS, ``ops/validate.py`` gates single columns, ``ops/profile.py``
summarizes one snapshot): given a REFERENCE snapshot and a CURRENT one,
bucket a numeric column on a shared edge grid and report the population
stability index contribution per bucket — the standard
"did the feature distribution move?" monitor in front of a model or a
training-data mixture.

Scale shape: each side reduces to a ``bins``-length count vector per
block (one ``searchsorted`` + ``bincount`` — nothing shuffles at all;
the partials stream to the driver where the merged histogram is a few
dozen ints).  PSI math happens on the driver over that tiny vector.

Semantics (pinned so the DuckDB oracle matches exactly):

- bucket of ``v`` = number of edges ≤ ``v`` (half-open ``[lo, hi)``
  buckets, underflow bucket 0, overflow bucket ``len(edges)``);
- nulls and NaNs are excluded from both counts (reported via the
  ``n_*`` totals summing below the input row count);
- fractions are clamped to ``eps`` (default 1e-6) before the log so
  empty buckets contribute a finite term (the standard PSI smoothing);
- per-bucket term = ``(p_cur - p_ref) * ln(p_cur / p_ref)``, emitted
  half-up e4 fixed point; total PSI is the sum of the terms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["distribution_drift"]


def _bucket_counts(
    ds: ray.data.Dataset, col: str, edges: np.ndarray
) -> np.ndarray:
    nb = len(edges) + 1

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        v = np.asarray(batch[col], dtype=np.float64)
        v = v[~np.isnan(v)]
        c = np.bincount(
            np.searchsorted(edges, v, side="right"), minlength=nb
        )
        return {
            "bin": np.arange(nb, dtype=np.int64),
            "n": c.astype(np.int64),
        }

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    ).to_pandas()
    out = np.zeros(nb, dtype=np.int64)
    np.add.at(out, parts["bin"].to_numpy(), parts["n"].to_numpy())
    return out


def distribution_drift(
    ref: ray.data.Dataset,
    cur: ray.data.Dataset,
    col: str,
    edges: list[float],
    eps: float = 1e-6,
) -> ray.data.Dataset:
    """PSI drift of ``cur`` vs ``ref`` on ``col`` over the shared
    ``edges`` grid (must be strictly increasing and finite).  Output one
    row per bucket:

    ``(bin int64, n_ref int64, n_cur int64, psi_term_e4 int64)``

    where ``sum(psi_term_e4) / 1e4`` is the total PSI (rule of thumb:
    < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift).
    """
    e = np.asarray(edges, dtype=np.float64)
    if len(e) < 1:
        raise ValueError("edges must contain at least one cut point")
    if not np.isfinite(e).all():
        raise ValueError("edges must be finite")
    if len(e) > 1 and not (np.diff(e) > 0).all():
        raise ValueError("edges must be strictly increasing")
    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1): {eps}")

    n_ref = _bucket_counts(ref, col, e)
    n_cur = _bucket_counts(cur, col, e)
    t_ref, t_cur = n_ref.sum(), n_cur.sum()
    if t_ref == 0 or t_cur == 0:
        raise ValueError(
            f"empty snapshot after null/NaN exclusion "
            f"(ref={t_ref}, cur={t_cur}); PSI is undefined"
        )
    p_ref = np.maximum(n_ref / t_ref, eps)
    p_cur = np.maximum(n_cur / t_cur, eps)
    term = (p_cur - p_ref) * np.log(p_cur / p_ref)
    return ray.data.from_arrow(
        pa.table(
            {
                "bin": pa.array(np.arange(len(e) + 1, dtype=np.int64)),
                "n_ref": pa.array(n_ref),
                "n_cur": pa.array(n_cur),
                "psi_term_e4": pa.array(
                    np.floor(term * 10_000.0 + 0.5).astype(np.int64)
                ),
            }
        )
    )
