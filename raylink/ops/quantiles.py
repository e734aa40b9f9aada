"""Grouped quantiles: exact linear-interpolated percentiles per key.

One ``sort(key)`` range-partition shuffle, then each whole key-group
computes its quantiles with a single vectorized ``np.quantile`` call
(sorted-run scan; the same one-group-fits-a-block partitioning assumption
every sorted-run consumer here documents).  ``np.quantile``'s default
linear interpolation matches SQL ``quantile_cont`` / ``percentile_cont``
semantics exactly ((n-1)*q index convention).

For groups too large for one block, pre-bin values into a fixed-point
histogram first (``count_by_key`` on (key, bin)) and run this over the
histogram — exact for discrete data, epsilon-bounded for continuous.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["grouped_quantiles"]


def grouped_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-``key_col`` quantiles of ``val_col`` at each q in ``qs``.

    Output: one row per key with columns ``q{int(q*100)}`` (float64).
    Null values are dropped per group (SQL aggregate semantics).
    """
    names = [f"q{int(round(q * 100)):02d}" for q in qs]
    q_arr = np.asarray(qs, dtype=np.float64)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[val_col], dtype=np.float64)
        v = v[~np.isnan(v)]
        out: dict = {key_col: np.asarray(batch[key_col])[:1]}
        if len(v) == 0:
            for nm in names:
                out[nm] = np.array([np.nan])
            return out
        vals = np.quantile(v, q_arr)
        for nm, x in zip(names, vals):
            out[nm] = np.array([x])
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out: dict = {key_col: np.asarray(batch[key_col])[:0]}
        for nm in names:
            out[nm] = np.empty(0, dtype=np.float64)
        return out

    return sorted_group_scan(
        ds.select_columns([key_col, val_col]),
        key_col,
        group_fn,
        empty_fn,
        num_partitions,
    )
