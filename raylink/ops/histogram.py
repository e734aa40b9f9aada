"""Grouped fixed-bin histograms: the distribution profile that powers
data-quality dashboards (per-source length distributions, per-type value
spreads) without ever shipping raw values.

Combiner-first: each block bins its own rows (one vectorized
``floor((v - lo) / width)`` + ``np.unique``) and emits partials ``(key,
bin, n)`` — at most ``n_bins`` rows per key per block — so only
histogram-sized partials shuffle, never the input.  A sorted-run scan
per key then sums partial counts per bin.  Bin ids clamp to
``[0, n_bins-1]`` (under/overflow land in the edge bins, SQL
``LEAST/GREATEST`` semantics); nulls are dropped (SQL aggregate
semantics); only observed bins emit rows (GROUP BY semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["grouped_histogram"]


def grouped_histogram(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-``key_col`` histogram of ``val_col`` over ``n_bins`` equal
    bins spanning ``[lo, hi)``.  Output: (key, bin int64, cnt int64),
    one row per observed (key, bin)."""
    if not (hi > lo):
        raise ValueError("hi must be > lo")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    width = (hi - lo) / n_bins

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        ok = ~np.isnan(v)
        if keys.dtype == object:
            # dtype=bool: an empty comprehension otherwise infers float64
            # and bool &= float64 raises
            ok &= np.array([k is not None for k in keys], dtype=bool)
        keys, v = keys[ok], v[ok]
        # clip BEFORE the int cast so +/-inf clamps to the edge bins
        # (inf.astype(int64) is undefined) — LEAST/GREATEST semantics
        bins = np.clip(
            np.floor((v - lo) / width), 0, n_bins - 1
        ).astype(np.int64)
        # per-block combine on the composite (key, bin)
        order = np.lexsort((bins, keys))
        ks, bs = keys[order], bins[order]
        change = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            change[1:] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(ks)))
        return pa.table(
            {
                key_col: pa.array(ks[starts]),
                "bin": pa.array(bs[starts]),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    def merge(group: dict[str, np.ndarray]) -> dict:
        bins = np.asarray(group["bin"])
        n = np.asarray(group["n"])
        uniq = np.unique(bins)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, np.searchsorted(uniq, bins), n)
        return {
            key_col: np.repeat(np.asarray(group[key_col])[:1], len(uniq)),
            "bin": uniq,
            "cnt": cnt,
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "bin": np.empty(0, dtype=np.int64),
            "cnt": np.empty(0, dtype=np.int64),
        }

    partials = ds.select_columns([key_col, val_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return sorted_group_scan(partials, key_col, merge, empty,
                             num_partitions)
