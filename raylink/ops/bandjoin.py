"""Standalone numeric band join (un-blocked ``gammaNUMCKpar!`` capability).

The reference's numeric kernel is a sort-merge band sweep over the
concatenated columns (/root/reference/src/gammas/gammaNUMCKpar.jl:40-205).
Distributed, the same semantics become a *bucket join*: each row lands in
bucket ``floor(value / cut)`` and its successor, so any pair within ``cut``
shares a bucket; pairs are generated per bucket and deduplicated by charging
each pair to ``floor(min(v_a, v_b) / cut)`` only.  One groupby shuffle, no
global sort, and dense value regions are capped with an explicit truncation
flag.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["band_join_self"]


def band_join_self(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    cut: float,
    group_cols: list[str] | None = None,
    bucket_cap: int = 10_000,
) -> ray.data.Dataset:
    """All pairs (id_a < id_b) with ``|v_a - v_b| <= cut`` (optionally also
    equal on ``group_cols``).  Returns (id_a, id_b, diff, truncated);
    ``truncated`` is 1 on every pair emitted from a bucket that exceeded
    ``bucket_cap`` (whose pairs are therefore incomplete) — truncation is
    explicit, never silent."""
    group_cols = group_cols or []

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        base = np.floor(v / cut).astype(np.int64)
        n = len(v)
        # each row also visits the bucket BELOW, so the higher value of any
        # in-band pair reaches the lower value's bucket (the canonical one)
        idx = np.concatenate([np.arange(n), np.arange(n)])
        buckets = np.concatenate([base, base - 1])
        taken = batch.take(pa.array(idx))
        return taken.append_column("_bucket", pa.array(buckets, type=pa.int64()))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def gen(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(group[id_col])
        vals = np.asarray(group[value_col], dtype=np.float64)
        bucket = int(np.asarray(group["_bucket"])[0])
        empty = {
            "id_a": ids[:0],
            "id_b": ids[:0],
            "diff": np.empty(0, dtype=np.float64),
            "truncated": np.empty(0, dtype=np.int8),
        }
        n = len(ids)
        if n < 2:
            return empty
        was_truncated = n > bucket_cap
        if was_truncated:
            order = np.argsort(vals, kind="stable")[:bucket_cap]
            ids, vals = ids[order], vals[order]
            n = bucket_cap
        order = np.argsort(vals, kind="stable")
        ids_s, vals_s = ids[order], vals[order]
        # sorted sweep, vectorized: for each i, pairs (i, j) for i < j < hi[i]
        # where hi[i] bounds v_j <= v_i + cut
        hi = np.searchsorted(vals_s, vals_s + cut, side="right")
        counts = hi - np.arange(n) - 1
        counts = np.maximum(counts, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        ia = np.repeat(np.arange(n), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ib = np.arange(total) - np.repeat(starts, counts) + ia + 1
        va, vb = vals_s[ia], vals_s[ib]
        # exact band predicate in subtraction form ((vb - va) <= cut), which
        # float-rounds differently from the searchsorted vb <= va + cut at
        # the boundary — match SQL abs-difference semantics exactly
        keep = (vb - va) <= cut
        # charge each pair to its canonical (lower-value) bucket only
        keep &= np.floor(np.minimum(va, vb) / cut).astype(np.int64) == bucket
        ia, ib, va, vb = ia[keep], ib[keep], va[keep], vb[keep]
        a, b = ids_s[ia], ids_s[ib]
        swap = a > b
        out_a = np.where(swap, b, a)
        out_b = np.where(swap, a, b)
        return {
            "id_a": out_a,
            "id_b": out_b,
            "diff": vb - va,
            "truncated": np.full(len(out_a), was_truncated, dtype=np.int8),
        }

    keys = [*group_cols, "_bucket"]
    return bucketed.groupby(keys).map_groups(gen, batch_format="numpy")
