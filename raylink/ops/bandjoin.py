"""Standalone numeric band join (un-blocked ``gammaNUMCKpar!`` capability).

The reference's numeric kernel is a sort-merge band sweep over the
concatenated columns (/root/reference/src/gammas/gammaNUMCKpar.jl:40-205).
Distributed, the same semantics become a *bucket join*: each row lands in
bucket ``floor(value / cut)`` and its successor, so any pair within ``cut``
shares a bucket; pairs are generated per bucket and deduplicated by charging
each pair to ``floor(min(v_a, v_b) / cut)`` only.  One sort shuffle, no
global all-pairs, and dense value regions are capped with an explicit
``truncated`` flag on every affected pair.

Executes via :func:`raylink.stages.sortedrun.sorted_group_scan` rather than
``groupby().map_groups`` — buckets are numerous and tiny, exactly the shape
where map_groups' ~300us/group slicing tax dominates (measured in
sortedrun.py).  When ``group_cols`` are present the scan key is a 63-bit
hash of (group_cols, bucket); the per-group UDF re-splits its slice by the
TRUE key tuple, so a hash collision merges groups harmlessly instead of
emitting cross-group pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["band_join_self"]


def _sweep(
    ids: np.ndarray, vals: np.ndarray, bucket: int, cut: float, bucket_cap: int
) -> dict[str, np.ndarray]:
    """Vectorized in-band pair sweep over one true (group, bucket) cell."""
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
    # where hi[i] bounds v_j <= v_i + cut.  The bound is widened one ulp:
    # fl(v_i + cut) can round BELOW the real v_i + cut and exclude a v_j
    # the exact predicate accepts — the sweep must be a superset, the
    # exact keep-filter below prunes
    hi = np.searchsorted(
        vals_s, np.nextafter(vals_s + cut, np.inf), side="right"
    )
    counts = np.maximum(hi - np.arange(n) - 1, 0)
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
    return {
        "id_a": np.where(swap, b, a),
        "id_b": np.where(swap, a, b),
        "diff": vb - va,
        "truncated": np.full(int(keep.sum()), was_truncated, dtype=np.int8),
    }


def band_join_self(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    cut: float,
    group_cols: list[str] | None = None,
    bucket_cap: int = 10_000,
    num_partitions: int | None = None,
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
        out = taken.append_column("_bucket", pa.array(buckets, type=pa.int64()))
        if group_cols:
            from ..functions.hashing import scan_key63

            key = scan_key63(
                [buckets]
                + [
                    taken.column(c).to_numpy(zero_copy_only=False)
                    for c in group_cols
                ]
            )
            out = out.append_column("_scan_key", pa.array(key, type=pa.int64()))
        return out

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def gen(group: dict[str, np.ndarray]) -> dict:
        bkt = np.asarray(group["_bucket"])
        n = len(bkt)
        ids = np.asarray(group[id_col])
        vals = np.asarray(group[value_col], dtype=np.float64)
        if n == 0:
            return _sweep(ids, vals, 0, cut, bucket_cap)
        # re-split by the TRUE key tuple: with group_cols the scan key is a
        # hash, and a collision must not generate cross-group pairs
        key_cols = [np.asarray(group[c]) for c in group_cols] + [bkt]
        if len(key_cols) == 1:
            order = np.argsort(bkt, kind="stable")
        else:
            order = np.lexsort(tuple(reversed(key_cols)))
        sorted_cols = [c[order] for c in key_cols]
        change = np.zeros(n - 1, dtype=bool)
        for c in sorted_cols:
            change |= c[1:] != c[:-1]
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((starts[1:], [n]))
        ids_o, vals_o, bkt_o = ids[order], vals[order], bkt[order]
        parts = [
            _sweep(ids_o[s:e], vals_o[s:e], int(bkt_o[s]), cut, bucket_cap)
            for s, e in zip(starts, ends)
        ]
        out: dict = {}
        for col in parts[0]:
            vs = [p[col] for p in parts]
            out[col] = np.concatenate(vs) if len(vs) > 1 else vs[0]
        return out

    from ..stages.sortedrun import sorted_group_scan

    scan_key = "_scan_key" if group_cols else "_bucket"
    n_part = num_partitions or max(
        32, 2 * int(ray.cluster_resources().get("CPU", 8))
    )
    return sorted_group_scan(
        bucketed,
        scan_key,
        gen,
        lambda batch: gen({k: np.asarray(v)[:0] for k, v in batch.items()}),
        num_partitions=n_part,
    )
