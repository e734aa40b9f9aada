"""Distributed global prefix sum: exclusive cumulative offsets in key order.

The primitive behind sequence packing (concat-and-chunk for LLM
pretraining), shard layout, and byte-offset assignment.  Classic
three-step distributed scan:

1. bucket every row by ``order_col // bucket_width``; per-block partial
   sums reduce each block to one row per bucket present in it;
2. the driver exclusive-scans the per-bucket totals (tiny: one float per
   bucket) and broadcasts the base-offset array once via ``ray.put``;
3. one sorted-run scan over buckets finishes each bucket locally
   (in-group sort by ``order_col`` + ``cumsum``) and adds its base.

Only bucket partials shuffle; input rows pay one ``sort(bucket)``
range-partition exchange.  ``bucket_width`` trades driver memory (one
int64 per bucket) against group size — at 10^12 rows keep
``rows_per_bucket x row_width`` within a block and the bucket count
within driver RAM (e.g. width 2^16 -> 15M buckets = 120 MB).
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["global_prefix_sum"]

_BUCKET = "__gps_bucket"


def global_prefix_sum(
    ds: ray.data.Dataset,
    order_col: str,
    val_col: str,
    out_col: str = "offset",
    bucket_width: int = 1 << 14,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exclusive prefix sum of ``val_col`` over ascending ``order_col``
    (int64; values must be unique — ties would make the scan order, and
    therefore every downstream offset, nondeterministic).

    Output: input columns + ``out_col`` (int64) = sum of ``val_col`` over
    all rows with strictly smaller ``order_col``.
    """

    def with_bucket(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out = dict(batch)
        out[_BUCKET] = (
            np.asarray(batch[order_col]).astype(np.int64) // bucket_width
        )
        return out

    # consumed twice (partials pass + final scan): materialize so the
    # upstream lineage doesn't execute twice
    bucketed = ds.map_batches(with_bucket, batch_format="numpy").materialize()
    if bucketed.count() == 0:
        # an empty materialized dataset loses its column schema, so the
        # select/scan below would KeyError — emit the empty result now
        return ds.map_batches(
            lambda t: dict(t, **{out_col: np.zeros(0, dtype=np.int64)}),
            batch_format="numpy",
        )

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        b = batch[_BUCKET]
        v = np.asarray(batch[val_col]).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, v)
        return {_BUCKET: uniq, "s": sums}

    parts_ds = bucketed.select_columns([_BUCKET, val_col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    )
    # partial volume is one row per (block, bucket-touched) — bounded when
    # the input is roughly clustered by order_col.  For unclustered input
    # (every block touches ~rows buckets) merge the partials distributed
    # first so the driver only ever sees one row per bucket.
    parts_ds = parts_ds.materialize()
    if parts_ds.count() > 5_000_000:

        def merge(group: dict[str, np.ndarray]) -> dict:
            return {
                _BUCKET: np.asarray(group[_BUCKET])[:1],
                "s": np.asarray([np.sum(group["s"])], dtype=np.int64),
            }

        def mempty(batch: dict[str, np.ndarray]) -> dict:
            return {
                _BUCKET: np.asarray(batch[_BUCKET])[:0],
                "s": np.empty(0, dtype=np.int64),
            }

        parts_ds = sorted_group_scan(
            parts_ds, _BUCKET, merge, mempty, num_partitions
        )
    parts = parts_ds.to_pandas()
    totals = parts.groupby(_BUCKET)["s"].sum().sort_index()
    if len(totals) == 0:
        return ds.map_batches(
            lambda t: dict(t, **{out_col: np.zeros(0, dtype=np.int64)}),
            batch_format="numpy",
        )
    min_bucket = int(totals.index.min())
    max_bucket = int(totals.index.max())
    dense = np.zeros(max_bucket - min_bucket + 1, dtype=np.int64)
    dense[totals.index.to_numpy() - min_bucket] = totals.to_numpy()
    base = np.concatenate(([0], np.cumsum(dense)[:-1]))
    base_ref = ray.put(base)

    cols = [c for c in (ds.schema().names or []) if c != _BUCKET]

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        b = int(np.asarray(batch[_BUCKET])[0])
        order = np.argsort(
            np.asarray(batch[order_col]).astype(np.int64), kind="stable"
        )
        v = np.asarray(batch[val_col]).astype(np.int64)[order]
        off = np.concatenate(([0], np.cumsum(v)[:-1])) + ray.get(base_ref)[
            b - min_bucket
        ]
        out = {c: np.asarray(batch[c])[order] for c in cols}
        out[out_col] = off
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        bucketed, _BUCKET, group_fn, empty_fn, num_partitions
    )
