"""Column profiling: per-column row / null / distinct counts.

The data-quality step every ingest pipeline runs first.  Shape: one pass
emits per-block partials — a null/row counter plus the block's DISTINCT
values per column, hashed to stable 64-bit keys so mixed column types
share one partial schema and wide values never leave the block — then the
distinct sets merge either on the driver (small) or through a sorted-run
scan (large), counting uniques per column.

Distinct counts are exact up to 64-bit hash collisions (~n^2 / 2^64 —
negligible below ~10^8 distinct values per column; beyond that switch the
hash to 128 bits before trusting exactness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.hashing import hash64_array

__all__ = ["profile_columns"]

#: hash slot reserved for "no non-null values in this block"
_SENTINEL = np.int64(-(2**63))


def profile_columns(
    ds: ray.data.Dataset,
    cols: list[str],
    driver_threshold: int = 5_000_000,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """One row per profiled column: ``(column, n, n_null, n_distinct)``.

    Nulls are excluded from the distinct count (SQL ``count(DISTINCT)``
    semantics).  Returns a small driver-side DataFrame (one row per
    column).
    """

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out_col: list[str] = []
        out_h: list[np.ndarray] = []
        out_n: list[int] = []
        out_null: list[int] = []
        for c in cols:
            v = np.asarray(batch[c])
            null_mask = pd.isna(v)
            vv = v[~null_mask]
            # int64 view keeps one dtype with the sentinel (uint64 would
            # upcast the concat to float64 and corrupt the hashes)
            h = np.unique(hash64_array(vv).view(np.int64))
            if len(h) == 0:
                # all-null block: a sentinel row still carries the counters
                h = np.array([_SENTINEL], dtype=np.int64)
            out_col.append(c)
            out_h.append(h)
            out_n.append(len(v))
            out_null.append(int(null_mask.sum()))
        reps = np.array([len(h) for h in out_h], dtype=np.int64)
        return {
            "column": np.repeat(np.array(out_col, dtype=object), reps),
            "h": np.concatenate(out_h) if out_h else np.empty(0, np.int64),
            # block-level counters ride on the FIRST hash row per column
            "n": np.concatenate(
                [
                    np.concatenate(([n], np.zeros(r - 1, dtype=np.int64)))
                    if r
                    else np.empty(0, np.int64)
                    for n, r in zip(out_n, reps)
                ]
            ),
            "n_null": np.concatenate(
                [
                    np.concatenate(([m], np.zeros(r - 1, dtype=np.int64)))
                    if r
                    else np.empty(0, np.int64)
                    for m, r in zip(out_null, reps)
                ]
            ),
        }

    parts = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="numpy", batch_size=None)
        .materialize()
    )
    if parts.count() <= driver_threshold:
        df = parts.to_pandas()
        g = df.groupby("column").agg(n=("n", "sum"), n_null=("n_null", "sum"))
        g["n_distinct"] = (
            df[df["h"] != _SENTINEL].groupby("column")["h"].nunique()
        )
        g["n_distinct"] = g["n_distinct"].fillna(0).astype(np.int64)
        return g.reset_index().sort_values("column", ignore_index=True)

    from ..stages.sortedrun import sorted_group_scan

    def merge(group: dict[str, np.ndarray]) -> dict:
        return {
            "column": np.asarray(group["column"])[:1],
            "n": np.asarray([np.sum(group["n"])], dtype=np.int64),
            "n_null": np.asarray([np.sum(group["n_null"])], dtype=np.int64),
            "n_distinct": np.asarray(
                [
                    len(
                        np.unique(
                            np.asarray(group["h"])[
                                np.asarray(group["h"]) != _SENTINEL
                            ]
                        )
                    )
                ],
                dtype=np.int64,
            ),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "column": np.asarray(batch["column"])[:0],
            "n": np.empty(0, np.int64),
            "n_null": np.empty(0, np.int64),
            "n_distinct": np.empty(0, np.int64),
        }

    out = sorted_group_scan(
        parts, "column", merge, empty, num_partitions
    ).to_pandas()
    return out.sort_values("column", ignore_index=True)
