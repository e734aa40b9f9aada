"""Grouped ordered string concatenation (SQL ``string_agg``).

"The user's event journey as one string" is the standard sequence-
building aggregate for session analysis and for turning event logs into
training documents.  The reference has no aggregate layer at all (it
stops at match output), so this op follows the repo's sorted-run shape:

- the input projects to exactly (key, order cols, value) — nothing else
  pays the shuffle;
- one range-partition sort by key (the same data movement any groupby
  pays — concatenation is order-sensitive, so unlike ``grouped_mode``
  there is no per-block partial that can shrink it);
- each group concatenates at numpy speed after an in-group lexsort on
  the order columns (callers should include a unique tie-break column,
  e.g. the event id, for fully deterministic output).

Null values are skipped (SQL ``string_agg`` semantics); a key whose
values are all null emits no row (match it with ``WHERE v IS NOT NULL``
in the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan
from .canonical import pa_column_type

__all__ = ["grouped_concat"]


def grouped_concat(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    sep: str = ",",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key ``sep``-joined ``value_col`` ordered by ``order_cols``.

    Output: ``key_col``, ``concat`` (string), ``n`` (int64 — the number
    of non-null values joined).
    """
    if not order_cols:
        raise ValueError("grouped_concat needs at least one order column")
    key_type = pa_column_type(ds, key_col)

    def prune(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # drop null values AND null keys before the shuffle
        mask = pc.and_(
            pc.is_valid(batch.column(value_col)),
            pc.is_valid(batch.column(key_col)),
        )
        return batch.filter(mask)

    pruned = ds.select_columns([key_col, *order_cols, value_col]).map_batches(
        prune, batch_format="pyarrow"
    )

    out_schema = pa.schema(
        [
            pa.field(key_col, key_type),
            pa.field("concat", pa.string()),
            pa.field("n", pa.int64()),
        ]
    )

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        vals = np.asarray(g[value_col], dtype=object)
        # lexsort: last key is primary, so reverse the order columns
        keys = []
        for c in reversed(order_cols):
            arr = np.asarray(g[c])
            if np.issubdtype(arr.dtype, np.datetime64):
                arr = arr.astype("datetime64[us]").view("int64")
            elif arr.dtype == object:
                # object order columns sort as strings for determinism
                arr = np.asarray(pd.Series(arr).astype(str))
            keys.append(arr)
        order = np.lexsort(tuple(keys))
        joined = pd.Series(vals[order]).astype(str).str.cat(sep=sep)
        return {
            key_col: np.asarray(g[key_col])[:1],
            "concat": [joined],
            "n": np.array([len(vals)], dtype=np.int64),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "concat": [],
            "n": np.array([], dtype=np.int64),
        }

    return sorted_group_scan(
        pruned,
        key_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )
