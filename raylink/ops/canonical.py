"""Survivorship aggregates: grouped mode with deterministic ties.

After clustering (connected components, dedup keepers) an ER pipeline
builds one CANONICAL record per entity; the workhorse aggregate is
"most frequent non-null value per group" (the reference stops at match
output — FastLink.jl's getMatches, /root/reference/src/getMatches.jl —
so survivorship is the natural next step its users run by hand).

Scale shape is combiner-first, same as ``count_by_key``: every block
reduces to at most ``unique(key, value)`` partial-count rows, and only
those partials pay the key shuffle, where a per-group scan sums counts
and takes the argmax.  Input rows never shuffle.

Ties break deterministically — count DESC, then value ASC — matching the
SQL ``row_number() OVER (PARTITION BY key ORDER BY cnt DESC, value)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["grouped_mode", "pa_column_type"]


def pa_column_type(ds: ray.data.Dataset, col: str) -> pa.DataType:
    """Arrow type of ``col`` for Arrow- AND pandas-backed Datasets."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if hasattr(base, "field"):
        return base.field(col).type
    i = list(base.names).index(col)  # PandasBlockSchema
    t = base.types[i]
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string() if getattr(t, "kind", "O") == "O" else pa.int64()


def grouped_mode(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Most frequent non-null ``value_col`` per ``key_col``.

    Output: ``key_col``, ``mode_value`` (string), ``mode_count`` (int64,
    the value's total occurrences).  Null values never win (a key whose
    values are all null emits no row, matching SQL ``WHERE v IS NOT
    NULL``); ties break on value ascending.
    """
    key_type = pa_column_type(ds, key_col)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        mask = pd.notna(vals)
        df = pd.DataFrame({"k": keys[mask], "v": vals[mask]})
        c = (
            df.groupby(["k", "v"], sort=False, dropna=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                key_col: pa.array(c["k"], type=key_type),
                "v": pa.array(c["v"].astype(object), type=pa.string()),
                "cnt": pa.array(c["cnt"], type=pa.int64()),
            }
        )

    partials = ds.select_columns([key_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )

    out_schema = pa.schema(
        [
            pa.field(key_col, key_type),
            pa.field("mode_value", pa.string()),
            pa.field("mode_count", pa.int64()),
        ]
    )

    def group_fn(g: dict[str, np.ndarray]) -> dict:
        vals = np.asarray(g["v"], dtype=object)
        cnt = np.asarray(g["cnt"], dtype=np.int64)
        # sum partial counts per value; sort=True gives value-ascending
        # order, so argmax (first max) IS the count-desc/value-asc winner
        summed = pd.Series(cnt).groupby(pd.Series(vals), sort=True).sum()
        i = int(np.argmax(summed.to_numpy()))
        return {
            key_col: np.asarray(g[key_col])[:1],
            "mode_value": np.array([summed.index[i]], dtype=object),
            "mode_count": np.array([summed.iloc[i]], dtype=np.int64),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "mode_value": np.array([], dtype=object),
            "mode_count": np.array([], dtype=np.int64),
        }

    return sorted_group_scan(
        partials,
        key_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )
