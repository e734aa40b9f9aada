"""Grouped imputation: forward fill (last observation carried forward).

The telemetry-repair op (sensor dropouts, sparse attribute snapshots):
within each group, ordered by timestamp, every null value takes the most
recent non-null value before it; leading nulls stay null.  Matches the
SQL window ``last_value(v IGNORE NULLS) OVER (PARTITION BY group ORDER
BY ts, tie ROWS UNBOUNDED PRECEDING)``, with the tie column making the
order — and therefore the result — deterministic under equal
timestamps.

Scale shape: one sorted-run scan (the same range-partition shuffle a
``groupby`` pays, nothing else); the per-group fill is a vectorized
``np.maximum.accumulate`` over valid-value indices — no per-row Python.
Unlike most grouped ops here the raw rows DO shuffle (the output is
row-level, there is nothing to pre-reduce), so this op costs exactly one
exchange of the projected columns — project before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["group_fill_forward"]


def group_fill_forward(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    filled_col: str | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-group LOCF of ``value_col`` ordered by (``ts_col``,
    ``tie_col``).  Output columns: ``(group_col, tie_col, value_col,
    filled_col)`` where ``filled_col`` defaults to
    ``f"{value_col}_filled"``.  Works for numeric (NaN = missing) and
    object/string (None = missing) values alike.
    """
    filled_col = filled_col or f"{value_col}_filled"
    cols = [group_col, ts_col, value_col, tie_col]

    def fill(group: dict[str, np.ndarray]) -> dict:
        ts = np.asarray(group[ts_col])
        tie = np.asarray(group[tie_col])
        v = np.asarray(group[value_col])
        order = np.lexsort((tie, ts))
        vo = v[order]
        if vo.dtype.kind == "f":
            valid = ~np.isnan(vo)
        else:
            valid = ~pd.isna(vo)
        n = len(vo)
        idx = np.where(valid, np.arange(n), -1)
        np.maximum.accumulate(idx, out=idx)
        filled = vo[np.maximum(idx, 0)]
        if vo.dtype.kind == "f":
            filled = np.where(idx >= 0, filled, np.nan)
        else:
            filled = filled.astype(object)
            filled[idx < 0] = None
        return {
            group_col: np.asarray(group[group_col])[order],
            tie_col: tie[order],
            value_col: vo,
            filled_col: filled,
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            tie_col: np.asarray(batch[tie_col])[:0],
            value_col: np.asarray(batch[value_col])[:0],
            filled_col: np.asarray(batch[value_col])[:0],
        }

    projected = ds.select_columns(cols)
    # pin output types: a block whose string values are ALL null would
    # otherwise type-infer as null and break Arrow schema unification.
    # try_arrow_schema handles Arrow- AND pandas-backed datasets and
    # logs (never silently swallows) a failed pin — the shared pattern
    # from lag.py/snm.py.
    import pyarrow as pa

    from .lag import try_arrow_schema

    out_schema = None
    base = try_arrow_schema(projected)
    if base is not None:
        vt = base.field(value_col).type
        out_schema = pa.schema(
            [
                base.field(group_col),
                base.field(tie_col),
                pa.field(value_col, vt),
                pa.field(filled_col, vt),
            ]
        )

    return sorted_group_scan(
        projected,
        group_col,
        fill,
        empty,
        num_partitions,
        out_schema=out_schema,
    )
