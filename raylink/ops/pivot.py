"""Pivot / wide categorical aggregation: one row per key, one count
column per category — the feature-engineering "crosstab" shape.

Combiner-first like ``count_by_key``: every block reduces to per-(key,
category) partial counts via one ``np.unique`` over the factorized
composite, so only partials — at most ``keys_per_block x n_categories``
rows — pay the shuffle; a sorted-run scan then emits each key's wide row.
The category set must be SMALL and CLOSED (explicit list): pivoting on an
unbounded column is a schema explosion, so unknown categories either
raise or fold into an ``other`` column, never silently widen the schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["pivot_counts", "unpivot"]


def pivot_counts(
    ds: ray.data.Dataset,
    key_col: str,
    cat_col: str,
    categories: list[str],
    other: str | None = "other",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """One row per ``key_col`` with an int64 ``n_<category>`` column per
    entry of ``categories`` (+ ``n_<other>`` unless ``other=None``, in
    which case an unseen category raises).
    """
    if len(set(categories)) != len(categories):
        raise ValueError("categories must be unique")
    cat_to_idx = {c: i for i, c in enumerate(categories)}
    n_cats = len(categories) + (1 if other is not None else 0)
    out_names = [f"n_{c}" for c in categories] + (
        [f"n_{other}"] if other is not None else []
    )

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        keys = np.asarray(batch[key_col])
        cats = np.asarray(batch[cat_col])
        uc, ci = np.unique(cats, return_inverse=True)
        code_of_uc = np.empty(len(uc), dtype=np.int64)
        for i, c in enumerate(uc):
            code = cat_to_idx.get(c)
            if code is None:
                if other is None:
                    raise ValueError(f"unknown category {c!r}")
                code = len(categories)
            code_of_uc[i] = code
        cat_code = code_of_uc[ci]
        uk, ki = np.unique(keys, return_inverse=True)
        comp = ki * n_cats + cat_code
        uc2, cnt = np.unique(comp, return_counts=True)
        return {
            key_col: uk[uc2 // n_cats],
            "__cat": (uc2 % n_cats).astype(np.int64),
            "__n": cnt.astype(np.int64),
        }

    partials = ds.select_columns([key_col, cat_col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    )

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        counts = np.zeros(n_cats, dtype=np.int64)
        np.add.at(counts, np.asarray(batch["__cat"]), np.asarray(batch["__n"]))
        out: dict = {key_col: np.asarray(batch[key_col])[:1]}
        for i, nm in enumerate(out_names):
            out[nm] = counts[i : i + 1]
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out: dict = {key_col: np.asarray(batch[key_col])[:0]}
        for nm in out_names:
            out[nm] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        partials, key_col, group_fn, empty_fn, num_partitions
    )


def unpivot(
    ds: ray.data.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
    include_nulls: bool = False,
) -> ray.data.Dataset:
    """Wide -> long (SQL ``UNPIVOT`` / pandas ``melt``): each input row
    emits one output row per entry of ``value_cols`` — the id columns,
    the source column's NAME, and its VALUE.

    Map-only (no shuffle): each block independently stacks one slice per
    value column, so the transform streams at read speed and the output
    is ``len(value_cols)``x the input rows.  ``include_nulls=False`` is
    SQL UNPIVOT's contract (rows whose value is NULL are dropped);
    ``True`` keeps them (the UNION-ALL formulation).  Value columns must
    share one type, or all be numeric (promoted to float64) — mixed
    non-numeric types are refused rather than silently stringified.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    overlap = set(id_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"columns {sorted(overlap)!r} in both id and value")
    if var_name == value_name or {var_name, value_name} & set(id_cols):
        raise ValueError("var_name / value_name clash with id columns")

    def melt_batch(batch: pa.Table) -> pa.Table:
        types = {str(batch.column(c).type) for c in value_cols}
        if len(types) == 1:
            target = batch.column(value_cols[0]).type
        else:
            if not all(
                pa.types.is_integer(batch.column(c).type)
                or pa.types.is_floating(batch.column(c).type)
                for c in value_cols
            ):
                raise ValueError(
                    f"value_cols mix non-numeric types {sorted(types)!r}; "
                    "cast them to one type first"
                )
            target = pa.float64()
        pieces = []
        for c in value_cols:
            vals = batch.column(c).cast(target).combine_chunks()
            tbl = pa.Table.from_arrays(
                [batch.column(k) for k in id_cols]
                + [
                    # pin string: an empty block would otherwise infer
                    # a null-typed var column (heterogeneous schemas)
                    pa.array(
                        np.full(len(batch), c, dtype=object),
                        type=pa.string(),
                    ),
                    vals,
                ],
                names=[*id_cols, var_name, value_name],
            )
            if not include_nulls and vals.null_count:
                tbl = tbl.filter(pa.compute.is_valid(tbl.column(value_name)))
            pieces.append(tbl)
        return pa.concat_tables(pieces)

    return ds.select_columns(
        list(dict.fromkeys([*id_cols, *value_cols]))
    ).map_batches(melt_batch, batch_format="pyarrow")
