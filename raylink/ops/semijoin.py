"""Semi / anti join: filter left rows by key membership in the right side.

Ray Data's native ``join`` has no semi/anti types; the right shapes are:

- **broadcast** (right key set small): collect the DISTINCT right keys —
  first reduced per block with ``np.unique`` so only distinct values per
  block reach the driver — ``ray.put`` once, and filter every left batch
  with one vectorized ``isin``.  No shuffle at all.
- **co-scan** (right side large): tag both sides, union, one
  ``sort(key)`` shuffle, and emit each key-group's left rows iff the
  group does (semi) / does not (anti) contain a right row — the same
  sorted-run machinery as the as-of join.

``semi_anti_join`` picks broadcast when the distinct right key count is
within ``broadcast_limit``, else the co-scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["semi_anti_join"]

_SIDE = "__sj_side"


def semi_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    right_key_col: str | None = None,
    anti: bool = False,
    broadcast_limit: int = 5_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Rows of ``left`` whose ``key_col`` is (semi) / is not (anti) present
    in ``right``'s ``right_key_col`` (defaults to ``key_col``).  Null left
    keys never match (SQL ``IN`` / ``NOT EXISTS`` join-key semantics)."""
    rkey = right_key_col or key_col

    def distinct(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        vals = np.asarray(batch[rkey])
        if vals.dtype == object:
            vals = vals[np.array([v is not None for v in vals], dtype=bool)]
        return {rkey: np.unique(vals)}

    rkeys = right.select_columns([rkey]).map_batches(
        distinct, batch_format="numpy", batch_size=None
    ).materialize()
    if rkeys.count() <= broadcast_limit:
        import pandas as pd

        key_set = pd.unique(rkeys.to_pandas()[rkey])
        keys_ref = ray.put(key_set)

        def filt(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            import pandas as pd

            member = pd.Series(batch[key_col]).isin(ray.get(keys_ref))
            member &= pd.Series(batch[key_col]).notna()
            keep = (~member if anti else member).to_numpy()
            return {c: np.asarray(v)[keep] for c, v in batch.items()}

        return left.map_batches(filt, batch_format="numpy")

    # co-scan path: union left rows with right DISTINCT keys
    lschema = left.schema().base_schema
    cols = list(lschema.names)
    union_schema = pa.schema(
        [(c, lschema.field(c).type) for c in cols] + [(_SIDE, pa.int8())]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        arrays = [t.column(c) for c in cols]
        arrays.append(pa.array(np.ones(len(t), dtype=np.int8)))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(t: pa.Table) -> pa.Table:
        n = len(t)
        arrays = []
        for c in cols:
            if c == key_col:
                arrays.append(t.column(rkey).cast(lschema.field(c).type))
            else:
                arrays.append(pa.nulls(n, type=lschema.field(c).type))
        arrays.append(pa.array(np.zeros(n, dtype=np.int8)))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    union = left.map_batches(tag_left, batch_format="pyarrow").union(
        rkeys.map_batches(tag_right, batch_format="pyarrow")
    )

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        side = np.asarray(batch[_SIDE])
        has_right = bool((side == 0).any())
        keep = (side == 1) & (has_right != anti)
        return {c: np.asarray(batch[c])[keep] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        union,
        key_col,
        group_fn,
        empty_fn,
        num_partitions,
        out_schema=lschema,
    )
