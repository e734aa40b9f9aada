"""Change-data-capture merge: apply an upsert/delete batch to a snapshot.

The MERGE INTO of a curation pipeline: a base snapshot plus a (usually
much smaller, but unbounded) change batch — rows to upsert (insert or
replace by id) and ids to delete — yield the next snapshot version.
Together with :func:`raylink.ops.diff.snapshot_diff` this closes the
versioned-corpus loop: diff tells you what a refresh did, merge applies
a curated change set.

Scale design (100 TB): both sides stream; the tagged union co-locates
per id with one sort and each id-group resolves locally (change wins,
delete emits nothing).  Neither side is ever collected; the change
batch needs no special casing when it grows to snapshot size.

Ambiguity is refused loudly: more than one change row per id, or
duplicate ids in the base, raise instead of picking silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["apply_changes"]


def apply_changes(
    base: ray.data.Dataset,
    changes: ray.data.Dataset,
    id_col: str = "doc_id",
    op_col: str = "op",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Merge a change batch into a snapshot.

    ``changes`` must carry every ``base`` column plus ``op_col`` with
    values ``"upsert"`` (insert new id or replace the base row) or
    ``"delete"`` (drop the id; deleting an absent id is a no-op).
    Returns the merged snapshot with ``base``'s schema.
    """
    from .lag import _arrow_schema

    base_schema = _arrow_schema(base)
    data_cols = list(base_schema.names)
    missing = [c for c in data_cols if c not in _arrow_schema(changes).names]
    if missing:
        raise ValueError(f"changes is missing base columns: {missing}")

    union_schema = pa.schema(
        [(c, base_schema.field(c).type) for c in data_cols]
        + [("side", pa.int8()), ("_op", pa.string())]
    )

    def tag_base(t: pa.Table) -> pa.Table:
        arrays = [
            t.column(c).cast(base_schema.field(c).type) for c in data_cols
        ]
        arrays.append(pa.array(np.zeros(len(t), dtype=np.int8)))
        arrays.append(pa.nulls(len(t), type=pa.string()))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_changes(t: pa.Table) -> pa.Table:
        ops = t.column(op_col).to_numpy(zero_copy_only=False)
        # mask nulls before np.unique: numpy's sort cannot order None
        # next to str, and a null op must surface as a LOUD bad-op error
        import pandas as pd

        null_mask = pd.isna(ops)
        bad = [
            o for o in np.unique(ops[~null_mask].astype(object))
            if o not in ("upsert", "delete")
        ]
        if null_mask.any():
            bad.append(None)
        if bad:
            raise ValueError(f"unknown change op(s): {bad}")
        arrays = [
            t.column(c).cast(base_schema.field(c).type) for c in data_cols
        ]
        arrays.append(pa.array(np.ones(len(t), dtype=np.int8)))
        arrays.append(pa.array(ops.astype(object), type=pa.string()))
        return pa.Table.from_arrays(arrays, schema=union_schema)

    tagged = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(tag_changes, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [(c, base_schema.field(c).type) for c in data_cols]
    )

    def resolve(group: dict[str, np.ndarray]) -> dict:
        side = np.asarray(group["side"])
        n_changes = int((side == 1).sum())
        n_base = len(side) - n_changes
        if n_changes > 1:
            raise ValueError(
                f"multiple change rows for id {group[id_col][0]!r}"
            )
        if n_base > 1:
            raise ValueError(
                f"duplicate base rows for id {group[id_col][0]!r}"
            )
        if n_changes:
            i = int(np.flatnonzero(side == 1)[0])
            op = group["_op"][i]
            if op == "delete":
                idx = np.empty(0, dtype=np.int64)
            else:
                idx = np.array([i], dtype=np.int64)
        else:
            idx = np.array([0], dtype=np.int64)
        return {c: np.asarray(group[c], dtype=object)[idx] for c in data_cols}

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.empty(0, dtype=object) for c in data_cols}

    return sorted_group_scan(
        tagged,
        id_col,
        resolve,
        empty,
        num_partitions=num_partitions,
        sort_keys=[id_col, "side"],
        out_schema=out_schema,
    )
