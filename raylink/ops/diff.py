"""Corpus snapshot diff: what changed between two dataset versions.

Training-data pipelines re-ingest sources continuously; the first
question after every refresh is "what actually changed?" — how many
documents were added, removed, or edited, and which ones.  This op
compares two snapshots keyed by id and classifies every id into
``added`` (only in the new snapshot), ``removed`` (only in the old),
``changed`` (both, value differs) or ``unchanged``.

Scale design (100 TB): neither snapshot materializes.  Each side maps
to ``(id, value-hash)`` rows (64-bit SipHash of the compared column —
the full value never shuffles), the tagged union co-locates per id with
one sort, and each id-group classifies in the scan.  Equal-value pairs
collapse to one output row; at 10^12 ids the 63-bit hash admits rare
birthday collisions that would mark a changed doc unchanged — pass
``hash_values=False`` to shuffle exact values when that matters more
than the bandwidth.

SQL equivalent: ``FULL OUTER JOIN`` on id + CASE over null-ness and
value equality (the oracle for ``corpus_diff_docs``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_array
from ..stages.sortedrun import sorted_group_scan

__all__ = ["snapshot_diff"]

_STATUS = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    id_col: str = "doc_id",
    value_col: str = "text",
    hash_values: bool = True,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Classify every id across two snapshots.

    Output columns: ``(id_col, status)`` with status in ``added`` /
    ``removed`` / ``changed`` / ``unchanged``.  Ids must be unique
    within each snapshot (duplicate ids in one side raise — a diff over
    a non-keyed table is meaningless).  A null value is a legitimate
    value: null -> null is unchanged, null -> text is changed.
    """
    from .lag import _arrow_schema

    new_schema = _arrow_schema(new)
    id_type = new_schema.field(id_col).type
    enc_type = pa.int64() if hash_values else new_schema.field(value_col).type

    def side(tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch.column(value_col).to_numpy(zero_copy_only=False)
            # null marker folded into the hash domain: hash(None) is
            # pandas-defined and stable, so null==null compares equal
            if hash_values:
                enc = hash64_array(vals).astype(np.int64).astype(object)
            else:
                enc = np.asarray(vals, dtype=object)
            return pa.Table.from_arrays(
                [
                    batch.column(id_col).cast(id_type),
                    pa.array(enc, type=enc_type, from_pandas=True),
                    pa.array(np.full(len(batch), tag, dtype=np.int8)),
                ],
                names=[id_col, "enc", "side"],
            )

        return fn

    tagged = old.select_columns([id_col, value_col]).map_batches(
        side(0), batch_format="pyarrow"
    ).union(
        new.select_columns([id_col, value_col]).map_batches(
            side(1), batch_format="pyarrow"
        )
    )

    out_schema = pa.schema([(id_col, id_type), ("status", pa.string())])

    def classify(group: dict[str, np.ndarray]) -> dict:
        s = np.asarray(group["side"])
        if len(s) > 2 or (len(s) == 2 and s[0] == s[1]):
            raise ValueError(
                f"duplicate id within one snapshot: {group[id_col][0]!r}"
            )
        if len(s) == 1:
            status = "removed" if s[0] == 0 else "added"
        else:
            e = np.asarray(group["enc"], dtype=object)
            a, b = e[0], e[1]
            same = (a == b) or (a is None and b is None)
            # NaN payloads (unhashed float values) compare by identity
            if not same and isinstance(a, float) and isinstance(b, float):
                same = np.isnan(a) and np.isnan(b)
            status = "unchanged" if same else "changed"
        return {
            id_col: np.asarray(group[id_col])[:1],
            "status": np.array([status], dtype=object),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "status": np.empty(0, dtype=object),
        }

    return sorted_group_scan(
        tagged,
        id_col,
        classify,
        empty,
        num_partitions=num_partitions,
        sort_keys=[id_col, "side"],
        out_schema=out_schema,
    )
