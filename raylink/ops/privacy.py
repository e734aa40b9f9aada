"""Privacy audits over quasi-identifier columns: k-anonymity.

A training-data pipeline that keeps user-linked metadata needs to know
which quasi-identifier combinations single people out BEFORE the table
ships (Sweeney 2002: a release is k-anonymous when every QI combination
matches at least k rows).  :func:`k_anonymity_audit` reports every
violating group — the rows a release would have to generalize,
suppress, or drop.

Scale shape (the repo's partial-counts pattern, as in
``ops/mutualinfo.py``): every block reduces to its per-combination
counts (one pandas groupby — bounded by the block's rows), the partials
merge in a distributed sorted-run scan keyed by an unambiguous
length-prefixed combo string, and only groups with ``n < k`` survive
the merge — so the exchange carries block-bounded partials and the
output is bounded by the violation count, never by input rows.  SQL
semantics throughout: NULL QI values form their own group (the
``GROUP BY`` convention), exact int64 counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["k_anonymity_audit"]


def k_anonymity_audit(
    ds: ray.data.Dataset,
    qi_cols: list[str],
    k: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Every quasi-identifier combination matched by FEWER than ``k``
    rows — the groups that break k-anonymity.  Output one row per
    violating group:

    ``(*qi_cols (input types), n int64)``  with ``1 <= n < k``.

    NULL QI values form their own group, exactly like SQL ``GROUP BY``
    (a null birth date is itself an identifying signature) — for string
    columns; a null in an INTEGER-typed QI column is refused loudly
    (int64 nulls cannot survive the scan's numpy transport without a
    lossy float detour — cast the column to string first), and FLOAT
    QI columns are refused outright (NaN-vs-NULL and -0.0-vs-0.0 have
    no single grouping the pandas block layer can represent faithfully;
    a float is not a quasi-identifier — bucket or round it to a string
    first).  An empty result means the table IS k-anonymous over
    ``qi_cols``.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 can never be violated)")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")

    from ..stages.sortedrun import sorted_group_scan
    from .lag import _arrow_schema
    from .rollup import _encode_combo

    in_schema = _arrow_schema(ds)
    qi_types = {c: in_schema.field(c).type for c in qi_cols}
    for c in qi_cols:
        if pa.types.is_floating(qi_types[c]) or pa.types.is_decimal(
            qi_types[c]
        ):
            raise TypeError(
                f"float QI column {c!r}: NaN-vs-NULL and -0.0 grouping "
                "cannot be represented faithfully — bucket or round it "
                "to a string first"
            )
    cell_schema = pa.schema(
        [("_combo", pa.string())]
        + [(c, qi_types[c]) for c in qi_cols]
        + [("n", pa.int64())]
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        for c in qi_cols:
            if pa.types.is_integer(qi_types[c]) and batch[c].isna().any():
                raise ValueError(
                    f"null in integer QI column {c!r}: int64 nulls do "
                    "not survive the scan's numpy transport — cast the "
                    "column to string first"
                )
        g = (
            batch.groupby(qi_cols, sort=False, observed=True, dropna=False)
            .size()
            .reset_index(name="n")
        )
        if len(g):
            combo = _encode_combo(
                [g[c].to_numpy(dtype=object) for c in qi_cols],
                nulls=[g[c].isna().to_numpy() for c in qi_cols],
            )
        else:
            combo = np.empty(0, dtype=object)
        return pa.Table.from_arrays(
            [pa.array(combo, type=pa.string())]
            + [
                pa.array(g[c].to_numpy(), type=qi_types[c], from_pandas=True)
                for c in qi_cols
            ]
            + [pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64())],
            schema=cell_schema,
        )

    def merge_group(group: dict[str, np.ndarray]) -> dict:
        total = int(np.asarray(group["n"]).sum())
        take = 1 if total < k else 0  # k-anonymous groups emit nothing
        out = {"_combo": np.asarray(group["_combo"])[:take]}
        for c in qi_cols:
            out[c] = np.asarray(group[c])[:take]
        out["n"] = np.array([total], dtype=np.int64)[:take]
        return out

    def merge_empty(batch: dict[str, np.ndarray]) -> dict:
        out = {"_combo": np.asarray(batch["_combo"])[:0]}
        for c in qi_cols:
            out[c] = np.asarray(batch[c])[:0]
        out["n"] = np.empty(0, dtype=np.int64)
        return out

    parts = ds.select_columns(list(qi_cols)).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    merged = sorted_group_scan(
        parts,
        "_combo",
        merge_group,
        merge_empty,
        num_partitions=num_partitions,
        out_schema=cell_schema,
    )
    return merged.map_batches(
        lambda b: b.drop_columns(["_combo"]), batch_format="pyarrow"
    )
