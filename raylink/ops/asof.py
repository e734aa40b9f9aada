"""As-of join: each left row matched to the latest right row at-or-before
its timestamp, per key (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics, backward direction, inner).

Ray Data has no asof operator; the scale-safe composition is the repo's
sorted-run shape: tag the two sides, union them into ONE dataset, pay a
single ``sort(key, ts)`` range-partition shuffle, then resolve every
match inside each key-group with one ``searchsorted`` — no per-pair rows,
no broadcast of either side.  Partitioning assumption: one key's rows fit
in a block's group slice (the same assumption every sorted-run consumer
here documents); per-key volume is bounded by the time range, not the
corpus.

Ties on (key, ts) within the right side yield a single arbitrary match
(as in DuckDB); callers needing determinism must de-duplicate right-side
timestamps first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["asof_join"]

_SIDE = "__asof_side"
_TS = "__asof_ts"


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if not isinstance(base, pa.Schema):
        raise TypeError(
            "asof_join requires Arrow-backed datasets (read_parquet / "
            f"from_arrow); got block schema {s!r}"
        )
    return base


def _ts_int64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Order key as comparable int64 (timestamps: epoch in their own unit)."""
    return col.cast(pa.int64())


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    suffix: str = "_r",
    tolerance: int | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Backward as-of join (inner): for each left row, the latest right row
    of the same ``key_col`` with ``right.ts <= left.ts`` (equality counts;
    ``tolerance`` additionally requires ``left.ts - right.ts <=
    tolerance``, in the ts column's native integer unit).

    ``left_cols`` are emitted under their own names, ``right_cols`` under
    ``name + suffix``; both lists may overlap (self-joins are fine).
    Unmatched left rows are dropped.
    """
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_cols = [c for c in left_cols if c != key_col]
    names = [key_col] + left_cols + [c + suffix for c in right_cols]
    if len(set(names)) != len(names):
        raise ValueError(f"asof_join output column collision: {names}")
    out_fields = [(key_col, lschema.field(key_col).type)]
    out_fields += [(c, lschema.field(c).type) for c in left_cols]
    out_fields += [(c + suffix, rschema.field(c).type) for c in right_cols]
    union_schema = pa.schema(
        out_fields + [(_TS, pa.int64()), (_SIDE, pa.int8())]
    )
    out_schema = pa.schema(out_fields)

    def tag(side: int):
        cols = left_cols if side == 1 else right_cols

        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            arrays = []
            for name, typ in out_fields:
                if name == key_col:
                    arrays.append(t.column(key_col).cast(typ))
                elif side == 1 and name in left_cols:
                    arrays.append(t.column(name).cast(typ))
                elif side == 0 and name.endswith(suffix) and name[: -len(suffix)] in cols:
                    arrays.append(t.column(name[: -len(suffix)]).cast(typ))
                else:
                    arrays.append(pa.nulls(n, type=typ))
            arrays.append(_ts_int64(t.column(ts_col)))
            arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return fn

    lsel = list({key_col, ts_col, *left_cols})
    rsel = list({key_col, ts_col, *right_cols})
    union = left.select_columns(lsel).map_batches(
        tag(1), batch_format="pyarrow"
    ).union(right.select_columns(rsel).map_batches(tag(0), batch_format="pyarrow"))

    left_names = [key_col] + list(left_cols)
    right_names = [(c, c + suffix) for c in right_cols]

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        side = np.asarray(batch[_SIDE])
        ts = np.asarray(batch[_TS])
        r = np.flatnonzero(side == 0)
        l = np.flatnonzero(side == 1)
        if len(r) == 0 or len(l) == 0:
            return {n: batch[n][:0] for n, _ in out_fields}
        r = r[np.argsort(ts[r], kind="stable")]
        idx = np.searchsorted(ts[r], ts[l], side="right") - 1
        ok = idx >= 0
        if tolerance is not None:
            ok &= ts[l] - ts[r[np.clip(idx, 0, None)]] <= tolerance
        li = l[ok]
        ri = r[idx[ok]]
        out = {n: np.asarray(batch[n])[li] for n in left_names}
        for src, dst in right_names:
            out[dst] = np.asarray(batch[dst])[ri]
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {n: np.asarray(batch[n])[:0] for n, _ in out_fields}

    return sorted_group_scan(
        union,
        key_col,
        group_fn,
        empty_fn,
        num_partitions,
        sort_keys=[key_col, _TS],
        out_schema=out_schema,
    )
