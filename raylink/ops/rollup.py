"""Multi-level aggregation in one input scan (SQL ``GROUP BY ROLLUP`` /
``CUBE``).

The reference engine has no OLAP layer; this is part of the ops surface
a 100-TB training-data pipeline needs for corpus accounting — per
(source, day) token budgets with per-source and corpus totals in one
job instead of three.

Scale shape: the RAW rows are scanned exactly once, producing finest-
level partials per block (the per-partition-sufficient-statistics
combiner: at most |distinct key tuples| rows leave each block).  Every
coarser grouping then re-aggregates an already-aggregated table —
ROLLUP cascades prefix levels (each input strictly smaller than the
last), CUBE derives each of the 2^k - 1 coarser subsets from the finest
level — so the cascade costs one full-data exchange plus exchanges over
aggregate tables.  Sums are carried as half-up e4 fixed-point int64
(``sum_<col>_e4``), bit-identical at any parallelism and summable
across levels without float reassociation drift.

Rolled-up key columns are emitted as NULL (SQL's convention).  A real
NULL key value in the data would be ambiguous with the rollup marker —
exactly as in SQL without ``GROUPING()`` — so null keys are refused
loudly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["grouped_rollup", "grouped_cube", "grouped_grouping_sets"]

_SEP = "\x1f"


def _encode_combo(
    parts: list[np.ndarray], nulls: list[np.ndarray] | None = None
) -> np.ndarray:
    """Unambiguous composite key: each part is length-prefixed
    (``len SEP value`` concatenated), so key values containing the
    separator cannot merge distinct groups (same convention as
    ops/matching.py).  With ``nulls`` (one boolean mask per part, or
    None for an all-valid part), NULL positions get their own marker
    piece (``N SEP``) that no length-prefixed value piece can collide
    with — value pieces always start with a digit."""
    combo = None
    for i, p in enumerate(parts):
        pu = p.astype(str)
        piece = np.char.add(
            np.char.add(np.char.str_len(pu).astype(str), _SEP), pu
        )
        mask = nulls[i] if nulls is not None else None
        if mask is not None and mask.any():
            piece = piece.astype(object)
            piece[mask] = "N" + _SEP
        combo = (
            piece.astype(str)
            if combo is None
            else np.char.add(combo, piece.astype(str))
        )
    return combo.astype(object)


def _merge_fns(keys: list[str], sum_col: str):
    def merge_group(group: dict[str, np.ndarray]) -> dict:
        out = {"_combo": np.asarray(group["_combo"])[:1]}
        for k in keys:
            out[k] = np.asarray(group[k])[:1]
        out["n"] = np.array([np.asarray(group["n"]).sum()], dtype=np.int64)
        out[sum_col] = np.array(
            [np.asarray(group[sum_col]).sum()], dtype=np.int64
        )
        out["_nn"] = np.array(
            [np.asarray(group["_nn"]).sum()], dtype=np.int64
        )
        return out

    def merge_empty(batch: dict[str, np.ndarray]) -> dict:
        out = {"_combo": np.asarray(batch["_combo"])[:0]}
        for k in keys:
            out[k] = np.asarray(batch[k])[:0]
        out["n"] = np.empty(0, dtype=np.int64)
        out[sum_col] = np.empty(0, dtype=np.int64)
        out["_nn"] = np.empty(0, dtype=np.int64)
        return out

    return merge_group, merge_empty


def _level_schema(keys: list[str], sum_col: str) -> pa.Schema:
    return pa.schema(
        [("_combo", pa.string())]
        + [(k, pa.string()) for k in keys]
        + [("n", pa.int64()), (sum_col, pa.int64()), ("_nn", pa.int64())]
    )


def _finest_level(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    sum_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """One raw scan → the finest-level aggregate (materialized), keyed by
    the combined ``_combo`` string with the key parts alongside."""

    def finest_partial(batch: pa.Table) -> pa.Table:
        cols = []
        for k in keys:
            arr = batch.column(k).to_numpy(zero_copy_only=False)
            s = pd.Series(arr, dtype="object")
            if s.isna().any():
                raise ValueError(
                    f"null value in rollup key {k!r}: ambiguous with the "
                    "rollup NULL marker; fill or drop null keys first"
                )
            cols.append(s.astype(str).to_numpy(dtype=object))
        v = np.asarray(
            batch.column(val_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        not_null = ~np.isnan(v)
        v_e4 = np.where(not_null, np.floor(v * 10000 + 0.5), 0).astype(
            np.int64
        )
        combo = _encode_combo(cols)
        uniq, first_idx, inv = np.unique(
            combo, return_index=True, return_inverse=True
        )
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sv = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sv, inv, v_e4)
        # non-null value count per group: SQL SUM over an all-null
        # group is NULL, not 0 — _nn carries that distinction
        nn = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(nn, inv, not_null.astype(np.int64))
        arrays = [pa.array(uniq.astype(str), type=pa.string())]
        names = ["_combo"]
        for j, k in enumerate(keys):
            arrays.append(
                pa.array(cols[j][first_idx].astype(str), type=pa.string())
            )
            names.append(k)
        arrays.append(pa.array(n, type=pa.int64()))
        names.append("n")
        arrays.append(pa.array(sv, type=pa.int64()))
        names.append(sum_col)
        arrays.append(pa.array(nn, type=pa.int64()))
        names.append("_nn")
        return pa.Table.from_arrays(arrays, names=names)

    merge_group, merge_empty = _merge_fns(keys, sum_col)
    partials = ds.select_columns(
        list(dict.fromkeys([*keys, val_col]))
    ).map_batches(finest_partial, batch_format="pyarrow")
    return sorted_group_scan(
        partials,
        "_combo",
        merge_group,
        merge_empty,
        num_partitions=num_partitions,
        out_schema=_level_schema(keys, sum_col),
    ).materialize()


def _reaggregate(
    level: ray.data.Dataset,
    keys: list[str],
    kept: tuple[str, ...],
    sum_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """Aggregate an existing level down to the ``kept`` key subset;
    dropped key columns become NULL."""

    def rekey(batch: pa.Table, _kept=kept) -> pa.Table:
        if _kept:
            parts = [
                np.asarray(
                    batch.column(k).to_numpy(zero_copy_only=False)
                ).astype(str)
                for k in _kept
            ]
            combo_arr = pa.array(_encode_combo(parts), type=pa.string())
        else:
            combo_arr = pa.array(
                np.full(len(batch), "", dtype=object), type=pa.string()
            )
        arrays, names = [combo_arr], ["_combo"]
        for k in keys:
            if k in _kept:
                arrays.append(batch.column(k).cast(pa.string()))
            else:
                arrays.append(pa.nulls(len(batch), type=pa.string()))
            names.append(k)
        arrays.append(batch.column("n"))
        names.append("n")
        arrays.append(batch.column(sum_col))
        names.append(sum_col)
        arrays.append(batch.column("_nn"))
        names.append("_nn")
        return pa.Table.from_arrays(arrays, names=names)

    merge_group, merge_empty = _merge_fns(keys, sum_col)
    return sorted_group_scan(
        level.map_batches(rekey, batch_format="pyarrow"),
        "_combo",
        merge_group,
        merge_empty,
        num_partitions=num_partitions,
        out_schema=_level_schema(keys, sum_col),
    )


def _finish(
    levels: list[ray.data.Dataset], keys: list[str], sum_col: str
) -> ray.data.Dataset:
    out_schema = pa.schema(
        [(k, pa.string()) for k in keys]
        + [("n", pa.int64()), (sum_col, pa.int64())]
    )

    def pin(batch: pa.Table) -> pa.Table:
        # SQL SUM over an all-null value group is NULL, not 0
        nn = batch.column("_nn").to_numpy(zero_copy_only=False)
        arrays = []
        for f in out_schema:
            if f.name == sum_col:
                sv = batch.column(sum_col).to_numpy(zero_copy_only=False)
                arrays.append(
                    pa.array(
                        np.asarray(sv, dtype=np.int64),
                        type=pa.int64(),
                        mask=(np.asarray(nn) == 0),
                    )
                )
            else:
                arrays.append(batch.column(f.name).cast(f.type))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out.map_batches(pin, batch_format="pyarrow")


def grouped_rollup(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """``GROUP BY ROLLUP(keys)``: one output row per group at every
    PREFIX level of ``keys`` (finest first, grand total last), with
    ``n`` (row count) and ``sum_<val_col>_e4`` (half-up e4 fixed-point
    sum).  Key columns are strings; rolled-up positions are NULL."""
    if not keys:
        raise ValueError("keys must be non-empty")
    sum_col = f"sum_{val_col}_e4"
    level = _finest_level(ds, keys, val_col, sum_col, num_partitions)
    levels = [level]
    # cascade: each prefix level re-aggregates the previous (smaller) one
    for depth in range(len(keys) - 1, -1, -1):
        level = _reaggregate(
            level,
            keys,
            tuple(keys[:depth]),
            sum_col,
            max(2, num_partitions // 8),
        ).materialize()
        levels.append(level)
    return _finish(
        [
            lv.map_batches(
                lambda b: b.drop_columns(["_combo"]), batch_format="pyarrow"
            )
            for lv in levels
        ],
        keys,
        sum_col,
    )


def grouped_cube(
    ds: ray.data.Dataset,
    keys: list[str],
    val_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """``GROUP BY CUBE(keys)``: one output row per group at EVERY subset
    of ``keys`` (2^k groupings).  Same output contract as
    :func:`grouped_rollup`.  Every coarser subset derives from the
    finest level (already tiny), so the raw data is still scanned once;
    ``len(keys)`` is capped at 6 (64 groupings) to keep the plan sane."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if len(keys) > 6:
        raise ValueError("cube over more than 6 keys explodes (2^k levels)")
    sum_col = f"sum_{val_col}_e4"
    finest = _finest_level(ds, keys, val_col, sum_col, num_partitions)
    levels = [finest]
    # every proper subset, derived from the finest level
    for mask in range((1 << len(keys)) - 2, -1, -1):
        kept = tuple(k for j, k in enumerate(keys) if mask & (1 << j))
        levels.append(
            _reaggregate(
                finest, keys, kept, sum_col, max(2, num_partitions // 8)
            )
        )
    return _finish(
        [
            lv.map_batches(
                lambda b: b.drop_columns(["_combo"]), batch_format="pyarrow"
            )
            for lv in levels
        ],
        keys,
        sum_col,
    )


def grouped_grouping_sets(
    ds: ray.data.Dataset,
    keys: list[str],
    sets: list[tuple[str, ...]],
    val_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """``GROUP BY GROUPING SETS(sets)``: one output row per group for
    each REQUESTED key subset — the generalization that ROLLUP (prefix
    levels) and CUBE (all subsets) are special cases of.

    ``keys`` is the ordered union of every set (the finest grouping
    computed from the raw scan); each entry of ``sets`` must be a subset
    of it.  The raw data is scanned once (finest-level block partials);
    every requested set is then derived from that already-aggregated
    finest table, so adding a grouping set costs an exchange over an
    aggregate, never another raw scan.  Output contract matches
    :func:`grouped_rollup`: string key columns (NULL where the set drops
    the key), ``n``, and half-up e4 fixed-point ``sum_<val_col>_e4``.

    Duplicate sets are refused (SQL would emit duplicated rows; a
    duplicated aggregate row is almost always a bug upstream, and the
    caller can union the result with itself if they truly want one).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if not sets:
        raise ValueError("sets must be non-empty")
    canon: list[tuple[str, ...]] = []
    seen: set[tuple[str, ...]] = set()
    for s in sets:
        extra = [k for k in s if k not in keys]
        if extra:
            raise ValueError(
                f"grouping set {tuple(s)!r} uses keys {extra!r} not in "
                f"keys={keys!r}"
            )
        c = tuple(k for k in keys if k in s)  # canonical keys order
        if c in seen:
            raise ValueError(f"duplicate grouping set {c!r}")
        seen.add(c)
        canon.append(c)
    sum_col = f"sum_{val_col}_e4"
    finest = _finest_level(ds, keys, val_col, sum_col, num_partitions)
    full = tuple(keys)
    levels = [
        finest
        if c == full
        else _reaggregate(finest, keys, c, sum_col, max(2, num_partitions // 8))
        for c in canon
    ]
    return _finish(
        [
            lv.map_batches(
                lambda b: b.drop_columns(["_combo"]), batch_format="pyarrow"
            )
            for lv in levels
        ],
        keys,
        sum_col,
    )
