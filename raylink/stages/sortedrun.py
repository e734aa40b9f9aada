"""Sorted-run group execution: ``groupby().map_groups`` without the tax.

Ray Data's ``map_groups`` costs ~300us of per-group slicing/format
machinery; corpora whose groups are tiny (pair-group cells are mostly 2-3
records after blocking) spend >90% of the stage inside that machinery.

``sorted_group_scan`` runs the same per-group UDF at numpy speed: one
global ``sort(keys)`` (range-partition shuffle — the same data movement a
groupby pays), then each block applies the UDF to every *interior* group
with plain numpy slicing.  The at-most-2 *boundary* groups per block (the
first and last key value, which may straddle a block edge) are filtered
out and repaired through a tiny real ``groupby().map_groups`` whose input
is only those rows.

This matches the semantics of ``ds.groupby(keys[0]).map_groups(fn)``
exactly when ``fn`` is order-insensitive w.r.t. rows within a group (all
raylink group UDFs are — they sort internally or are symmetric).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import ray.data

__all__ = [
    "sorted_group_scan",
    "sort_by_key",
    "count_by_key",
    "sum_by_key",
    "absorb_blank_blocks",
]


def _group_slices(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start/end offsets of equal-key runs in an already-sorted array."""
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if np.issubdtype(keys.dtype, np.floating) and np.isnan(keys).any():
        # NaN != NaN breaks run detection AND the boundary-repair masks:
        # every NaN row would become its own group and straddling NaN
        # runs would never merge — refuse rather than emit fragments
        raise ValueError(
            "NaN group keys are unsupported in sorted scans; fill or "
            "filter null keys first"
        )
    change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    return starts, ends


def _concat_outputs(parts: list[dict]) -> dict:
    """Column-wise concat of per-group UDF outputs (numpy arrays or lists)."""
    if not parts:
        return {}
    out: dict = {}
    for col in parts[0]:
        vals = [p[col] for p in parts]
        if isinstance(vals[0], np.ndarray):
            out[col] = np.concatenate(vals) if len(vals) > 1 else vals[0]
        else:
            merged: list = []
            for v in vals:
                merged.extend(v)
            out[col] = merged
    return out


def count_by_key(
    ds: ray.data.Dataset,
    key: str,
    num_partitions: int = 64,
    driver_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """``ds.groupby(key).count()`` at numpy speed.

    Ray's sort-based Aggregate spends ~100us/row in Python merge machinery
    (measured: 145 CPU-seconds to count 1.3M int64 keys).  Here each block
    pre-counts with ``np.unique`` (the combiner), then the per-block
    partials — one row per distinct key per block — merge either on the
    driver (small inputs: one ``np.add.reduceat``) or via a sorted-run scan
    (large inputs: the partials shuffle, never the input rows).  Output
    schema matches ``groupby(key).count()``: ``(key, "count()")``.
    """
    import pyarrow as pa

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        uniq, cnt = np.unique(k, return_counts=True)
        return {key: uniq, "cnt": cnt.astype(np.int64)}

    partials = ds.select_columns([key]).map_batches(
        partial, batch_format="numpy", batch_size=None
    ).materialize()
    if partials.count() <= driver_threshold:
        ks, cs = [], []
        for b in partials.iter_batches(
            batch_size=4_194_304, batch_format="numpy"
        ):
            ks.append(np.asarray(b[key]))
            cs.append(np.asarray(b["cnt"]))
        k = np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
        c = np.concatenate(cs) if cs else np.empty(0, dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        if len(k):
            starts = np.flatnonzero(
                np.concatenate(([True], k[1:] != k[:-1]))
            )
            k, c = k[starts], np.add.reduceat(c, starts)
        return ray.data.from_arrow(pa.table({key: k, "count()": c}))

    # at-scale path: shuffle only the partials, merge runs vectorized
    sp = partials.repartition(num_partitions).sort(key).materialize()

    def interior(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        c = np.asarray(batch["cnt"])
        if len(k) == 0:
            return {key: k, "count()": c}
        keep = (k != k[0]) & (k != k[-1])
        ki, ci = k[keep], c[keep]
        if len(ki) == 0:
            return {key: ki, "count()": ci}
        starts = np.flatnonzero(np.concatenate(([True], ki[1:] != ki[:-1])))
        return {key: ki[starts], "count()": np.add.reduceat(ci, starts)}

    def boundary(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        c = np.asarray(batch["cnt"])
        if len(k) == 0:
            return {key: k, "cnt": c}
        m = (k == k[0]) | (k == k[-1])
        return {key: k[m], "cnt": c[m]}

    def merge_boundary(group: dict[str, np.ndarray]) -> dict[str, list]:
        return {
            key: [np.asarray(group[key])[0]],
            "count()": [np.int64(np.asarray(group["cnt"]).sum())],
        }

    interior_out = sp.map_batches(interior, batch_format="numpy", batch_size=None)
    repaired = (
        sp.map_batches(boundary, batch_format="numpy", batch_size=None)
        .groupby(key)
        .map_groups(merge_boundary, batch_format="numpy")
    )
    return interior_out.union(repaired)


def sum_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    num_partitions: int = 64,
    driver_threshold: int = 20_000_000,
) -> ray.data.Dataset:
    """``ds.groupby(key).sum(value)`` at numpy speed — :func:`count_by_key`
    with a weight column.  ``value`` must be integer-typed (int64 partial
    sums are associative, so the result is bit-identical at any
    parallelism; fixed-point encode floats first).  Output schema:
    ``(key, "sum" int64)``.  Null keys/values are the caller's problem —
    filter first (numpy partials cannot order None).
    """
    import pyarrow as pa

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        v = np.asarray(batch[value])
        if not np.issubdtype(v.dtype, np.integer):
            raise TypeError(
                f"{value} must be integer-typed for exact "
                "order-independent sums; fixed-point encode floats first"
            )
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order].astype(np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1]))
        ) if len(ks) else np.empty(0, dtype=np.int64)
        return {
            key: ks[starts],
            "s": np.add.reduceat(vs, starts) if len(starts) else vs[:0],
        }

    partials = ds.select_columns([key, value]).map_batches(
        partial, batch_format="numpy", batch_size=None
    ).materialize()
    if partials.count() <= driver_threshold:
        ks, ss = [], []
        for b in partials.iter_batches(
            batch_size=4_194_304, batch_format="numpy"
        ):
            ks.append(np.asarray(b[key]))
            ss.append(np.asarray(b["s"]))
        k = np.concatenate(ks) if ks else np.empty(0, dtype=np.int64)
        s = np.concatenate(ss) if ss else np.empty(0, dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, s = k[order], s[order]
        if len(k):
            starts = np.flatnonzero(
                np.concatenate(([True], k[1:] != k[:-1]))
            )
            k, s = k[starts], np.add.reduceat(s, starts)
        return ray.data.from_arrow(pa.table({key: k, "sum": s}))

    # at-scale path: shuffle only the partials, merge runs vectorized
    # (same interior/boundary split as count_by_key — no per-group loop)
    sp = partials.repartition(num_partitions).sort(key).materialize()

    def interior(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        s = np.asarray(batch["s"])
        if len(k) == 0:
            return {key: k, "sum": s}
        keep = (k != k[0]) & (k != k[-1])
        ki, si = k[keep], s[keep]
        if len(ki) == 0:
            return {key: ki, "sum": si}
        starts = np.flatnonzero(np.concatenate(([True], ki[1:] != ki[:-1])))
        return {key: ki[starts], "sum": np.add.reduceat(si, starts)}

    def boundary(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        k = np.asarray(batch[key])
        s = np.asarray(batch["s"])
        if len(k) == 0:
            return {key: k, "s": s}
        m = (k == k[0]) | (k == k[-1])
        return {key: k[m], "s": s[m]}

    def merge_boundary(group: dict[str, np.ndarray]) -> dict[str, list]:
        return {
            key: [np.asarray(group[key])[0]],
            "sum": [np.int64(np.asarray(group["s"]).sum())],
        }

    interior_out = sp.map_batches(
        interior, batch_format="numpy", batch_size=None
    )
    repaired = (
        sp.map_batches(boundary, batch_format="numpy", batch_size=None)
        .groupby(key)
        .map_groups(merge_boundary, batch_format="numpy")
    )
    return interior_out.union(repaired)


def sort_by_key(
    ds: ray.data.Dataset,
    key: str,
    num_partitions: int,
    sort_keys: list[str] | None = None,
) -> ray.data.Dataset:
    """The shuffle half of :func:`sorted_group_scan`, exposed so callers
    that scan the same grouping twice (e.g. the pooled linkage engine's
    histogram pass + match pass) pay for the sort once."""
    return ds.repartition(num_partitions).sort(sort_keys or [key]).materialize()


def _dict_to_table(out: dict, schema) -> "object":
    """Convert a UDF output dict to a pa.Table with EXPLICIT column types.

    Without this, an output block whose string column happens to be all-null
    (e.g. every pair in the block has a missing comparison field) gets
    type-inferred as null/float and breaks Arrow schema unification in the
    next shuffle.  ``from_pandas=True`` maps None/NaN to Arrow nulls.
    """
    import pyarrow as pa

    arrays = []
    for f in schema:
        col = out[f.name]
        if not isinstance(col, np.ndarray):
            col = np.asarray(col, dtype=object)
        arrays.append(pa.array(col, type=f.type, from_pandas=True))
    return pa.Table.from_arrays(arrays, schema=schema)


def sorted_group_scan(
    ds: ray.data.Dataset,
    key: str,
    group_fn: Callable[[dict[str, np.ndarray]], dict],
    empty_fn: Callable[[dict[str, np.ndarray]], dict],
    num_partitions: int,
    sort_keys: list[str] | None = None,
    presorted: bool = False,
    out_schema=None,
) -> ray.data.Dataset:
    """Apply ``group_fn`` per ``key``-group via sort + vectorized block scan.

    ``empty_fn(batch)`` must return a zero-row output dict with the UDF's
    schema (used for blocks that contain only boundary groups, so every
    block yields a consistently-typed batch).  With ``presorted=True`` the
    input must already be globally sorted by ``key`` (e.g. via
    :func:`sort_by_key`) and the shuffle is skipped.  ``out_schema``
    (pa.Schema, optional) pins output block types explicitly — required
    when outputs carry nullable string columns that could otherwise be
    type-inferred from an all-null block (see :func:`_dict_to_table`).
    """
    sorted_ds = (
        ds if presorted else sort_by_key(ds, key, num_partitions, sort_keys)
    )

    def interior(batch: dict[str, np.ndarray]) -> dict:
        keys = np.asarray(batch[key])
        starts, ends = _group_slices(keys)
        parts: list[dict] = []
        first_val = keys[0] if len(keys) else None
        last_val = keys[-1] if len(keys) else None
        for s, e in zip(starts, ends):
            if keys[s] == first_val or keys[s] == last_val:
                continue  # boundary group: repaired in the second pass
            parts.append(group_fn({k: v[s:e] for k, v in batch.items()}))
        out = _concat_outputs(parts) or empty_fn(batch)
        return _dict_to_table(out, out_schema) if out_schema is not None else out

    in_schema = None
    try:  # materialized input -> schema() is metadata-only
        import pyarrow as pa

        s = sorted_ds.schema(fetch_if_missing=False)
        base = getattr(s, "base_schema", None)
        # pandas/numpy-backed datasets report a PandasBlockSchema here —
        # only a real Arrow schema can pin types
        in_schema = base if isinstance(base, pa.Schema) else None
    except Exception:
        in_schema = None

    def boundary_rows(batch: dict[str, np.ndarray]) -> dict:
        keys = np.asarray(batch[key])
        if len(keys) == 0:
            return batch
        mask = (keys == keys[0]) | (keys == keys[-1])
        idx = np.flatnonzero(mask)
        out = {k: np.asarray(v)[idx] for k, v in batch.items()}
        # pin input types: an all-null string slice must not re-infer
        return _dict_to_table(out, in_schema) if in_schema is not None else out

    repair_fn = group_fn
    if out_schema is not None:
        def repair_fn(group):  # noqa: F811 - intentional wrapper
            return _dict_to_table(group_fn(group), out_schema)

    interior_out = sorted_ds.map_batches(
        interior, batch_format="numpy", batch_size=None
    )
    repaired = (
        sorted_ds.map_batches(boundary_rows, batch_format="numpy", batch_size=None)
        .groupby(key)
        .map_groups(repair_fn, batch_format="numpy")
    )
    # NOTE: the union (and the sort/map_groups machinery inside it) can
    # emit zero-row, SCHEMA-LESS blocks for empty partitions; they pass
    # through map operators untouched (Ray skips empty bundles), every
    # map/sort/aggregate consumer tolerates them, but Ray's hash-shuffle
    # JOIN cannot type its empty partitions from such a dataset — a join
    # consumer must absorb them first with a small repartition() (see
    # ops/graph.py::triangle_count).
    return interior_out.union(repaired)


def absorb_blank_blocks(
    ds: "ray.data.Dataset", num_blocks: int = 2
) -> "ray.data.Dataset":
    """Rebuild ``ds``'s blocks so schema-less empties disappear.

    The scan-union outputs in this module (``sorted_group_scan``,
    ``count_by_key``/``sum_by_key`` at-scale paths) can carry zero-row
    blocks with NO schema (empty sort partitions and empty
    ``map_groups`` outputs).  Map operators skip empty blocks, so they
    cannot repair them; every map/sort/aggregate consumer tolerates
    them, but Ray's hash-shuffle join types its EMPTY shuffle
    partitions from the dataset schema, which a blank-bearing dataset
    cannot provide — under key skew a join partition receiving only
    blanks fails with an Acero FieldRef error.  ``repartition`` is the
    one operator that rebuilds every block, so it absorbs the blanks;
    call this on any scan output that feeds a join, sized small (the
    inputs are aggregate tables, not raw data).
    """
    return ds.repartition(num_blocks)
