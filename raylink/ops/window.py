"""Tumbling-window aggregation over an event stream.

A windowed aggregate the reference lacks (it has no event/stream operators
at all — SURVEY.md §2.11), but any large-scale training-data pipeline
needs: per-key counts/sums over fixed time windows.

Scale design: per-batch partial aggregation first (a batch of B events
shrinks to at most distinct-(key, window) rows, the classic combiner), so
the shuffle moves partials, never events.  The merge is a sorted-run scan
over the TRUE composite key (one multi-column ``sort`` — no hashed key, so
no collision risk), with ``np.add.reduceat`` doing the interior merges at C
speed and the at-most-2 boundary key-tuples per block repaired through a
tiny real ``groupby().map_groups`` (same structure as
``raylink.stages.sortedrun``, generalized to a two-column key).

Sums are computed on ``round(value * 10^4)`` int64 fixed-point so results
are exactly associative (float summation order would otherwise make the
distributed result nondeterministic vs a SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = ["tumbling_window_agg", "hopping_window_agg", "tumbling_distinct"]


def _epoch_seconds(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column -> int64 epoch seconds (floor)."""
    arr = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[s]").astype(np.int64)
    return np.floor(arr.astype(np.float64)).astype(np.int64)


def tumbling_window_agg(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
    group_col: str,
    window_seconds: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-(group, window) event count and fixed-point value sum.

    Returns columns ``(group_col, window_start, n_events, sum_value_e4)``
    where ``window_start = floor(epoch_seconds / window) * window`` (int64
    epoch seconds) and ``sum_value_e4 = sum(round(value * 10^4))``.
    """
    w = int(window_seconds)

    def windows(secs: np.ndarray):
        # one window per event: idx is the identity, start = floor align
        return np.arange(len(secs), dtype=np.int64), (secs // w) * w

    partials = ds.select_columns([ts_col, value_col, group_col]).map_batches(
        _make_window_partial(ts_col, value_col, group_col, windows),
        batch_format="pyarrow",
    )
    return _merge_window_partials(partials, group_col, num_partitions)


def _make_window_partial(ts_col, value_col, group_col, windows):
    """Shared per-batch combiner: ``windows(secs) -> (event_idx,
    window_start)`` maps each event to one or more windows; the
    fixed-point rule, partial groupby, and int64 output schema are
    stated once for every window shape.

    floor(x*1e4 + 0.5) is explicit half-up — identical in any SQL
    engine (np.round is half-to-even and would diverge from an oracle).
    """

    def partial(batch: pa.Table) -> pa.Table:
        secs = _epoch_seconds(batch.column(ts_col))
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        v4 = np.floor(
            np.asarray(v, dtype=np.float64) * 10_000 + 0.5
        ).astype(np.int64)
        idx, win = windows(secs)
        df = pd.DataFrame({"g": g[idx], "w": win, "s": v4[idx]})
        p = (
            df.groupby(["g", "w"], sort=False, observed=True)
            .agg(n=("s", "size"), s=("s", "sum"))
            .reset_index()
        )
        gv = p["g"].to_numpy()
        g_arr = (
            pa.array(gv, type=pa.int64())
            if np.issubdtype(np.asarray(g).dtype, np.integer)
            else pa.array(gv)  # string/object keys keep their type
        )
        return pa.table(
            {
                group_col: g_arr,
                "window_start": pa.array(p["w"].to_numpy(), type=pa.int64()),
                "n_events": pa.array(p["n"].to_numpy(np.int64), type=pa.int64()),
                "sum_value_e4": pa.array(p["s"].to_numpy(np.int64), type=pa.int64()),
            }
        )

    return partial


def hopping_window_agg(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
    group_col: str,
    window_seconds: int,
    hop_seconds: int,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-(group, window) count/sum over HOPPING (sliding) windows of
    ``window_seconds`` advancing every ``hop_seconds`` — each event lands
    in every window ``w ≡ 0 (mod hop)`` with ``w <= t < w + window``
    (``window / hop`` of them).  Same fixed-point output schema as
    :func:`tumbling_window_agg`; ``hop == window`` degenerates to it.

    The window-replication factor is applied INSIDE the per-batch
    combiner (one np.repeat before the partial groupby), so the shuffle
    still moves per-(group, window) partials, never events x windows.
    """
    w = int(window_seconds)
    h = int(hop_seconds)
    if not (0 < h <= w):
        raise ValueError(f"need 0 < hop <= window, got hop={h} window={w}")

    def windows(secs: np.ndarray):
        # windows containing t: starts h*k for k in (  (t-w)/h , t/h ]
        k_min = (secs - w) // h + 1
        k_max = secs // h
        reps = (k_max - k_min + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(secs), dtype=np.int64), reps)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        step = np.arange(reps.sum(), dtype=np.int64) - np.repeat(starts, reps)
        return idx, (k_min[idx] + step) * h

    partials = ds.select_columns([ts_col, value_col, group_col]).map_batches(
        _make_window_partial(ts_col, value_col, group_col, windows),
        batch_format="pyarrow",
    )
    return _merge_window_partials(partials, group_col, num_partitions)


def _merge_window_partials(
    partials: ray.data.Dataset,
    group_col: str,
    num_partitions: int | None,
) -> ray.data.Dataset:
    """Shared partial-merge: one composite-key sort, np.add.reduceat
    interior runs, map_groups repair of the ≤2 boundary key-tuples per
    block (see module docstring)."""
    if num_partitions is None:
        num_partitions = max(
            16, int(ray.cluster_resources().get("CPU", 8))
        )
    sp = (
        partials.repartition(num_partitions)
        .sort([group_col, "window_start"])
        .materialize()
    )

    def _runs(g: np.ndarray, win: np.ndarray) -> np.ndarray:
        """Start offsets of equal-(g, win) runs in sorted arrays."""
        if len(g) == 0:
            return np.empty(0, dtype=np.int64)
        change = (g[1:] != g[:-1]) | (win[1:] != win[:-1])
        return np.concatenate(([0], np.flatnonzero(change) + 1))

    def _boundary_mask(g: np.ndarray, win: np.ndarray) -> np.ndarray:
        first = (g == g[0]) & (win == win[0])
        last = (g == g[-1]) & (win == win[-1])
        return first | last

    def interior(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        win = np.asarray(batch["window_start"])
        n = np.asarray(batch["n_events"])
        s = np.asarray(batch["sum_value_e4"])
        empty = {
            group_col: g[:0],
            "window_start": win[:0],
            "n_events": n[:0],
            "sum_value_e4": s[:0],
        }
        if len(g) == 0:
            return empty
        keep = ~_boundary_mask(g, win)
        g, win, n, s = g[keep], win[keep], n[keep], s[keep]
        if len(g) == 0:
            return empty
        starts = _runs(g, win)
        return {
            group_col: g[starts],
            "window_start": win[starts],
            "n_events": np.add.reduceat(n, starts),
            "sum_value_e4": np.add.reduceat(s, starts),
        }

    def boundary(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        win = np.asarray(batch["window_start"])
        if len(g) == 0:
            return batch
        m = _boundary_mask(g, win)
        return {k: np.asarray(v)[m] for k, v in batch.items()}

    def merge(group: dict[str, np.ndarray]) -> dict[str, list]:
        return {
            group_col: [np.asarray(group[group_col])[0]],
            "window_start": [np.asarray(group["window_start"])[0]],
            "n_events": [int(np.asarray(group["n_events"]).sum())],
            "sum_value_e4": [int(np.asarray(group["sum_value_e4"]).sum())],
        }

    interior_out = sp.map_batches(interior, batch_format="numpy", batch_size=None)
    repaired = (
        sp.map_batches(boundary, batch_format="numpy", batch_size=None)
        .groupby([group_col, "window_start"])
        .map_groups(merge, batch_format="numpy")
    )
    return interior_out.union(repaired)


def tumbling_distinct(
    ds: ray.data.Dataset,
    ts_col: str,
    key_col: str,
    window_seconds: int,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-tumbling-window EXACT distinct-key count (distinct active
    users per hour/day — the cardinality sibling of
    :func:`tumbling_window_agg`'s count/sum).  Returns
    ``(window_start int64 epoch seconds, n_distinct int64)``.

    Exact, not sketched: every block first reduces to its DISTINCT
    (window, key) pairs (the combiner — repeated keys inside a block
    never shuffle), the global pair set dedupes in one sorted scan
    keyed by an unambiguous combo, and a partial-count pass produces
    the per-window cardinalities.  The exchange carries distinct pairs,
    bounded by windows x keys, never raw events.  Null timestamps and
    null keys are excluded like every grouped op in this repo (and like
    SQL ``count(DISTINCT ...)``).  For cardinalities too large to
    shuffle even as distinct pairs, the HLL sketch path
    (``ops/sketch.py``) is the approximate alternative.
    """
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    w = int(window_seconds)

    from ..stages.sortedrun import count_by_key, sorted_group_scan
    from .rollup import _encode_combo

    pair_schema = pa.schema([("_wk", pa.string()), ("ws", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([ts_col, key_col])
        t = t.filter(
            pc.and_(
                pc.is_valid(t.column(ts_col)),
                pc.is_valid(t.column(key_col)),
            )
        )
        secs = _epoch_seconds(t.column(ts_col))
        ws = (secs // w) * w
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        d = pd.DataFrame({"ws": ws, "k": k}).drop_duplicates()
        if len(d):
            combo = _encode_combo(
                [
                    d["ws"].to_numpy(dtype=object),
                    d["k"].to_numpy(dtype=object),
                ]
            )
        else:
            combo = np.empty(0, dtype=object)
        return pa.Table.from_arrays(
            [
                pa.array(combo, type=pa.string()),
                pa.array(
                    d["ws"].to_numpy(dtype=np.int64), type=pa.int64()
                ),
            ],
            schema=pair_schema,
        )

    def merge_group(group: dict[str, np.ndarray]) -> dict:
        return {"ws": np.asarray(group["ws"])[:1]}

    def merge_empty(batch: dict[str, np.ndarray]) -> dict:
        return {"ws": np.empty(0, dtype=np.int64)}

    distinct = sorted_group_scan(
        ds.map_batches(partial, batch_format="pyarrow"),
        "_wk",
        merge_group,
        merge_empty,
        num_partitions=num_partitions,
        out_schema=pa.schema([("ws", pa.int64())]),
    )
    return count_by_key(distinct, "ws").map_batches(
        lambda b: pa.table(
            {
                "window_start": b.column("ws").cast(pa.int64()),
                "n_distinct": b.column("count()").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
