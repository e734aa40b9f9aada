"""Event sessionization — a windowed aggregate the reference lacks.

Splits each user's event stream into sessions at inactivity gaps larger
than ``gap``: one sort shuffle, then a vectorized per-group cumsum of gap
indicators.  Runs through ``sorted_group_scan`` (sort + block scan +
boundary repair) rather than ``groupby().map_groups`` — at 10^9 users the
~300us/group slicing tax of map_groups dominates the work (the same
measurement that drove the assembly stage's design,
raylink/stages/sortedrun.py).
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["sessionize", "dedupe_consecutive", "runlength_encode"]


def sessionize(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    gap_seconds: float = 1800.0,
) -> ray.data.Dataset:
    """Session-level rows: (user, session_idx, n_events, ts_start, ts_end,
    duration_s [, sum_value])."""

    def fn(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ts = np.asarray(group[ts_col]).astype("datetime64[us]").astype(np.int64)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        gaps = np.diff(ts) > gap_seconds * 1_000_000
        sess = np.concatenate([[0], np.cumsum(gaps)])
        n_sessions = int(sess[-1]) + 1 if len(sess) else 0
        # ts is sorted and sess is non-decreasing: session extents come from
        # the boundary indices directly (no per-session scan)
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(sess)) + 1, [len(ts)]]
        )
        starts = ts[bounds[:-1]]
        ends = ts[bounds[1:] - 1]
        counts = np.diff(bounds)
        out = {
            user_col: np.repeat(np.asarray(group[user_col])[:1], n_sessions),
            "session_idx": np.arange(n_sessions, dtype=np.int64),
            "n_events": counts,
            "ts_start": starts,
            "ts_end": ends,
            "duration_s": (ends - starts) / 1_000_000.0,
        }
        if value_col is not None and value_col in group:
            vals = np.asarray(group[value_col], dtype=np.float64)[order]
            sums = np.zeros(n_sessions)
            np.add.at(sums, sess, vals)
            out["sum_value"] = sums
        return out

    def empty(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out = {
            user_col: np.asarray(batch[user_col])[:0],
            "session_idx": np.empty(0, dtype=np.int64),
            "n_events": np.empty(0, dtype=np.int64),
            "ts_start": np.empty(0, dtype=np.int64),
            "ts_end": np.empty(0, dtype=np.int64),
            "duration_s": np.empty(0, dtype=np.float64),
        }
        if value_col is not None and value_col in batch:
            out["sum_value"] = np.empty(0, dtype=np.float64)
        return out

    import ray

    n_part = max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))
    return sorted_group_scan(events, user_col, fn, empty, num_partitions=n_part)


def dedupe_consecutive(
    events: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    compare_cols: list[str],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Drop each row whose ``compare_cols`` tuple equals the PREVIOUS
    row's (within ``group_col``, ordered by ``order_cols``) — the
    stream-cleaning pass that removes stuttered sensor readings or
    repeated identical conversation turns while keeping the first of
    each run.  Output: the surviving rows, all input columns.

    SQL semantics: ``lag(c) OVER (PARTITION BY group ORDER BY
    order_cols)`` compared with ``IS NOT DISTINCT FROM`` per column
    (NULL equals NULL — a repeated null reading is still a repeat);
    each group's first row always survives (a pure-LAG SQL twin needs
    an ``OR row_number() = 1`` clause, since LAG cannot distinguish
    no-previous-row from a null previous value).  Pass a unique tiebreaker
    in ``order_cols`` or ties make survivorship engine-dependent,
    exactly as in SQL.

    One sort exchange; per group one lexsort + vectorized
    adjacent-tuple compare.
    """
    if not order_cols or not compare_cols:
        raise ValueError("order_cols and compare_cols must be non-empty")

    import pandas as pd
    import pyarrow as pa

    from .lag import _arrow_schema

    in_schema = _arrow_schema(events)
    cols = in_schema.names
    out_schema = pa.schema([in_schema.field(c) for c in cols])

    def group_fn(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        order = np.lexsort(
            tuple(np.asarray(group[c]) for c in reversed(order_cols))
        )
        n = len(order)
        # dup[i] = every compared column equals the previous row's
        # (NULL equals NULL); the group's first row is never a dup.
        # Adjacent compare stays in the column's own dtype — a
        # Series.shift() detour would cast int64 to float64 and
        # falsely equate distinct values above 2^53 (epoch-us, IDs)
        dup = np.zeros(n, dtype=bool)
        if n > 1:
            dup[1:] = True
            for c in compare_cols:
                a = np.asarray(group[c])[order]
                na = pd.isna(a)
                same = (a[1:] == a[:-1]) | (na[1:] & na[:-1])
                dup[1:] &= np.asarray(same, dtype=bool)
        sel = order[~dup]
        return {c: np.asarray(group[c])[sel] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        events,
        group_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def runlength_encode(
    events: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Compress each group's ordered stream into runs of consecutive
    equal ``value_col`` values (gaps-and-islands): one output row per
    run with the run's value, its length, and the order-column values
    of the run's FIRST row — the state-compression pass for repeated
    sensor states, dialogue-role stretches, or status streams, and the
    row-count-preserving complement of :func:`dedupe_consecutive`
    (which keeps only each run's first row; ``run_len`` here recovers
    what it dropped).

    SQL semantics: the classic ``row_number() OVER (PARTITION BY g)
    - row_number() OVER (PARTITION BY g, v)`` island key, grouped.
    NULL equals NULL (a run of null states is one run, as in
    ``IS NOT DISTINCT FROM``).  Pass a unique tiebreaker in
    ``order_cols`` or run boundaries at order ties are
    engine-dependent, exactly as in SQL.

    Output: ``group_col``, ``value_col``, ``run_len`` (int64), and
    each order column prefixed ``first_`` (the run-start coordinates).
    One sort exchange; per group one lexsort + one change-point scan.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")

    import pandas as pd
    import pyarrow as pa

    from .lag import try_arrow_schema

    base = try_arrow_schema(events)
    out_schema = None
    if base is not None:
        out_schema = pa.schema(
            [
                base.field(group_col),
                base.field(value_col),
                pa.field("run_len", pa.int64()),
                *[
                    pa.field(f"first_{c}", base.field(c).type)
                    for c in order_cols
                ],
            ]
        )
    cols = [group_col, value_col, *order_cols]

    def group_fn(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        order = np.lexsort(
            tuple(np.asarray(group[c]) for c in reversed(order_cols))
        )
        v = np.asarray(group[value_col])[order]
        n = len(v)
        na = pd.isna(v)
        change = np.ones(n, dtype=bool)
        if n > 1:
            # adjacent compare in the column's own dtype (see
            # dedupe_consecutive for the int64-above-2^53 rationale)
            same = (v[1:] == v[:-1]) | (na[1:] & na[:-1])
            change[1:] = ~np.asarray(same, dtype=bool)
        starts = np.flatnonzero(change)
        lens = np.diff(np.append(starts, n))
        out: dict[str, np.ndarray] = {
            group_col: np.asarray(group[group_col])[order][starts],
            value_col: v[starts],
            "run_len": lens.astype(np.int64),
        }
        for c in order_cols:
            out[f"first_{c}"] = np.asarray(group[c])[order][starts]
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out = {
            group_col: np.asarray(batch[group_col])[:0],
            value_col: np.asarray(batch[value_col])[:0],
            "run_len": np.empty(0, dtype=np.int64),
        }
        for c in order_cols:
            out[f"first_{c}"] = np.asarray(batch[c])[:0]
        return out

    return sorted_group_scan(
        events.select_columns(list(dict.fromkeys(cols))),
        group_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )
