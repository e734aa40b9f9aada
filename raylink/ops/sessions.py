"""Event sessionization — a windowed aggregate the reference lacks.

Splits each user's event stream into sessions at inactivity gaps larger than
``gap``: one ``groupby(user)`` shuffle, vectorized per-group cumsum of
gap indicators (the same assembly pattern as conversations).
"""

from __future__ import annotations

import numpy as np

import ray.data

__all__ = ["sessionize"]


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

    return events.groupby(user_col).map_groups(fn, batch_format="numpy")
