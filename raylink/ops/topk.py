"""Grouped top-k: the k best rows per key by a score column.

The scale shape is combiner-first (same as ``count_by_key``): every block
reduces to AT MOST k rows per key present in it (a lexsort + run-slice
pass, no Python per-group loop), and only those partials pay the
``sort(key)`` shuffle, where a second identical pass finishes the merge.
Input rows never shuffle; the exchanged volume is bounded by
``k x keys_per_block x blocks``.

Ties are broken deterministically: descending ``score_col``, then
ascending ``tie_col`` — matching the SQL
``row_number() OVER (PARTITION BY key ORDER BY score DESC, tie)``.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["grouped_top_k"]


def _negatable(score: np.ndarray) -> np.ndarray:
    """Unsigned scores wrap under negation (0 maps to 0, not the max), so
    the descending lexsort key needs a signed/float view of them."""
    return score.astype(np.float64) if score.dtype.kind == "u" else score


def grouped_top_k(
    ds: ray.data.Dataset,
    key_col: str,
    score_col: str,
    k: int,
    tie_col: str,
    payload_cols: list[str] | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Top ``k`` rows per ``key_col`` ordered by (``score_col`` desc,
    ``tie_col`` asc).  Output columns: key, score, tie, payload."""
    payload_cols = [
        c
        for c in (payload_cols or [])
        if c not in (key_col, score_col, tie_col)
    ]
    cols = [key_col, score_col, tie_col] + payload_cols

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        keys = np.asarray(batch[key_col])
        score = _negatable(np.asarray(batch[score_col]))
        tie = np.asarray(batch[tie_col])
        # one lexsort orders every group at once: key runs, then
        # (-score, tie) within each run
        order = np.lexsort((tie, -score, keys))
        sk = keys[order]
        n = len(sk)
        if n == 0:
            return {c: np.asarray(batch[c])[:0] for c in cols}
        change = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        starts = np.concatenate(([0], change))
        # rank of each sorted row within its key run; keep rank < k
        rank = np.arange(n) - np.repeat(
            starts, np.diff(np.concatenate((starts, [n])))
        )
        keep = order[rank < k]
        return {c: np.asarray(batch[c])[keep] for c in cols}

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="numpy", batch_size=None
    )

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        score = _negatable(np.asarray(batch[score_col]))
        tie = np.asarray(batch[tie_col])
        order = np.lexsort((tie, -score))[:k]
        return {c: np.asarray(batch[c])[order] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        partials, key_col, group_fn, empty_fn, num_partitions
    )
