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

__all__ = ["grouped_top_k", "grouped_weighted_top_k"]


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


def grouped_weighted_top_k(
    ds: ray.data.Dataset,
    key_col: str,
    item_col: str,
    weight_col: str,
    k: int,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Top ``k`` ITEMS per key by their summed weight — the two-level
    report shape ("top sources per language by total chars"), where
    ``grouped_top_k`` ranks raw ROWS this ranks aggregates.

    Combiner-first: each block reduces to per-(key, item) partial sums
    (one lexsort + reduceat — only these partials shuffle), then one
    sorted-run scan per key finishes the sums and takes the top ``k``
    (weight desc, item asc — matching SQL ``row_number() OVER (PARTITION
    BY key ORDER BY sum DESC, item)``).  Weights must be integers: int64
    partial sums are associative, so results are identical at any
    parallelism (float weights would make the sum order-dependent).
    Null keys/items are excluded (SQL GROUP BY semantics).

    Output: (key, item, total int64).
    """
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        items = t.column(item_col).to_numpy(zero_copy_only=False)
        wcol = t.column(weight_col)
        # the integer contract is on the ARROW type: an int64 column with
        # nulls converts to float64+NaN, which must not trip the refusal
        # — null weights are excluded like null keys (SQL sum semantics)
        if not pa.types.is_integer(wcol.type):
            raise TypeError(
                f"{weight_col} must be integer-typed for exact "
                "order-independent sums; fixed-point encode floats first"
            )
        import pyarrow.compute as pc

        ok = pc.is_valid(wcol).to_numpy(zero_copy_only=False)
        w = wcol.fill_null(0).to_numpy(zero_copy_only=False)
        if keys.dtype == object:
            # dtype=bool: an empty comprehension infers float64 otherwise
            ok &= np.array([x is not None for x in keys], dtype=bool)
        if items.dtype == object:
            ok &= np.array([x is not None for x in items], dtype=bool)
        keys, items, w = keys[ok], items[ok], np.asarray(w)[ok]
        order = np.lexsort((items, keys))
        ks, its, ws = keys[order], items[order], w[order]
        change = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            change[1:] = (ks[1:] != ks[:-1]) | (its[1:] != its[:-1])
        starts = np.flatnonzero(change)
        sums = np.add.reduceat(ws, starts) if len(starts) else ws[:0]
        return pa.table(
            {
                key_col: pa.array(ks[starts]),
                item_col: pa.array(its[starts]),
                "n": pa.array(sums.astype(np.int64)),
            }
        )

    def merge(group: dict[str, np.ndarray]) -> dict:
        items = np.asarray(group[item_col])
        n = np.asarray(group["n"])
        uniq, inv = np.unique(items, return_inverse=True)
        total = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(total, inv, n)
        top = np.lexsort((uniq, -total))[:k]
        return {
            key_col: np.repeat(np.asarray(group[key_col])[:1], len(top)),
            item_col: uniq[top],
            "total": total[top],
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            item_col: np.asarray(batch[item_col])[:0],
            "total": np.empty(0, dtype=np.int64),
        }

    partials = ds.select_columns(
        [key_col, item_col, weight_col]
    ).map_batches(partial, batch_format="pyarrow")
    return sorted_group_scan(partials, key_col, merge, empty,
                             num_partitions)
