"""Per-group percent rank: each row's quantile position within its group
— the percentile-labeling step of quality-score normalization ("this doc
is in its language's top decile").

One ``sort(group)`` range-partition exchange, then a vectorized per-run
scan (``sorted_group_scan``): within a group the ranks come from one
argsort + tie-collapse (``np.unique``), no per-row Python.  Semantics
match SQL ``percent_rank()`` exactly — ties share the MIN rank, the
result is ``(rank - 1) / (n - 1)`` (0 for singleton groups) — emitted as
half-up e6 fixed point so the DuckDB oracle matches bit-for-bit (the
single float division rounds identically in both engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["group_ntile", "group_percent_rank", "group_row_number", "keep_top_fraction"]


def group_percent_rank(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    out_col: str = "pct_rank_e6",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append ``out_col`` = ``floor(percent_rank * 1e6 + 0.5)`` (int64)
    of ``val_col`` within each ``group_col`` group."""
    cols = list(ds.schema().names)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[val_col])
        n = len(v)
        out = {c: np.asarray(batch[c]) for c in cols}
        if n == 1:
            out[out_col] = np.zeros(1, dtype=np.int64)
            return out
        # min-rank with ties: sort, find run starts, scatter back
        order = np.argsort(v, kind="stable")
        sv = v[order]
        starts = np.concatenate(([0], np.flatnonzero(sv[1:] != sv[:-1]) + 1))
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        min_rank_of_run = starts + 1  # 1-based
        rank = np.empty(n, dtype=np.int64)
        rank[order] = min_rank_of_run[run_id]
        pct = (rank - 1) / (n - 1)
        out[out_col] = np.floor(pct * 1_000_000 + 0.5).astype(np.int64)
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions
    )


def keep_top_fraction(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    frac: float,
    tiebreak_cols: list[str] | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Keep the top ``frac`` fraction of rows per group by ``val_col``
    (descending) — the quantile-cut curation primitive ("keep each
    language's best 20% of documents"), where a fixed top-N would over-
    or under-sample skewed groups.

    Keeps exactly ``ceil(frac * n)`` rows per group (ties broken by
    ``tiebreak_cols`` ascending, so pass a unique id for determinism) —
    identical to SQL ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY
    v DESC, tb) <= ceil(frac * COUNT(*) OVER (PARTITION BY g))``.

    ``val_col`` must be numeric (it is negated for the descending sort).
    Same machinery and partitioning assumption as the other per-group
    windows: one sort exchange, one np.lexsort per group run, no per-row
    Python.
    """
    if not (0.0 < frac <= 1.0):
        raise ValueError("frac must be in (0, 1]")
    tiebreaks = list(tiebreak_cols or [])
    cols = list(ds.schema().names)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[val_col])
        n = len(v)
        # unsigned dtypes wrap under negation (0 would sort as the max) —
        # same guard as ops/topk.py::_negatable
        neg = v.astype(np.float64) if v.dtype.kind == "u" else v
        # lexsort: primary key LAST → (-v) desc, then tiebreaks asc
        keys = [np.asarray(batch[c]) for c in reversed(tiebreaks)]
        keys.append(-neg)
        idx = np.lexsort(tuple(keys))
        k = int(np.ceil(frac * n))
        keep = np.sort(idx[:k])  # restore input order within the group
        return {c: np.asarray(batch[c])[keep] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions
    )


def group_row_number(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    out_col: str = "row_num",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append SQL ``row_number() OVER (PARTITION BY group ORDER BY
    order_cols)`` (1-based int64) — the top-N-per-group materialization
    primitive.  Pass a unique tiebreaker in ``order_cols`` for a total
    order (like any deterministic ROW_NUMBER).  Same machinery as the
    other per-group windows: one sort exchange, one np.lexsort per run,
    no per-row Python."""
    cols = list(ds.schema().names)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        out[out_col] = np.arange(1, len(idx) + 1, dtype=np.int64)
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions
    )


def group_ntile(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    k: int,
    out_col: str = "ntile",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append SQL ``NTILE(k) OVER (PARTITION BY group ORDER BY
    order_cols)`` — equal-frequency bucket labels (quartiles, deciles)
    per group, the categorical form of the quantile features next to
    :func:`keep_top_fraction` / percent rank.  Exact SQL semantics: the
    first ``n % k`` buckets get ``ceil(n/k)`` rows, the rest
    ``floor(n/k)``; pass a unique tiebreaker in ``order_cols`` or tied
    rows land in engine-dependent buckets (same caveat as SQL).

    One sort exchange; per group one lexsort + integer arithmetic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = list(ds.schema().names)
    from .lag import _arrow_schema

    out_schema = pa.schema(
        list(_arrow_schema(ds)) + [pa.field(out_col, pa.int64())]
    )

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        n = len(idx)
        small, n_big = divmod(n, k)
        big = small + 1
        i = np.arange(n)
        cut = n_big * big
        bucket = np.where(
            i < cut,
            i // big,
            n_big + (i - cut) // max(small, 1) if small else n_big,
        )
        out[out_col] = (bucket + 1).astype(np.int64)
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )
