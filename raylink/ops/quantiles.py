"""Grouped quantiles: exact linear-interpolated percentiles per key.

One ``sort(key)`` range-partition shuffle, then each whole key-group
computes its quantiles with a single vectorized ``np.quantile`` call
(sorted-run scan; the same one-group-fits-a-block partitioning assumption
every sorted-run consumer here documents).  ``np.quantile``'s default
linear interpolation matches SQL ``quantile_cont`` / ``percentile_cont``
semantics exactly ((n-1)*q index convention).

For groups too large for one block, pre-bin values into a fixed-point
histogram first (``count_by_key`` on (key, bin)) and run this over the
histogram — exact for discrete data, epsilon-bounded for continuous.
"""

from __future__ import annotations

import numpy as np

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = [
    "grouped_quantiles",
    "grouped_weighted_quantiles",
    "clip_to_group_quantiles",
]


def grouped_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-``key_col`` quantiles of ``val_col`` at each q in ``qs``.

    Output: one row per key with columns ``q{int(q*100)}`` (float64).
    Null values are dropped per group (SQL aggregate semantics).
    """
    names = [f"q{int(round(q * 100)):02d}" for q in qs]
    q_arr = np.asarray(qs, dtype=np.float64)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[val_col], dtype=np.float64)
        v = v[~np.isnan(v)]
        out: dict = {key_col: np.asarray(batch[key_col])[:1]}
        if len(v) == 0:
            for nm in names:
                out[nm] = np.array([np.nan])
            return out
        vals = np.quantile(v, q_arr)
        for nm, x in zip(names, vals):
            out[nm] = np.array([x])
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out: dict = {key_col: np.asarray(batch[key_col])[:0]}
        for nm in names:
            out[nm] = np.empty(0, dtype=np.float64)
        return out

    return sorted_group_scan(
        ds.select_columns([key_col, val_col]),
        key_col,
        group_fn,
        empty_fn,
        num_partitions,
    )


def clip_to_group_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    out_col: str = "clipped",
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Winsorize: append ``out_col`` = ``val_col`` clipped to its group's
    [``lo_q``, ``hi_q``] quantile band — the standard per-source outlier
    treatment before numeric features feed a model (SQL ``LEAST(GREATEST(
    v, q_lo), q_hi)`` with per-group ``quantile_cont`` thresholds).

    Plan: the threshold table is one row per key (``grouped_quantiles``,
    a sorted-run scan over (key, value) only), pulled to the driver under
    ``broadcast_limit`` and shipped once via ``ray.put``; the full rows
    then stream map-only through a vectorized clip — the big side never
    shuffles.  Null values stay null (NaN propagates through the clip),
    matching SQL's NULL arithmetic.
    """
    import pandas as pd

    import ray

    thr = grouped_quantiles(
        ds, key_col, val_col, (lo_q, hi_q), num_partitions
    )
    lo_name = f"q{int(round(lo_q * 100)):02d}"
    hi_name = f"q{int(round(hi_q * 100)):02d}"
    tdf = thr.limit(broadcast_limit + 1).to_pandas()
    if len(tdf) > broadcast_limit:
        raise ValueError(
            f"threshold table exceeds broadcast_limit={broadcast_limit} "
            "keys; partition on the key and clip per partition instead"
        )
    lo_map = dict(zip(tdf[key_col], tdf[lo_name]))
    hi_map = dict(zip(tdf[key_col], tdf[hi_name]))
    thr_ref = ray.put((lo_map, hi_map))
    cols = list(ds.schema().names)

    def clip(batch: dict[str, np.ndarray]) -> dict:
        lo_m, hi_m = ray.get(thr_ref)
        keys = pd.Series(batch[key_col])
        v = np.asarray(batch[val_col], dtype=np.float64)
        lo = keys.map(lo_m).to_numpy(dtype=np.float64, na_value=np.nan)
        hi = keys.map(hi_m).to_numpy(dtype=np.float64, na_value=np.nan)
        out = {c: batch[c] for c in cols}
        out[out_col] = np.minimum(np.maximum(v, lo), hi)
        return out

    return ds.map_batches(clip, batch_format="numpy")


def grouped_weighted_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    weight_col: str,
    ps: tuple[int, ...] = (50, 95, 99),
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key WEIGHTED quantiles: the smallest value whose cumulative
    weight reaches ``p`` percent of the group's total weight (the
    lower weighted quantile) — the weight-aware percentile cut a
    curation pipeline needs when rows are not equal (e.g. a
    token-weighted quality threshold: "the score below which 30 % of
    TOKENS, not documents, fall").

    Exactness contract: weights are positive int64 and ``ps`` are
    integer percents, so the selection test ``cum_w * 100 >= p *
    total_w`` is exact integer arithmetic — bit-identical to the SQL
    twin (a cumulative-weight window + ``min(v) FILTER``) at any
    parallelism, with no float-threshold tie hazard.  Value ties are
    harmless by construction: whether a percent threshold falls inside
    a run of equal values, the selected VALUE is the run's value in
    every tie order.  Requires ``total_w * 100 < 2**63`` per group.

    Null values (and their weights) are dropped per group (SQL
    aggregate semantics); null, zero or negative weights on non-null
    values are REFUSED loudly — silently dropping them would skew
    every threshold downstream.

    Output: one row per key, columns ``wq{p:02d}`` (float64; NaN for
    all-null groups).  Same sorted-run scan shape (one range-partition
    exchange over three columns) and same one-group-fits-a-block
    assumption as :func:`grouped_quantiles`.
    """
    for p in ps:
        if not (isinstance(p, (int, np.integer)) and 0 < p <= 100):
            raise ValueError(
                f"ps must be integer percents in (0, 100]: {p!r}"
            )
    names = [f"wq{int(p):02d}" for p in ps]

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[val_col], dtype=np.float64)
        w_raw = np.asarray(batch[weight_col], dtype=np.float64)
        keep = ~np.isnan(v)
        v, w_raw = v[keep], w_raw[keep]
        if np.isnan(w_raw).any() or (w_raw <= 0).any():
            key = np.asarray(batch[key_col])[0]
            raise ValueError(
                f"group {key!r}: null or non-positive weights on "
                "non-null values; weighted quantiles require positive "
                "integer weights"
            )
        w = w_raw.astype(np.int64)
        out: dict = {key_col: np.asarray(batch[key_col])[:1]}
        if len(v) == 0:
            for nm in names:
                out[nm] = np.array([np.nan])
            return out
        order = np.argsort(v, kind="stable")
        vs, ws = v[order], w[order]
        cw = np.cumsum(ws)
        tw = int(cw[-1])
        scaled = cw * 100  # int64; overflow bound documented above
        for nm, p in zip(names, ps):
            idx = int(np.searchsorted(scaled, int(p) * tw, side="left"))
            out[nm] = np.array([vs[idx]])
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out: dict = {key_col: np.asarray(batch[key_col])[:0]}
        for nm in names:
            out[nm] = np.empty(0, dtype=np.float64)
        return out

    return sorted_group_scan(
        ds.select_columns([key_col, val_col, weight_col]),
        key_col,
        group_fn,
        empty_fn,
        num_partitions,
    )
