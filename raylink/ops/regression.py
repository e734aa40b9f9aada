"""Grouped bivariate ordinary-least-squares fit (SQL ``regr_slope`` /
``regr_intercept`` / ``regr_r2`` semantics) — the per-segment trend-line
profile behind drift dashboards and price/quantity sanity checks.

Reference scope: FastLink.jl has no regression op; this is a
beyond-reference relational-analytics addition in the same
combiner-first two-pass shape as ``grouped_higher_moments``
(``raylink/ops/normalize.py``): raw power sums of corpus-scale values
cancel catastrophically in float64, so pass 1 fixes each group's means
and pass 2 accumulates centered cross-products, whose partial-sum error
is bounded at ~1e-12 relative — the same tolerance class as DuckDB's
own streaming accumulators, so both engines round to the same e4 fixed
point except on measure-zero boundaries.

Scale notes: only per-block partial rows (groups x blocks) ever
shuffle; the rows themselves move at most once (the hash-shuffle join
on the at-scale path).  Low group cardinality — the common case —
broadcasts the pass-1 means as a LUT and moves zero rows.
"""

from __future__ import annotations

import numpy as np
import ray.data

__all__ = ["grouped_linear_fit"]


def grouped_linear_fit(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    driver_threshold: int = 2_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group OLS fit of ``y_col`` on ``x_col``; one row per group:

    ``(group_col, n int64, slope_e4, intercept_e4, r2_e4  int64|null)``

    with half-up e4 fixed point.  Semantics match probed DuckDB
    ``regr_*(y, x)`` behaviour exactly:

    - pairs where either side is null are dropped (``regr_count``);
    - ``slope``/``intercept``/``r2`` are null when n < 2 or var(x) = 0;
    - when var(y) = 0 but var(x) > 0: slope 0, intercept mean(y),
      r2 = 1 (degenerate perfect fit, Postgres-compatible);
    - otherwise slope = Sxy/Sxx, intercept = mean(y) - slope*mean(x),
      r2 = Sxy^2 / (Sxx*Syy).

    Null group keys are excluded (repo-wide grouping convention).
    """
    import pyarrow as pa

    from ..stages.sortedrun import absorb_blank_blocks, sorted_group_scan
    from .joins import hash_join
    from .lag import _arrow_schema
    from .normalize import pd_isna

    gtype = _arrow_schema(ds).field(group_col).type
    rows = ds.select_columns([group_col, x_col, y_col])

    def partial1(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        x = np.asarray(batch[x_col], dtype=np.float64)
        y = np.asarray(batch[y_col], dtype=np.float64)
        ok = ~(np.isnan(x) | np.isnan(y) | pd_isna(g))
        g, x, y = g[ok], x[ok], y[ok]
        uniq, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        sx = np.zeros(len(uniq), dtype=np.float64)
        sy = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(n, inv, 1)
        np.add.at(sx, inv, x)
        np.add.at(sy, inv, y)
        return {group_col: uniq, "n": n, "sx": sx, "sy": sy}

    partials1 = rows.map_batches(
        partial1, batch_format="numpy"
    ).materialize()

    if partials1.count() <= driver_threshold:
        parts = partials1.to_pandas()
        stats = parts.groupby(group_col)[["n", "sx", "sy"]].sum()
        lut_ref = ray.put(
            dict(
                zip(
                    stats.index,
                    zip(
                        stats["n"].astype(int),
                        stats["sx"].astype(float),
                        stats["sy"].astype(float),
                    ),
                )
            )
        )

        def with_stats(batch: dict[str, np.ndarray]):
            lut = ray.get(lut_ref)
            g = np.asarray(batch[group_col])
            # null group keys are excluded from the fit (mirrors
            # partial1/partial2); they must also be dropped here or
            # np.unique raises on None-vs-str comparisons
            ok = ~pd_isna(g)
            g = g[ok]
            batch = {
                group_col: g,
                x_col: np.asarray(batch[x_col])[ok],
                y_col: np.asarray(batch[y_col])[ok],
            }
            uniq, inv = np.unique(g, return_inverse=True)
            trip = [lut.get(k, (0, 0.0, 0.0)) for k in uniq]
            n = np.asarray([t[0] for t in trip], dtype=np.int64)[inv]
            sx = np.asarray([t[1] for t in trip], dtype=np.float64)[inv]
            sy = np.asarray([t[2] for t in trip], dtype=np.float64)[inv]
            return {
                group_col: g,
                x_col: np.asarray(batch[x_col], dtype=np.float64),
                y_col: np.asarray(batch[y_col], dtype=np.float64),
                "_lf_n": n,
                "_lf_sx": sx,
                "_lf_sy": sy,
            }

        staged = rows.map_batches(with_stats, batch_format="numpy")
    else:
        def merge1(group: dict[str, np.ndarray]) -> dict:
            return {
                group_col: np.asarray(group[group_col])[:1],
                "_lf_n": np.asarray([np.sum(group["n"])], dtype=np.int64),
                "_lf_sx": np.asarray(
                    [np.sum(group["sx"])], dtype=np.float64
                ),
                "_lf_sy": np.asarray(
                    [np.sum(group["sy"])], dtype=np.float64
                ),
            }

        def empty1(batch: dict[str, np.ndarray]) -> dict:
            return {
                group_col: np.asarray(batch[group_col])[:0],
                "_lf_n": np.empty(0, dtype=np.int64),
                "_lf_sx": np.empty(0, dtype=np.float64),
                "_lf_sy": np.empty(0, dtype=np.float64),
            }

        stats_ds = sorted_group_scan(
            partials1, group_col, merge1, empty1,
            num_partitions=num_partitions,
        )
        stats_ds = absorb_blank_blocks(stats_ds, num_partitions)
        staged = hash_join(
            rows, stats_ds, on=group_col, how="left",
            num_partitions=num_partitions,
        )

    def partial2(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        x = np.asarray(batch[x_col], dtype=np.float64)
        y = np.asarray(batch[y_col], dtype=np.float64)
        n = np.asarray(batch["_lf_n"], dtype=np.float64)
        sx = np.asarray(batch["_lf_sx"], dtype=np.float64)
        sy = np.asarray(batch["_lf_sy"], dtype=np.float64)
        ok = ~(np.isnan(x) | np.isnan(y) | pd_isna(g)) & (n > 0)
        g, x, y, n, sx, sy = g[ok], x[ok], y[ok], n[ok], sx[ok], sy[ok]
        dx = x - sx / n
        dy = y - sy / n
        uniq, inv = np.unique(g, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        sxx = np.zeros(len(uniq), dtype=np.float64)
        syy = np.zeros(len(uniq), dtype=np.float64)
        sxy = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(cnt, inv, 1)
        np.add.at(sxx, inv, dx * dx)
        np.add.at(syy, inv, dy * dy)
        np.add.at(sxy, inv, dx * dy)
        # carry the group means through so the finish scan never needs
        # a second lookup: they came from the single global pass-1
        # merge, so every row of a group holds the identical value and
        # any representative works.
        rep = np.zeros(len(uniq), dtype=np.int64)
        rep[inv] = np.arange(len(g))
        mx = (sx / n)[rep]
        my = (sy / n)[rep]
        return {
            group_col: uniq, "cnt": cnt,
            "sxx": sxx, "syy": syy, "sxy": sxy, "mx": mx, "my": my,
        }

    partials2 = staged.map_batches(partial2, batch_format="numpy")

    out_schema = pa.schema(
        [
            (group_col, gtype),
            ("n", pa.int64()),
            ("slope_e4", pa.int64()),
            ("intercept_e4", pa.int64()),
            ("r2_e4", pa.int64()),
        ]
    )

    def _e4(v: float) -> int:
        return int(np.floor(v * 10_000.0 + 0.5))

    def finish(group: dict[str, np.ndarray]) -> dict:
        n = int(np.sum(np.asarray(group["cnt"], dtype=np.int64)))
        sxx = float(np.sum(np.asarray(group["sxx"], dtype=np.float64)))
        syy = float(np.sum(np.asarray(group["syy"], dtype=np.float64)))
        sxy = float(np.sum(np.asarray(group["sxy"], dtype=np.float64)))
        mx = float(np.asarray(group["mx"], dtype=np.float64)[0])
        my = float(np.asarray(group["my"], dtype=np.float64)[0])
        slope = intercept = r2 = None
        if n >= 2 and sxx > 0.0:
            s = sxy / sxx
            slope, intercept = _e4(s), _e4(my - s * mx)
            r2 = _e4(1.0) if syy == 0.0 else _e4(sxy * sxy / (sxx * syy))
        return {
            group_col: np.asarray(group[group_col])[:1],
            "n": np.array([n], dtype=np.int64),
            "slope_e4": [slope],
            "intercept_e4": [intercept],
            "r2_e4": [r2],
        }

    def empty2(batch: dict[str, np.ndarray]) -> dict:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            "n": np.empty(0, dtype=np.int64),
            "slope_e4": np.empty(0, dtype=np.int64),
            "intercept_e4": np.empty(0, dtype=np.int64),
            "r2_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        partials2, group_col, finish, empty2,
        num_partitions=num_partitions, out_schema=out_schema,
    )
