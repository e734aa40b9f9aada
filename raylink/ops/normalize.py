"""Per-group feature standardization (z-score) — the two-pass
broadcast-stats shape.

Pass 1 reduces each block to per-key ``(count, sum, sum-of-squares)``
partials over FIXED-POINT integer values; the driver merges them (one
row per key — event-type-like cardinality) and broadcasts the stats
table once via ``ray.put``.  Pass 2 is a pure ``map_batches`` that
standardizes every row against its group's stats.  No row ever shuffles.

Integer moments are the exactness trick: float accumulation order
differs between engines (and between cluster sizes!), but int64 sums of
e2 fixed-point values are associative, so the z-score

    z = (n * x - sum) / sqrt(n * sumsq - sum^2)

is computed from IDENTICAL integers in this engine and in the DuckDB
oracle — each float op is a single IEEE-correctly-rounded expression,
so results match bit-for-bit at any parallelism.  Constraint:
``n * sumsq`` per group must stay below 2^63 (e.g. |value| <= 10^5 at
e2 supports ~10^8 rows/group; lower the fixed-point scale for more).

For key cardinalities beyond driver memory, merge the partials with a
``sorted_group_scan`` instead and join the stats back by key — the
partials (3 ints/key/block) are what shuffles, never the rows.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

__all__ = ["group_standardize"]


def group_standardize(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    out_col: str = "z_e4",
    value_scale: int = 100,
) -> ray.data.Dataset:
    """Append half-up e4 fixed-point population z-scores of ``val_col``
    within each ``group_col`` group.  Zero-variance groups get z = 0.
    Null values pass through with a null z-score and are excluded from
    the moments.
    """

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        v = np.asarray(batch[val_col], dtype=np.float64)
        ok = ~np.isnan(v)
        g, v = g[ok], v[ok]
        vc = np.floor(v * value_scale + 0.5).astype(np.int64)
        uniq, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        ss = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, vc)
        np.add.at(ss, inv, vc * vc)
        return {group_col: uniq, "n": n, "s": s, "ss": ss}

    parts = (
        ds.select_columns([group_col, val_col])
        .map_batches(partial, batch_format="numpy")
        .to_pandas()
    )
    stats = parts.groupby(group_col)[["n", "s", "ss"]].sum()
    stats_ref = ray.put(
        {
            k: (int(r["n"]), int(r["s"]), int(r["ss"]))
            for k, r in stats.iterrows()
        }
    )

    def apply(batch):
        import pyarrow as pa

        lut = ray.get(stats_ref)
        g = np.asarray(batch.column(group_col).to_numpy(zero_copy_only=False))
        v = np.asarray(
            batch.column(val_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        uniq, inv = np.unique(g, return_inverse=True)
        # a group whose every value is null never reaches pass 1's LUT;
        # n=0 makes disc=0 so its rows fall through to the null z below
        n = np.asarray(
            [lut.get(k, (0, 0, 0))[0] for k in uniq], dtype=np.int64
        )[inv]
        s = np.asarray(
            [lut.get(k, (0, 0, 0))[1] for k in uniq], dtype=np.int64
        )[inv]
        ss = np.asarray(
            [lut.get(k, (0, 0, 0))[2] for k in uniq], dtype=np.int64
        )[inv]
        vc = np.floor(v * value_scale + 0.5)
        vc_i = np.where(np.isnan(vc), 0, vc).astype(np.int64)
        disc = (n * ss - s * s).astype(np.float64)
        num = (n * vc_i - s).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(disc > 0, num / np.sqrt(disc), 0.0)
        z_e4 = np.floor(z * 10000 + 0.5)
        nan = np.isnan(v)
        # nullable int64 honors the e4 fixed-point contract: null input ->
        # null z (not NaN-in-float64, which breaks downstream int64 casts)
        arr = pa.array(
            np.where(nan, 0, z_e4).astype(np.int64),
            type=pa.int64(),
            mask=nan,
        )
        return batch.append_column(out_col, arr)

    return ds.map_batches(apply, batch_format="pyarrow")
