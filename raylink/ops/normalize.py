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

For key cardinalities beyond driver memory, ``group_standardize``
switches automatically (``driver_threshold``, same switch as
``exact_dedup``): the partials (3 ints/key/block) merge through a
``sorted_group_scan`` and the stats join back to the rows with the
native hash-shuffle join — one row shuffle, which IS the honest cost
once the stats table itself is too big to broadcast.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

__all__ = [
    "collapse_rare_categories",
    "group_standardize",
    "grouped_corr",
    "grouped_robust_stats",
    "grouped_higher_moments",
]


def _z_e4_column(v: np.ndarray, n, s, ss, value_scale: int):
    """The one shared float expression of both execution paths: e4
    fixed-point z from identical int64 moments (see module docstring)."""
    import pyarrow as pa

    n = np.asarray(n, dtype=np.int64)
    s = np.asarray(s, dtype=np.int64)
    ss = np.asarray(ss, dtype=np.int64)
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
    return pa.array(
        np.where(nan, 0, z_e4).astype(np.int64), type=pa.int64(), mask=nan
    )


def group_standardize(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    out_col: str = "z_e4",
    value_scale: int = 100,
    driver_threshold: int = 2_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Append half-up e4 fixed-point population z-scores of ``val_col``
    within each ``group_col`` group.  Zero-variance groups get z = 0.
    Null values pass through with a null z-score and are excluded from
    the moments.

    Partial-moment rows (keys x blocks) at or below ``driver_threshold``
    merge on the driver and broadcast as a LUT (zero row movement);
    above it the scale path engages: sorted-run partial merge + a
    hash-shuffle join of the stats back onto the rows.
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

    partials = (
        ds.select_columns([group_col, val_col])
        .map_batches(partial, batch_format="numpy")
        .materialize()
    )

    if partials.count() <= driver_threshold:
        parts = partials.to_pandas()
        stats = parts.groupby(group_col)[["n", "s", "ss"]].sum()
        stats_ref = ray.put(
            dict(
                zip(
                    stats.index,
                    zip(
                        stats["n"].astype(int),
                        stats["s"].astype(int),
                        stats["ss"].astype(int),
                    ),
                )
            )
        )

        def apply(batch):
            lut = ray.get(stats_ref)
            g = np.asarray(
                batch.column(group_col).to_numpy(zero_copy_only=False)
            )
            v = np.asarray(
                batch.column(val_col).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            uniq, inv = np.unique(g, return_inverse=True)
            # a group whose every value is null never reaches pass 1's
            # LUT; n=0 makes disc=0 so its rows get z=0 / null-v rows null
            n = np.asarray(
                [lut.get(k, (0, 0, 0))[0] for k in uniq], dtype=np.int64
            )[inv]
            s = np.asarray(
                [lut.get(k, (0, 0, 0))[1] for k in uniq], dtype=np.int64
            )[inv]
            ss = np.asarray(
                [lut.get(k, (0, 0, 0))[2] for k in uniq], dtype=np.int64
            )[inv]
            return batch.append_column(
                out_col, _z_e4_column(v, n, s, ss, value_scale)
            )

        return ds.map_batches(apply, batch_format="pyarrow")

    # scale path: merge partials via sorted-run scan (only partials
    # shuffle there), then ONE hash-shuffle join of the 4-column stats
    # table back onto the rows — unavoidable once the stats exceed a
    # broadcastable size
    from ..stages.sortedrun import absorb_blank_blocks, sorted_group_scan
    from .joins import hash_join

    def merge(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            group_col: np.asarray(group[group_col])[:1],
            "_gs_n": np.asarray([np.sum(group["n"])], dtype=np.int64),
            "_gs_s": np.asarray([np.sum(group["s"])], dtype=np.int64),
            "_gs_ss": np.asarray([np.sum(group["ss"])], dtype=np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            "_gs_n": np.empty(0, dtype=np.int64),
            "_gs_s": np.empty(0, dtype=np.int64),
            "_gs_ss": np.empty(0, dtype=np.int64),
        }

    stats_ds = sorted_group_scan(
        partials, group_col, merge, empty, num_partitions=num_partitions
    )
    # the scan union can carry schema-less empty blocks that break the
    # join's empty-partition typing under key skew — absorb them first,
    # at the SAME granularity as the scan (this branch exists for stats
    # tables too big to broadcast; fewer blocks would concentrate a
    # beyond-driver table into a handful of repartition tasks)
    stats_ds = absorb_blank_blocks(stats_ds, num_partitions)
    joined = hash_join(
        ds, stats_ds, on=group_col, how="left", num_partitions=num_partitions
    )

    def apply_joined(batch):
        import pyarrow.compute as pc

        v = np.asarray(
            batch.column(val_col).to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        # all-null groups miss the left join -> null moments -> n=0.
        # fill_null IN ARROW: a null-bearing int64 column would decay to
        # float64 NaN in numpy and lose exactness near 2^63
        n, s, ss = (
            pc.fill_null(batch.column(c), 0).to_numpy(zero_copy_only=False)
            for c in ("_gs_n", "_gs_s", "_gs_ss")
        )
        out = batch.drop_columns(["_gs_n", "_gs_s", "_gs_ss"])
        return out.append_column(
            out_col, _z_e4_column(v, n, s, ss, value_scale)
        )

    return joined.map_batches(apply_joined, batch_format="pyarrow")


def grouped_corr(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int = 100,
    y_scale: int = 100,
) -> ray.data.Dataset:
    """Pearson correlation of ``x_col`` and ``y_col`` per group — the
    drift/association profile ("does discount track quantity per flag?").

    Same integer-moment exactness trick as :func:`group_standardize`:
    blocks reduce to per-key int64 moments ``(n, Σx, Σy, Σx², Σy², Σxy)``
    over half-up fixed-point values (associative — identical at any
    parallelism), and the one float expression

        r = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²) · √(n·Σy² − Σy²))

    is evaluated from identical integers in both this engine and the
    DuckDB oracle, so ``corr_e6`` matches bit-for-bit.  The fixed-point
    scales cancel in r, so they only need to preserve the caller's
    precision; the int64 headroom constraint is the module's usual one.
    Rows with a null in either column are excluded (SQL ``corr``
    semantics); degenerate groups (n < 2 or zero variance) emit no row.

    Output: (group, n int64, corr_e6 int64).
    """
    import pyarrow as pa

    moments = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        x = np.asarray(batch[x_col], dtype=np.float64)
        y = np.asarray(batch[y_col], dtype=np.float64)
        ok = ~np.isnan(x) & ~np.isnan(y)
        if g.dtype == object:
            # dtype=bool: an empty comprehension infers float64 otherwise
            ok &= np.array([k is not None for k in g], dtype=bool)
        g, x, y = g[ok], x[ok], y[ok]
        xq = np.floor(x * x_scale + 0.5).astype(np.int64)
        yq = np.floor(y * y_scale + 0.5).astype(np.int64)
        uniq, inv = np.unique(g, return_inverse=True)
        out = {group_col: uniq}
        acc = {m: np.zeros(len(uniq), dtype=np.int64) for m in moments}
        np.add.at(acc["n"], inv, 1)
        np.add.at(acc["sx"], inv, xq)
        np.add.at(acc["sy"], inv, yq)
        np.add.at(acc["sxx"], inv, xq * xq)
        np.add.at(acc["syy"], inv, yq * yq)
        np.add.at(acc["sxy"], inv, xq * yq)
        out.update(acc)
        return out

    parts = (
        ds.select_columns([group_col, x_col, y_col])
        .map_batches(partial, batch_format="numpy")
        .to_pandas()
    )
    if len(parts) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "corr_e6": pa.array([], type=pa.int64()),
                }
            )
        )
    stats = parts.groupby(group_col)[moments].sum().reset_index()
    # each SUM casts to double FIRST, then one float expression — the
    # exact op sequence the oracle's ::DOUBLE casts produce
    f = {m: stats[m].to_numpy(np.int64).astype(np.float64)
         for m in moments}
    num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
    dx = f["n"] * f["sxx"] - f["sx"] * f["sx"]
    dy = f["n"] * f["syy"] - f["sy"] * f["sy"]
    keep = (dx > 0) & (dy > 0)
    r = num[keep] / (np.sqrt(dx[keep]) * np.sqrt(dy[keep]))
    return ray.data.from_arrow(
        pa.table(
            {
                group_col: pa.array(stats[group_col].to_numpy()[keep]),
                "n": pa.array(stats["n"].to_numpy(np.int64)[keep]),
                "corr_e6": pa.array(
                    np.floor(r * 1000000 + 0.5).astype(np.int64)
                ),
            }
        )
    )


def grouped_robust_stats(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group robust location/scale: exact median and MAD (median
    absolute deviation, DuckDB ``mad()`` semantics — the outlier-immune
    siblings of :func:`group_standardize`'s mean/std).  Output one row
    per group:

    ``(group_col, n int64, median_e4 int64, mad_e4 int64)``

    with half-up e4 fixed-point values and ``n`` the non-null value
    count.  Null group keys and null values are excluded like every
    grouped op in this repo (SQL aggregates skip null inputs).

    Scale shape: one sort exchange, then each group computes both
    medians in one vectorized pass — the same group-fits-one-task model
    as ``group_ntile`` / ``group_percent_rank`` (exact medians are not
    mergeable from partials; the approximate sketch for
    beyond-task-memory groups is ``ops/sketch.py``'s quantile path).
    Both engines interpolate even-length medians as the mean of the two
    middle doubles, so the e4 values match the oracle bit-for-bit.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.sortedrun import sorted_group_scan
    from .lag import _arrow_schema

    gtype = _arrow_schema(ds).field(group_col).type
    out_schema = pa.schema(
        [
            (group_col, gtype),
            ("n", pa.int64()),
            ("median_e4", pa.int64()),
            ("mad_e4", pa.int64()),
        ]
    )

    def prune(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, val_col])
        return t.filter(
            pc.and_(
                pc.is_valid(t.column(group_col)),
                pc.is_valid(t.column(val_col)),
            )
        )

    def group_fn(group: dict[str, np.ndarray]) -> dict:
        v = np.asarray(group[val_col], dtype=np.float64)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return {
            group_col: np.asarray(group[group_col])[:1],
            "n": np.array([len(v)], dtype=np.int64),
            "median_e4": np.array(
                [np.floor(med * 10_000.0 + 0.5)], dtype=np.int64
            ),
            "mad_e4": np.array(
                [np.floor(mad * 10_000.0 + 0.5)], dtype=np.int64
            ),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            "n": np.empty(0, dtype=np.int64),
            "median_e4": np.empty(0, dtype=np.int64),
            "mad_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        ds.map_batches(prune, batch_format="pyarrow"),
        group_col,
        group_fn,
        empty_fn,
        num_partitions=num_partitions,
        out_schema=out_schema,
    )


def grouped_higher_moments(
    ds: ray.data.Dataset,
    group_col: str,
    val_col: str,
    driver_threshold: int = 2_000_000,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Per-group sample skewness and excess kurtosis, DuckDB
    ``skewness()`` / ``kurtosis()`` semantics (adjusted Fisher-Pearson
    skewness; bias-corrected excess kurtosis) — the tail-shape profile
    behind distribution drift checks and outlier-regime detection.
    Output one row per group:

    ``(group_col, n int64, skew_e4 int64|null, kurt_e4 int64|null)``

    with half-up e4 fixed point; ``skew_e4`` is null when n < 3 or the
    group has zero variance, ``kurt_e4`` when n < 4 or zero variance
    (probed DuckDB behaviour).  Null keys/values excluded as usual.

    Two combiner-first passes (higher central moments are not
    order-independently mergeable in float, and raw power sums of
    e-scaled ints overflow int64 at corpus scale):

    1. per-block ``(n, sum)`` partials -> per-group mean.  Partial rows
       at or below ``driver_threshold`` merge on the driver and
       broadcast as a LUT (zero row movement — the common low-
       cardinality case); above it they merge in a sorted-run scan and
       reach the rows through one hash-shuffle join (the honest cost
       once the group table exceeds broadcast size).
    2. per-block centered power sums sum((v-mean)^k), k=2..4, merged in
       a sorted-run scan; the final formula map emits one row per group.

    Exactness contract: centering bounds the float64 partial-sum error
    at ~1e-12 relative (vs the cancellation catastrophe of raw power
    sums), the same order as DuckDB's own streaming accumulation, so
    both engines' doubles round to the same e4 integer except on
    measure-zero boundaries — the same tolerance argument as every
    e4-rounded float op in this repo.
    """
    import pyarrow as pa

    from ..stages.sortedrun import absorb_blank_blocks, sorted_group_scan
    from .joins import hash_join
    from .lag import _arrow_schema

    gtype = _arrow_schema(ds).field(group_col).type
    rows = ds.select_columns([group_col, val_col])

    def partial1(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        g = np.asarray(batch[group_col])
        v = np.asarray(batch[val_col], dtype=np.float64)
        ok = ~(np.isnan(v) | pd_isna(g))
        g, v = g[ok], v[ok]
        uniq, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        s = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, v)
        return {group_col: uniq, "n": n, "s": s}

    partials1 = rows.map_batches(
        partial1, batch_format="numpy"
    ).materialize()

    broadcast = partials1.count() <= driver_threshold
    if broadcast:
        parts = partials1.to_pandas()
        stats = parts.groupby(group_col)[["n", "s"]].sum()
        lut_ref = ray.put(
            dict(
                zip(
                    stats.index,
                    zip(stats["n"].astype(int), stats["s"].astype(float)),
                )
            )
        )

        def with_stats(batch: dict[str, np.ndarray]):
            lut = ray.get(lut_ref)
            g = np.asarray(batch[group_col])
            uniq, inv = np.unique(g, return_inverse=True)
            n = np.asarray(
                [lut.get(k, (0, 0.0))[0] for k in uniq], dtype=np.int64
            )[inv]
            s = np.asarray(
                [lut.get(k, (0, 0.0))[1] for k in uniq], dtype=np.float64
            )[inv]
            return {
                group_col: g,
                val_col: np.asarray(batch[val_col], dtype=np.float64),
                "_hm_n": n,
                "_hm_s": s,
            }

        staged = rows.map_batches(with_stats, batch_format="numpy")
    else:
        def merge1(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return {
                group_col: np.asarray(group[group_col])[:1],
                "_hm_n": np.asarray([np.sum(group["n"])], dtype=np.int64),
                "_hm_s": np.asarray([np.sum(group["s"])], dtype=np.float64),
            }

        def empty1(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
            return {
                group_col: np.asarray(batch[group_col])[:0],
                "_hm_n": np.empty(0, dtype=np.int64),
                "_hm_s": np.empty(0, dtype=np.float64),
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
        v = np.asarray(batch[val_col], dtype=np.float64)
        n = np.asarray(batch["_hm_n"], dtype=np.float64)
        s = np.asarray(batch["_hm_s"], dtype=np.float64)
        ok = ~(np.isnan(v) | pd_isna(g)) & (n > 0)
        g, v, n, s = g[ok], v[ok], n[ok], s[ok]
        d = v - s / n
        uniq, inv = np.unique(g, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        d2 = np.zeros(len(uniq), dtype=np.float64)
        d3 = np.zeros(len(uniq), dtype=np.float64)
        d4 = np.zeros(len(uniq), dtype=np.float64)
        sq = d * d
        np.add.at(cnt, inv, 1)
        np.add.at(d2, inv, sq)
        np.add.at(d3, inv, sq * d)
        np.add.at(d4, inv, sq * sq)
        return {group_col: uniq, "cnt": cnt, "d2": d2, "d3": d3, "d4": d4}

    partials2 = staged.map_batches(partial2, batch_format="numpy")

    out_schema = pa.schema(
        [
            (group_col, gtype),
            ("n", pa.int64()),
            ("skew_e4", pa.int64()),
            ("kurt_e4", pa.int64()),
        ]
    )

    def finish(group: dict[str, np.ndarray]) -> dict:
        n = int(np.sum(np.asarray(group["cnt"], dtype=np.int64)))
        d2 = float(np.sum(np.asarray(group["d2"], dtype=np.float64)))
        d3 = float(np.sum(np.asarray(group["d3"], dtype=np.float64)))
        d4 = float(np.sum(np.asarray(group["d4"], dtype=np.float64)))
        skew = kurt = None
        if n >= 3 and d2 > 0.0:
            m2 = d2 / n
            g1 = (d3 / n) / m2**1.5
            skew = np.floor(
                g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0) * 10_000.0 + 0.5
            )
        if n >= 4 and d2 > 0.0:
            m2 = d2 / n
            g2 = (d4 / n) / (m2 * m2) - 3.0
            kurt = np.floor(
                (n - 1.0) / ((n - 2.0) * (n - 3.0))
                * ((n + 1.0) * g2 + 6.0)
                * 10_000.0
                + 0.5
            )
        return {
            group_col: np.asarray(group[group_col])[:1],
            "n": np.array([n], dtype=np.int64),
            "skew_e4": [None if skew is None else int(skew)],
            "kurt_e4": [None if kurt is None else int(kurt)],
        }

    def empty2(batch: dict[str, np.ndarray]) -> dict:
        return {
            group_col: np.asarray(batch[group_col])[:0],
            "n": np.empty(0, dtype=np.int64),
            "skew_e4": np.empty(0, dtype=np.int64),
            "kurt_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        partials2, group_col, finish, empty2,
        num_partitions=num_partitions, out_schema=out_schema,
    )


def pd_isna(arr: np.ndarray) -> np.ndarray:
    """Elementwise null mask that is total over object/str/numeric key
    arrays (np.isnan alone rejects object dtype)."""
    import pandas as pd

    return pd.isna(arr)


def collapse_rare_categories(
    ds: ray.data.Dataset,
    col: str,
    min_count: int,
    out_col: str | None = None,
    other: str = "other",
    broadcast_limit: int = 5_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Replace category values observed fewer than ``min_count`` times
    with ``other`` — the standard long-tail hygiene step before a
    pivot, a mixture plan, or a categorical feature (SQL: ``CASE WHEN
    cnt >= k THEN v ELSE 'other' END`` over a count join).

    Plan (combiner-first broadcast, zero row shuffle for the data):
    :func:`~raylink.stages.sortedrun.count_by_key` reduces every block
    to per-category partials, the KEPT set (categories at or above the
    threshold — bounded by the distinct count, not the row count) pulls
    to the driver and ships once via ``ray.put``, and the rows stream
    map-only through a vectorized membership test.  Nulls pass through
    unchanged (SQL CASE on a NULL count never fires; null is "no
    category", not a rare one).  A kept-set larger than
    ``broadcast_limit`` is refused loudly — at that cardinality the
    column is id-like and collapsing is the wrong tool.
    """
    import pandas as pd

    import ray

    from ..stages.sortedrun import count_by_key

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    out_col = out_col or col

    def drop_nulls(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[col])
        return {col: v[~pd_isna(v)]}

    counts = count_by_key(
        ds.select_columns([col]).map_batches(
            drop_nulls, batch_format="numpy"
        ),
        col,
        num_partitions=num_partitions,
    )
    def thresh(t):
        import pyarrow.compute as _pc

        return t.filter(
            _pc.greater_equal(t.column("count()"), int(min_count))
        )

    kept_df = (
        counts.map_batches(thresh, batch_format="pyarrow")
        .limit(broadcast_limit + 1)
        .to_pandas()
    )
    if len(kept_df) > broadcast_limit:
        raise ValueError(
            f"kept-category set exceeds broadcast_limit="
            f"{broadcast_limit}; the column is id-like — collapsing "
            "is the wrong tool at that cardinality"
        )
    kept_ref = ray.put(
        set() if len(kept_df) == 0 else set(kept_df[col].tolist())
    )
    cols = list(ds.schema().names)

    def collapse(batch: dict[str, np.ndarray]) -> dict:
        kept = ray.get(kept_ref)
        v = np.asarray(batch[col], dtype=object)
        isna = pd_isna(v)
        in_kept = pd.Series(v).isin(kept).to_numpy()
        out_v = np.where(in_kept | isna, v, other)
        out = {c: batch[c] for c in cols}
        out[out_col] = out_v
        return out

    return ds.map_batches(collapse, batch_format="numpy")
