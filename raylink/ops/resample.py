"""Time-series resampling: downsample an event stream to a fixed period
grid per group, DENSIFYING the gaps (every period between a group's first
and last active period gets a row, zero-count periods included) — the
"regularize telemetry before charting/joining" op every event pipeline
needs and plain GROUP BY cannot produce (it only emits periods that have
rows).

Scale shape is combiner-first (the repo's ``count_by_key`` pattern):
every block reduces to per-(group, period) partials — one lexsort +
``np.add.reduceat``, no Python per-row loop — and ONLY those partials pay
the shuffle; the raw events never do.  A sorted-run scan per group merges
the partials and scatters them onto the dense ``arange(lo, hi+1)`` grid.
Densification is the one place resampling can explode (a group whose
first and last events are years apart at a 1-second period emits tens of
millions of rows), so the span is guarded: a group wider than
``max_periods_per_group`` raises loudly instead of silently flooding the
output.

Sums use half-up e4 fixed point (``floor(v*1e4 + 0.5)`` as int64), the
repo-wide convention that makes them associative — bit-identical at any
parallelism.  SQL semantics: ``n`` is ``count(*)`` (null values still
count the row), ``sum_e4`` is ``SUM`` (nulls skipped; NULL when every
value in the period is null, including gap periods).  Null group keys
and null timestamps are excluded like every grouped op in this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["resample_periods"]

DAY_US = 86_400_000_000


def resample_periods(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    value_col: str | None = None,
    period_us: int = DAY_US,
    max_periods_per_group: int = 100_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-group fixed-period (epoch-aligned, UTC) downsample with dense
    gap fill.  Output one row per period in ``[first_active_period,
    last_active_period]`` per group:

    ``(group_col, period_start timestamp[us], n int64, sum_e4 int64?)``

    where gap periods carry ``n=0`` / ``sum_e4=NULL`` and ``sum_e4`` is
    omitted entirely when ``value_col`` is None.
    """
    if period_us < 1:
        raise ValueError("period_us must be >= 1")
    if max_periods_per_group < 1:
        raise ValueError("max_periods_per_group must be >= 1")
    with_value = value_col is not None
    cols = [group_col, ts_col] + ([value_col] if with_value else [])

    try:  # pin the group column's real type (int keys must stay int)
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            gtype = base.field(group_col).type
        else:  # PandasBlockSchema: parallel names/types lists
            gtype = pa.from_numpy_dtype(
                np.dtype(base.types[base.names.index(group_col)])
            )
    except Exception:
        gtype = pa.string()

    def partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(group_col)),
            pc.is_valid(batch.column(ts_col)),
        )
        t = batch.filter(ok)
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        period = (
            t.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // period_us
        )
        if with_value:
            vcol = t.column(value_col)
            has_v = pc.is_valid(vcol).to_numpy(zero_copy_only=False)
            v = vcol.cast(pa.float64()).fill_null(0.0).to_numpy(
                zero_copy_only=False
            )
            ve4 = np.floor(v * 10_000.0 + 0.5).astype(np.int64)
            ve4[~has_v] = 0
        order = np.lexsort((period, g))
        gs, ps = g[order], period[order]
        change = np.ones(len(gs), dtype=bool)
        if len(gs) > 1:
            change[1:] = (gs[1:] != gs[:-1]) | (ps[1:] != ps[:-1])
        starts = np.flatnonzero(change)
        n = (
            np.diff(np.concatenate((starts, [len(gs)])))
            if len(starts)
            else np.empty(0, dtype=np.int64)
        )
        out = {
            # pin the type: an empty/fully-filtered block would otherwise
            # infer a null-typed group column (heterogeneous schemas)
            group_col: pa.array(gs[starts], type=gtype, from_pandas=True),
            "_period": pa.array(ps[starts], type=pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        }
        if with_value:
            so = ve4[order]
            ho = has_v[order].astype(np.int64)
            out["s_e4"] = pa.array(
                np.add.reduceat(so, starts) if len(starts) else so[:0],
                type=pa.int64(),
            )
            out["nv"] = pa.array(
                np.add.reduceat(ho, starts) if len(starts) else ho[:0],
                type=pa.int64(),
            )
        return pa.table(out)

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge(group: dict[str, np.ndarray]) -> dict:
        p = np.asarray(group["_period"])
        n = np.asarray(group["n"])
        order = np.argsort(p, kind="stable")
        p, n = p[order], n[order]
        starts = np.flatnonzero(
            np.concatenate(([True], p[1:] != p[:-1]))
        )
        up = p[starts]
        lo, hi = int(up[0]), int(up[-1])
        span = hi - lo + 1
        if span > max_periods_per_group:
            raise ValueError(
                f"group {group[group_col][0]!r} spans {span} periods "
                f"(> max_periods_per_group={max_periods_per_group}); "
                "widen period_us or raise the cap explicitly"
            )
        idx = (up - lo).astype(np.int64)
        dense_n = np.zeros(span, dtype=np.int64)
        dense_n[idx] = np.add.reduceat(n, starts)
        out = {
            group_col: np.repeat(np.asarray(group[group_col])[:1], span),
            "period_start": (
                (np.arange(lo, hi + 1, dtype=np.int64) * period_us)
                .astype("datetime64[us]")
            ),
            "n": dense_n,
        }
        if with_value:
            s = np.asarray(group["s_e4"])[order]
            nv = np.asarray(group["nv"])[order]
            dense_s = np.zeros(span, dtype=np.int64)
            dense_s[idx] = np.add.reduceat(s, starts)
            dense_nv = np.zeros(span, dtype=np.int64)
            dense_nv[idx] = np.add.reduceat(nv, starts)
            # SQL SUM: NULL when the period has no non-null values —
            # object-with-None keeps the int64 sums exact (a float NaN
            # detour would round above 2^53)
            sum_out = dense_s.astype(object)
            sum_out[dense_nv == 0] = None
            out["sum_e4"] = sum_out
        return out

    def empty(batch: dict[str, np.ndarray]) -> dict:
        out = {
            group_col: np.asarray(batch[group_col])[:0],
            "period_start": np.empty(0, dtype="datetime64[us]"),
            "n": np.empty(0, dtype=np.int64),
        }
        if with_value:
            out["sum_e4"] = np.empty(0, dtype=object)
        return out

    fields = [
        pa.field(group_col, gtype),
        pa.field("period_start", pa.timestamp("us")),
        pa.field("n", pa.int64()),
    ]
    if with_value:
        fields.append(pa.field("sum_e4", pa.int64()))
    return sorted_group_scan(
        partials,
        group_col,
        merge,
        empty,
        num_partitions,
        out_schema=pa.schema(fields),
    )
