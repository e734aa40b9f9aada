"""Per-group ordered window functions: LAG / inter-event delta and
running (cumulative) sum.

The classic feature-engineering windows over an event stream — "time
since this user's previous event", "user's running spend" — which the
reference lacks entirely (it has no event operators, SURVEY.md §2.11)
but any training-data/session pipeline needs.

Scale design: one ``sort(group)`` range-partition exchange via
``sorted_group_scan`` (raylink.stages.sortedrun), then a vectorized
per-run scan — inside each group the window is one ``np.lexsort`` by the
order columns plus a shifted view / ``np.cumsum``; no per-row Python, no
``groupby().map_groups`` over interior groups (boundary groups that
straddle block edges are repaired by the scan's tiny second pass).  The
rows of a group never need to fit anywhere but one block — the same
assumption every SQL window PARTITION BY makes.

Ordering inside a group is re-established *inside* the group function
(groups are small; block-level sort stability is never relied on), so
the result is deterministic at any parallelism as long as
``order_cols`` is a total order per group (pass a unique tiebreaker
like the event id).

Numeric exactness: LAG/delta are emitted through float64 (NaN = SQL
NULL for each group's first row) and pinned back to int64 when the
input is integral — exact below 2^53, plenty for epoch-microsecond
timestamps.  The running sum uses half-up e4 fixed-point int64
(``floor(v * 10^4 + 0.5)`` — the same expression a SQL oracle can
state), so the cumulative sum is exactly associative and bit-identical
cross-engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["group_lag", "group_running_sum", "group_rolling_sum", "group_rolling_sum_range", "group_decayed_sum"]


def try_arrow_schema(ds: ray.data.Dataset) -> "pa.Schema | None":
    """`_arrow_schema`, returning None (with a logged warning) when the
    schema cannot be derived.  Callers use this to PIN output schemas on
    scans that may emit empty blocks; a silent failure here degrades to
    the schema-less-empty-block hazard documented in
    stages/sortedrun.py::absorb_blank_blocks, so the failure must be
    loud even though it is recoverable."""
    import logging

    try:
        return _arrow_schema(ds)
    except (TypeError, ValueError, KeyError, AttributeError,
            pa.ArrowInvalid, pa.ArrowNotImplementedError) as exc:
        logging.getLogger("raylink").warning(
            "schema pin failed (%s: %s); empty output blocks will be "
            "schema-less", type(exc).__name__, exc,
        )
        return None


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Best-effort Arrow schema for a Dataset (pandas-backed inputs in
    tests report numpy dtypes — map them; object dtype means strings
    in a pandas block, which pa.from_numpy_dtype cannot express)."""
    s = ds.schema()
    fields = []
    for name, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            dt = np.dtype(t)
            if dt == np.dtype(object):
                t = pa.string()
            else:
                t = pa.from_numpy_dtype(dt)
        fields.append(pa.field(name, t))
    return pa.schema(fields)


# |v| * 10^4 must stay within int64 for the fixed-point encodings below
_E4_LIMIT = (1 << 63) // 10_000


def _fixed_e4(v: np.ndarray, integral: bool) -> np.ndarray:
    """Half-up e4 fixed-point int64, refusing silent overflow (numpy
    int64 wraps without raising — epoch-microsecond magnitudes already
    exceed int64/10^4)."""
    if integral:
        if len(v) and int(np.abs(v).max()) >= _E4_LIMIT:
            raise ValueError(
                "values exceed the e4 fixed-point int64 range "
                f"(|v| >= {_E4_LIMIT}); sum epoch-second or delta values "
                "instead of raw epoch-microseconds"
            )
        return v.astype(np.int64) * 10_000
    f = np.asarray(v, dtype=np.float64)
    if np.isnan(f).any():
        # floor(NaN).astype(int64) silently becomes INT64_MIN and wraps
        # every later cumulative sum; SQL SUM-skips-NULL semantics are
        # not reproducible through a cumsum, so refuse loudly
        raise ValueError(
            "null values in the summed column are unsupported; filter or "
            "fill them first"
        )
    if len(f) and np.max(np.abs(f)) >= float(_E4_LIMIT):
        raise ValueError(
            "values exceed the e4 fixed-point int64 range; rescale first"
        )
    return np.floor(f * 10_000 + 0.5).astype(np.int64)


def _as_numeric(v: np.ndarray) -> tuple[np.ndarray, bool]:
    """datetime64 -> epoch-us int64; returns (array, is_integral)."""
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64), True
    if np.issubdtype(v.dtype, np.integer):
        return v, True
    return v, False


def group_lag(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    val_col: str,
    out_prev: str = "prev",
    out_delta: str = "delta",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append SQL ``LAG(val) OVER (PARTITION BY group ORDER BY order_cols)``
    (as ``out_prev``) and ``val - LAG(val)`` (as ``out_delta``); NULL on
    each group's first row.  ``val_col`` may be int, float, or timestamp
    (timestamps become epoch-microsecond int64)."""
    cols = list(ds.schema().names)
    base = _arrow_schema(ds)
    vt = base.field(val_col).type
    probe_integral = pa.types.is_integer(vt) or pa.types.is_timestamp(vt)
    out_t = pa.int64() if probe_integral else pa.float64()
    out_schema = pa.schema(
        list(base) + [pa.field(out_prev, out_t), pa.field(out_delta, out_t)]
    )

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        v, integral = _as_numeric(out[val_col])
        if integral and len(v) and int(np.abs(v).max()) >= (1 << 53):
            # prev/delta ride through float64; beyond 2^53 (epoch-ns,
            # snowflake ids) adjacent values collapse silently
            raise ValueError(
                "integer values exceed float64's exact range (2^53); "
                "rescale (e.g. epoch-ns -> epoch-us) first"
            )
        vf = v.astype(np.float64)
        prev = np.empty(len(vf), dtype=np.float64)
        prev[0] = np.nan
        prev[1:] = vf[:-1]
        out[out_prev] = prev
        out[out_delta] = vf - prev  # NaN propagates to the first row
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_prev] = np.empty(0, dtype=np.float64)
        out[out_delta] = np.empty(0, dtype=np.float64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )


def group_running_sum(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    val_col: str,
    out_col: str = "run_sum_e4",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append the per-group running sum of ``val_col`` ordered by
    ``order_cols`` as half-up e4 fixed-point int64 — SQL
    ``SUM(floor(v*10000+0.5)::BIGINT) OVER (PARTITION BY group ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)``, bit-identical at any
    parallelism because every engine sums the same integers.  Values at
    epoch-microsecond magnitude exceed the e4 int64 range and are
    refused loudly — sum inter-event deltas or epoch seconds instead."""
    cols = list(ds.schema().names)
    base = _arrow_schema(ds)
    out_schema = pa.schema(list(base) + [pa.field(out_col, pa.int64())])

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        v, integral = _as_numeric(out[val_col])
        out[out_col] = np.cumsum(_fixed_e4(v, integral))
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )


def group_rolling_sum(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    val_col: str,
    window: int,
    out_col: str = "roll_sum_e4",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append the per-group sliding-window sum of the last ``window``
    rows (current row inclusive) ordered by ``order_cols`` — SQL
    ``SUM(floor(v*10000+0.5)::BIGINT) OVER (PARTITION BY group ORDER BY
    order_cols ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` —
    half-up e4 fixed-point int64, so exact at any parallelism.  The
    window is a cumsum difference per group run: O(n), no per-row
    Python, no re-summation per position."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    cols = list(ds.schema().names)
    base = _arrow_schema(ds)
    out_schema = pa.schema(list(base) + [pa.field(out_col, pa.int64())])

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        v, integral = _as_numeric(out[val_col])
        c = np.cumsum(_fixed_e4(v, integral))
        roll = c.copy()
        roll[window:] -= c[:-window]
        out[out_col] = roll
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )


def group_rolling_sum_range(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    val_col: str,
    window_us: int,
    out_col: str = "range_sum_e4",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append the per-group TIME-range rolling sum — SQL
    ``SUM(floor(v*10000+0.5)::BIGINT) OVER (PARTITION BY group ORDER BY
    ts RANGE BETWEEN <window> PRECEDING AND CURRENT ROW)`` — the
    value-based frame :func:`group_rolling_sum` (ROWS-k) cannot
    express: each row sums every group row with
    ``ts in [ts_i - window_us, ts_i]``, INCLUDING later-ordered peers
    that share ``ts_i`` exactly (SQL RANGE peer semantics, pinned by
    the oracle).  An all-null frame yields NULL, matching ``SUM``.

    One sort exchange; per group the frame bounds come from two
    ``searchsorted`` passes over the epoch-microsecond timestamps and
    the sums from one cumsum difference — O(n log n) in the group, no
    per-row Python.  Rows with a null timestamp are refused loudly
    (SQL leaves their frame undefined-ish; an explicit filter upstream
    beats a silent convention).
    """
    if window_us < 0:
        raise ValueError(f"window_us must be >= 0, got {window_us}")
    cols = list(ds.schema().names)
    base = _arrow_schema(ds)
    out_schema = pa.schema(list(base) + [pa.field(out_col, pa.int64())])

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        import pandas as pd

        raw = np.asarray(batch[ts_col])
        # NaT converts to INT64_MIN through the integral path — catch
        # BEFORE conversion so a null timestamp cannot silently become
        # an ancient epoch
        bad = (
            np.isnat(raw).any()
            if np.issubdtype(raw.dtype, np.datetime64)
            else pd.isna(raw).any()
        )
        if bad:
            raise ValueError(
                f"null timestamps in {ts_col!r}: filter them before a "
                "RANGE window (SQL peer frames are undefined for NULL "
                "ordering keys)"
            )
        ts_raw, ts_int = _as_numeric(raw)
        if ts_int and ts_raw.dtype.kind == "u":
            # unsigned wraps under `ts - window` (stays unsigned):
            # move to int64, refusing the values that cannot
            if len(ts_raw) and int(ts_raw.max()) >= 2**63:
                raise ValueError(
                    f"{ts_col!r} has uint64 values beyond int64 range"
                )
            ts_raw = ts_raw.astype(np.int64)
        # float timestamps stay float: truncating to int64 would merge
        # distinct fractional instants into RANGE peers (searchsorted
        # and the window arithmetic work identically on float64)
        idx = np.argsort(ts_raw, kind="stable")
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        ts = ts_raw[idx]
        v, integral = _as_numeric(out[val_col])
        if integral:
            e4 = _fixed_e4(v, True)
            nn = np.ones(len(v), dtype=np.int64)
        else:
            isnan = np.isnan(v)
            e4 = _fixed_e4(np.where(isnan, 0.0, v), False)
            e4[isnan] = 0
            nn = (~isnan).astype(np.int64)
        c = np.concatenate(([0], np.cumsum(e4)))
        cn = np.concatenate(([0], np.cumsum(nn)))
        # frame = [ts_i - window, ts_i] inclusive of ALL equal-ts peers
        lo = np.searchsorted(ts, ts - window_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        sums = c[hi] - c[lo]
        counts = cn[hi] - cn[lo]
        if (counts == 0).any():  # only NULL-bearing groups pay the
            res = sums.astype(object)  # object-array boxing
            res[counts == 0] = None
            out[out_col] = res
        else:
            out[out_col] = sums
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=object)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )


def group_decayed_sum(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    val_col: str,
    half_life_us: float,
    out_col: str = "decayed_sum",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-group exponentially-decayed sum — the recency-weighted
    engagement/activity score::

        s_i = sum_{j: ts_j <= ts_i} v_j * 0.5 ** ((ts_i - ts_j) / half_life)

    peer-inclusive on exact timestamp ties (rows sharing ``ts_i`` see
    each other, the RANGE-frame convention).  An ITERATIVE aggregate —
    SQL's only exact spelling is an O(n²) theta self-join, and a
    recurrence evaluated in a different order drifts in the last float
    ulps, so this op ships with a brute-force parity test and a bench
    grade instead of a hash oracle.

    One sort exchange; within each group the recurrence is vectorized
    with segmented renormalization: weights ``exp((t - t_base)/tau)``
    stay in float64 range by restarting the base whenever the segment
    span exceeds ~80·tau (the carry across a restart decays through a
    directly-computed ``exp(-gap/tau)``, which only ever UNDERFLOWS to
    the mathematically-correct 0).  Output is deterministic at any
    parallelism.  Null timestamps are refused; null values contribute 0
    but still emit their row.
    """
    if half_life_us <= 0:
        raise ValueError("half_life_us must be positive")
    tau = float(half_life_us) / np.log(2.0)
    cols = list(ds.schema().names)
    base = _arrow_schema(ds)
    out_schema = pa.schema(list(base) + [pa.field(out_col, pa.float64())])
    _SPAN = 80.0  # exp(80) ~ 5.5e34: comfortably inside float64

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        import pandas as pd

        raw = np.asarray(batch[ts_col])
        bad = (
            np.isnat(raw).any()
            if np.issubdtype(raw.dtype, np.datetime64)
            else pd.isna(raw).any()
        )
        if bad:
            raise ValueError(f"null timestamps in {ts_col!r}")
        # float64 throughout: unsigned wrap is moot here (no integer
        # subtraction), so the sibling op's uint guard is not needed
        ts_f = _as_numeric(raw)[0].astype(np.float64)
        idx = np.argsort(ts_f, kind="stable")
        out = {c: np.asarray(batch[c])[idx] for c in cols}
        t = ts_f[idx]
        v = np.asarray(
            pd.to_numeric(pd.Series(out[val_col]), errors="coerce"),
            dtype=np.float64,
        )
        v = np.nan_to_num(v, nan=0.0)
        n = len(t)
        s = np.empty(n, dtype=np.float64)
        # segment starts: restart the weight base when the span from the
        # current base exceeds _SPAN * tau — advanced by searchsorted,
        # so the work is O(#segments log n), not a per-row Python loop
        starts = [0]
        while starts[-1] < n:
            base_t = t[starts[-1]]
            nxt = int(
                np.searchsorted(t, base_t + _SPAN * tau, side="right")
            )
            starts.append(max(nxt, starts[-1] + 1))
        # n == 0 leaves starts == [0]: zero segments, s stays empty
        carry = 0.0  # decayed sum just after the previous segment's end
        carry_t = -np.inf
        for a, b in zip(starts[:-1], starts[1:]):
            seg_t, seg_v = t[a:b], v[a:b]
            w = np.exp((seg_t - seg_t[0]) / tau)
            c = np.cumsum(seg_v * w)
            # peer-inclusive: each row reads the cumsum at the END of
            # its tie run
            hi = np.searchsorted(seg_t, seg_t, side="right") - 1
            with np.errstate(under="ignore"):
                decay_in = (
                    np.exp(-(seg_t - carry_t) / tau)
                    if np.isfinite(carry_t)
                    else np.zeros(b - a)
                )
                s[a:b] = c[hi] / w + carry * decay_in
            carry = float(s[b - 1])
            carry_t = float(seg_t[-1])
        out[out_col] = s
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.float64)
        return out

    return sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions,
        out_schema=out_schema,
    )
