"""Ordered-funnel and cohort-retention analytics — the event-stream
accounting queries a training-data/ops pipeline runs over its telemetry
(the reference engine has no event layer; these extend the repo's
sessionize/transitions family).

Both are per-user computations expressed combiner-first:

- :func:`funnel_counts` prunes the stream to the step event types at the
  read (only those rows shuffle), resolves each user's step depth under
  ANY-CHAIN reachability semantics vectorized inside a sorted-run scan
  (feasible completion times propagate per step via two searchsorted;
  equivalent to greedy earliest-chain without a conversion window, and
  the only correct form with one), and reduces to a
  ``len(steps)``-row result.
- :func:`cohort_retention` reduces every block to its distinct
  (user, period) pairs before the shuffle, so at most
  ``users_per_block x periods`` rows pay the exchange; the per-user scan
  emits (cohort, delta) pairs and a second partial-count pass produces
  the cohort matrix — the raw events never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.sortedrun import count_by_key, sorted_group_scan

__all__ = ["funnel_counts", "cohort_retention"]

_SEP = "\x1f"
_DAY_US = 86_400_000_000


def funnel_counts(
    events: ray.data.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_step_gap_us: int | None = None,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """How many users complete step 1, steps 1-2, ..., steps 1-k IN ORDER
    (strictly increasing timestamps; first-match / earliest-chain
    semantics).  Returns one row per step:
    ``(step_idx int64 1-based, step string, n_users int64)``.

    ``n_users`` is cumulative-conjunctive under ANY-CHAIN (reachability)
    semantics: a user counts for step i iff SOME ordered chain of events
    ``steps[0] < ... < steps[i]`` exists with strictly increasing
    timestamps — and, with ``max_step_gap_us`` set, each consecutive gap
    at most that many microseconds (the conversion-window form: "clicked
    within 7 days of the view").  Resolved per user by propagating the
    FEASIBLE-COMPLETION-TIME SET per step (two searchsorted per step, no
    per-event loop): greedy earliest-match is equivalent when no gap cap
    is set, but NOT under one (a later anchor can enable a deeper chain),
    so the feasible-set form is the only correct vectorization.

    Rows with a null user id or null timestamp are excluded, like every
    grouped op in this repo.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError("duplicate step types: each step must be distinct")
    if max_step_gap_us is not None and max_step_gap_us < 1:
        raise ValueError("max_step_gap_us must be >= 1")
    step_idx = {s: i for i, s in enumerate(steps)}
    n_steps = len(steps)

    # prune at the read: only step-typed events, three columns, shuffle
    def prune(batch: pa.Table) -> pa.Table:
        # null user ids / timestamps are excluded like every grouped op
        # in this repo (a NaT would otherwise int-cast to int64 min and
        # anchor a bogus year-1677 chain)
        mask = pc.and_(
            pc.is_in(
                batch.column(type_col),
                value_set=pa.array(steps, type=pa.string()),
            ),
            pc.and_(
                pc.is_valid(batch.column(user_col)),
                pc.is_valid(batch.column(ts_col)),
            ),
        )
        kept = batch.filter(mask)
        code = np.full(len(kept), -1, dtype=np.int64)
        tv = kept.column(type_col).to_numpy(zero_copy_only=False)
        for s, i in step_idx.items():
            code[tv == s] = i
        return pa.Table.from_arrays(
            [
                kept.column(user_col),
                pa.array(code, type=pa.int64()),
                pa.array(
                    kept.column(ts_col)
                    .cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64),
                    type=pa.int64(),
                ),
            ],
            names=[user_col, "_step", "_ts"],
        )

    pruned = events.select_columns(
        [user_col, type_col, ts_col]
    ).map_batches(prune, batch_format="pyarrow")

    gap = max_step_gap_us

    def chain(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        code = np.asarray(group["_step"])
        ts = np.asarray(group["_ts"])
        feas = np.sort(ts[code == 0])  # every step-0 time anchors a chain
        depth = 1 if len(feas) else 0
        for i in range(1, n_steps):
            if len(feas) == 0:
                break
            cand = np.sort(ts[code == i])
            if len(cand) == 0:
                break
            # cand t is reachable iff some feasible completion of step
            # i-1 lies in [t - gap, t)  (strictly before, within window)
            hi = np.searchsorted(feas, cand, side="left")
            lo = (
                np.searchsorted(feas, cand - gap, side="left")
                if gap is not None
                else np.zeros(len(cand), dtype=np.int64)
            )
            feas = cand[hi > lo]
            if len(feas):
                depth += 1
        return {
            user_col: np.asarray(group[user_col])[:1],
            "depth": np.array([depth], dtype=np.int64),
        }

    def chain_empty(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            user_col: np.asarray(batch[user_col])[:0],
            "depth": np.empty(0, dtype=np.int64),
        }

    depths = sorted_group_scan(
        pruned, user_col, chain, chain_empty, num_partitions
    )
    # depth histogram is <= n_steps+1 rows: safe to pull to the driver
    hist = count_by_key(depths, "depth").to_pandas()
    by_depth = np.zeros(n_steps + 1, dtype=np.int64)
    for d, c in zip(hist["depth"], hist["count()"]):
        by_depth[int(d)] = int(c)
    # users at depth >= i completed step i (cumulative from the deep end)
    reached = np.cumsum(by_depth[::-1])[::-1]
    out = pa.Table.from_arrays(
        [
            pa.array(np.arange(1, n_steps + 1, dtype=np.int64)),
            pa.array(steps, type=pa.string()),
            pa.array(reached[1:], type=pa.int64()),
        ],
        names=["step_idx", "step", "n_users"],
    )
    return ray.data.from_arrow(out)


def cohort_retention(
    events: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 1,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Cohort retention matrix: cohort = the period (UTC, ``period_days``
    wide, epoch-aligned) of each user's FIRST event; for every later
    period in which the user is active, the (cohort, delta) cell counts
    them once.  Returns
    ``(cohort string YYYY-MM-DD of the cohort period start,
    period_delta int64 >= 0, n_users int64)`` — ``delta=0`` is cohort
    size.  User ids may be any type; rows with a null user id or null
    timestamp are excluded, like every grouped op in this repo.
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    span = _DAY_US * period_days

    # block combiner: distinct (user, period) pairs only.  Ids keep
    # their input type (string ids work like funnel_counts); null ids /
    # timestamps are excluded like every grouped op in this repo.
    def distinct_pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(user_col)),
                pc.is_valid(batch.column(ts_col)),
            )
        )
        uid = t.column(user_col).to_numpy(zero_copy_only=False)
        ts = (
            t.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        period = ts // span
        keep = (
            pd.DataFrame({"u": uid, "p": period})
            .drop_duplicates()
            .index.to_numpy()
        )
        return pa.Table.from_arrays(
            [
                t.column(user_col).take(pa.array(keep, type=pa.int64())),
                pa.array(period[keep], type=pa.int64()),
            ],
            names=[user_col, "_period"],
        )

    pairs = events.select_columns([user_col, ts_col]).map_batches(
        distinct_pairs, batch_format="pyarrow"
    )

    def per_user(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        periods = np.unique(np.asarray(group["_period"]))
        cohort = periods[0]
        key = np.char.add(
            np.char.add(np.full(len(periods), str(cohort)), _SEP),
            (periods - cohort).astype(str),
        )
        return {"_cell": key.astype(object)}

    def per_user_empty(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {"_cell": np.empty(0, dtype=object)}

    cells = sorted_group_scan(
        pairs,
        user_col,
        per_user,
        per_user_empty,
        num_partitions,
        out_schema=pa.schema([("_cell", pa.string())]),
    )
    counts = count_by_key(cells, "_cell")

    def unpack(batch: pa.Table) -> pa.Table:
        cell = batch.column("_cell").to_numpy(zero_copy_only=False)
        n = batch.column("count()")
        if len(cell):
            parts = np.array([c.split(_SEP) for c in cell], dtype=object)
            cohort_p = parts[:, 0].astype(np.int64)
            delta = parts[:, 1].astype(np.int64)
        else:
            cohort_p = np.empty(0, dtype=np.int64)
            delta = np.empty(0, dtype=np.int64)
        start = pa.array(
            (cohort_p * span).astype("datetime64[us]"),
            type=pa.timestamp("us"),
        )
        return pa.Table.from_arrays(
            [
                pc.strftime(start, format="%Y-%m-%d"),
                pa.array(delta, type=pa.int64()),
                n.cast(pa.int64()) if hasattr(n, "cast") else n,
            ],
            names=["cohort", "period_delta", "n_users"],
        )

    return counts.map_batches(unpack, batch_format="pyarrow")
