"""Broadcast equi-join: map-only dimension-table enrichment.

Ray Data's native ``Dataset.join`` is a hash-shuffle join — both sides
are repartitioned by key, an all-to-all exchange of every row.  That is
the right plan for big⋈big, but the overwhelmingly common analytic join
is big-fact ⋈ small-dimension (orders⋈customer-segment, docs⋈source
metadata, events⋈user attributes).  There the classic distributed plan
is a **broadcast join**: materialize the small side once, ``ray.put`` it
into the object store, and merge each fact batch against it inside
``map_batches`` — zero shuffle, the fact table streams straight through,
and every worker on every node reads the one shared copy (Ray's object
store replicates it per node, not per task).

Semantics are SQL ``INNER`` / ``LEFT OUTER JOIN`` on one equi-key:

- duplicate right keys multiply left rows (true join, not a lookup);
- NULL keys never match (null == null included — Acero-native), and
  neither do NaN float keys (Acero WOULD match NaN == NaN; NaN-keyed
  right rows are dropped from the hash table up front, so a NaN left
  key is dropped under inner / null-padded under left, exactly SQL);
- overlapping non-key column names on the right get ``suffix``.

The per-batch merge is ``pyarrow.Table.join`` (Acero's hash join)
against the broadcast Arrow table — zero-copy from the object store,
no pandas conversion on the fact stream, and unmatched left-outer rows
null-pad natively (Arrow int64 stays int64 with nulls; the pandas path
needed an Int64 pin to stop miss-bearing batches decaying to float64).

The small side must actually be small: ``broadcast_limit`` guards the
driver materialization and the error message points at Ray's native
shuffle join for the big⋈big case.  At 100 TB the fact side never
materializes anywhere — each block is merged and released by the
streaming executor.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

import ray
import ray.data

__all__ = ["broadcast_join", "hash_join"]


def broadcast_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset | pd.DataFrame,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    suffix: str = "_r",
    broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Join ``left`` (streaming, any size) with a small ``right`` side
    broadcast once via ``ray.put``.  ``how`` is ``"inner"`` or
    ``"left"``; the join key keeps ``left``'s column name."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rkey = right_on or on

    if isinstance(right, ray.data.Dataset):
        # one execution: pull at most limit+1 rows — enough to prove the
        # side is too big without counting (or materializing) the rest.
        # permissive promotion: an all-null column in one block comes
        # back null-typed, which would otherwise fail the concat
        rtab = pa.concat_tables(
            ray.get(right.limit(broadcast_limit + 1).to_arrow_refs()),
            promote_options="permissive",
        )
    else:
        rtab = pa.Table.from_pandas(right, preserve_index=False)
    if len(rtab) > broadcast_limit:
        raise ValueError(
            f"right side exceeds broadcast_limit={broadcast_limit} rows; "
            "use Dataset.join (hash-shuffle) for big-big joins"
        )
    # SQL join-key semantics: Acero never matches null keys (null == null
    # included) but DOES match NaN == NaN on float keys — drop both from
    # the hash table so a NaN left key finds no partner (dropped under
    # inner, null-padded under left), exactly SQL's behaviour
    keep = pc.is_valid(rtab.column(rkey))
    if pa.types.is_floating(rtab.column(rkey).type):
        keep = pc.and_(keep, pc.invert(pc.is_nan(rtab.column(rkey))))
    rtab = rtab.filter(keep)
    if rkey != on:
        # keep the LEFT key name; Acero coalesces the key columns
        rtab = rtab.rename_columns(
            [on if c == rkey else c for c in rtab.column_names]
        )
    rtab = rtab.combine_chunks()
    join_type = "inner" if how == "inner" else "left outer"
    right_ref = ray.put(rtab)

    def merge(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)
        key_type = r.column(on).type
        if not batch.column(on).type.equals(key_type):
            # Acero refuses mismatched key types (pd.merge coerced).
            # Cast the fact batch's key to the dim side's type; Arrow's
            # default safe cast raises on any lossy value, so a genuine
            # type conflict fails loudly instead of mis-joining.
            idx = batch.column_names.index(on)
            batch = batch.set_column(
                idx, on, batch.column(on).cast(key_type)
            )
        # use_threads=False: Ray already runs one task per core; letting
        # Acero spawn its own thread pool per batch just adds contention
        return batch.join(
            r,
            keys=on,
            join_type=join_type,
            right_suffix=suffix,
            use_threads=False,
        )

    return left.map_batches(merge, batch_format="pyarrow")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    suffix: str = "_r",
    enforce_partitions: bool = False,
) -> ray.data.Dataset:
    """Big ⋈ big distributed equi-join — the shuffle plan.

    The counterpart to :func:`broadcast_join` for the case its guard
    exists for: BOTH sides too large to materialize anywhere.  Delegates
    to Ray Data's native hash-shuffle join (both sides repartition by
    key hash; each of ``num_partitions`` aggregators joins one key
    range), normalized to this repo's join conventions:

    - ``how`` is ``"inner"`` / ``"left"`` (SQL names, as in
      :func:`broadcast_join`), mapped to Ray's ``inner`` /
      ``left_outer``;
    - NULL keys never match (verified Ray behaviour; pinned by the
      regression test, since pandas-level joins get this wrong);
    - duplicate keys multiply rows — a true join, not a lookup;
    - overlapping non-key right columns get ``suffix``.

    Size ``num_partitions`` so one key range's worth of BOTH sides fits
    an aggregator's heap (rows_total / num_partitions ≲ a few hundred
    MB) — but no SMALLER: each partition costs a dedicated aggregator
    actor, and that fixed overhead dominates below ~250k rows/partition
    (measured on a 4M⋈4M join at 32 CPUs: 16 partitions 8.4 s,
    128 partitions 29.5 s).  Skewed hot keys belong in
    :func:`broadcast_join` (fact ⋈ hot-dim) or need salting upstream.
    """
    how_map = {"inner": "inner", "left": "left_outer"}
    if how not in how_map:
        raise ValueError(f"how must be one of {sorted(how_map)}: {how!r}")
    # Ray's join reserves 0.125 CPU per partition for its aggregator
    # actors: at num_partitions = 8x the CPU count the reservation
    # consumes the ENTIRE budget and the shuffle-send tasks starve (a
    # borderline scheduling stall, observed flaky at 32 partitions on a
    # 4-CPU session).  Cap partitions at 4x the cluster CPUs so the
    # aggregators can reserve at most half the budget.  When the
    # memory-driven sizing in the docstring genuinely needs more
    # partitions than the CPU budget allows (few cores, huge sides),
    # pass enforce_partitions=True and accept the scheduling risk —
    # the honest alternative is more cores or more heap per aggregator.
    if not enforce_partitions:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            cpus = 0
        cap = max(2, cpus * 4)
        if cpus > 0 and num_partitions > cap:
            logging.getLogger(__name__).warning(
                "hash_join: capping num_partitions %d -> %d (4x the %d-"
                "CPU budget); pass enforce_partitions=True to override",
                num_partitions, cap, cpus,
            )
            num_partitions = cap
    return left.join(
        right,
        join_type=how_map[how],
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        right_suffix=suffix,
    )
