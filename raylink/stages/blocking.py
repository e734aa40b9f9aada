"""Blocking-key derivation and hot-block salting.

The reference scores the full N_A x N_B cross product
(/root/reference/src/fastlink/fastlink.jl:20); at 10^12-turn scale candidate
generation must be blocked, and skewed blocks (e.g. boilerplate first turns)
must be salted or one group swallows a node (north star: "explicit salting of
hot blocks to defuse skew").

Design
------
1. ``derive_block_keys`` (map_batches, vectorized SipHash): block_key =
   hash(prefix of normalized first-turn text) combined with hash(tool
   signature) — or any configured column list.
2. ``plan_salts``: a distributed ``groupby(block_key).count()`` filtered to
   ``count > cap`` — only *hot* keys reach the driver (tiny by construction),
   and the resulting ``{block_key: n_salts}`` plan is broadcast via
   ``ray.put`` (read once per task, zero re-shipping per batch).
3. ``expand_pair_groups`` (map_batches): each record lands in the pair-group
   ``(block, i, j)`` cells that cover all its candidate pairs.  A record in a
   block with ``s`` salts takes salt ``k = hash(id) % s`` and is replicated
   to ``s`` cells (dedupe: the triangle cells ``(k,k)``, ``(k,j>k)``,
   ``(i<k,k)``; link: A-side to ``(k, *)``, B-side to ``(*, k)``), so every
   cross/intra sub-block combination is generated exactly once and the
   largest shuffle group shrinks from ``n`` to ``~cap`` records.

Counters (blocks, hot blocks, dropped oversized blocks) are returned
explicitly — no silent truncation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import BlockingConfig
from ..functions.hashing import combine_hashes, hash64_array
from .sortedrun import count_by_key

#: Ray Data groupby/sort paths route key values through Python ints and
#: C longs, so shuffle keys must fit int64 — all keys are masked to 63 bits.
_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def _to_i63(h) -> np.ndarray:
    return (np.asarray(h, dtype=np.uint64) & _MASK63).astype(np.int64)


__all__ = [
    "derive_block_keys",
    "transcript_block_keys",
    "plan_salts",
    "expand_pair_groups",
    "BlockingCounters",
]


@dataclass
class BlockingCounters:
    n_hot_blocks: int = 0
    n_dropped_blocks: int = 0
    dropped_rows: int = 0
    salt_plan_size: int = 0
    notes: dict = field(default_factory=dict)


def derive_block_keys(
    records: ray.data.Dataset, keys: list[str]
) -> ray.data.Dataset:
    """Add a uint64 ``block_key`` column from the configured key columns.

    A key written ``soundex(col)`` blocks on the column's Soundex code
    (phonetic blocking for name-like fields — the reference ships a Soundex
    encoder, /root/reference/src/encode/soundex.jl, though its pipeline
    never calls it)."""

    def add_key(batch: pa.Table) -> pa.Table:
        h = None
        for k in keys:
            if k.startswith("soundex(") and k.endswith(")"):
                from ..functions.soundex import soundex

                col = batch.column(k[8:-1]).to_numpy(zero_copy_only=False)
                col = np.array([soundex(x) for x in col], dtype=object)
            else:
                col = batch.column(k).to_numpy(zero_copy_only=False)
            hk = hash64_array(col)
            h = hk if h is None else combine_hashes(h, hk)
        return batch.append_column("block_key", pa.array(_to_i63(h), type=pa.int64()))

    return records.map_batches(add_key, batch_format="pyarrow")


def transcript_block_keys(
    records: ray.data.Dataset, prefix_chars: int = 24
) -> ray.data.Dataset:
    """Flagship blocking key: normalized first-turn prefix + tool signature.

    Vectorized with pyarrow compute (zero-copy slice + utf8) then SipHash.
    """

    def add_key(batch: pa.Table) -> pa.Table:
        prefix = pc.utf8_slice_codeunits(
            batch.column("first_text_norm"), 0, prefix_chars
        ).to_numpy(zero_copy_only=False)
        tools = batch.column("tool_sig").to_numpy(zero_copy_only=False)
        h = combine_hashes(hash64_array(prefix), hash64_array(tools))
        return batch.append_column("block_key", pa.array(_to_i63(h), type=pa.int64()))

    return records.map_batches(add_key, batch_format="pyarrow")


def analyze_blocks(
    records: ray.data.Dataset, blocking: BlockingConfig
) -> tuple[dict[int, int], BlockingCounters, ray.data.Dataset]:
    """One distributed block-count pass serving both the salt plan and the
    singleton filter.  Returns (plan, counters, counts_ds)."""
    counts = count_by_key(records, "block_key").materialize()
    plan, counters = _plan_from_counts(counts, blocking)
    return plan, counters, counts


def plan_salts(
    records: ray.data.Dataset, blocking: BlockingConfig
) -> tuple[dict[int, int], BlockingCounters]:
    """Compute the hot-block salt plan {block_key: n_salts} (driver-small)."""
    counts = count_by_key(records, "block_key")
    return _plan_from_counts(counts, blocking)


def _plan_from_counts(
    counts: ray.data.Dataset, blocking: BlockingConfig
) -> tuple[dict[int, int], BlockingCounters]:
    cap = blocking.cap
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), cap)),
        batch_format="pyarrow",
    ).to_pandas()
    counters = BlockingCounters()
    plan: dict[int, int] = {}
    dropped: set[int] = set()
    if len(hot) == 0:
        counters.notes["dropped_block_keys"] = []
        return plan, counters
    for bk, n in zip(hot["block_key"].to_numpy(), hot["count()"].to_numpy()):
        s = math.ceil(int(n) / blocking.cap)
        if s > blocking.max_salts:
            if blocking.drop_oversized:
                dropped.add(int(bk))
                counters.n_dropped_blocks += 1
                counters.dropped_rows += int(n)
                continue
            s = blocking.max_salts
        plan[int(bk)] = s
    counters.n_hot_blocks = len(plan)
    counters.salt_plan_size = len(plan)
    counters.notes["dropped_block_keys"] = sorted(dropped)
    return plan, counters


def filter_to_multi_blocks(
    records: ray.data.Dataset,
    num_partitions: int | None = None,
    counts: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Drop records whose block has a single member (they generate no pairs).

    In dedupe corpora most blocks are singletons; without this, the pair
    shuffle sorts and the per-group UDF visits millions of no-op groups.  A
    distributed count + inner hash join keeps it broadcast-free (the
    multi-member key set can be arbitrarily large at 10^12 scale).
    """
    if num_partitions is None:
        import ray as _ray

        num_partitions = max(16, int(_ray.cluster_resources().get("CPU", 8)))
    if counts is None:
        counts = count_by_key(records, "block_key")
    multi = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("count()"), 2)).select(
            ["block_key"]
        ),
        batch_format="pyarrow",
    ).materialize()
    n_multi = multi.count()
    if n_multi == 0:
        # every block is a singleton: no pairs exist.  (An empty
        # MATERIALIZED dataset loses its column schema, so the broadcast
        # path below would KeyError on 'block_key' — emit the typed
        # empty result here.)
        return records.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow"
        )
    if n_multi <= 2_000_000:
        # broadcast path: the key set fits comfortably in the object store
        keys = np.sort(multi.to_pandas()["block_key"].to_numpy(np.int64))
        keys_ref = ray.put(keys)

        def keep(batch: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            bk = batch.column("block_key").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, bk)
            pos_c = np.clip(pos, 0, max(len(ks) - 1, 0))
            hit = (ks[pos_c] == bk) if len(ks) else np.zeros(len(bk), dtype=bool)
            return batch.take(pa.array(np.flatnonzero(hit)))

        return records.map_batches(keep, batch_format="pyarrow")
    # at-scale path: distributed inner hash join (broadcast-free).  NOTE
    # Ray 2.49's join errors when a right-side hash partition is empty, so
    # the join is only used when the key set is large enough that every
    # partition is populated.
    return records.join(
        multi,
        join_type="inner",
        num_partitions=num_partitions,
        on=("block_key",),
    )


def expand_pair_groups(
    records: ray.data.Dataset,
    plan: dict[int, int],
    id_col: str,
    side: str | None = None,
    dropped: set[int] | None = None,
) -> ray.data.Dataset:
    """Replicate records into salted pair-group cells.

    Adds ``pg_key`` (uint64 group key), ``sub_i``/``sub_j`` (the cell) and
    ``salt`` (this record's sub-block).  ``side``: None for dedupe
    (self-link), "a"/"b" for two-table link.  The salt plan is shipped once
    via the object store and fetched zero-copy per task.
    """
    plan_ref = ray.put((plan, dropped or set()))

    def expand(batch: pa.Table) -> pa.Table:
        the_plan, the_dropped = ray.get(plan_ref)
        bk = batch.column("block_key").to_numpy(zero_copy_only=False)
        n = len(bk)
        if n == 0 or not (the_plan or the_dropped):
            # fast path: no hot blocks anywhere — identity mapping, zero
            # replication, fully vectorized
            zeros = np.zeros(n, dtype=np.int64)
            return _with_pg_columns(batch, np.arange(n), zeros, zeros, zeros)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # vectorized membership test; dict lookups only for the (rare) hits
        plan_keys = np.fromiter(the_plan.keys(), dtype=np.int64, count=len(the_plan))
        is_hot = np.isin(bk, plan_keys)
        if the_dropped:
            drop_keys = np.fromiter(
                the_dropped, dtype=np.int64, count=len(the_dropped)
            )
            keep = ~np.isin(bk, drop_keys)
        else:
            keep = np.ones(n, dtype=bool)
        plain = keep & ~is_hot
        plain_idx = np.flatnonzero(plain)
        rep_idx = [plain_idx]
        zeros = np.zeros(len(plain_idx), dtype=np.int64)
        cell_i = [zeros]
        cell_j = [zeros]
        my_salt = [zeros]
        hot_rows = np.flatnonzero(keep & is_hot)
        if len(hot_rows):
            hsalt = hash64_array(ids[hot_rows], seed=7)
            ri: list[int] = []
            ci: list[int] = []
            cj: list[int] = []
            ms: list[int] = []
            for pos, i in enumerate(hot_rows):
                s = the_plan[int(bk[i])]
                k = int(hsalt[pos] % np.uint64(s))
                if side is None:
                    # dedupe: the s triangle cells covering salt k
                    for j in range(k, s):
                        ri.append(i); ci.append(k); cj.append(j); ms.append(k)
                    for ii in range(0, k):
                        ri.append(i); ci.append(ii); cj.append(k); ms.append(k)
                elif side == "a":
                    for j in range(s):
                        ri.append(i); ci.append(k); cj.append(j); ms.append(k)
                else:  # side == "b"
                    for ii in range(s):
                        ri.append(i); ci.append(ii); cj.append(k); ms.append(k)
            rep_idx.append(np.array(ri, dtype=np.int64))
            cell_i.append(np.array(ci, dtype=np.int64))
            cell_j.append(np.array(cj, dtype=np.int64))
            my_salt.append(np.array(ms, dtype=np.int64))
        return _with_pg_columns(
            batch,
            np.concatenate(rep_idx),
            np.concatenate(cell_i),
            np.concatenate(cell_j),
            np.concatenate(my_salt),
        )

    return records.map_batches(expand, batch_format="pyarrow")


def _with_pg_columns(
    batch: pa.Table,
    rep_idx: np.ndarray,
    cell_i: np.ndarray,
    cell_j: np.ndarray,
    my_salt: np.ndarray,
) -> pa.Table:
    identity = len(rep_idx) == len(batch) and (
        len(rep_idx) == 0 or np.array_equal(rep_idx, np.arange(len(batch)))
    )
    taken = batch if identity else batch.take(pa.array(rep_idx))
    bk = taken.column("block_key").to_numpy(zero_copy_only=False).astype(np.uint64)
    ci = np.asarray(cell_i, dtype=np.uint64)
    cj = np.asarray(cell_j, dtype=np.uint64)
    cell = (ci << np.uint64(16)) | cj
    pg = _to_i63(combine_hashes(bk, cell + np.uint64(1)))
    taken = taken.append_column("pg_key", pa.array(pg, type=pa.int64()))
    taken = taken.append_column("sub_i", pa.array(ci.astype(np.int32), type=pa.int32()))
    taken = taken.append_column("sub_j", pa.array(cj.astype(np.int32), type=pa.int32()))
    taken = taken.append_column(
        "salt", pa.array(np.asarray(my_salt, dtype=np.int32), type=pa.int32())
    )
    return taken
