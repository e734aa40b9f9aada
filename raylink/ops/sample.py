"""Deterministic sampling operators for training-data curation.

The reference engine has no sampling story; a 100-TB pretraining
pipeline needs three shapes of it:

- ``hash_sample``: keep a fixed fraction of rows, decided per-row from a
  pure function of the row id — no shuffle, no RNG state, identical
  output on every rerun/resume and on any cluster size.
- ``mixture_sample``: per-domain sampling rates (source reweighting for
  data mixtures) — same map-only shape with a broadcast rate table.
- ``stratified_sample``: exactly ``k`` rows per group, chosen by hash
  rank — one sort shuffle (the same exchange a groupby pays), then a
  vectorized sorted-run scan; no group ever materializes more than a
  block.

All three share one hash so results compose: a row kept at fraction f1
is a member of the rows kept at f2 > f1 with the same seed.  The hash
is three rounds of the MINSTD multiplicative congruential step,
``h0 = (id % p + seed) % p;  h = h0 * 48271^3 (mod p)`` applied as
three successive ``* 48271 % p`` steps with ``p = 2^31 - 1`` — chosen
over a bytewise mixer because it is *exactly* expressible in ANSI SQL
integer arithmetic (the DuckDB oracles in ``__ray_entry__`` compute the
identical nested expression), never overflows int64 (every intermediate
product is < 2^47), and is a bijection on [0, p).  One round is NOT
enough: for ids below ~44k the single product never wraps past p, so
the map is order-preserving rather than mixing; measured kept-fraction
error with three rounds is < 0.1% on sequential ids from 5k to 1M.
"""

from __future__ import annotations

import numpy as np

import ray
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = [
    "minstd_hash",
    "hash_sample",
    "weighted_sample",
    "select_to_token_budget",
    "mixture_sample",
    "stratified_sample",
    "temperature_sample",
    "assign_splits",
    "global_sample_k",
    "MINSTD_MOD",
]

MINSTD_MOD = 2_147_483_647  # 2^31 - 1 (prime)
_MINSTD_MUL = 48_271


def minstd_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Three MINSTD rounds over ``(id % p + seed) % p`` in int64 —
    matches the SQL expression
    ``((((id % 2147483647 + seed) % 2147483647)
       * 48271 % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647``
    bit-for-bit for non-negative ids."""
    ids = np.asarray(ids).astype(np.int64)
    h = (ids % MINSTD_MOD + int(seed)) % MINSTD_MOD
    for _ in range(3):
        h = (h * _MINSTD_MUL) % MINSTD_MOD
    return h


def hash_sample(
    ds: ray.data.Dataset,
    id_col: str,
    fraction: float,
    seed: int = 0,
) -> ray.data.Dataset:
    """Keep rows where ``minstd_hash(id) < fraction * p``.

    Map-only: zero shuffle, zero coordination, resumable by
    construction — the scale-ideal shape.  ``id_col`` must be a
    non-negative integer id; rows whose id collides mod p sample
    together (irrelevant below 2^31 rows per id-space).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * MINSTD_MOD)

    def filt(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        keep = minstd_hash(batch[id_col], seed) < threshold
        return {k: np.asarray(v)[keep] for k, v in batch.items()}

    return ds.map_batches(filt, batch_format="numpy")


def weighted_sample(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    scale: float = 1.0,
    seed: int = 0,
) -> ray.data.Dataset:
    """Per-row importance sampling: keep each row with probability
    ``clamp(weight * scale, 0, 1)`` — the quality-weighted subsampling
    primitive (keep good documents more often), decided by the shared
    deterministic hash so the draw is map-only, resume-identical, and
    exactly SQL-expressible:
    ``minstd_hash(id) < floor(least(greatest(w * scale, 0), 1) * p)``.

    NULL weights never keep (SQL comparison-with-NULL semantics).
    """

    def filt(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        w = np.asarray(batch[weight_col], dtype=np.float64)
        p_keep = np.clip(w * scale, 0.0, 1.0)
        thr = np.floor(p_keep * MINSTD_MOD)
        with np.errstate(invalid="ignore"):
            keep = minstd_hash(batch[id_col], seed) < thr
        keep &= ~np.isnan(w)
        return {k: np.asarray(v)[keep] for k, v in batch.items()}

    return ds.map_batches(filt, batch_format="numpy")


def select_to_token_budget(
    ds: ray.data.Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    seed: int = 0,
    num_partitions: int = 64,
    bucket_width: int = 1 << 20,
) -> ray.data.Dataset:
    """Budget-constrained corpus selection: keep documents in the
    deterministic hash order while the running token total stays within
    ``budget`` — "give me ~10B tokens of this corpus" as one call.

    ``bucket_width`` partitions the 2^31 hash space for the prefix sum:
    the default (2^20 -> 2048 buckets) keeps per-bucket groups large
    enough that the scan's per-group overhead stays negligible while
    the driver's bucket array stays tiny.

    Ids must lie in [0, 2^31-1) (enforced with a loud error): there the
    hash is a bijection, so hash order is a fixed pseudorandom
    permutation (an unbiased prefix = a uniform sample) and is
    collision-free — a valid unique order for the distributed prefix
    sum.  Wider id spaces must be re-keyed first (ids congruent mod p
    would tie and make the kept set layout-dependent).  A row is kept iff its inclusive running sum
    ``<= budget`` (SQL: ``SUM(n) OVER (ORDER BY hash, id ROWS
    UNBOUNDED PRECEDING) <= budget``), so the result is identical at
    any parallelism and composes with the other samplers via the shared
    seed.  One range exchange (the prefix sum's); everything else is
    map-only.
    """
    from .offsets import global_prefix_sum

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")

    def add_hash(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(batch[id_col]).astype(np.int64)
        # the hash is only a bijection (collision-free, so a valid unique
        # prefix-sum order) for ids within [0, p); ids congruent mod p
        # would tie and make the kept prefix layout-dependent — refuse
        if len(ids) and (ids.min() < 0 or ids.max() >= MINSTD_MOD):
            raise ValueError(
                f"{id_col} must lie in [0, 2^31-1) for a collision-free "
                "hash order; re-key ids first"
            )
        out = dict(batch)
        out["_tbs_hash"] = minstd_hash(ids, seed)
        return out

    cols = list(ds.schema().names)
    hashed = ds.map_batches(add_hash, batch_format="numpy")
    with_off = global_prefix_sum(
        hashed, "_tbs_hash", tokens_col, out_col="_tbs_off",
        bucket_width=bucket_width, num_partitions=num_partitions,
    )

    def filt(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        off = np.asarray(batch["_tbs_off"], dtype=np.int64)
        n = np.asarray(batch[tokens_col], dtype=np.int64)
        keep = off + n <= budget
        return {c: np.asarray(batch[c])[keep] for c in cols}

    return with_off.map_batches(filt, batch_format="numpy")


def mixture_sample(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> ray.data.Dataset:
    """Per-group sampling rates: keep a row of group g where
    ``minstd_hash(id) < fractions[g] * p``.

    The domain-reweighting primitive for training-data mixtures
    ("2x src0, 0.1x src3").  The rate table is captured by value in the
    task closure — tiny (one float per domain), shipped once per task,
    never per batch.  Unlisted groups get ``default_fraction``.
    """
    thresholds = {
        g: int(f * MINSTD_MOD) for g, f in fractions.items()
    }
    default_thr = int(default_fraction * MINSTD_MOD)

    def filt(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        groups = np.asarray(batch[group_col])
        uniq, inv = np.unique(groups, return_inverse=True)
        thr_by_uniq = np.asarray(
            [thresholds.get(g, default_thr) for g in uniq], dtype=np.int64
        )
        keep = minstd_hash(batch[id_col], seed) < thr_by_uniq[inv]
        return {k: np.asarray(v)[keep] for k, v in batch.items()}

    return ds.map_batches(filt, batch_format="numpy")


def stratified_sample(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Exactly ``min(k, |group|)`` rows per group, the ones with the
    smallest ``(minstd_hash(id), id)`` — a deterministic uniform draw
    (the hash is a bijection, so hash-rank order is a fixed pseudorandom
    permutation of each group).

    Combiner-first (the ``grouped_top_k`` shape): every block first
    reduces to AT MOST ``k`` rows per group present in it with one
    lexsort + run-slice pass, and only those partials pay the
    ``sort(group_col)`` shuffle, where an identical per-group pass
    finishes the merge.  Input rows never shuffle; exchanged volume is
    bounded by ``k x groups_per_block x blocks``.  Equivalent SQL:
    ``row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = list(ds.schema().names)

    def prune(batch: dict[str, np.ndarray]) -> dict:
        keys = np.asarray(batch[group_col])
        ids = np.asarray(batch[id_col]).astype(np.int64)
        h = minstd_hash(ids, seed)
        order = np.lexsort((ids, h, keys))
        sk = keys[order]
        n = len(sk)
        if n == 0:
            return {c: np.asarray(batch[c])[:0] for c in cols}
        change = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        starts = np.concatenate(([0], change))
        rank = np.arange(n) - np.repeat(
            starts, np.diff(np.concatenate((starts, [n])))
        )
        keep = order[rank < k]
        return {c: np.asarray(batch[c])[keep] for c in cols}

    partials = ds.map_batches(prune, batch_format="numpy", batch_size=None)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(batch[id_col]).astype(np.int64)
        h = minstd_hash(ids, seed)
        order = np.lexsort((ids, h))[:k]
        return {c: np.asarray(batch[c])[order] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        partials, group_col, group_fn, empty_fn, num_partitions
    )


def assign_splits(
    ds: ray.data.Dataset,
    id_col: str,
    splits: dict[str, float],
    out_col: str = "split",
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: partition the hash range
    by cumulative ``splits`` fractions (must sum to 1.0) and label each
    row by where ``minstd_hash(id)`` falls.

    Map-only and stable under resharding/resume — a row's split never
    depends on which block or node saw it.  Split ORDER matters (it fixes
    the range boundaries): pass an ordered dict, e.g.
    ``{"train": 0.9, "val": 0.05, "test": 0.05}``.
    """
    names = list(splits)
    fracs = np.asarray([splits[n] for n in names], dtype=np.float64)
    if abs(fracs.sum() - 1.0) > 1e-9:
        raise ValueError(f"splits must sum to 1.0, got {fracs.sum()}")
    bounds = np.floor(np.cumsum(fracs) * MINSTD_MOD).astype(np.int64)
    bounds[-1] = MINSTD_MOD  # close the range despite float rounding
    labels = np.asarray(names, dtype=object)

    def tag(batch: dict[str, np.ndarray]) -> dict:
        h = minstd_hash(batch[id_col], seed)
        idx = np.searchsorted(bounds, h, side="right")
        out = dict(batch)
        out[out_col] = labels[idx]
        return out

    return ds.map_batches(tag, batch_format="numpy")


def global_sample_k(
    ds: ray.data.Dataset,
    id_col: str,
    k: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """Exactly ``min(k, N)`` rows drawn uniformly from the whole dataset:
    the ones with the smallest ``(minstd_hash(id), id)`` — the
    deterministic equivalent of reservoir sampling (the hash is a fixed
    pseudorandom permutation, so the k smallest hash ranks are a uniform
    draw), with none of reservoir sampling's sequential state.

    Combiner-first: every block prunes itself to its own k smallest
    rows (one lexsort), so at most ``blocks x k`` rows reach the final
    single-partition merge.  Equivalent SQL:
    ``ORDER BY hash, id LIMIT k``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cols = list(ds.schema().names)

    def prune(batch: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(batch[id_col]).astype(np.int64)
        order = np.lexsort((ids, minstd_hash(ids, seed)))[:k]
        return {c: np.asarray(batch[c])[order] for c in cols}

    partials = ds.map_batches(prune, batch_format="numpy", batch_size=None)
    # final merge: one task over <= blocks x k pruned rows
    merged = partials.repartition(1).map_batches(
        prune, batch_format="numpy", batch_size=None
    )
    return merged


def temperature_sample(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    total_target: int,
    alpha: float = 0.5,
    seed: int = 0,
    max_groups: int = 1_000_000,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Temperature-based mixture sampling (the multilingual-training
    classic): draw ~``total_target`` rows whose group shares follow
    ``p_g^alpha`` renormalized — ``alpha=1`` preserves the corpus mix,
    ``alpha=0`` equalizes groups, values between flatten head domains
    and upweight tails.  Per group the quota is

        k_g = min(floor(total_target * w_g + 0.5), n_g),
        w_g = (n_g/N)^alpha / sum_h (n_h/N)^alpha

    and the rows kept are the ``k_g`` smallest by ``(minstd_hash(id),
    id)`` — a deterministic uniform draw with an exact SQL twin
    (``row_number() OVER (PARTITION BY g ORDER BY hash, id) <= k_g``
    with the quota CTE-computed from the same float64 expressions).

    Scale shape: one combiner-first group count (partials only), quotas
    on the driver (one float per group, ``max_groups``-guarded — mixture
    domains are vocabularies, not ids), then the ``stratified_sample``
    combiner plan with a per-group quota LUT: every block prunes to at
    most ``k_g`` rows per group before the single ``sort(group)``
    exchange.  Null group keys are excluded.
    """
    if total_target < 1:
        raise ValueError("total_target must be >= 1")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    from ..stages.sortedrun import count_by_key, sorted_group_scan

    cols = list(ds.schema().names)

    def drop_null_groups(batch: dict[str, np.ndarray]) -> dict:
        g = np.asarray(batch[group_col])
        return {group_col: g[~_isna(g)]}

    counts = count_by_key(
        ds.select_columns([group_col]).map_batches(
            drop_null_groups, batch_format="numpy"
        ),
        group_col,
        num_partitions=num_partitions,
    ).to_pandas()
    if len(counts) > max_groups:
        raise ValueError(
            f"{len(counts)} groups exceed max_groups={max_groups}; "
            "temperature sampling over near-unique keys is not a "
            "meaningful mixture — bucket the key or raise the cap"
        )
    if len(counts) == 0:
        def empty_all(batch: dict[str, np.ndarray]) -> dict:
            return {c: np.asarray(batch[c])[:0] for c in cols}

        return ds.map_batches(empty_all, batch_format="numpy")

    # quota arithmetic mirrors the SQL twin's expression SHAPE exactly
    # (floor(target * pw / sum(pw) + 0.5), group-key-ordered sequential
    # sum): `target * (pw / sum)` vs `(target * pw) / sum` can differ by
    # 1 ulp and flip the half-up floor on adversarial counts
    counts = counts.sort_values(group_col, ignore_index=True)
    n_g = counts["count()"].to_numpy(dtype=np.float64)
    total = float(n_g.sum())
    pw = np.power(n_g / total, float(alpha))
    pw_sum = 0.0
    for v in pw.tolist():
        pw_sum += v
    k_g = np.minimum(
        np.floor(float(total_target) * pw / pw_sum + 0.5), n_g
    ).astype(np.int64)
    quota_ref = ray.put(
        dict(zip(counts[group_col], (int(k) for k in k_g)))
    )

    def prune(batch: dict[str, np.ndarray]) -> dict:
        quota = ray.get(quota_ref)
        keys = np.asarray(batch[group_col])
        ok = ~_isna(keys)
        idx0 = np.flatnonzero(ok)
        keys = keys[idx0]
        ids = np.asarray(batch[id_col])[idx0].astype(np.int64)
        h = minstd_hash(ids, seed)
        order = np.lexsort((ids, h, keys))
        sk = keys[order]
        n = len(sk)
        if n == 0:
            return {c: np.asarray(batch[c])[:0] for c in cols}
        change = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        starts = np.concatenate(([0], change))
        rank = np.arange(n) - np.repeat(
            starts, np.diff(np.concatenate((starts, [n])))
        )
        kq = np.asarray([quota.get(g, 0) for g in sk[starts]],
                        dtype=np.int64)
        kq_full = np.repeat(
            kq, np.diff(np.concatenate((starts, [n])))
        )
        keep = idx0[order[rank < kq_full]]
        return {c: np.asarray(batch[c])[keep] for c in cols}

    partials = ds.map_batches(prune, batch_format="numpy", batch_size=None)

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        quota = ray.get(quota_ref)
        ids = np.asarray(batch[id_col]).astype(np.int64)
        h = minstd_hash(ids, seed)
        g = np.asarray(batch[group_col])[0]
        order = np.lexsort((ids, h))[: quota.get(g, 0)]
        return {c: np.asarray(batch[c])[order] for c in cols}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in cols}

    return sorted_group_scan(
        partials, group_col, group_fn, empty_fn, num_partitions
    )


def _isna(arr: np.ndarray) -> np.ndarray:
    import pandas as pd

    return np.asarray(pd.isna(arr))
