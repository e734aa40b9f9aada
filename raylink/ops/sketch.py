"""HyperLogLog approximate distinct counting — the canonical mergeable
sketch (Flajolet et al. 2007).

Why a sketch at 100 TB: exact per-key distinct needs every distinct value
to cross the wire; an HLL register array is a FIXED 2^p bytes per key no
matter the cardinality, and merging is elementwise max — associative,
commutative, idempotent — so per-block partial sketches combine in any
order with no re-scan.  Standard error is ~1.04/sqrt(2^p).

Shapes:
- :func:`approx_distinct` — one global estimate: per-block register
  partials (one 2^p-byte row per block), elementwise-max reduce on the
  driver.
- :func:`grouped_approx_distinct` — per-key estimates: per-block
  (key, registers) partial rows, merged through a sorted-run scan —
  only sketch rows shuffle, never values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..functions.hashing import hash64_array
from ..stages.sortedrun import sorted_group_scan

__all__ = [
    "approx_distinct",
    "grouped_approx_distinct",
    "frequent_items",
    "approx_quantiles",
    "count_min_sketch",
    "count_min_estimate",
]


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (uint8, length 2^p) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash64_array(values).astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining bits + 1, via float64 exponent
    lz = np.zeros(len(rest), dtype=np.int64)
    x = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the standard small/large-range
    corrections."""
    m = float(len(regs))
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    est = alpha * m * m / inv.sum()
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    elif est > (1 << 32) / 30.0:
        est = -float(1 << 32) * np.log1p(-est / float(1 << 32))
    return float(est)


def approx_distinct(
    ds: ray.data.Dataset, col: str, precision: int = 14
) -> float:
    """Approximate global ``count(DISTINCT col)``; ~0.8% std error at the
    default precision (2^14 registers = 16 KiB per partial)."""

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        v = np.asarray(batch[col])
        v = v[~pd.isna(v)]
        return {"regs": [_registers(v, precision).tobytes()]}

    parts = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="numpy", batch_size=None)
        .to_pandas()
    )
    merged = np.zeros(1 << precision, dtype=np.uint8)
    for blob in parts["regs"]:
        np.maximum(merged, np.frombuffer(blob, dtype=np.uint8), out=merged)
    return _estimate(merged)


def grouped_approx_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    col: str,
    precision: int = 12,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-``key_col`` approximate distinct of ``col``.  Output:
    ``(key, approx_distinct: int64)``; ~1.6% std error at the default
    precision (4 KiB sketch per key per block)."""

    def partial(batch: dict[str, np.ndarray]) -> dict:
        keys = np.asarray(batch[key_col])
        vals = np.asarray(batch[col])
        ok = ~pd.isna(vals)
        keys, vals = keys[ok], vals[ok]
        if len(keys) == 0:
            return {key_col: keys, "regs": []}
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [len(keys)]))
        return {
            key_col: keys[starts],
            "regs": [
                _registers(vals[s:e], precision).tobytes()
                for s, e in zip(starts, ends)
            ],
        }

    parts = ds.select_columns([key_col, col]).map_batches(
        partial, batch_format="numpy", batch_size=None
    )

    def merge(group: dict[str, np.ndarray]) -> dict:
        merged = np.zeros(1 << precision, dtype=np.uint8)
        for blob in group["regs"]:
            np.maximum(
                merged, np.frombuffer(blob, dtype=np.uint8), out=merged
            )
        return {
            key_col: np.asarray(group[key_col])[:1],
            "approx_distinct": np.asarray(
                [int(round(_estimate(merged)))], dtype=np.int64
            ),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            key_col: np.asarray(batch[key_col])[:0],
            "approx_distinct": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(parts, key_col, merge, empty, num_partitions)


def _mg_reduce(items: np.ndarray, counts: np.ndarray, capacity: int):
    """Misra-Gries reduction: shrink an (item, count) summary to at most
    ``capacity`` entries by subtracting the (capacity+1)-th largest count
    from every entry and dropping the non-positive ones (Agarwal et al.
    2013's mergeable-summaries formulation).  Returns the reduced pair
    plus the amount subtracted per surviving entry (the per-entry
    undercount this step introduced)."""
    if len(items) <= capacity:
        return items, counts, 0
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    keep = counts > kth
    return items[keep], counts[keep] - kth, int(kth)


def frequent_items(
    ds: ray.data.Dataset,
    col: str,
    k: int,
    capacity: int = 8192,
    explode_tokens: bool = False,
) -> pd.DataFrame:
    """Exact global top-``k`` most frequent values of ``col`` WITHOUT a
    distinct-value shuffle: the two-pass heavy-hitters plan.

    Pass 1 — per-block Misra-Gries summaries of ``capacity`` entries
    (per-block ``np.unique`` then MG reduction), merged on the driver
    (block summaries are tiny: ≤ capacity rows each).  The merged
    summary provably contains every item with true count > N/(capacity+1).
    Pass 2 — the merged candidate set (≤ capacity items) is broadcast and
    recounted EXACTLY in one map-only scan; partial counts per block sum
    on the driver.

    The result is certified: if the k-th exact candidate count does not
    exceed the MG undercount ceiling (so an unseen item could in theory
    beat it), a ValueError tells the caller to raise ``capacity`` —
    never a silently-wrong answer.  ``explode_tokens=True`` treats
    ``col`` as whitespace-tokenizable text and counts tokens.

    At 100 TB: pass 1 moves capacity x n_blocks summary rows to the
    driver (a few MB), pass 2 is map-only against a broadcast array —
    the full (value -> count) table never exists anywhere, unlike a
    groupby wordcount whose shuffle carries every distinct value.
    """
    import ray as _ray

    def to_values(batch: dict[str, np.ndarray]) -> np.ndarray:
        v = pd.Series(np.asarray(batch[col]), dtype="object")
        if explode_tokens:
            toks = v.fillna("").str.split().explode()
            return toks[toks.notna()].to_numpy()
        # SQL value-count semantics: NULL is not a value — dropping it
        # here keeps it out of both the MG pass and the exact recount
        return v[v.notna()].to_numpy()

    def summarize(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        vals = to_values(batch)
        uniq, cnt = np.unique(vals, return_counts=True)
        items, counts, _ = _mg_reduce(uniq, cnt.astype(np.int64), capacity)
        return {"item": items.astype(object), "cnt": counts}

    # driver merge of block summaries (each <= capacity rows)
    parts = (
        ds.select_columns([col])
        .map_batches(summarize, batch_format="numpy")
        .to_pandas()
    )
    if parts.empty:
        # every block's summary collapsed: no value is frequent enough to
        # survive MG at this capacity — refuse rather than guess
        raise ValueError(
            f"0 candidates for top-{k}: no value exceeds the per-block MG "
            f"floor; raise capacity (= {capacity})"
        )
    merged = parts.groupby("item", sort=False)["cnt"].sum()
    items = merged.index.to_numpy(dtype=object)
    counts = merged.to_numpy(dtype=np.int64)
    items, counts, _ = _mg_reduce(items, counts, capacity)

    # pass 2: exact recount of the candidate set (map-only, broadcast)
    cand_ref = _ray.put(pd.Index(items))

    def recount(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        vals = to_values(batch)
        n = np.int64(len(vals))
        cand = _ray.get(cand_ref)
        mask = pd.Series(vals).isin(cand).to_numpy()
        uniq, cnt = np.unique(vals[mask], return_counts=True)
        return {
            "item": np.concatenate((uniq.astype(object), [None])),
            "cnt": np.concatenate((cnt.astype(np.int64), [0])),
            "block_n": np.concatenate(
                (np.zeros(len(uniq), dtype=np.int64), [n])
            ),
        }

    ex = (
        ds.select_columns([col])
        .map_batches(recount, batch_format="numpy")
        .to_pandas()
    )
    n_total = int(ex["block_n"].sum())
    exact = (
        ex[ex["item"].notna()].groupby("item")["cnt"].sum().sort_values(
            ascending=False
        )
    )
    if len(exact) < k:
        raise ValueError(
            f"only {len(exact)} candidates for top-{k}; raise capacity"
        )
    # certification: any non-candidate's true count <= floor(N/(cap+1))
    ceiling = n_total // (capacity + 1)
    out = exact.reset_index()
    out.columns = ["item", "cnt"]
    out = out.sort_values(
        ["cnt", "item"], ascending=[False, True]
    ).reset_index(drop=True)
    kth = int(out.loc[k - 1, "cnt"])
    if kth <= ceiling:
        raise ValueError(
            f"top-{k} not certified exact: k-th count {kth} <= MG ceiling "
            f"{ceiling}; raise capacity (= {capacity})"
        )
    return out.head(k)


def approx_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    qs: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    k: int = 4096,
) -> pd.DataFrame:
    """Approximate quantiles from a mergeable k-row uniform sample.

    The quantile member of the sketch family (HLL distinct, Misra-Gries
    heavy hitters): each block keeps its bottom-``k`` rows by SipHash of
    the id — a DETERMINISTIC uniform row sample, identical at any
    parallelism — and the driver merges the per-block bottom-k sets
    (``k`` rows each, never raw data) into the global bottom-k before
    reading the quantiles off the sampled values.  Standard error is
    ~``1/(2*sqrt(k))`` quantile units (~0.8 percentile points at the
    default k), graded against the exact quantiles in ``bench.py``.

    Exact grouped quantiles (one sort) live in ``ops/quantiles.py``;
    this is the single-pass path for when the sort exchange is the
    bottleneck.  Null values are excluded (SQL aggregate semantics);
    rows with null ids are refused — the sample would not be stable.
    """
    from ..functions.hashing import hash64_array

    if not 1 <= k:
        raise ValueError("k must be positive")

    def bottom_k(h: np.ndarray, v: np.ndarray):
        """Tie-aware bottom-k by (hash, value): duplicate ids produce
        equal hashes, and a plain argpartition cut would then depend on
        row order — breaking the any-parallelism determinism contract.
        Ordering ties by value makes the selection a pure function of
        the (hash, value) multiset."""
        if len(h) <= k:
            return h, v
        t = np.partition(h, k - 1)[k - 1]
        cand = h <= t
        hc, vc = h[cand], v[cand]
        order = np.lexsort((vc, hc))[:k]
        return hc[order], vc[order]

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        ids = np.asarray(batch[id_col])
        vals = np.asarray(batch[value_col], dtype=np.float64)
        if pd.isna(ids).any():
            raise ValueError(
                f"null ids in {id_col!r}: the deterministic sample "
                "requires a total id population"
            )
        keep = ~np.isnan(vals)
        ids, vals = ids[keep], vals[keep]
        h, vals = bottom_k(hash64_array(ids), vals)
        return {"h": h.astype(np.uint64), "v": vals}

    parts = (
        ds.select_columns([id_col, value_col])
        .map_batches(partial, batch_format="numpy", batch_size=None)
        .to_pandas()
    )
    h = parts["h"].to_numpy(dtype=np.uint64)
    v = parts["v"].to_numpy(dtype=np.float64)
    _, v = bottom_k(h, v)
    if len(v) == 0:
        return pd.DataFrame({"q_e4": [], "value": []}).astype(
            {"q_e4": "int64", "value": "float64"}
        )
    v.sort()
    out_q = [int(round(q * 1e4)) for q in qs]
    # nearest-rank on the sample (deterministic, matches np 'lower')
    est = [float(np.quantile(v, q, method="lower")) for q in qs]
    return pd.DataFrame({"q_e4": out_q, "value": est})


def count_min_sketch(
    ds: ray.data.Dataset,
    col: str,
    width: int = 2048,
    depth: int = 4,
    reduce_fanin: int = 32,
) -> np.ndarray:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) of the
    value frequencies in ``col``: a ``(depth, width)`` int64 array whose
    point query (:func:`count_min_estimate`) NEVER underestimates and
    overestimates by at most ``2N/width`` with probability
    ``1 - 2^-depth`` — the fixed-size frequency companion to HLL's
    fixed-size cardinality.

    Why at 100 TB: exact per-value counts need every distinct value to
    cross the wire; a CMS is ``depth x width x 8`` bytes per partial no
    matter the vocabulary, and merging is elementwise SUM — associative
    and commutative, so per-block partials combine in any order.  The
    reduce is two-level (per-block partials -> ``reduce_fanin``
    intermediate sums -> driver), keeping driver traffic at
    ``reduce_fanin`` sketches even at millions of blocks.

    Row hashes are Kirsch-Mitzenmeyer double hashing ``h1 + i*h2`` over
    two independently-keyed SipHash families (not a seed-mix of one
    base hash), so a base-hash collision does not collide in every row.
    Nulls are excluded (SQL aggregate convention).
    """
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    d_idx = np.arange(depth, dtype=np.uint64)[:, None]

    def partial(batch: dict[str, np.ndarray]) -> dict:
        v = np.asarray(batch[col])
        v = v[~pd.isna(v)]
        counts = np.zeros((depth, width), dtype=np.int64)
        if len(v):
            h1 = hash64_array(v)
            h2 = hash64_array(v, hash_key="raylink-cminsck!")
            with np.errstate(over="ignore"):  # intended modular wrap
                idx = (h1[None, :] + d_idx * h2[None, :]) % np.uint64(width)
            flat = (d_idx * np.uint64(width) + idx).ravel().astype(np.int64)
            counts += np.bincount(
                flat, minlength=depth * width
            ).reshape(depth, width)
        return {"cms": [counts.tobytes()]}

    def combine(batch: dict[str, np.ndarray]) -> dict:
        total = np.zeros(depth * width, dtype=np.int64)
        for blob in batch["cms"]:
            total += np.frombuffer(blob, dtype=np.int64)
        return {"cms": [total.tobytes()]}

    parts = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="numpy", batch_size=None)
        .repartition(reduce_fanin)
        .map_batches(combine, batch_format="numpy", batch_size=None)
        .to_pandas()
    )
    merged = np.zeros(depth * width, dtype=np.int64)
    for blob in parts["cms"]:
        merged += np.frombuffer(blob, dtype=np.int64)
    return merged.reshape(depth, width)


def count_min_estimate(sketch: np.ndarray, values) -> np.ndarray:
    """Point-query a :func:`count_min_sketch`: estimated frequency of
    each value (int64, min across the depth rows — never below the true
    count)."""
    depth, width = sketch.shape
    v = np.asarray(values, dtype=object)
    h1 = hash64_array(v)
    h2 = hash64_array(v, hash_key="raylink-cminsck!")
    d_idx = np.arange(depth, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        idx = (h1[None, :] + d_idx * h2[None, :]) % np.uint64(width)
    est = sketch[np.arange(depth)[:, None], idx.astype(np.int64)]
    return est.min(axis=0).astype(np.int64)
