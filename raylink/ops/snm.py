"""Global rank + sorted-neighborhood blocking (SNM).

Sorted-neighborhood is the classic alternative to standard (equality)
blocking in record linkage (Hernandez & Stolfo 1995): sort all records
by a key, slide a window of ``w`` positions, and emit every pair that
co-occurs in a window — a LINEAR number of candidate pairs
(``N·(w-1)``) regardless of key-value skew, where equality blocking
degenerates quadratically on hot keys.  The reference
(jw2249a/FastLink.jl) compares the full cross product
(`getComparisons`, fetch_patterns.jl) and leaves candidate pruning to
the caller; this module supplies the standard pruning strategy its
users pair it with.

Two primitives:

- :func:`global_rank` — exact dense global row numbers under ``ORDER BY
  key, id`` via sample-based range partitioning: a deterministic
  hash-pruned key sample picks partition boundaries, per-partition
  counts prefix-scan on the driver (one int per partition), and each
  partition ranks locally (lexsort + base offset).  One range-partition
  exchange; only partition-count partials and the bounded sample ever
  reach the driver.
- :func:`sorted_neighborhood_pairs` — candidate pairs within ``window``
  rank positions, emitted slab-wise: rows land in ``rn // slab_rows``
  slabs, each slab's trailing ``window-1`` rows are duplicated into the
  next slab (the only cross-slab pairs possible), and every slab emits
  its pairs with ``window-1`` vectorized shifted-slice compares — no
  per-pair Python, no quadratic blowup.

Scale notes: ranks are a property of the total order, so results are
bit-identical at any parallelism even though partition boundaries move
with the sample; a heavily duplicated sort key collapses into one range
partition (same reality as any range-partitioned ORDER BY — size
``num_partitions`` so N/P fits a task, and prefer higher-cardinality
keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import hash64_array
from ..stages.sortedrun import sorted_group_scan

__all__ = ["global_rank", "global_percent_rank", "sorted_neighborhood_pairs"]

_PART = "__gr_part"
_SLAB = "__snm_slab"


def global_rank(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    out_col: str = "rn",
    num_partitions: int = 64,
    sample_per_partition: int = 200,
) -> ray.data.Dataset:
    """Append exact dense 0-based global row numbers (int64) under
    ``ORDER BY key_col, id_col`` (binary/codepoint string order — the
    same total order DuckDB's default collation sorts by).  ``id_col``
    must be unique (it is the tiebreaker that makes the order total);
    null keys are refused — exclude them first, as a SQL oracle must
    anyway decide their placement explicitly.
    """
    cols = list(ds.schema().names)
    for c in (key_col, id_col):
        if c not in cols:
            raise ValueError(f"column {c!r} not in dataset ({cols})")

    proj = ds.materialize()
    n_total = proj.count()
    if n_total == 0:
        def tag_empty(batch: dict[str, np.ndarray]) -> dict:
            out = dict(batch)
            out[out_col] = np.zeros(0, dtype=np.int64)
            return out

        return proj.map_batches(tag_empty, batch_format="numpy")

    # deterministic bounded boundary sample: keep keys whose 64-bit hash
    # falls below the rate cutoff (parallelism-independent, unlike
    # ds.random_sample)
    target = max(num_partitions * sample_per_partition, 1)
    rate = min(1.0, (4.0 * target) / n_total)
    # via float64: np.uint64(py_int > 2^63) trips numpy's C-long path
    cutoff = (
        np.uint64(np.nextafter(np.float64(2**64), 0))
        if rate >= 1.0
        else np.float64(rate * float(2**64)).astype(np.uint64)
    )

    def sample_keys(batch: dict[str, np.ndarray]) -> dict:
        k = np.asarray(batch[key_col])
        if _null_mask(k).any():
            raise ValueError(
                f"null values in rank key {key_col!r}; filter them first"
            )
        h = hash64_array(k.astype(str)).astype(np.uint64)
        return {key_col: k[h <= cutoff]}

    sample = (
        proj.select_columns([key_col])
        .map_batches(sample_keys, batch_format="numpy")
        .to_pandas()[key_col]
        .to_numpy()
    )
    sample.sort(kind="stable")
    if num_partitions <= 1:
        bounds = sample[:0]
    elif len(sample) > num_partitions - 1:
        pick = np.linspace(
            0, len(sample) - 1, num_partitions - 1
        ).round().astype(np.int64)
        bounds = np.unique(sample[pick])
    else:
        bounds = np.unique(sample)
    bounds_ref = ray.put(bounds)

    def with_part(batch: dict[str, np.ndarray]) -> dict:
        b = ray.get(bounds_ref)
        k = np.asarray(batch[key_col])
        out = dict(batch)
        out[_PART] = np.searchsorted(b, k, side="right").astype(np.int64)
        return out

    parted = proj.map_batches(with_part, batch_format="numpy").materialize()

    def part_counts(batch: dict[str, np.ndarray]) -> dict:
        uniq, counts = np.unique(
            np.asarray(batch[_PART]), return_counts=True
        )
        return {_PART: uniq, "c": counts.astype(np.int64)}

    parts = (
        parted.select_columns([_PART])
        .map_batches(part_counts, batch_format="numpy")
        .to_pandas()
        .groupby(_PART)["c"]
        .sum()
    )
    # exclusive prefix scan over ALL partition slots (missing = 0)
    n_parts = len(bounds) + 1
    totals = np.zeros(n_parts, dtype=np.int64)
    totals[parts.index.to_numpy()] = parts.to_numpy()
    base = np.concatenate(([0], np.cumsum(totals)[:-1]))
    base_ref = ray.put(base)

    from .lag import try_arrow_schema

    out_schema = None
    base_schema = try_arrow_schema(parted)
    if base_schema is not None:
        out_schema = pa.schema(
            [f for f in base_schema if f.name != _PART]
            + [pa.field(out_col, pa.int64())]
        )

    def rank_part(group: dict[str, np.ndarray]) -> dict:
        b = ray.get(base_ref)
        keys = np.asarray(group[key_col])
        ids = np.asarray(group[id_col])
        idx = np.lexsort((ids, keys))
        out = {
            c: np.asarray(group[c])[idx] for c in cols
        }
        p = int(np.asarray(group[_PART])[0])
        out[out_col] = b[p] + np.arange(len(idx), dtype=np.int64)
        return out

    def empty_part(batch: dict[str, np.ndarray]) -> dict:
        out = {c: np.asarray(batch[c])[:0] for c in cols}
        out[out_col] = np.empty(0, dtype=np.int64)
        return out

    return sorted_group_scan(
        parted, _PART, rank_part, empty_part,
        num_partitions=min(num_partitions, 64), out_schema=out_schema,
    )


def sorted_neighborhood_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    window: int,
    slab_rows: int = 65536,
    num_partitions: int = 64,
    carry_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Candidate pairs ``(id_a, id_b, dist)`` for every two records
    within ``window`` positions of each other under ``ORDER BY key_col,
    id_col`` (Hernandez-Stolfo sorted-neighborhood blocking).  ``dist``
    is the rank distance (1..window-1); ``id_a`` is the rank-earlier
    record.  Rows with a null key are excluded (they cannot be
    meaningfully windowed).

    ``carry_cols`` names record columns to ship through the slab scan
    and emit on both pair sides (``<col>_a`` / ``<col>_b``) — the
    zero-join way to hand candidate pairs their comparison payloads
    (joining the fields back on id would stack two hash-shuffle
    aggregator fleets on top of the scan for no benefit).

    Exactly ``max(N - d, 0)`` pairs per distance ``d`` — linear in N
    for fixed window, immune to key-frequency skew.  Slab emit: each
    slab of ``slab_rows`` consecutive ranks emits its interior pairs
    with ``window-1`` shifted-slice compares; only the trailing
    ``window-1`` rows duplicate into the next slab to close seam pairs.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    if window > slab_rows:
        raise ValueError(
            f"window ({window}) must not exceed slab_rows ({slab_rows})"
        )
    carry = [c for c in (carry_cols or []) if c != id_col]

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch[key_col]))

    rows = ds.select_columns(
        list(dict.fromkeys([key_col, id_col, *carry]))
    ).map_batches(drop_null_keys, batch_format="pyarrow")
    ranked = global_rank(
        rows, key_col, id_col, out_col="__snm_rn",
        num_partitions=num_partitions,
    ).select_columns(
        list(dict.fromkeys([id_col, *carry, "__snm_rn"]))
    )

    from .lag import try_arrow_schema

    types: dict[str, pa.DataType] = {}
    s = try_arrow_schema(ds)
    if s is not None and all(c in s.names for c in [id_col, *carry]):
        types = {c: s.field(c).type for c in [id_col, *carry]}

    def to_slabs(batch: dict[str, np.ndarray]) -> dict:
        rn = np.asarray(batch["__snm_rn"], dtype=np.int64)
        slab = rn // slab_rows
        # trailing window-1 rows of each slab also feed the next slab
        dup = (rn % slab_rows) >= (slab_rows - (window - 1))
        out = {
            _SLAB: np.concatenate((slab, slab[dup] + 1)),
            "__snm_rn": np.concatenate((rn, rn[dup])),
        }
        for c in [id_col, *carry]:
            v = np.asarray(batch[c])
            out[c] = np.concatenate((v, v[dup]))
        return out

    slabbed = ranked.map_batches(to_slabs, batch_format="numpy")

    out_fields = [
        pa.field("id_a", types.get(id_col, pa.string())),
        pa.field("id_b", types.get(id_col, pa.string())),
    ]
    for c in carry:
        out_fields.append(pa.field(f"{c}_a", types.get(c, pa.string())))
        out_fields.append(pa.field(f"{c}_b", types.get(c, pa.string())))
    out_fields.append(pa.field("dist", pa.int64()))
    out_schema = pa.schema(out_fields) if types else None

    def emit_pairs(group: dict[str, np.ndarray]) -> dict:
        rn = np.asarray(group["__snm_rn"], dtype=np.int64)
        slab = int(np.asarray(group[_SLAB])[0])
        order = np.argsort(rn, kind="stable")
        rn = rn[order]
        vals = {c: np.asarray(group[c])[order] for c in [id_col, *carry]}
        if len(rn) > 1 and not np.all(np.diff(rn) == 1):
            raise AssertionError(
                "global ranks are not dense within a slab — "
                "global_rank produced a gap"
            )
        owner = (rn // slab_rows) == slab
        parts: dict[str, list[np.ndarray]] = {
            f: [] for f in
            ["id_a", "id_b", *(f"{c}_{s}" for c in carry for s in "ab"),
             "dist"]
        }
        m = len(rn)
        for d in range(1, window):
            if m <= d:
                break
            # a pair lives in exactly one slab: the one OWNING its later
            # row (the earlier row of a seam pair is only present here
            # as a duplicated prefix row)
            mask = owner[d:]
            if not mask.any():
                continue
            parts["id_a"].append(vals[id_col][: m - d][mask])
            parts["id_b"].append(vals[id_col][d:][mask])
            for c in carry:
                parts[f"{c}_a"].append(vals[c][: m - d][mask])
                parts[f"{c}_b"].append(vals[c][d:][mask])
            parts["dist"].append(
                np.full(int(mask.sum()), d, dtype=np.int64)
            )
        if not parts["id_a"]:
            return _empty_snm(vals, carry, id_col)
        return {f: np.concatenate(v) for f, v in parts.items()}

    def empty_pairs(batch: dict[str, np.ndarray]) -> dict:
        vals = {c: np.asarray(batch[c]) for c in [id_col, *carry]}
        return _empty_snm(vals, carry, id_col)

    return sorted_group_scan(
        slabbed, _SLAB, emit_pairs, empty_pairs,
        num_partitions=num_partitions, out_schema=out_schema,
    )


def _empty_snm(
    vals: dict[str, np.ndarray], carry: list[str], id_col: str
) -> dict:
    out = {"id_a": vals[id_col][:0], "id_b": vals[id_col][:0]}
    for c in carry:
        out[f"{c}_a"] = vals[c][:0]
        out[f"{c}_b"] = vals[c][:0]
    out["dist"] = np.empty(0, dtype=np.int64)
    return out


def _null_mask(arr: np.ndarray) -> np.ndarray:
    import pandas as pd

    return np.asarray(pd.isna(arr))


def global_percent_rank(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    out_col: str = "pct_rank_e4",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Append SQL ``PERCENT_RANK() OVER (ORDER BY key_col, id_col)`` as
    half-up e4 fixed point (int64) — the global equal-rank position
    feature (``rn / (N-1)``; 0 when N = 1, matching the probed DuckDB
    contract, which both engines compute from the same float64
    division).  Null keys are refused by :func:`global_rank` — filter
    them first, exactly as the SQL twin must decide their placement.

    One extra materialization over :func:`global_rank` (the ranked
    stream is consumed for its count and then mapped)."""
    ranked = global_rank(
        ds, key_col, id_col, out_col="__gpr_rn",
        num_partitions=num_partitions,
    ).materialize()
    n_total = ranked.count()
    denom = float(max(n_total - 1, 1))

    def finish(batch: dict[str, np.ndarray]) -> dict:
        out = {
            k: v for k, v in batch.items() if k != "__gpr_rn"
        }
        rn = np.asarray(batch["__gpr_rn"], dtype=np.float64)
        out[out_col] = np.floor(
            rn / denom * 10_000.0 + 0.5
        ).astype(np.int64)
        return out

    return ranked.map_batches(finish, batch_format="numpy")
