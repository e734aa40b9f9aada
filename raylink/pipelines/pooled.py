"""Pooled (dictionary-encoded) linkage engine: the reference's unique-value
economy, distributed.

The reference's ``gammaCKpar!`` never scores row pairs: it pools each column
(/root/reference/src/gammas/gammaCKpar.jl:99-106 loops over pool *values*),
scores each unique value pair once, and expands the results into a 2-bit
DiBitMatrix over the full N_A x N_B cross product.  This module is that
design re-expressed Ray-Data-first:

1. **Factorize** — each comparison column's distinct values are collected
   (per-block ``unique`` partials -> driver union; bounded by the pooled-
   cardinality assumption, exactly the assumption the reference's pool
   encoding makes) and the records gain int32 ``code`` columns via a
   broadcast ``searchsorted``.  Pair machinery then ships narrow ints, not
   strings.
2. **Gamma LUTs** — for each string variable, the uint8 gamma of every
   unique value pair is computed ONCE by a distributed ``map_batches`` sweep
   over the (n_a x n_b) unique-pair grid (the actual string-distance work),
   then broadcast via ``ray.put``.  Variables with identical (dictionary,
   method, cuts) share one LUT — e.g. a column compared twice under two
   names costs one sweep.
3. **Two-pass cell scan** — records are salted/expanded with the standard
   blocking machinery, sorted by pair-group key ONCE
   (:func:`raylink.stages.sortedrun.sort_by_key`), then scanned twice:
   pass 1 computes the agreement-pattern histogram per cell (pure LUT
   gathers + ``bincount``; no pair rows exist anywhere), EM runs on the
   tiny histogram, and pass 2 re-scans the same sorted blocks emitting ONLY
   the matched pairs.  This mirrors the reference's shape (pattern counts +
   indices -> EM -> extract matches, matchPatterns.jl/getMatches.jl) and is
   the 10^12-pair-safe layout: the full comparison set is never
   materialized, only streamed.

Scale assumptions (documented per the custom-operator rule): per-variable
distinct counts must satisfy ``n_a * n_b <= lut_max_cells`` (default 256M,
i.e. a 256 MB uint8 LUT — broadcast once, read zero-copy by every task).
High-cardinality free-text comparators (token_lv over transcripts) are NOT
poolable; :func:`poolable` reports False and callers fall back to the
row-pair scoring engine (:mod:`raylink.stages.scoring`).
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import LinkConfig, VarConfig
from ..constants import BITS_PER_VAR, MATCH1, MATCH2, MISSING, NONMATCH
from ..functions.strdist import (
    char_bitmask,
    encode_strings,
    jaro_winkler_grid,
    similarity_pairs,
)
from ..functions.gamma import gamma_from_similarity
from ..stages import blocking as blocking_stage
from ..stages.cluster import connected_components
from ..stages.sortedrun import sort_by_key, sorted_group_scan
from .linkage import LinkResult, fit_patterns
from ..stages.patterns import unpack_patterns

__all__ = [
    "poolable",
    "link_records_pooled",
    "dedupe_records_pooled",
    "pooled_pattern_histogram",
]

#: Max cells in one gamma LUT (uint8 bytes).  256M = one 256 MB broadcast
#: object (put once, read zero-copy from the object store by every task);
#: beyond this the pooled engine refuses (fallback: row scoring).
DEFAULT_LUT_MAX_CELLS = 256_000_000
#: Max distinct values per side per variable before the pooled assumption
#: is considered violated.
DEFAULT_MAX_DISTINCT = 1_000_000
#: Pair cells are scanned in row-chunks bounded to this many pairs so the
#: per-chunk gather matrices stay cache-sized.  Default 512k pairs: the
#: per-variable uint8 gather temp (512 KB) and the uint16 key accumulator
#: (1 MB) then live in L2/L3 instead of streaming through DRAM — measured
#: 10-15% faster than 4M chunks on the 1G-pair ref workload at BOTH 4 and
#: 16 CPUs (best-of-3: 34.3->38.4 M pairs/s at 4, 79.4->88.2 M at 16;
#: 256k is slightly worse than 512k).  Env-tunable for experiments.
SCAN_CHUNK_PAIRS = int(os.environ.get("RAYLINK_SCAN_CHUNK_PAIRS", 512_000))


def poolable(variables: list[VarConfig], config=None) -> bool:
    """True when every leaf variable can be scored by the pooled engine.

    tf_adjust IS poolable for string/exact variables (round 3): the
    factorization carries a per-code frequency vector (the reference's
    pooled kernels carry tf natively, gammaCKpar.jl:132-235 /
    gammaKpar.jl:60-130), gathered only in the matched-pair extraction
    scan.  Still NOT poolable: numeric tf (no analog in the reference's
    numeric kernel) and NESTED tf configs (per-pair child collapse
    changes the EM itself — pass ``config`` to detect those; they belong
    to the row engine's ``fit_patterns_per_pair`` path)."""
    ok = all(
        v.kernel in ("string", "exact")
        or (v.kernel == "numeric" and not getattr(v, "tf_adjust", False))
        for v in variables
    )
    if not ok:
        return False
    if config is not None:
        from .nested_tf import has_nested_tf

        if has_nested_tf(config):
            return False
    return True


# ---------------------------------------------------------------------------
# factorization


def _distinct_values_multi(
    ds: ray.data.Dataset, cols: list[str], cap: int
) -> dict[str, np.ndarray]:
    """Distinct non-null values of every column in ``cols``, ONE pass.

    Per-block ``unique`` partials for all columns stream to the driver
    together (one Dataset execution, not one per column); the union is
    bounded by the pooled-cardinality assumption (checked against ``cap``).
    """
    if not cols:
        return {}

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        width = 0
        for c in cols:
            vals = pd.Series(batch[c]).dropna().unique()
            out[c] = np.asarray(vals, dtype=object)
            width = max(width, len(out[c]))
        # pad to a rectangle (None pads drop out at the union)
        for c in cols:
            if len(out[c]) < width:
                out[c] = np.concatenate(
                    [out[c], np.full(width - len(out[c]), None, dtype=object)]
                )
        return out

    parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    seen = 0
    uniq_ds = ds.select_columns(cols).map_batches(
        partial, batch_format="numpy", batch_size=None
    )
    for b in uniq_ds.iter_batches(batch_size=1_000_000, batch_format="numpy"):
        for c in cols:
            arr = np.asarray(b[c], dtype=object)
            parts[c].append(arr)
            seen += len(arr)
        if seen > 50 * cap * len(cols):  # early abort on unbounded columns
            raise ValueError(
                f"columns {cols} exceed the pooled cardinality budget "
                f"({seen}+ partial-distinct values; cap {cap})"
            )
    out_vals: dict[str, np.ndarray] = {}
    for c in cols:
        if not parts[c]:
            out_vals[c] = np.empty(0, dtype=object)
            continue
        vals = pd.Series(np.concatenate(parts[c])).dropna().unique()
        if len(vals) > cap:
            raise ValueError(
                f"column {c!r} has {len(vals)} distinct values; pooled "
                f"engine cap is {cap}"
            )
        out_vals[c] = np.sort(np.asarray(vals, dtype=object))
    return out_vals


def _value_counts_multi(
    ds: ray.data.Dataset, cols: list[str]
) -> dict[str, pd.Series]:
    """Non-null value counts of every column in ``cols``, ONE pass.

    Per-block ``value_counts`` partials stream to the driver padded to a
    rectangle (zero-count pads drop out at the merge); the merged result
    is one (value -> count) Series per column, bounded by the pooled-
    cardinality assumption.  This is the tf side-channel's input: the
    reference's pooled kernels count pool-value frequencies the same way
    (/root/reference/src/gammas/gammaCKpar.jl:180-193).
    """
    if not cols:
        return {}

    def partial(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        width = 0
        for c in cols:
            vc = pd.Series(batch[c]).value_counts(dropna=True)
            out[c] = np.asarray(vc.index.to_numpy(), dtype=object)
            out[f"_cnt_{c}"] = vc.to_numpy().astype(np.int64)
            width = max(width, len(vc))
        for c in cols:
            k = len(out[c])
            if k < width:
                out[c] = np.concatenate(
                    [out[c], np.full(width - k, None, dtype=object)]
                )
                out[f"_cnt_{c}"] = np.concatenate(
                    [out[f"_cnt_{c}"], np.zeros(width - k, dtype=np.int64)]
                )
        return out

    parts: dict[str, list[pd.DataFrame]] = {c: [] for c in cols}
    cnt_ds = ds.select_columns(cols).map_batches(
        partial, batch_format="numpy", batch_size=None
    )
    for b in cnt_ds.iter_batches(batch_size=1_000_000, batch_format="numpy"):
        for c in cols:
            vals = np.asarray(b[c], dtype=object)
            keep = pd.notna(vals)
            parts[c].append(
                pd.DataFrame(
                    {"v": vals[keep], "n": np.asarray(b[f"_cnt_{c}"])[keep]}
                )
            )
    out: dict[str, pd.Series] = {}
    for c in cols:
        if not parts[c]:
            out[c] = pd.Series([], dtype="int64")
            continue
        merged = pd.concat(parts[c], ignore_index=True)
        out[c] = merged.groupby("v")["n"].sum()
    return out


def _tf_freq_vector(
    v: VarConfig, dict_vals: np.ndarray, counts: pd.Series, n: int
) -> np.ndarray:
    """Per-code frequency vector (len(dict)+1, float32) for one tf variable.

    Slot ``code`` holds ``max(count/n, tf_minimum_u_value)``; the padding
    slot (null code -1, remapped to len(dict)) holds the null-group
    frequency — identical formulas to the row engine's
    :func:`raylink.stages.tf.add_tf_columns`, so the two engines' tf
    columns are bit-equal.  ``upper`` string variables merge counts across
    codes whose uppercased value coincides (the row engine counts AFTER
    normalize_upper; the pooled dictionary holds raw values).
    """
    cnt = np.zeros(len(dict_vals), dtype=np.int64)
    if len(counts):
        pos = np.searchsorted(dict_vals, counts.index.to_numpy(object))
        cnt[pos] = counts.to_numpy()
    total = int(cnt.sum())
    if v.upper and v.kernel == "string" and len(dict_vals):
        up = np.array([s.upper() for s in dict_vals], dtype=object)
        uniq, inv = np.unique(up, return_inverse=True)
        merged = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(merged, inv, cnt)
        cnt = merged[inv]
    freq = np.maximum(cnt / n, v.tf_minimum_u_value).astype(np.float32)
    null_cnt = n - total
    null_freq = (
        max(null_cnt / n, v.tf_minimum_u_value)
        if null_cnt > 0
        else v.tf_minimum_u_value
    )
    return np.concatenate([freq, np.asarray([null_freq], dtype=np.float32)])


def _add_code_columns(
    ds: ray.data.Dataset, dicts: dict[str, np.ndarray]
) -> ray.data.Dataset:
    """Replace each dict column with an int32 ``c_<col>`` code (-1 = null)."""
    dicts_ref = ray.put(dicts)

    def encode(batch: pa.Table) -> pa.Table:
        the_dicts = ray.get(dicts_ref)
        for col, vals in the_dicts.items():
            arr = batch.column(col).to_numpy(zero_copy_only=False)
            s = pd.Series(arr, dtype=object)
            isna = s.isna().to_numpy()
            codes = np.full(len(s), -1, dtype=np.int32)
            if len(vals) and (~isna).any():
                nz = np.flatnonzero(~isna)
                codes[nz] = np.searchsorted(vals, s.iloc[nz].to_numpy()).astype(
                    np.int32
                )
            batch = batch.drop_columns([col]).append_column(
                f"c_{col}", pa.array(codes, type=pa.int32())
            )
        return batch

    return ds.map_batches(encode, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# gamma LUTs


def _build_gamma_luts(
    jobs: list[tuple[np.ndarray, np.ndarray, VarConfig]],
    cells_per_task: int = 2_000_000,
) -> list[np.ndarray]:
    """(n_a+1, n_b+1) uint8 gamma LUTs for the given string variables,
    built by ONE distributed sweep over every job's unique-pair grid.

    Row i / column j of LUT k hold gamma(vals_a[i], vals_b[j]) for job k;
    the padding row and column (code -1 remapped to n) hold MISSING.  All
    jobs' row-chunks interleave in a single Dataset execution — the
    per-execution fixed cost (startup, scheduling) is paid once however
    many variables the config has, which matters for scaling at low
    parallelism.  Each finished LUT is n_a*n_b bytes on the driver.
    """
    luts = [
        np.full((len(va) + 1, len(vb) + 1), MISSING, dtype=np.uint8)
        for va, vb, _ in jobs
    ]
    items: list[dict] = []
    payloads = []
    params = []
    for j, (vals_a, vals_b, v) in enumerate(jobs):
        na, nb = len(vals_a), len(vals_b)
        params.append(
            {
                "method": v.distmethod,
                "w": v.w,
                "cut_a": float(v.cut_a),
                "cut_b": float(v.cut_b),
                "partial": v.partial,
                "nb": nb,
            }
        )
        if na == 0 or nb == 0:
            payloads.append(None)
            continue
        if v.upper:
            vals_a = np.array([s.upper() for s in vals_a], dtype=object)
            vals_b = np.array([s.upper() for s in vals_b], dtype=object)
        if getattr(v, "fuzzy_truncate", False):
            # gammaCKfuzzy.jl's 16-codeunit window, applied once per pool
            # value (the unique-value economy makes this O(pool), not
            # O(pairs))
            vals_a = np.array([s[:16] for s in vals_a], dtype=object)
            vals_b = np.array([s[:16] for s in vals_b], dtype=object)
        if v.distmethod == "jw":
            # encode each pool ONCE; every task reuses the code matrices
            # and char bitmasks (bound-pruned grid kernel) — zero per-pair
            # Python anywhere
            enc_a, len_a = encode_strings(list(vals_a))
            enc_b, len_b = encode_strings(list(vals_b))
            if enc_a.dtype != enc_b.dtype:
                enc_a = enc_a.astype(np.uint32)
                enc_b = enc_b.astype(np.uint32)
            payloads.append(
                (enc_a, len_a, char_bitmask(enc_a), enc_b, len_b, char_bitmask(enc_b))
            )
        else:
            payloads.append((vals_a, vals_b))
        rows_per_task = max(1, cells_per_task // nb)
        for s in range(0, na, rows_per_task):
            items.append({"job": j, "start": s, "end": min(s + rows_per_task, na)})
    if not items:
        return luts
    # one ray.put PER JOB: a scoring task deserializes only its own
    # job's pools, not every variable's (object-dtype pools pickle,
    # they don't zero-copy — shipping all jobs to all tasks repays the
    # full deserialization once per task)
    payload_refs = [ray.put(p) for p in payloads]

    def score_item(job: int, start: int, end: int) -> np.ndarray:
        pl = ray.get(payload_refs[job])
        p = params[job]
        nb = p["nb"]
        ia = np.arange(start, end, dtype=np.int64)
        if p["method"] == "jw":
            ea, la, ma, eb, lb, mb = pl
            prune_below = float(p["cut_b"] if p["partial"] else p["cut_a"])
            inner = max(1, 2_000_000 // nb)  # bounds (chunk, nb) temporaries
            g_out = np.empty((len(ia), nb), dtype=np.uint8)
            for c0 in range(0, len(ia), inner):
                rows = ia[c0 : c0 + inner]
                sims = jaro_winkler_grid(
                    ea, la, ma, eb, lb, mb, rows, p=p["w"], prune_below=prune_below
                )
                g_out[c0 : c0 + len(rows)] = gamma_from_similarity(
                    sims.ravel(), cut_a=p["cut_a"], cut_b=p["cut_b"],
                    partial=p["partial"],
                ).reshape(len(rows), nb)
            return g_out
        va, vb = pl
        A = np.repeat(va[ia], nb)
        B = np.tile(vb, len(ia))
        sims = similarity_pairs(A, B, method=p["method"], w=p["w"])
        return gamma_from_similarity(
            sims, cut_a=p["cut_a"], cut_b=p["cut_b"], partial=p["partial"]
        ).reshape(len(ia), nb)

    # plain Ray tasks, not a Dataset: the sweep is a scatter-compute-gather
    # onto a driver-side matrix — Dataset block machinery adds seconds of
    # fixed overhead here with no streaming benefit (results are consumed
    # whole, immediately, by the driver)
    score_task = ray.remote(
        lambda j, s, e: score_item(j, s, e)
    )
    refs = [
        score_task.remote(it["job"], it["start"], it["end"]) for it in items
    ]
    for it, g in zip(items, ray.get(refs)):
        j, s, e = it["job"], it["start"], it["end"]
        luts[j][s:e, : params[j]["nb"]] = g
    return luts


@dataclass
class _PooledVar:
    """Per-variable pooled scoring spec shipped to the scan tasks."""

    name: str
    kind: str  # "lut" | "exact" | "numeric"
    bit: int  # bit offset in the packed pattern key (2 bits per var)
    lut: np.ndarray | None = None  # (na+1, nb+1) uint8, kind == "lut"
    na: int = 0
    nb: int = 0
    cut_a: float = 0.0
    cut_b: float = 0.0
    partial: bool = True
    # tf side-channel: per-code frequency vectors (len(dict)+1 float32,
    # null slot last), gathered only in the matched-pair extraction scan
    tf: bool = False
    freq_a: np.ndarray | None = None
    freq_b: np.ndarray | None = None


def _prepare_pooled_vars(
    leaf_vars: list[VarConfig],
    dicts_a: dict[str, np.ndarray],
    dicts_b: dict[str, np.ndarray],
    lut_max_cells: int,
) -> list[_PooledVar]:
    """Build the per-var specs; string vars with identical (dicts, method,
    cuts) share one LUT (the reference recomputes these — a pure win).  All
    distinct LUTs are built by ONE distributed sweep (:func:`_build_gamma_luts`)."""
    specs: list[_PooledVar] = []
    lut_jobs: list[tuple[np.ndarray, np.ndarray, VarConfig]] = []
    job_of_key: dict[tuple, int] = {}
    pending: list[tuple[int, int]] = []  # (spec index, job index)
    for k, v in enumerate(leaf_vars):
        bit = BITS_PER_VAR * k
        if v.kernel == "exact":
            specs.append(
                _PooledVar(
                    name=v.name,
                    kind="exact",
                    bit=bit,
                    na=len(dicts_a[v.name]),
                    nb=len(dicts_b[v.name]),
                )
            )
        elif v.kernel == "numeric":
            specs.append(
                _PooledVar(
                    name=v.name,
                    kind="numeric",
                    bit=bit,
                    cut_a=float(v.cut_a),
                    cut_b=float(v.cut_b),
                    partial=v.partial,
                )
            )
        elif v.kernel == "string":
            va, vb = dicts_a[v.name], dicts_b[v.name]
            cells = (len(va) + 1) * (len(vb) + 1)
            if cells > lut_max_cells:
                raise ValueError(
                    f"variable {v.name!r}: {len(va)}x{len(vb)} unique-pair "
                    f"grid exceeds lut_max_cells={lut_max_cells}; use the "
                    "row-pair scoring engine for this config"
                )
            key = (
                v.distmethod,
                v.w,
                float(v.cut_a),
                float(v.cut_b),
                v.partial,
                v.upper,
                # truncation changes the gammas: two vars differing only
                # in this flag must NOT share one LUT
                bool(getattr(v, "fuzzy_truncate", False)),
                hash(tuple(va)),
                hash(tuple(vb)),
            )
            if key not in job_of_key:
                job_of_key[key] = len(lut_jobs)
                lut_jobs.append((va, vb, v))
            pending.append((len(specs), job_of_key[key]))
            specs.append(
                _PooledVar(
                    name=v.name,
                    kind="lut",
                    bit=bit,
                    lut=None,  # filled below
                    na=len(va),
                    nb=len(vb),
                )
            )
        else:  # pragma: no cover - guarded by poolable()
            raise ValueError(f"variable {v.name!r} is not poolable ({v.kernel})")
    if lut_jobs:
        luts = _build_gamma_luts(lut_jobs)
        for spec_idx, job_idx in pending:
            specs[spec_idx].lut = luts[job_idx]
    return specs


# ---------------------------------------------------------------------------
# the two-pass cell scan


def _pair_patterns(
    specs: list[_PooledVar],
    cols_a: dict[str, np.ndarray],
    cols_b: dict[str, np.ndarray],
    ia: np.ndarray,
    ib_all: np.ndarray,
) -> np.ndarray:
    """Packed pattern keys for the cross product rows ``ia`` x ``ib_all``.

    Returns an (len(ia), len(ib_all)) matrix of pattern keys — uint16 when
    every variable's bits fit (the common case; 4x less write traffic than
    int64 on a gather-bound scan), int64 beyond.  All per-variable work is
    LUT gathers / broadcast compares — no Python per pair.  Variables whose
    inputs are bit-identical (same LUT object + same code slices, e.g. a
    column compared twice under two names) are gathered ONCE and shifted
    into both bit positions.
    """
    m, n = len(ia), len(ib_all)
    max_bit = max((s.bit for s in specs), default=0) + BITS_PER_VAR
    dtype = np.uint16 if max_bit <= 16 else np.int64
    # one (gamma matrix, bit multiplier) entry per UNIQUE computation:
    # duplicated variables accumulate their bit weights onto one gather
    groups: dict[tuple, list] = {}
    for s in specs:
        if s.kind == "lut":
            ca = cols_a[f"c_{s.name}"][ia].astype(np.int64)
            cb = cols_b[f"c_{s.name}"][ib_all].astype(np.int64)
            sig = ("lut", id(s.lut), ca.tobytes(), cb.tobytes())
            if sig not in groups:
                ca = np.where(ca < 0, s.na, ca)
                cb = np.where(cb < 0, s.nb, cb)
                groups[sig] = [s.lut[ca[:, None], cb[None, :]], 0]
        elif s.kind == "exact":
            ca = cols_a[f"c_{s.name}"][ia]
            cb = cols_b[f"c_{s.name}"][ib_all]
            sig = ("exact", ca.tobytes(), cb.tobytes())
            if sig not in groups:
                eq = ca[:, None] == cb[None, :]
                g = np.where(eq, MATCH2, NONMATCH).astype(np.uint8)
                miss = (ca[:, None] < 0) | (cb[None, :] < 0)
                g[miss] = MISSING
                groups[sig] = [g, 0]
        else:  # numeric
            va = np.asarray(cols_a[s.name][ia], dtype=np.float64)
            vb = np.asarray(cols_b[s.name][ib_all], dtype=np.float64)
            sig = (
                "num", s.cut_a, s.cut_b, s.partial, va.tobytes(), vb.tobytes()
            )
            if sig not in groups:
                d = np.abs(va[:, None] - vb[None, :])
                g = np.full((m, n), NONMATCH, dtype=np.uint8)
                with np.errstate(invalid="ignore"):
                    if s.partial:
                        g[d <= s.cut_b] = MATCH1
                        g[d <= s.cut_a] = MATCH2
                    else:
                        g[d < s.cut_a] = MATCH2
                g[np.isnan(d)] = MISSING
                groups[sig] = [g, 0]
        groups[sig][1] += 1 << s.bit
    # gamma codes occupy 2 bits and multipliers target disjoint bit spans,
    # so OR of shifts == sum of products: ONE multiply-add per unique gamma
    keys: np.ndarray | None = None
    for g, mult in groups.values():
        contrib = g.astype(dtype)
        if mult != 1:
            contrib *= dtype(mult)
        if keys is None:
            keys = contrib
        else:
            keys += contrib
    if keys is None:
        keys = np.zeros((m, n), dtype=dtype)
    return keys


def _cell_indices(
    cols: dict[str, np.ndarray], id_col: str, link: bool
) -> tuple[np.ndarray, np.ndarray, bool] | None:
    """Row-index sets (a_rows, b_rows, triangular) for one pair-group cell."""
    if link:
        side = np.asarray(cols["_side"])
        a_rows = np.flatnonzero(side == "a")
        b_rows = np.flatnonzero(side == "b")
        if len(a_rows) == 0 or len(b_rows) == 0:
            return None
        return a_rows, b_rows, False
    n = len(cols[id_col])
    if n < 2:
        return None
    sub_i = int(cols["sub_i"][0])
    sub_j = int(cols["sub_j"][0])
    if sub_i == sub_j:
        order = np.argsort(cols[id_col], kind="stable")
        return order, order, True
    salt = cols["salt"]
    left = np.flatnonzero(salt == sub_i)
    right = np.flatnonzero(salt == sub_j)
    if len(left) == 0 or len(right) == 0:
        return None
    return left, right, False


def _make_hist_fn(specs_ref, id_col: str, link: bool, n_bins: int):
    """Pass-1 UDF: per-cell pattern histogram (no pair rows)."""

    def hist_fn(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        specs = ray.get(specs_ref)
        cols = {k: np.asarray(v) for k, v in group.items()}
        empty = {
            "pattern_key": np.empty(0, dtype=np.int64),
            "cnt": np.empty(0, dtype=np.int64),
        }
        idx = _cell_indices(cols, id_col, link)
        if idx is None:
            return empty
        a_rows, b_rows, tri = idx
        nb_c = len(b_rows)
        chunk = max(1, SCAN_CHUNK_PAIRS // max(nb_c, 1))
        counts = np.zeros(n_bins, dtype=np.int64)
        for c0 in range(0, len(a_rows), chunk):
            ia = a_rows[c0 : c0 + chunk]
            if tri:
                # upper triangle only: columns j > global row position
                jb = b_rows[c0 + 1 :]
                if len(jb) == 0:
                    continue
                keys = _pair_patterns(specs, cols, cols, ia, jb)
                # row r (global c0+r) pairs with columns at local index > r-1
                mask = (
                    np.arange(len(jb))[None, :]
                    >= np.arange(len(ia))[:, None]
                )
                counts += np.bincount(keys[mask], minlength=n_bins)
            else:
                keys = _pair_patterns(specs, cols, cols, ia, b_rows)
                counts += np.bincount(keys.ravel(), minlength=n_bins)
        nz = np.flatnonzero(counts)
        return {"pattern_key": nz.astype(np.int64), "cnt": counts[nz]}

    def empty_fn(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return {
            "pattern_key": np.empty(0, dtype=np.int64),
            "cnt": np.empty(0, dtype=np.int64),
        }

    return hist_fn, empty_fn


def _make_match_fn(
    specs_ref,
    matched_ref,
    id_col: str,
    id_out: tuple[str, str],
    link: bool,
):
    """Pass-2 UDF: emit only pairs whose pattern is in the matched set.

    tf-flagged specs also emit ``tf_<var>_a`` / ``tf_<var>_b`` per-pair
    frequency columns (a per-code vector gather — O(matched pairs), never
    O(comparisons))."""

    def empty(cols: dict[str, np.ndarray], specs) -> dict[str, np.ndarray]:
        out = {
            id_out[0]: cols[id_col][:0],
            id_out[1]: cols[id_col][:0],
            "pattern_key": np.empty(0, dtype=np.int64),
            "zeta_j": np.empty(0, dtype=np.float64),
            "weights": np.empty(0, dtype=np.float64),
        }
        for sp in specs:
            if sp.tf:
                out[f"tf_{sp.name}_a"] = np.empty(0, dtype=np.float32)
                out[f"tf_{sp.name}_b"] = np.empty(0, dtype=np.float32)
        return out

    def match_fn(group: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        specs = ray.get(specs_ref)
        mkeys, mzeta, mweights = ray.get(matched_ref)
        cols = {k: np.asarray(v) for k, v in group.items()}
        idx = _cell_indices(cols, id_col, link)
        if idx is None or len(mkeys) == 0:
            return empty(cols, specs)
        a_rows, b_rows, tri = idx
        nb_c = len(b_rows)
        chunk = max(1, SCAN_CHUNK_PAIRS // max(nb_c, 1))
        ids = cols[id_col]
        tf_specs = [sp for sp in specs if sp.tf]
        out_a, out_b, out_k = [], [], []
        out_f: dict[str, tuple[list, list]] = {
            sp.name: ([], []) for sp in tf_specs
        }
        for c0 in range(0, len(a_rows), chunk):
            ia = a_rows[c0 : c0 + chunk]
            if tri:
                jb = b_rows[c0 + 1 :]
                if len(jb) == 0:
                    continue
                keys = _pair_patterns(specs, cols, cols, ia, jb)
                tri_mask = (
                    np.arange(len(jb))[None, :]
                    >= np.arange(len(ia))[:, None]
                )
            else:
                jb = b_rows
                keys = _pair_patterns(specs, cols, cols, ia, jb)
                tri_mask = None
            pos = np.searchsorted(mkeys, keys.ravel())
            pos_c = np.clip(pos, 0, len(mkeys) - 1)
            hit = mkeys[pos_c] == keys.ravel()
            if tri_mask is not None:
                hit &= tri_mask.ravel()
            flat = np.flatnonzero(hit)
            if len(flat) == 0:
                continue
            ri, ci = np.unravel_index(flat, keys.shape)
            out_a.append(ids[ia[ri]])
            out_b.append(ids[jb[ci]])
            out_k.append(keys.ravel()[flat])
            for sp in tf_specs:
                c = cols[f"c_{sp.name}"]
                ca = c[ia[ri]].astype(np.int64)
                cb = c[jb[ci]].astype(np.int64)
                out_f[sp.name][0].append(
                    sp.freq_a[np.where(ca < 0, sp.na, ca)]
                )
                out_f[sp.name][1].append(
                    sp.freq_b[np.where(cb < 0, sp.nb, cb)]
                )
        if not out_a:
            return empty(cols, specs)
        id_a = np.concatenate(out_a)
        id_b = np.concatenate(out_b)
        kk = np.concatenate(out_k)
        swap = None
        if not link:
            swap = id_a > id_b
            id_a, id_b = np.where(swap, id_b, id_a), np.where(swap, id_a, id_b)
        kk = kk.astype(np.int64)
        pos = np.searchsorted(mkeys, kk)
        out = {
            id_out[0]: id_a,
            id_out[1]: id_b,
            "pattern_key": kk,
            "zeta_j": mzeta[pos],
            "weights": mweights[pos],
        }
        for sp in tf_specs:
            fa = np.concatenate(out_f[sp.name][0])
            fb = np.concatenate(out_f[sp.name][1])
            if swap is not None:
                # keep tf_<var>_a attached to id_a through the orientation
                # swap (row-engine parity; the denominators are symmetric)
                fa, fb = np.where(swap, fb, fa), np.where(swap, fa, fb)
            out[f"tf_{sp.name}_a"] = fa.astype(np.float32)
            out[f"tf_{sp.name}_b"] = fb.astype(np.float32)
        return out

    def empty_fn(batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        return empty(
            {k: np.asarray(v) for k, v in batch.items()}, ray.get(specs_ref)
        )

    return match_fn, empty_fn


def _attach_gammas(matches: ray.data.Dataset, leaf_names: list[str]):
    """Unpack gamma_<var> columns from pattern_key (matched rows only)."""

    def unpack(batch: pa.Table) -> pa.Table:
        keys = batch.column("pattern_key").to_numpy(zero_copy_only=False)
        mat = unpack_patterns(keys, len(leaf_names))
        for k, name in enumerate(leaf_names):
            batch = batch.append_column(
                f"gamma_{name}", pa.array(mat[:, k], type=pa.uint8())
            )
        return batch

    return matches.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# direct cell tasks (the no-blocking fast path)
#
# When there is no blocking the comparison space is ONE salted block whose
# cell membership is pure arithmetic (salt = hash(id) % s), so the
# expansion+sort shuffle of the general path is unnecessary data movement:
# records are bucketed by salt ONCE (one ray.put per bucket — object-store
# resident, read zero-copy), and each pair-group cell is a plain Ray task
# reading its two buckets.  This is one of the sanctioned drops to raw Ray
# tasks: the Dataset API cannot express "join each bucket with each other
# bucket without replicating rows s times".  Requires the (coded, narrow)
# records to fit in the object store — true by construction for unblocked
# linkage, whose O(N^2) comparisons bound N itself.


def _collect_columns(ds: ray.data.Dataset, cols: list[str]) -> dict[str, np.ndarray]:
    parts: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    for b in ds.select_columns(cols).iter_batches(
        batch_size=None, batch_format="numpy"
    ):
        for c in cols:
            parts[c].append(np.asarray(b[c]))
    return {
        c: (np.concatenate(v) if v else np.empty(0)) for c, v in parts.items()
    }


def _salt_buckets(
    cols: dict[str, np.ndarray], id_col: str, s: int,
    sort_col: str | None = None,
) -> list:
    """Split collected record columns into s object-store buckets by the
    same stable id-hash rule the expansion path uses.

    ``sort_col`` orders each bucket by that (code) column: the cell scan's
    LUT gather then walks LUT rows/columns near-sequentially instead of
    randomly — cache-line reuse on the biggest LUT is the difference
    between a bandwidth-bound and a compute-bound scan.
    """
    from ..functions.hashing import hash64_array

    ids = cols[id_col]
    if sort_col is not None:
        order = np.argsort(cols[sort_col], kind="stable")
        cols = {c: v[order] for c, v in cols.items()}
        ids = cols[id_col]
    salt = (hash64_array(ids, seed=7) % np.uint64(s)).astype(np.int64)
    refs = []
    for k in range(s):
        idx = np.flatnonzero(salt == k)
        refs.append(ray.put({c: v[idx] for c, v in cols.items()}))
    return refs


def _hot_sort_col(specs: list[_PooledVar]) -> str | None:
    """Code column of the largest LUT variable (the gather to optimize)."""
    luts = [sp for sp in specs if sp.kind == "lut"]
    if not luts:
        return None
    hot = max(luts, key=lambda sp: (sp.na + 1) * (sp.nb + 1))
    return f"c_{hot.name}"


@ray.remote
def _cell_hist_task(ba, bb, specs, id_col: str, n_bins: int, diag: bool):
    """Pattern histogram of one cell (bucket_a x bucket_b) -> (n_bins,) counts."""
    cols_a, cols_b = ba, bb
    na, nb = len(cols_a[id_col]), len(cols_b[id_col])
    counts = np.zeros(n_bins, dtype=np.int64)
    if na == 0 or nb == 0:
        return counts
    # bucket order is preserved (code-sorted by _salt_buckets); the diag
    # triangle counts each unordered pair once under ANY fixed order
    a_rows = np.arange(na)
    b_rows = np.arange(nb)
    chunk = max(1, SCAN_CHUNK_PAIRS // max(len(b_rows), 1))
    for c0 in range(0, len(a_rows), chunk):
        ia = a_rows[c0 : c0 + chunk]
        if diag:
            jb = b_rows[c0 + 1 :]
            if len(jb) == 0:
                continue
            keys = _pair_patterns(specs, cols_a, cols_a, ia, jb)
            mask = np.arange(len(jb))[None, :] >= np.arange(len(ia))[:, None]
            counts += np.bincount(keys[mask], minlength=n_bins)
        else:
            keys = _pair_patterns(specs, cols_a, cols_b, ia, b_rows)
            counts += np.bincount(keys.ravel(), minlength=n_bins)
    return counts


@ray.remote
def _cell_match_task(
    ba, bb, specs, matched, id_col: str, id_out, diag: bool, dedupe: bool
):
    """Matched pairs of one cell -> pa.Table(id_a, id_b, pattern_key, zeta_j,
    weights[, tf_<var>_a/_b per tf spec])."""
    mkeys, mzeta, mweights = matched
    cols_a, cols_b = ba, bb
    na, nb = len(cols_a[id_col]), len(cols_b[id_col])
    ids_a_all, ids_b_all = cols_a[id_col], cols_b[id_col]
    tf_specs = [sp for sp in specs if sp.tf]

    def empty_tbl():
        d = {
            id_out[0]: pa.array(ids_a_all[:0]),
            id_out[1]: pa.array(ids_b_all[:0]),
            "pattern_key": pa.array([], type=pa.int64()),
            "zeta_j": pa.array([], type=pa.float64()),
            "weights": pa.array([], type=pa.float64()),
        }
        for sp in tf_specs:
            d[f"tf_{sp.name}_a"] = pa.array([], type=pa.float32())
            d[f"tf_{sp.name}_b"] = pa.array([], type=pa.float32())
        return pa.table(d)

    if na == 0 or nb == 0 or len(mkeys) == 0:
        return empty_tbl()
    # any fixed order works for the diag triangle: the dedupe swap below
    # normalizes pair orientation to id_a < id_b
    a_rows = np.arange(na)
    b_rows = np.arange(nb)
    chunk = max(1, SCAN_CHUNK_PAIRS // max(len(b_rows), 1))
    out_a, out_b, out_k = [], [], []
    out_f: dict[str, tuple[list, list]] = {
        sp.name: ([], []) for sp in tf_specs
    }
    for c0 in range(0, len(a_rows), chunk):
        ia = a_rows[c0 : c0 + chunk]
        if diag:
            jb = b_rows[c0 + 1 :]
            if len(jb) == 0:
                continue
            keys = _pair_patterns(specs, cols_a, cols_a, ia, jb)
            tri_mask = (
                np.arange(len(jb))[None, :] >= np.arange(len(ia))[:, None]
            )
        else:
            jb = b_rows
            keys = _pair_patterns(specs, cols_a, cols_b, ia, jb)
            tri_mask = None
        pos = np.searchsorted(mkeys, keys.ravel())
        pos_c = np.clip(pos, 0, len(mkeys) - 1)
        hit = mkeys[pos_c] == keys.ravel()
        if tri_mask is not None:
            hit &= tri_mask.ravel()
        flat = np.flatnonzero(hit)
        if len(flat) == 0:
            continue
        ri, ci = np.unravel_index(flat, keys.shape)
        out_a.append(ids_a_all[ia[ri]])
        out_b.append((ids_a_all if diag else ids_b_all)[jb[ci]])
        out_k.append(keys.ravel()[flat])
        for sp in tf_specs:
            ca = cols_a[f"c_{sp.name}"][ia[ri]].astype(np.int64)
            cb = (cols_a if diag else cols_b)[f"c_{sp.name}"][jb[ci]].astype(
                np.int64
            )
            # diag cells are same-table: both sides gather freq_a
            out_f[sp.name][0].append(sp.freq_a[np.where(ca < 0, sp.na, ca)])
            fb_vec = sp.freq_a if diag else sp.freq_b
            nb_pad = sp.na if diag else sp.nb
            out_f[sp.name][1].append(fb_vec[np.where(cb < 0, nb_pad, cb)])
    if not out_a:
        return empty_tbl()
    id_a = np.concatenate(out_a)
    id_b = np.concatenate(out_b)
    kk = np.concatenate(out_k)
    swap = None
    if dedupe:
        swap = id_a > id_b
        id_a, id_b = np.where(swap, id_b, id_a), np.where(swap, id_a, id_b)
    pos = np.searchsorted(mkeys, kk)
    d = {
        id_out[0]: pa.array(id_a),
        id_out[1]: pa.array(id_b),
        "pattern_key": pa.array(kk, type=pa.int64()),
        "zeta_j": pa.array(mzeta[pos], type=pa.float64()),
        "weights": pa.array(mweights[pos], type=pa.float64()),
    }
    for sp in tf_specs:
        fa = np.concatenate(out_f[sp.name][0])
        fb = np.concatenate(out_f[sp.name][1])
        if swap is not None:
            fa, fb = np.where(swap, fb, fa), np.where(swap, fa, fb)
        d[f"tf_{sp.name}_a"] = pa.array(
            fa.astype(np.float32), type=pa.float32()
        )
        d[f"tf_{sp.name}_b"] = pa.array(
            fb.astype(np.float32), type=pa.float32()
        )
    return pa.table(d)


def _direct_cells(s: int, link: bool) -> list[tuple[int, int, bool]]:
    """(i, j, diag) cell list: link = full s x s grid; dedupe = triangle."""
    if link:
        return [(i, j, False) for i in range(s) for j in range(s)]
    out = []
    for i in range(s):
        for j in range(i, s):
            out.append((i, j, i == j))
    return out


# ---------------------------------------------------------------------------
# pipelines


def _scan_partitions() -> int:
    return max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))


def pooled_pattern_histogram(
    records: ray.data.Dataset,
    variables: list[VarConfig],
    id_col: str,
    block_keys: list[str],
    blocking=None,
    lut_max_cells: int = DEFAULT_LUT_MAX_CELLS,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> pd.DataFrame:
    """Standalone pass-1: the agreement-pattern histogram of a blocked
    self-link through the pooled engine (no EM, no residual) — the pooled
    counterpart of ``score_pairs`` + ``pattern_histogram``.

    Returns a DataFrame (pattern_key, cnt) over the blocked pairs only.
    """
    from ..config import BlockingConfig

    blocking = blocking or BlockingConfig(cap=100_000)
    fields = [v.name for v in variables]
    string_like = [v.name for v in variables if v.kernel in ("string", "exact")]
    ds = records.select_columns(list(dict.fromkeys([id_col, *fields, *block_keys])))
    ds = blocking_stage.derive_block_keys(ds, block_keys).materialize()
    dicts = _distinct_values_multi(ds, string_like, max_distinct)
    ds_c = _add_code_columns(ds, dicts)
    specs = _prepare_pooled_vars(variables, dicts, dicts, lut_max_cells)
    specs_ref = ray.put(specs)
    plan, bcount = blocking_stage.plan_salts(ds, blocking)
    expanded = blocking_stage.expand_pair_groups(
        ds_c, plan, id_col, side=None,
        dropped=set(bcount.notes.get("dropped_block_keys", [])),
    )
    n_part = _scan_partitions()
    K = len(variables)
    hist_fn, hist_empty = _make_hist_fn(
        specs_ref, id_col, False, 1 << (BITS_PER_VAR * K)
    )
    hp = sorted_group_scan(
        expanded, "pg_key", hist_fn, hist_empty, n_part
    ).to_pandas()
    if "pattern_key" not in hp.columns:  # zero blocked pairs: schema-less
        return pd.DataFrame({"pattern_key": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    return hp.groupby("pattern_key", as_index=False)["cnt"].sum()


def link_records_pooled(
    records_a: ray.data.Dataset,
    records_b: ray.data.Dataset,
    config: LinkConfig,
    block_keys: list[str] | None = None,
    seed: int = 1234,
    lut_max_cells: int = DEFAULT_LUT_MAX_CELLS,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> LinkResult:
    """Two-table link through the pooled LUT engine.

    ``block_keys=[]`` (or a config with no blocking keys) runs the
    reference's UNBLOCKED full cross product: every record lands in one
    constant block, which the salting machinery immediately shards into
    bounded pair-group cells — the explicit-skew path doubles as the
    no-blocking path.
    """
    leaf_vars = config.leaf_vars()
    if not poolable(leaf_vars, config):
        raise ValueError(
            "config has non-poolable variables; use link_records()"
        )
    tf_vars = [v for v in leaf_vars if getattr(v, "tf_adjust", False)]
    counters: dict[str, Any] = {}
    id_a_col, id_b_col = config.idvar
    keys = config.blocking.keys if block_keys is None else block_keys
    fields = [v.name for v in leaf_vars]
    string_like = [v.name for v in leaf_vars if v.kernel in ("string", "exact")]
    numeric_fields = [v.name for v in leaf_vars if v.kernel == "numeric"]

    da = records_a.select_columns(
        list(dict.fromkeys([id_a_col, *fields, *keys]))
    )
    db = records_b.select_columns(
        list(dict.fromkeys([id_b_col, *fields, *keys]))
    )
    if keys:
        da = blocking_stage.derive_block_keys(da, keys)
        db = blocking_stage.derive_block_keys(db, keys)
    else:

        def add_const(b: pa.Table) -> pa.Table:
            return b.append_column(
                "block_key", pa.array(np.zeros(len(b), dtype=np.int64))
            )

        da = da.map_batches(add_const, batch_format="pyarrow")
        db = db.map_batches(add_const, batch_format="pyarrow")
    da = da.materialize()
    db = db.materialize()
    n_a, n_b = da.count(), db.count()
    counters["records_a"] = n_a
    counters["records_b"] = n_b
    total_comparisons = n_a * n_b

    # --- factorize ---------------------------------------------------------
    dicts_a = _distinct_values_multi(da, string_like, max_distinct)
    dicts_b = _distinct_values_multi(db, string_like, max_distinct)
    # exact vars compare codes directly, so both sides must share a dict
    for v in leaf_vars:
        if v.kernel == "exact":
            union = np.sort(
                pd.unique(
                    np.concatenate([dicts_a[v.name], dicts_b[v.name]])
                ).astype(object)
            )
            dicts_a[v.name] = union
            dicts_b[v.name] = union
    counters["pool_sizes"] = {
        c: (len(dicts_a[c]), len(dicts_b[c])) for c in string_like
    }

    # small value-level sample for residual u-estimation (before coding) —
    # only when blocking prunes pairs; an unblocked run covers the full
    # cross product, so there is no residual and no sampling pass to pay
    sample_a = sample_b = None
    if keys:
        from ..stages.sampling import deterministic_sample

        frac_a = min(1.0, 1000 / max(n_a, 1))
        frac_b = min(1.0, 1000 / max(n_b, 1))
        sample_a = deterministic_sample(
            da, id_a_col, frac_a, seed=seed
        ).to_pandas()
        sample_b = deterministic_sample(
            db, id_b_col, frac_b, seed=seed + 1
        ).to_pandas()

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_side", pa.array(np.repeat(side, len(b)))
            )

        return fn

    da_c = _add_code_columns(da, dicts_a).map_batches(
        tag("a"), batch_format="pyarrow"
    )
    db_c = _add_code_columns(db, dicts_b).map_batches(
        tag("b"), batch_format="pyarrow"
    )

    # --- gamma LUTs (the string-distance work, distributed) ----------------
    specs = _prepare_pooled_vars(leaf_vars, dicts_a, dicts_b, lut_max_cells)
    if tf_vars:
        # tf side-channel: one counts pass per table covering every tf
        # variable; per-code float32 frequency vectors ride inside specs
        tf_names = list(dict.fromkeys(v.name for v in tf_vars))
        counts_a = _value_counts_multi(da, tf_names)
        counts_b = _value_counts_multi(db, tf_names)
        for k, v in enumerate(leaf_vars):
            if getattr(v, "tf_adjust", False):
                specs[k].tf = True
                specs[k].freq_a = _tf_freq_vector(
                    v, dicts_a[v.name], counts_a[v.name], n_a
                )
                specs[k].freq_b = _tf_freq_vector(
                    v, dicts_b[v.name], counts_b[v.name], n_b
                )
    specs_ref = ray.put(specs)

    # --- salt plan + expansion --------------------------------------------
    if keys:
        both_keys = da.select_columns(["block_key"]).union(
            db.select_columns(["block_key"])
        )
        plan, bcount = blocking_stage.plan_salts(both_keys, config.blocking)
    else:
        # single constant block: the plan is arithmetic, no count pass
        total = n_a + n_b
        s = math.ceil(total / config.blocking.cap)
        plan = {0: min(s, config.blocking.max_salts)} if s > 1 else {}
        bcount = blocking_stage.BlockingCounters(n_hot_blocks=len(plan))
        bcount.notes["dropped_block_keys"] = []
    counters["hot_blocks"] = bcount.n_hot_blocks
    dropped = set(bcount.notes.get("dropped_block_keys", []))

    K = len(leaf_vars)
    n_bins = 1 << (BITS_PER_VAR * K)
    if n_bins > 1 << 20:
        raise ValueError(
            f"{K} variables need {n_bins} histogram bins; pooled engine "
            "caps at 10 variables (use the row engine beyond)"
        )
    spec_cols = [
        (f"c_{sp.name}" if sp.kind in ("lut", "exact") else sp.name)
        for sp in specs
    ]

    if not keys:
        # --- direct cell tasks (no shuffle): bucket by salt, one task per
        # pair-group cell, histogram via per-cell bincounts --------------
        s_salts = plan.get(0, 1)
        cols_a = _collect_columns(da_c, [id_a_col, *spec_cols])
        cols_b = _collect_columns(db_c, [id_b_col, *spec_cols])
        cols_a["_pair_id"] = cols_a.pop(id_a_col)
        cols_b["_pair_id"] = cols_b.pop(id_b_col)
        hot = _hot_sort_col(specs)
        ba = _salt_buckets(cols_a, "_pair_id", s_salts, sort_col=hot)
        bb = _salt_buckets(cols_b, "_pair_id", s_salts, sort_col=hot)
        cells = _direct_cells(s_salts, link=True)
        # measured wall of the distributed pass-1 scan (submit -> all cell
        # histograms back); reported so scaling readings can be taken on
        # the scan stage itself rather than inferred by subtracting the
        # O(1)-in-input driver work (factorize/LUT/EM) from the e2e wall
        _t_p1 = time.perf_counter()
        hist_refs = [
            _cell_hist_task.remote(ba[i], bb[j], specs_ref, "_pair_id", n_bins, d)
            for (i, j, d) in cells
        ]
        counts = np.zeros(n_bins, dtype=np.int64)
        for c in ray.get(hist_refs):
            counts += c
        counters["pass1_wall_seconds"] = round(time.perf_counter() - _t_p1, 3)
        nz = np.flatnonzero(counts)
        hist = pd.DataFrame(
            {"pattern_key": nz.astype(np.int64), "cnt": counts[nz]}
        )

        def run_pass2(matched_ref):
            refs = [
                _cell_match_task.remote(
                    ba[i], bb[j], specs_ref, matched_ref, "_pair_id",
                    ("id_a", "id_b"), d, False,
                )
                for (i, j, d) in cells
            ]
            return ray.data.from_arrow_refs(refs)

    else:
        # --- general path: salted expansion, sort ONCE, scan twice -------
        def rename_id(col: str):
            def fn(b: pa.Table) -> pa.Table:
                names = [("_pair_id" if c == col else c) for c in b.column_names]
                return b.rename_columns(names)

            return fn

        ea = blocking_stage.expand_pair_groups(
            da_c, plan, id_a_col, side="a", dropped=dropped
        ).map_batches(rename_id(id_a_col), batch_format="pyarrow")
        eb = blocking_stage.expand_pair_groups(
            db_c, plan, id_b_col, side="b", dropped=dropped
        ).map_batches(rename_id(id_b_col), batch_format="pyarrow")
        expanded = ea.union(eb)

        n_part = config.execution.pair_shuffle_partitions or _scan_partitions()
        sorted_cells = sort_by_key(expanded, "pg_key", n_part)

        hist_fn, hist_empty = _make_hist_fn(specs_ref, "_pair_id", True, n_bins)
        _t_p1 = time.perf_counter()
        hist_parts = sorted_group_scan(
            sorted_cells, "pg_key", hist_fn, hist_empty, n_part, presorted=True
        )
        # merge per-cell partial histograms on the driver (<= 4^K rows each)
        # — this consumption executes the expand+sort+scan, so the measured
        # wall covers the whole distributed pass 1
        hp = hist_parts.to_pandas()
        counters["pass1_wall_seconds"] = round(time.perf_counter() - _t_p1, 3)
        if "pattern_key" not in hp.columns:
            hp = pd.DataFrame({"pattern_key": pd.Series([], dtype="int64"),
                               "cnt": pd.Series([], dtype="int64")})
        hist = hp.groupby("pattern_key", as_index=False)["cnt"].sum()

        def run_pass2(matched_ref):
            match_fn, match_empty = _make_match_fn(
                specs_ref, matched_ref, "_pair_id", ("id_a", "id_b"), True
            )
            return sorted_group_scan(
                sorted_cells, "pg_key", match_fn, match_empty, n_part,
                presorted=True,
            )

    counters["scored_pairs"] = float(hist["cnt"].sum())
    counters["unique_leaf_patterns"] = len(hist)

    # --- EM (+ residual accounting, reusing the row-engine driver path) ----
    from ..stages.patterns import add_residual_pattern, merge_histograms, sample_residual_histogram

    residual = total_comparisons - float(hist["cnt"].sum())
    counters["residual_pairs"] = residual
    if residual > 0 and sample_a is not None:
        res_hist = sample_residual_histogram(
            sample_a, sample_b, leaf_vars, residual, seed=seed + 1
        )
        hist = merge_histograms(hist, res_hist)
        counters["residual_mode"] = "sampled"
    elif residual > 0:
        hist = add_residual_pattern(hist, total_comparisons)
        counters["residual_mode"] = "all_nonmatch"
    else:
        counters["residual_mode"] = "none"
    root_em, child_ems, leaf = fit_patterns(hist, config, seed=seed)

    # --- pass 2: extract matches ------------------------------------------
    lw = leaf
    t = root_em.threshold_match
    w_bound = lw["weights_raw"] if "weights_raw" in lw.columns else lw["weights"]
    matched = lw[(lw["zeta_j"] >= t) & (w_bound <= root_em.u_b)]
    mkeys = matched["pattern_key"].to_numpy(np.int64)
    order = np.argsort(mkeys)
    matched_ref = ray.put(
        (
            mkeys[order],
            matched["zeta_j"].to_numpy(np.float64)[order],
            matched["weights"].to_numpy(np.float64)[order],
        )
    )
    _t_p2 = time.perf_counter()
    matches = run_pass2(matched_ref)
    matches = _attach_gammas(matches, [v.name for v in leaf_vars]).materialize()
    counters["matched_pairs"] = matches.count()
    counters["pass2_wall_seconds"] = round(time.perf_counter() - _t_p2, 3)

    tf_matches = None
    if tf_vars:
        from ..stages.tf import apply_tf_adjustment

        tf_matches = apply_tf_adjustment(
            matches, root_em, leaf, leaf_vars, tf_vars
        )

    return LinkResult(
        em=root_em,
        child_ems=child_ems,
        leaf_patterns=leaf,
        matches=matches,
        scored_pairs=None,
        clusters=None,
        tf_matches=tf_matches,
        counters=counters,
    )


def dedupe_records_pooled(
    records: ray.data.Dataset,
    config: LinkConfig,
    id_col: str,
    block_keys: list[str] | None = None,
    cluster: bool = True,
    seed: int = 1234,
    lut_max_cells: int = DEFAULT_LUT_MAX_CELLS,
    max_distinct: int = DEFAULT_MAX_DISTINCT,
) -> LinkResult:
    """Self-link (dedupe) through the pooled LUT engine."""
    leaf_vars = config.leaf_vars()
    if not poolable(leaf_vars, config):
        raise ValueError("config has non-poolable variables; use dedupe_records()")
    tf_vars = [v for v in leaf_vars if getattr(v, "tf_adjust", False)]
    counters: dict[str, Any] = {}
    keys = config.blocking.keys if block_keys is None else block_keys
    fields = [v.name for v in leaf_vars]
    string_like = [v.name for v in leaf_vars if v.kernel in ("string", "exact")]

    ds = records.select_columns(list(dict.fromkeys([id_col, *fields, *keys])))
    if keys:
        ds = blocking_stage.derive_block_keys(ds, keys)
    else:

        def add_const(b: pa.Table) -> pa.Table:
            return b.append_column(
                "block_key", pa.array(np.zeros(len(b), dtype=np.int64))
            )

        ds = ds.map_batches(add_const, batch_format="pyarrow")
    ds = ds.materialize()
    n = ds.count()
    counters["records"] = n
    total_comparisons = n * (n - 1) // 2

    dicts = _distinct_values_multi(ds, string_like, max_distinct)
    counters["pool_sizes"] = {c: len(dicts[c]) for c in string_like}
    from ..stages.sampling import deterministic_sample

    frac = min(1.0, 2000 / max(n, 1))
    sample = deterministic_sample(ds, id_col, frac, seed=seed).to_pandas()
    ds_c = _add_code_columns(ds, dicts).materialize()

    specs = _prepare_pooled_vars(leaf_vars, dicts, dicts, lut_max_cells)
    if tf_vars:
        tf_names = list(dict.fromkeys(v.name for v in tf_vars))
        counts = _value_counts_multi(ds, tf_names)
        for k, v in enumerate(leaf_vars):
            if getattr(v, "tf_adjust", False):
                specs[k].tf = True
                fv = _tf_freq_vector(v, dicts[v.name], counts[v.name], n)
                specs[k].freq_a = fv
                specs[k].freq_b = fv
    specs_ref = ray.put(specs)

    K = len(leaf_vars)
    n_bins = 1 << (BITS_PER_VAR * K)
    if n_bins > 1 << 20:
        raise ValueError("pooled engine caps at 10 variables")
    spec_cols = [
        (f"c_{sp.name}" if sp.kind in ("lut", "exact") else sp.name)
        for sp in specs
    ]

    if not keys:
        # --- direct cell tasks: single salted block, no shuffle ----------
        s_salts = max(1, math.ceil(n / config.blocking.cap))
        s_salts = min(s_salts, config.blocking.max_salts)
        counters["hot_blocks"] = 1 if s_salts > 1 else 0
        cols = _collect_columns(ds_c, [id_col, *spec_cols])
        buckets = _salt_buckets(cols, id_col, s_salts, sort_col=_hot_sort_col(specs))
        cells = _direct_cells(s_salts, link=False)
        hist_refs = [
            _cell_hist_task.remote(
                buckets[i], buckets[j], specs_ref, id_col, n_bins, d
            )
            for (i, j, d) in cells
        ]
        counts = np.zeros(n_bins, dtype=np.int64)
        for c in ray.get(hist_refs):
            counts += c
        nz = np.flatnonzero(counts)
        hist = pd.DataFrame(
            {"pattern_key": nz.astype(np.int64), "cnt": counts[nz]}
        )

        def run_pass2(matched_ref):
            refs = [
                _cell_match_task.remote(
                    buckets[i], buckets[j], specs_ref, matched_ref, id_col,
                    ("id_a", "id_b"), d, True,
                )
                for (i, j, d) in cells
            ]
            return ray.data.from_arrow_refs(refs)

    else:
        plan, bcount, block_counts = blocking_stage.analyze_blocks(
            ds_c, config.blocking
        )
        counters["hot_blocks"] = bcount.n_hot_blocks
        counters["dropped_blocks"] = bcount.n_dropped_blocks
        paired = blocking_stage.filter_to_multi_blocks(ds_c, counts=block_counts)
        expanded = blocking_stage.expand_pair_groups(
            paired, plan, id_col, side=None,
            dropped=set(bcount.notes.get("dropped_block_keys", [])),
        )
        n_part = config.execution.pair_shuffle_partitions or _scan_partitions()
        sorted_cells = sort_by_key(expanded, "pg_key", n_part)

        hist_fn, hist_empty = _make_hist_fn(specs_ref, id_col, False, n_bins)
        hp = sorted_group_scan(
            sorted_cells, "pg_key", hist_fn, hist_empty, n_part, presorted=True
        ).to_pandas()
        if "pattern_key" not in hp.columns:
            hp = pd.DataFrame({"pattern_key": pd.Series([], dtype="int64"),
                               "cnt": pd.Series([], dtype="int64")})
        hist = hp.groupby("pattern_key", as_index=False)["cnt"].sum()

        def run_pass2(matched_ref):
            match_fn, match_empty = _make_match_fn(
                specs_ref, matched_ref, id_col, ("id_a", "id_b"), False
            )
            return sorted_group_scan(
                sorted_cells, "pg_key", match_fn, match_empty, n_part,
                presorted=True,
            )

    counters["scored_pairs"] = float(hist["cnt"].sum())

    from ..stages.patterns import merge_histograms, sample_residual_histogram

    residual = total_comparisons - float(hist["cnt"].sum())
    counters["residual_pairs"] = residual
    if residual > 0:
        res_hist = sample_residual_histogram(
            sample, sample, leaf_vars, residual, seed=seed + 1
        )
        hist = merge_histograms(hist, res_hist)
        counters["residual_mode"] = "sampled"
    else:
        counters["residual_mode"] = "none"
    root_em, child_ems, leaf = fit_patterns(hist, config, seed=seed)

    t = root_em.threshold_match
    w_bound = (
        leaf["weights_raw"] if "weights_raw" in leaf.columns else leaf["weights"]
    )
    matched = leaf[(leaf["zeta_j"] >= t) & (w_bound <= root_em.u_b)]
    mkeys = matched["pattern_key"].to_numpy(np.int64)
    order = np.argsort(mkeys)
    matched_ref = ray.put(
        (
            mkeys[order],
            matched["zeta_j"].to_numpy(np.float64)[order],
            matched["weights"].to_numpy(np.float64)[order],
        )
    )
    matches = run_pass2(matched_ref)
    matches = _attach_gammas(matches, [v.name for v in leaf_vars]).materialize()
    counters["matched_pairs"] = matches.count()

    tf_matches = None
    if tf_vars:
        from ..stages.tf import apply_tf_adjustment

        tf_matches = apply_tf_adjustment(
            matches, root_em, leaf, leaf_vars, tf_vars
        )

    clusters = None
    if cluster:
        nodes = ds.select_columns([id_col]).map_batches(
            lambda b: b.rename_columns(["node"]), batch_format="pyarrow"
        )
        clusters = connected_components(
            matches,
            nodes,
            node_col="node",
            src_col="id_a",
            dst_col="id_b",
            local_threshold=config.execution.cc_local_threshold,
            num_partitions=config.execution.cc_num_partitions,
        )

    return LinkResult(
        em=root_em,
        child_ems=child_ems,
        leaf_patterns=leaf,
        matches=matches,
        scored_pairs=None,
        clusters=clusters,
        tf_matches=tf_matches,
        counters=counters,
    )
