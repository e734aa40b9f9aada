"""Agreement-pattern packing and the distributed pattern histogram.

The reference collapses K dense 2-bit matrices into a histogram of unique
gamma vectors with per-pattern pair-index lists
(/root/reference/src/patterns.jl:62-89, matchPatterns.jl:9-31).  Here each
scored pair carries its whole gamma vector packed into one uint64
``pattern_key`` (2 bits per variable), so the histogram is a plain distributed
aggregation:

    map_batches(partial value_counts)  ->  groupby(pattern_key).sum(cnt)

The per-batch partial count is the combiner that keeps the shuffle tiny — at
most ``4^K`` distinct keys leave each block regardless of pair count (the
"per-partition sufficient statistics" the north star calls for).  Pairs keep
their ``pattern_key`` column, so the reference's per-pattern index lists need
no materialization: selecting a pattern's pairs is a filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..constants import BITS_PER_VAR, MISSING

__all__ = [
    "pack_gammas",
    "unpack_patterns",
    "pattern_histogram",
    "add_residual_pattern",
]


def pack_gammas(gamma_cols: list[np.ndarray]) -> np.ndarray:
    """Pack K uint8 gamma columns (values 0..3) into one uint64 key.

    Variable k occupies bits [2k, 2k+2), preserving declared variable order.
    """
    out = np.zeros(len(gamma_cols[0]) if gamma_cols else 0, dtype=np.uint64)
    for k, g in enumerate(gamma_cols):
        out |= np.asarray(g, dtype=np.uint64) << np.uint64(BITS_PER_VAR * k)
    # int64 view (bit pattern preserved): Ray groupby/sort paths cannot carry
    # uint64 values above 2**63-1
    return out.view(np.int64)


def unpack_patterns(keys: np.ndarray, n_vars: int) -> np.ndarray:
    """Unpack uint64 pattern keys into a (P, K) uint8 gamma matrix."""
    keys = np.asarray(keys, dtype=np.int64).view(np.uint64)
    out = np.empty((len(keys), n_vars), dtype=np.uint8)
    for k in range(n_vars):
        out[:, k] = (keys >> np.uint64(BITS_PER_VAR * k)) & np.uint64(3)
    return out


def all_missing_key(n_vars: int) -> int:
    key = 0
    for k in range(n_vars):
        key |= MISSING << (BITS_PER_VAR * k)
    return key


def _partial_counts(batch: pa.Table) -> pa.Table:
    keys = batch.column("pattern_key").to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(keys, return_counts=True)
    return pa.table(
        {"pattern_key": uniq.astype(np.int64), "cnt": counts.astype(np.int64)}
    )


def pattern_histogram(pairs: ray.data.Dataset) -> pd.DataFrame:
    """Histogram of ``pattern_key`` over a scored-pair Dataset.

    Returns a small driver-side DataFrame ``(pattern_key, cnt)`` sorted by
    key for canonical ordering (the reference's pattern order is
    thread-nondeterministic, patterns.jl:76-86; we canonicalize instead, per
    SURVEY.md §4 "Ordering assumptions").
    """
    partial = pairs.map_batches(_partial_counts, batch_format="pyarrow")
    # per-block partials are (n_blocks x n_patterns) rows — tiny at any input
    # scale — so the final merge happens on the driver, skipping a whole
    # distributed aggregate round
    df = partial.to_pandas()
    if df.empty and "pattern_key" not in df.columns:
        # a zero-pair run (e.g. all-singleton blocking) materializes as a
        # schema-less empty frame; give it the histogram's columns
        df = pd.DataFrame({"pattern_key": [], "cnt": []})
    df = df.groupby("pattern_key", as_index=False)["cnt"].sum()
    df["pattern_key"] = df["pattern_key"].astype(np.int64)
    df["cnt"] = df["cnt"].astype(np.int64)
    return df.sort_values("pattern_key", ignore_index=True)


def sample_residual_histogram(
    records_a,
    records_b,
    variables,
    total_residual: float,
    sample_size: int = 400,
    seed: int = 99,
    block_col: str = "block_key",
) -> pd.DataFrame:
    """Estimate the agreement-pattern distribution of blocking-PRUNED pairs.

    Crediting every unblocked pair to the all-NONMATCH pattern (see
    :func:`add_residual_pattern`) distorts the per-variable u-probabilities:
    real cross-block pairs still agree by chance on individual fields (same
    tool signature, similar text), and under tight blocking the EM then has
    no u-mass to explain within-block chance agreements, pushing them into
    the match class.  The standard remedy (random-pair u-estimation, as in
    the fastLink literature) is to score a deterministic random sample of
    cross-block pairs and scale its empirical pattern distribution to the
    residual count.

    ``records_a`` / ``records_b``: driver-side pandas samples (pass the same
    frame twice for dedupe).  Returns a histogram ``(pattern_key, cnt)`` with
    float counts summing to ``total_residual``.
    """
    from .scoring import PairScorer  # local import to avoid cycle

    rng = np.random.default_rng(seed)
    self_mode = records_a is records_b
    # canonicalize row order: the pair draw below is POSITIONAL, and the
    # caller's to_pandas() order depends on block arrival — a resumed or
    # re-parallelized run must draw the identical pairs from the identical
    # sample set (bench --resume-proof pins this)
    a = records_a.sort_values(
        list(records_a.columns), kind="stable", na_position="last"
    ).reset_index(drop=True)
    b = (
        a
        if self_mode
        else records_b.sort_values(
            list(records_b.columns), kind="stable", na_position="last"
        ).reset_index(drop=True)
    )
    # bounded random pair draw (not the full sample cross product): the
    # residual distribution only needs O(10^4) samples to pin down the
    # u-marginals, independent of corpus size
    n_pairs = sample_size * 25
    ia = rng.integers(0, len(a), size=n_pairs)
    ib = rng.integers(0, len(b), size=n_pairs)
    mask = ia != ib if self_mode else np.ones(n_pairs, dtype=bool)
    # keep only cross-block pairs — within-block pairs are already counted
    if block_col in a.columns and block_col in b.columns:
        mask &= a[block_col].to_numpy()[ia] != b[block_col].to_numpy()[ib]
    ia, ib = ia[mask], ib[mask]
    if len(ia) == 0 or total_residual <= 0:
        return pd.DataFrame(
            {
                "pattern_key": np.array([0], dtype=np.int64),
                "cnt": np.array([float(max(total_residual, 0))]),
            }
        )
    scorer = PairScorer(list(variables))
    key_chunks = []
    # chunked so the batched token-DP works on bounded arrays
    for lo in range(0, len(ia), 8192):
        sl = slice(lo, lo + 8192)
        cols = {}
        for v in variables:
            cols[f"{v.name}_a"] = a[v.name].to_numpy()[ia[sl]]
            cols[f"{v.name}_b"] = b[v.name].to_numpy()[ib[sl]]
        cols["id_a"] = ia[sl]
        cols["id_b"] = ib[sl]
        table = pa.table(
            {
                k: pa.array(list(val)) if val.dtype == object else pa.array(val)
                for k, val in cols.items()
            }
        )
        scored = scorer(table)
        key_chunks.append(
            scored.column("pattern_key").to_numpy(zero_copy_only=False)
        )
    keys = np.concatenate(key_chunks)
    uniq, counts = np.unique(keys, return_counts=True)
    freq = counts / counts.sum()
    return pd.DataFrame(
        {
            "pattern_key": uniq.astype(np.int64),
            "cnt": freq * float(total_residual),
        }
    )


def merge_histograms(*hists: pd.DataFrame) -> pd.DataFrame:
    """Sum (pattern_key, cnt) histograms (float-count safe)."""
    df = pd.concat(hists, ignore_index=True)
    out = df.groupby("pattern_key", as_index=False)["cnt"].sum()
    out["pattern_key"] = out["pattern_key"].astype(np.int64)
    return out.sort_values("pattern_key", ignore_index=True)


def add_residual_pattern(
    hist: pd.DataFrame, total_comparisons: int
) -> pd.DataFrame:
    """Fold blocking-pruned pairs into the all-NONMATCH pattern.

    The reference EM sees every one of the N_A*N_B comparisons
    (emlink.jl:174) and its test asserts ``sum(counts) == N_A*N_B``
    (runtests.jl:75).  Blocking hides the (overwhelmingly non-matching)
    unblocked pairs, so their count is credited to pattern key 0 — the
    all-gammas-NONMATCH pattern — preserving the p_m / p_u scale.  This is
    the semantic bridge between the reference's cross product and the blocked
    rebuild (SURVEY.md §7 "Residual-pattern accounting under blocking").
    """
    scored = int(hist["cnt"].sum())
    residual = total_comparisons - scored
    if residual < 0:
        raise ValueError(
            f"scored pairs ({scored}) exceed total comparisons "
            f"({total_comparisons}); duplicate candidate pairs upstream?"
        )
    if residual == 0:
        return hist
    out = hist.copy()
    zero = out["pattern_key"] == 0
    if zero.any():
        out.loc[zero, "cnt"] += residual
    else:
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "pattern_key": np.array([0], dtype=np.int64),
                        "cnt": np.array([residual], dtype=np.int64),
                    }
                ),
                out,
            ],
            ignore_index=True,
        ).sort_values("pattern_key", ignore_index=True)
    return out
