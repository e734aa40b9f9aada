"""Vectorized gamma (agreement-level) kernels over candidate-pair batches.

The reference computes gammas over the full N_A x N_B cross product into dense
2-bit matrices (/root/reference/src/gammas/*.jl).  Here each kernel consumes two
parallel arrays — the left/right values of already-generated candidate pairs —
and returns a uint8 gamma vector, one code per pair (see
:mod:`raylink.constants` for the level semantics).  Pairs pruned by blocking
are accounted as the all-NONMATCH pattern downstream
(:func:`raylink.stages.patterns.add_residual_pattern`).

Semantics preserved from the reference:

- similarity is rounded to 4 decimal digits *before* threshold comparison
  (gammaCKpar.jl:103), so cut-boundary ties behave identically;
- string/exact kernels: gamma=MISSING when either side is null
  (gammaKpar.jl:99-127);
- numeric: ``partial=True`` uses ``|d| <= cut`` (gammaNUMCKpar.jl:9-24
  ``get_diff2``; the sort-merge sweep guarantees y>=x there, so y-x == |d|),
  while ``partial=False`` uses the strict ``|d| < cut_a`` of ``get_diff1`` —
  an inconsistency in the reference that we keep for parity;
- string ``partial=False`` only awards MATCH2 at >= cut_a (``score_value``,
  gammaCKpar.jl:16-24).
"""

from __future__ import annotations

import numpy as np

from ..constants import MATCH1, MATCH2, MISSING, NONMATCH
from .strdist import similarity_pairs, token_levenshtein_matrix

__all__ = [
    "gamma_exact",
    "gamma_string",
    "gamma_numeric",
    "gamma_token_levenshtein",
    "gamma_from_similarity",
]


def _null_mask(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == object:
        return np.array(
            [
                v is None or (isinstance(v, float) and np.isnan(v))
                for v in arr
            ],
            dtype=bool,
        )
    if np.issubdtype(arr.dtype, np.floating):
        return np.isnan(arr)
    return np.zeros(len(arr), dtype=bool)


def gamma_exact(a, b) -> np.ndarray:
    """Exact agreement: MATCH2 iff equal, MISSING on nulls, else NONMATCH.

    Mirrors ``gammaKpar!`` (gammaKpar.jl:60-130); also serves the reference's
    ``bool`` method (fastlink.jl:97 routes bool to the exact kernel).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    miss = _null_mask(a) | _null_mask(b)
    out = np.full(len(a), NONMATCH, dtype=np.uint8)
    if a.dtype == object or b.dtype == object:
        # factorize over the concatenated values (C speed), then compare
        # int codes — no per-row Python equality loop
        import pandas as pd

        codes, _ = pd.factorize(np.concatenate([a, b]), use_na_sentinel=True)
        n = len(a)
        eq = codes[:n] == codes[n:]
    else:
        eq = a == b
    out[np.asarray(eq, dtype=bool) & ~miss] = MATCH2
    out[miss] = MISSING
    return out


def gamma_from_similarity(
    sims: np.ndarray,
    cut_a: float = 0.92,
    cut_b: float = 0.88,
    partial: bool = True,
) -> np.ndarray:
    """Threshold rounded similarities into gamma codes (NaN -> MISSING)."""
    sims = np.round(np.asarray(sims, dtype=np.float64), 4)
    out = np.full(len(sims), NONMATCH, dtype=np.uint8)
    miss = np.isnan(sims)
    with np.errstate(invalid="ignore"):
        if partial:
            out[sims >= cut_b] = MATCH1
        out[sims >= cut_a] = MATCH2
    out[miss] = MISSING
    return out


def gamma_string(
    a,
    b,
    method: str = "jw",
    cut_a: float = 0.92,
    cut_b: float = 0.88,
    partial: bool = True,
    w: float = 0.1,
    cache: dict | None = None,
) -> np.ndarray:
    """String-distance agreement (``gammaCKpar!``/``gammaCKfuzzy!`` semantics).

    The reference's bit-parallel ``gammaCKfuzzy!`` is a performance
    specialization of Jaro-Winkler with identical logical output modulo
    its 16-codeunit truncation — available here as the opt-in per-variable
    ``fuzzy_truncate`` flag, applied by the row scorer
    (stages/scoring.py) and the pooled engine (pipelines/pooled.py), not
    by this kernel; one scorer suffices.  See SURVEY.md §2.3.
    """
    sims = similarity_pairs(
        np.asarray(a, dtype=object),
        np.asarray(b, dtype=object),
        method=method,
        w=w,
        cache=cache,
    )
    return gamma_from_similarity(sims, cut_a=cut_a, cut_b=cut_b, partial=partial)


def gamma_numeric(
    a,
    b,
    cut_a: float = 1,
    cut_b: float = 2,
    partial: bool = True,
) -> np.ndarray:
    """Numeric band agreement (``gammaNUMCKpar!`` semantics, per-pair form)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    miss = np.isnan(a) | np.isnan(b)
    d = np.abs(b - a)
    out = np.full(len(a), NONMATCH, dtype=np.uint8)
    with np.errstate(invalid="ignore"):
        if partial:
            out[d <= cut_b] = MATCH1
            out[d <= cut_a] = MATCH2
        else:
            out[d < cut_a] = MATCH2
    out[miss] = MISSING
    return out


def gamma_token_levenshtein(
    seqs_a,
    seqs_b,
    cut_a: float = 0.92,
    cut_b: float = 0.88,
    partial: bool = True,
) -> np.ndarray:
    """Token-level Levenshtein agreement over token-id sequences.

    Accepts per-pair sequences as int arrays/lists OR packed little-endian
    int64 ``bytes`` blobs (the assemble stage's ``tok_blob``).  Null
    sequences (None) yield MISSING; empty sequences participate normally
    (two empties are identical -> similarity 1.0).
    """

    def to_seq(x):
        if isinstance(x, (bytes, bytearray, memoryview)):
            return np.frombuffer(x, dtype=np.int64)
        return np.asarray(x, dtype=np.int64)

    n = len(seqs_a)
    miss = np.zeros(n, dtype=bool)
    clean_a, clean_b = [], []
    empty = np.empty(0, dtype=np.int64)
    for i in range(n):
        sa, sb = seqs_a[i], seqs_b[i]
        if sa is None or sb is None:
            miss[i] = True
            clean_a.append(empty)
            clean_b.append(empty)
        else:
            clean_a.append(to_seq(sa))
            clean_b.append(to_seq(sb))
    # skip margin below the lower cut: values there are NONMATCH regardless
    # (0.001 guard keeps the round-to-4-digits threshold semantics exact)
    sims = token_levenshtein_matrix(
        clean_a, clean_b, skip_below=max(cut_b - 0.001, 0) if partial else max(cut_a - 0.001, 0)
    )
    sims[miss] = np.nan
    return gamma_from_similarity(sims, cut_a=cut_a, cut_b=cut_b, partial=partial)
