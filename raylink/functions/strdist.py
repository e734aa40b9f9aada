"""String similarity kernels.

Reimplements, from the published algorithm definitions, the seven distance
methods the reference dispatches on (/root/reference/src/gammas/gammaCKpar.jl:68-82
and the alias table /root/reference/src/FastLink.jl:11-30).  All functions
return a **similarity** in [0, 1] (1 = identical), matching the convention of
the reference's ``compare(...)`` calls ("this always normalizes dist 0 to 1",
gammaCKpar.jl:103).  Callers round to 4 decimal digits before thresholding to
reproduce the reference's cut-boundary behaviour.

Distances over unequal-length strings normalize by ``max(len_a, len_b)``.

The vectorized entry point is :func:`similarity_pairs`, which exploits the
same unique-value economy the reference gets from pooled (dictionary-encoded)
columns: duplicate ``(a, b)`` value pairs in a batch are scored once.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np

__all__ = [
    "METHOD_ALIASES",
    "jaro",
    "jaro_winkler",
    "levenshtein",
    "osa",
    "damerau_levenshtein",
    "hamming",
    "ratcliff_obershelp",
    "char_jaccard",
    "similarity",
    "similarity_pairs",
    "token_levenshtein_matrix",
]

#: Method-name alias table, kept verbatim from the reference
#: (/root/reference/src/FastLink.jl:11-30).
METHOD_ALIASES = {
    "jw": "jw",
    "jarowinkler": "jw",
    "jaro winkler": "jw",
    "jaro-winkler": "jw",
    "jaro": "jaro",
    "dl": "dl",
    "dameraulevenshtein": "dl",
    "damerau levenshtein": "dl",
    "damerau-levenshtein": "dl",
    "lv": "lv",
    "levenshtein": "lv",
    "hamming": "hamming",
    "ro": "ro",
    "ratcliffobershelp": "ro",
    "ratcliff obershelp": "ro",
    "ratcliff-obershelp": "ro",
    "osa": "osa",
    "optimal string alignment": "osa",
    "optimalstringalignment": "osa",
}


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity in [0, 1]."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = i - match_window
        hi = i + match_window + 1
        if lo < 0:
            lo = 0
        if hi > len2:
            hi = len2
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched characters in order
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(
    s1: str,
    s2: str,
    p: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> float:
    """Jaro–Winkler similarity: Jaro plus a common-prefix bonus.

    ``p`` is the Winkler weight (the reference's ``w`` parameter,
    gammaCKpar.jl:62 ``JaroWinkler(p=w)``); the prefix bonus applies when the
    Jaro score exceeds ``boost_threshold`` (Winkler's classic 0.7) and the
    shared prefix is capped at ``max_prefix`` characters.
    """
    sim = jaro(s1, s2)
    if sim <= boost_threshold:
        return sim
    prefix = 0
    for c1, c2 in zip(s1, s2):
        if c1 != c2 or prefix >= max_prefix:
            break
        prefix += 1
    return sim + prefix * p * (1.0 - sim)


def levenshtein(s1: str, s2: str) -> int:
    """Plain Levenshtein edit distance (two-row DP)."""
    if s1 == s2:
        return 0
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    if len1 > len2:  # iterate over the shorter row
        s1, s2, len1, len2 = s2, s1, len2, len1
    prev = list(range(len1 + 1))
    for j in range(1, len2 + 1):
        c2 = s2[j - 1]
        cur0 = j
        cur = [cur0]
        append = cur.append
        for i in range(1, len1 + 1):
            cost = prev[i - 1] + (s1[i - 1] != c2)
            dele = prev[i] + 1
            ins = cur0 + 1
            cur0 = cost if cost < dele else dele
            if ins < cur0:
                cur0 = ins
            append(cur0)
        prev = cur
    return prev[-1]


def osa(s1: str, s2: str) -> int:
    """Optimal string alignment (restricted Damerau-Levenshtein) distance."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    prev2: list[int] | None = None
    prev = list(range(len2 + 1))
    for i in range(1, len1 + 1):
        cur = [i] + [0] * len2
        c1 = s1[i - 1]
        for j in range(1, len2 + 1):
            cost = 0 if c1 == s2[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and c1 == s2[j - 2]
                and s1[i - 2] == s2[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[len2]


def damerau_levenshtein(s1: str, s2: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (with alphabet table)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0:
        return len2
    if len2 == 0:
        return len1
    maxdist = len1 + len2
    da: dict[str, int] = {}
    d = [[0] * (len2 + 2) for _ in range(len1 + 2)]
    d[0][0] = maxdist
    for i in range(len1 + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(len2 + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, len1 + 1):
        db = 0
        for j in range(1, len2 + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return d[len1 + 1][len2 + 1]


def hamming(s1: str, s2: str) -> int:
    """Hamming distance; unequal lengths contribute the length difference."""
    d = sum(c1 != c2 for c1, c2 in zip(s1, s2))
    return d + abs(len(s1) - len(s2))


def ratcliff_obershelp(s1: str, s2: str) -> float:
    """Ratcliff-Obershelp (Gestalt) similarity, 2M/(|a|+|b|)."""
    if s1 == s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return SequenceMatcher(None, s1, s2, autojunk=False).ratio()


def char_jaccard(s1: str, s2: str) -> float:
    """Jaccard similarity of the character *sets* (DuckDB ``jaccard()``)."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def similarity(method: str, s1: str, s2: str, w: float = 0.1) -> float:
    """Similarity in [0,1] for a canonical method code (see METHOD_ALIASES)."""
    if method == "jw":
        return jaro_winkler(s1, s2, p=w)
    if method == "jaro":
        return jaro(s1, s2)
    denom = max(len(s1), len(s2))
    if method == "lv":
        return 1.0 - levenshtein(s1, s2) / denom if denom else 1.0
    if method == "dl":
        return 1.0 - damerau_levenshtein(s1, s2) / denom if denom else 1.0
    if method == "osa":
        return 1.0 - osa(s1, s2) / denom if denom else 1.0
    if method == "hamming":
        return 1.0 - hamming(s1, s2) / denom if denom else 1.0
    if method == "ro":
        return ratcliff_obershelp(s1, s2)
    if method == "jaccard":
        return char_jaccard(s1, s2)
    raise ValueError(f"unknown string distance method: {method!r}")


def similarity_pairs(
    a: np.ndarray,
    b: np.ndarray,
    method: str = "jw",
    w: float = 0.1,
    cache: dict | None = None,
) -> np.ndarray:
    """Vectorized similarity over parallel object arrays of strings.

    Scores each *unique* ``(a, b)`` value pair once and broadcasts the result
    — the same unique-value economy the reference gets from pooled columns
    (gammaCKpar.jl:99-106 loops over ``pool`` values, not rows).  ``cache``
    (optional, caller-owned, e.g. per scoring actor) memoizes across batches.
    Null inputs (None/NaN) yield ``np.nan`` similarities; callers map those to
    the MISSING gamma level.
    """
    n = len(a)
    out = np.full(n, np.nan, dtype=np.float64)
    if n == 0:
        return out
    # factorize the value pairs: null-safe keying via sentinel
    keys = np.empty(n, dtype=object)
    valid = np.empty(n, dtype=bool)
    for i in range(n):
        x, y = a[i], b[i]
        if x is None or y is None or (isinstance(x, float) and np.isnan(x)) or (
            isinstance(y, float) and np.isnan(y)
        ):
            valid[i] = False
            keys[i] = None
        else:
            valid[i] = True
            keys[i] = (x, y)
    uniq, inv = np.unique(keys[valid], return_inverse=True)
    sims = np.empty(len(uniq), dtype=np.float64)
    if cache is None:
        for k, (x, y) in enumerate(uniq):
            sims[k] = similarity(method, x, y, w=w)
    else:
        for k, (x, y) in enumerate(uniq):
            ck = (method, x, y)
            s = cache.get(ck)
            if s is None:
                s = similarity(method, x, y, w=w)
                cache[ck] = s
            sims[k] = s
    out[valid] = sims[inv]
    return out


def token_levenshtein_matrix(
    seqs_a: list[np.ndarray],
    seqs_b: list[np.ndarray],
) -> np.ndarray:
    """Normalized token-level Levenshtein similarity, vectorized across pairs.

    ``seqs_a[i]`` / ``seqs_b[i]`` are integer token-id arrays for pair ``i``.
    Returns similarities ``1 - dist / max(len_a, len_b)`` (1.0 when both are
    empty).  The DP runs all pairs in lock-step over (N, Tb) numpy arrays —
    Ta iterations of vectorized ops instead of a per-pair Python DP — so cost
    scales with the padded batch shape, not pair count.  This is the engine
    behind the north star's "token-level Levenshtein over concatenated turn
    text" comparator; cap sequence length upstream (see assemble stage).
    """
    n = len(seqs_a)
    out = np.ones(n, dtype=np.float64)
    if n == 0:
        return out
    len_a = np.array([len(s) for s in seqs_a], dtype=np.int64)
    len_b = np.array([len(s) for s in seqs_b], dtype=np.int64)
    denom = np.maximum(len_a, len_b)
    nontrivial = denom > 0
    if not nontrivial.any():
        return out
    ta = int(len_a.max())
    tb = int(len_b.max())
    # pad into (N, T) matrices; pad token -1 (and -2) never match real tokens
    A = np.full((n, ta), -1, dtype=np.int64)
    B = np.full((n, tb), -2, dtype=np.int64)
    for i, s in enumerate(seqs_a):
        if len(s):
            A[i, : len(s)] = s
    for i, s in enumerate(seqs_b):
        if len(s):
            B[i, : len(s)] = s
    big = ta + tb + 1
    # prev[i, j] = D[row, j] with out-of-range (j > len_b) masked to big
    col_idx = np.arange(tb + 1)[None, :]  # (1, Tb+1)
    prev = np.where(col_idx <= len_b[:, None], col_idx, big).astype(np.int64)
    arange_row = col_idx[0]  # 0..tb
    for r in range(1, ta + 1):
        active = r <= len_a  # pairs whose row r exists
        sub_cost = (A[:, r - 1][:, None] != B).astype(np.int64)  # (N, Tb)
        # substitution / deletion candidates (no intra-row dependency)
        cand = np.minimum(prev[:, :-1] + sub_cost, prev[:, 1:] + 1)
        # first column of the new row is r (all-insertions)
        first = np.full((n, 1), r, dtype=np.int64)
        cand = np.concatenate([first, cand], axis=1)  # (N, Tb+1)
        # insertion recurrence cur[j] = min(cand[j], cur[j-1] + 1):
        # prefix-scan via min-accumulate of (cand - j) + j
        shifted = cand - arange_row[None, :]
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        cur = shifted + arange_row[None, :]
        prev = np.where(active[:, None], cur, prev)
    dist = prev[np.arange(n), len_b]
    out[nontrivial] = (denom[nontrivial] - dist[nontrivial]) / denom[nontrivial]
    return out
