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
    "monge_elkan",
    "monge_elkan_batch",
    "similarity",
    "similarity_pairs",
    "token_levenshtein_matrix",
    "encode_strings",
    "jaro_winkler_encoded",
]

#: Method-name alias table: the reference's entries verbatim
#: (/root/reference/src/FastLink.jl:11-30) plus the beyond-reference
#: "me" (Monge-Elkan) family.
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
    # beyond-reference token-level hybrid (Monge-Elkan, JW inner)
    "me": "me",
    "mongeelkan": "me",
    "monge elkan": "me",
    "monge-elkan": "me",
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


def ratcliff_obershelp_batch(
    strs_a: list[str], strs_b: list[str], w: float | None = None
) -> np.ndarray:
    """Ratcliff-Obershelp across pairs, exact vs :func:`ratcliff_obershelp`.

    The gestalt recursion is data-dependent per pair, so there is no
    lockstep-numpy form; the batch win here is amortizing difflib's b2j
    index build — pairs are grouped by their right-hand string and scored
    through ONE ``SequenceMatcher`` whose ``set_seq2`` (the expensive side:
    difflib indexes seq2 into a char→positions dict) is set once per unique
    b.  In the pooled/linkage workloads one b value meets many a values, so
    this removes the dominant constant.  ``w`` accepted/ignored for the
    `_BATCH_METHODS` signature.
    """
    n = len(strs_a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    arr_a = np.asarray(strs_a, dtype=object)
    arr_b = np.asarray(strs_b, dtype=object)
    equal = arr_a == arr_b
    out[equal] = 1.0
    len_a = np.fromiter((len(s) for s in strs_a), np.int64, n)
    len_b = np.fromiter((len(s) for s in strs_b), np.int64, n)
    todo = np.flatnonzero(~equal & (len_a > 0) & (len_b > 0))
    if todo.size == 0:
        return out
    order = todo[np.argsort(arr_b[todo], kind="stable")]
    sm = SequenceMatcher(None, autojunk=False)
    prev_b: str | None = None
    for i in order:
        b = strs_b[i]
        if b != prev_b:
            sm.set_seq2(b)
            prev_b = b
        sm.set_seq1(strs_a[i])
        out[i] = sm.ratio()
    return out


def char_jaccard(s1: str, s2: str) -> float:
    """Jaccard similarity of the character *sets* (DuckDB ``jaccard()``)."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def monge_elkan(s1: str, s2: str, p: float = 0.1) -> float:
    """Symmetrized Monge-Elkan token-set similarity with a Jaro-Winkler
    inner metric — the classic hybrid metric for multi-token fields
    (full names, addresses) where token ORDER should not matter but
    per-token typos should ("maria garcia lopez" vs "garcia lopez,
    maria").  Beyond-reference: fastLink's seven methods are all
    char-level (gammaCKpar.jl:60 dispatches jw/jaro/lv/dl/osa/hamming);
    this adds the token level the ER literature pairs them with.

    ``me(A,B) = mean_a max_b jw(a,b)`` symmetrized as the mean of both
    directions (textbook ME is asymmetric; the symmetric form is the
    linkage-friendly one).  Both sides tokenless -> 1.0; exactly one ->
    0.0.
    """
    ta, tb = s1.split(), s2.split()
    if not ta and not tb:
        return 1.0
    if not ta or not tb:
        return 0.0
    ab = sum(max(jaro_winkler(a, b, p=p) for b in tb) for a in ta) / len(ta)
    ba = sum(max(jaro_winkler(b, a, p=p) for a in ta) for b in tb) / len(tb)
    return (ab + ba) / 2.0


def monge_elkan_batch(
    strs_a: list[str], strs_b: list[str], p: float = 0.1
) -> np.ndarray:
    """Vectorized :func:`monge_elkan` over aligned string lists (the
    `_BATCH_METHODS` signature): every pair's token cross product is
    flattened into ONE ``jaro_winkler_batch`` call, then both
    directions' max-mean reductions run as segmented ``reduceat``
    passes — per-token-pair Python never happens; the second direction
    reuses the same similarity values through one lexsort (JW is
    symmetric)."""
    n = len(strs_a)
    out = np.empty(n, dtype=np.float64)
    toks_a = [s.split() for s in strs_a]
    toks_b = [s.split() for s in strs_b]
    na = np.asarray([len(t) for t in toks_a], dtype=np.int64)
    nb = np.asarray([len(t) for t in toks_b], dtype=np.int64)
    both_empty = (na == 0) & (nb == 0)
    one_empty = ((na == 0) | (nb == 0)) & ~both_empty
    out[both_empty] = 1.0
    out[one_empty] = 0.0
    live = np.flatnonzero(~(both_empty | one_empty))
    if len(live) == 0:
        return out
    la = na[live]
    lb = nb[live]
    cross = la * lb
    # flat token-pair expansion: pair-major, a-token-major, b-token minor
    flat_a: list[str] = []
    flat_b: list[str] = []
    for i in live:
        tb = toks_b[i]
        for a in toks_a[i]:
            flat_a.extend([a] * len(tb))
            flat_b.extend(tb)
    sims = jaro_winkler_batch(flat_a, flat_b, p=p)
    # direction A->B: max over each (pair, a-token) run of length lb,
    # then mean over each pair's la maxes
    seg_ab = np.repeat(lb, la)
    starts_ab = np.concatenate(([0], np.cumsum(seg_ab)[:-1]))
    max_ab = np.maximum.reduceat(sims, starts_ab)
    pair_starts_a = np.concatenate(([0], np.cumsum(la)[:-1]))
    me_ab = np.add.reduceat(max_ab, pair_starts_a) / la
    # direction B->A: regroup the SAME sims by (pair, b-token) with one
    # lexsort instead of re-scoring
    pair_id = np.repeat(np.arange(len(live), dtype=np.int64), cross)
    aj = np.repeat(
        np.concatenate([np.arange(k, dtype=np.int64) for k in la]),
        seg_ab,
    )
    bk_parts = [np.tile(np.arange(b, dtype=np.int64), a)
                for a, b in zip(la, lb)]
    bk = np.concatenate(bk_parts)
    order = np.lexsort((aj, bk, pair_id))
    seg_ba = np.repeat(la, lb)
    starts_ba = np.concatenate(([0], np.cumsum(seg_ba)[:-1]))
    max_ba = np.maximum.reduceat(sims[order], starts_ba)
    pair_starts_b = np.concatenate(([0], np.cumsum(lb)[:-1]))
    me_ba = np.add.reduceat(max_ba, pair_starts_b) / lb
    out[live] = (me_ab + me_ba) / 2.0
    return out


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
    if method == "me":
        return monge_elkan(s1, s2, p=w)
    raise ValueError(f"unknown string distance method: {method!r}")


def jaro_winkler_batch(
    strs_a: list[str],
    strs_b: list[str],
    p: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> np.ndarray:
    """Jaro-Winkler vectorized ACROSS pairs (exact match to the scalar fn).

    Runs the greedy match scan as L1 lock-step iterations of (N, L2) numpy
    ops instead of a per-pair Python loop — the same batching trick as
    :func:`token_levenshtein_matrix`.  Cost scales with the padded batch
    shape; intended for the scoring actors' unique-pair batches.
    """
    n = len(strs_a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    len_a = np.array([len(s) for s in strs_a], dtype=np.int64)
    len_b = np.array([len(s) for s in strs_b], dtype=np.int64)
    equal = np.array([x == y for x, y in zip(strs_a, strs_b)], dtype=bool)
    out[equal] = 1.0
    todo = ~equal & (len_a > 0) & (len_b > 0)
    if not todo.any():
        return out
    idx = np.flatnonzero(todo)
    # chunk by length so one long string doesn't inflate the padded (N, L)
    # matrices of the whole batch (same trick as token_levenshtein_matrix;
    # measured ~5x on mixed-length conversation text)
    order = np.argsort(np.maximum(len_a[idx], len_b[idx]), kind="stable")
    idx = idx[order]
    chunk = 1024
    for c0 in range(0, len(idx), chunk):
        cidx = idx[c0 : c0 + chunk]
        out[cidx] = _jw_chunk(
            [strs_a[i] for i in cidx],
            [strs_b[i] for i in cidx],
            len_a[cidx],
            len_b[cidx],
            p,
            boost_threshold,
            max_prefix,
        )
    return out


def encode_strings(strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pad-encode strings into an (N, Lmax) code matrix + length vector.

    1-byte codes when the batch is latin-1 (4x less memory traffic), else
    4-byte.  Pad value 0 never aliases NUL chars: window/length masks keep
    pad cells out of every comparison.
    """
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    lmax = int(lens.max()) if len(lens) else 0
    try:
        M = np.zeros((len(strs), max(lmax, 1)), dtype=np.uint8)
        for r, s in enumerate(strs):
            M[r, : len(s)] = np.frombuffer(s.encode("latin-1"), dtype=np.uint8)
    except UnicodeEncodeError:
        M = np.zeros((len(strs), max(lmax, 1)), dtype=np.uint32)
        for r, s in enumerate(strs):
            M[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return M, lens


def _jw_chunk(
    A_s: list[str],
    B_s: list[str],
    la: np.ndarray,
    lb: np.ndarray,
    p: float,
    boost_threshold: float,
    max_prefix: int,
) -> np.ndarray:
    """Lockstep Jaro-Winkler over one similarly-sized chunk of pairs."""
    A, _ = encode_strings(A_s)
    B, _ = encode_strings(B_s)
    if A.dtype != B.dtype:
        A = A.astype(np.uint32)
        B = B.astype(np.uint32)
    return jaro_winkler_encoded(A, B, la, lb, p, boost_threshold, max_prefix)


def jaro_winkler_encoded(
    A: np.ndarray,
    B: np.ndarray,
    la: np.ndarray,
    lb: np.ndarray,
    p: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
) -> np.ndarray:
    """Lockstep Jaro-Winkler over row-aligned PRE-ENCODED code matrices.

    ``A`` (m, L1) / ``B`` (m, L2) are :func:`encode_strings` outputs (rows
    repeated/tiled by the caller for grid sweeps — see the pooled engine's
    LUT builder, which encodes each value pool once and reuses the code
    matrices for every chunk, eliminating all per-pair Python).
    """
    m_ = len(A)
    l1 = A.shape[1]
    l2 = B.shape[1]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)  # match window
    flags1 = np.zeros((m_, l1), dtype=bool)
    flags2 = np.zeros((m_, l2), dtype=bool)
    cols = np.arange(l2)[None, :]  # (1, L2)
    rows = np.arange(m_)
    for i in range(l1):
        active = i < la
        if not active.any():
            break
        in_window = (cols >= (i - w)[:, None]) & (cols < np.minimum(lb, i + w + 1)[:, None])
        eligible = (B == A[:, i][:, None]) & ~flags2 & in_window
        eligible &= active[:, None]
        found = eligible.any(axis=1)
        j_sel = eligible.argmax(axis=1)  # first eligible column
        flags1[found, i] = True
        flags2[rows[found], j_sel[found]] = True
    m_counts = flags1.sum(axis=1)
    # transpositions: compare matched characters in order
    max_m = int(m_counts.max()) if m_ else 0
    t_half = np.zeros(m_, dtype=np.int64)
    if max_m > 0:
        M1 = np.zeros((m_, max_m), dtype=np.uint32)
        M2 = np.zeros((m_, max_m), dtype=np.uint32)
        r1 = flags1.cumsum(axis=1) - 1
        r2 = flags2.cumsum(axis=1) - 1
        rr1, cc1 = np.nonzero(flags1)
        M1[rr1, r1[rr1, cc1]] = A[rr1, cc1]
        rr2, cc2 = np.nonzero(flags2)
        M2[rr2, r2[rr2, cc2]] = B[rr2, cc2]
        valid = np.arange(max_m)[None, :] < m_counts[:, None]
        t_half = ((M1 != M2) & valid).sum(axis=1) // 2
    jaro_v = np.zeros(m_, dtype=np.float64)
    nz = m_counts > 0
    mc = m_counts[nz].astype(np.float64)
    jaro_v[nz] = (
        mc / la[nz] + mc / lb[nz] + (mc - t_half[nz]) / mc
    ) / 3.0
    # Winkler prefix bonus
    pref_span = min(max_prefix, l1, l2)
    if pref_span > 0:
        pre_eq = A[:, :pref_span] == B[:, :pref_span]
        pre_eq &= np.arange(pref_span)[None, :] < np.minimum(la, lb)[:, None]
        prefix = np.where(
            pre_eq.all(axis=1), pref_span, pre_eq.argmin(axis=1)
        ).astype(np.float64)
    else:
        prefix = np.zeros(m_)
    boost = jaro_v > boost_threshold
    jaro_v[boost] += prefix[boost] * p * (1.0 - jaro_v[boost])
    return jaro_v


#: 16-bit popcount lookup (numpy 1.x has no ``bitwise_count``)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount32(x: np.ndarray) -> np.ndarray:
    return _POP16[x & np.uint32(0xFFFF)] + _POP16[x >> np.uint32(16)]


def char_bitmask(enc: np.ndarray) -> np.ndarray:
    """Per-row uint32 character-presence mask over ``code % 32`` bit slots.

    Collisions (two characters sharing a slot) only INFLATE the
    intersection popcount, so bounds built on these masks stay valid upper
    bounds.  Pad cells (code 0) are excluded.
    """
    n = len(enc)
    mask = np.zeros(n, dtype=np.uint32)
    codes = enc.astype(np.uint32)
    for j in range(enc.shape[1]):
        c = codes[:, j]
        bit = (np.uint32(1) << (c % np.uint32(32))).astype(np.uint32)
        mask |= np.where(c != 0, bit, np.uint32(0))
    return mask


def jaro_winkler_grid(
    enc_a: np.ndarray,
    len_a: np.ndarray,
    mask_a: np.ndarray,
    enc_b: np.ndarray,
    len_b: np.ndarray,
    mask_b: np.ndarray,
    rows: np.ndarray,
    p: float = 0.1,
    boost_threshold: float = 0.7,
    max_prefix: int = 4,
    prune_below: float | None = None,
) -> np.ndarray:
    """Jaro-Winkler for the grid ``rows of A x all of B``, with pruning.

    Inputs are :func:`encode_strings` matrices + :func:`char_bitmask` masks
    for each side (encoded ONCE by the caller, reused across chunks).  A
    vectorized upper bound — common characters can't exceed the char-set
    intersection plus shared repeats, and ``(m-t)/m <= 1`` — prunes cells
    that cannot reach ``prune_below``; only survivors run the full lockstep
    scan.  Every cell whose true similarity could reach ``prune_below`` is
    computed exactly; pruned cells hold a placeholder GUARANTEED below
    ``prune_below`` (it may undercount the Winkler boost, so it is a bound
    for thresholding, not a similarity) — thresholding callers classify
    them correctly without ever computing the true value.

    This is the pooled engine's unique-pair sweep: the same role as the
    reference's bit-parallel ``gammaCKfuzzy!`` scoring of pool value pairs
    (/root/reference/src/gammas/gammaCKfuzzy.jl), achieved with numpy
    bound-pruning instead of per-character bit tricks.
    """
    m = len(rows)
    nb = len(enc_b)
    la = len_a[rows].astype(np.float64)[:, None]  # (m, 1)
    lb = len_b.astype(np.float64)[None, :]  # (1, nb)
    # upper bound on common (matched) characters
    inter = _popcount32(mask_a[rows][:, None] & mask_b[None, :]).astype(
        np.float64
    )
    pop_a = _popcount32(mask_a[rows]).astype(np.float64)[:, None]
    pop_b = _popcount32(mask_b).astype(np.float64)[None, :]
    extra = np.minimum(la - pop_a, lb - pop_b)
    c = np.minimum(inter + extra, np.minimum(la, lb))
    with np.errstate(invalid="ignore", divide="ignore"):
        jaro_bound = (c / la + c / lb + 1.0) / 3.0
    out = np.minimum(jaro_bound, 1.0)
    # zero-length strings: c/la is 0/0 = NaN, which would silently fail
    # every comparison below and leave the cell NaN (-> MISSING gamma),
    # diverging from the row engine's scalar convention ("" == "" -> 1.0,
    # one side empty -> 0.0).  Resolve those cells exactly, up front.
    zero_a = la == 0.0  # (m, 1)
    zero_b = lb == 0.0  # (1, nb)
    either_zero = zero_a | zero_b
    if either_zero.any():
        out = np.where(either_zero, np.where(zero_a & zero_b, 1.0, 0.0), out)
        jaro_bound = np.where(either_zero, -1.0, jaro_bound)  # never rescan
    if prune_below is None:
        todo = ~either_zero if either_zero.any() else np.ones(
            (m, nb), dtype=bool
        )
    else:
        # 5e-5 guard: callers round to 4 digits before thresholding
        cutoff = prune_below - 5e-5
        todo = jaro_bound >= cutoff
        # borderline cells: below the cut on the Jaro bound alone but
        # reachable with the (max_prefix-capped) Winkler boost — compute the
        # exact prefix ONLY there (gathered 1-D, not over the whole grid)
        max_boosted = jaro_bound + max_prefix * p * (1.0 - jaro_bound)
        bi, bj = np.nonzero(
            (~todo) & (jaro_bound > boost_threshold) & (max_boosted >= cutoff)
        )
        if len(bi):
            span = min(max_prefix, enc_a.shape[1], enc_b.shape[1])
            # pad-vs-pad equality may overcount the prefix -> still a bound
            eq = enc_a[rows[bi], :span] == enc_b[bj, :span]  # (k, span)
            prefix = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
            jb = jaro_bound[bi, bj]
            boosted = jb + prefix * p * (1.0 - jb)
            out[bi, bj] = np.minimum(boosted, 1.0)
            keep = boosted >= cutoff
            todo[bi[keep], bj[keep]] = True
    ri, ci = np.nonzero(todo)
    if len(ri):
        A = enc_a[rows[ri]]
        B = enc_b[ci]
        sims = jaro_winkler_encoded(
            A,
            B,
            len_a[rows[ri]],
            len_b[ci],
            p=p,
            boost_threshold=boost_threshold,
            max_prefix=max_prefix,
        )
        out[ri, ci] = sims
    return out


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
    import pandas as pd

    n = len(a)
    out = np.full(n, np.nan, dtype=np.float64)
    if n == 0:
        return out
    # integer factorization of the value pairs (C speed; nulls become -1)
    codes_a, vals_a = pd.factorize(a, use_na_sentinel=True)
    codes_b, vals_b = pd.factorize(b, use_na_sentinel=True)
    valid = (codes_a >= 0) & (codes_b >= 0)
    pair_key = codes_a.astype(np.int64) * np.int64(len(vals_b)) + codes_b
    uniq_keys, inv = np.unique(pair_key[valid], return_inverse=True)
    uniq = [
        (vals_a[k // len(vals_b)], vals_b[k % len(vals_b)]) for k in uniq_keys
    ]
    sims = np.empty(len(uniq), dtype=np.float64)
    batch_fn = _BATCH_METHODS.get(method)
    if batch_fn is not None:
        # batch-vectorized path: score only cache misses, in one numpy pass
        miss_idx = []
        for k, (x, y) in enumerate(uniq):
            if cache is not None:
                s = cache.get((method, x, y))
                if s is not None:
                    sims[k] = s
                    continue
            miss_idx.append(k)
        if miss_idx:
            ua = [uniq[k][0] for k in miss_idx]
            ub = [uniq[k][1] for k in miss_idx]
            vals = batch_fn(ua, ub, w)
            for pos, k in enumerate(miss_idx):
                sims[k] = vals[pos]
                if cache is not None:
                    cache[(method, uniq[k][0], uniq[k][1])] = float(vals[pos])
    elif cache is None:
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


def osa_matrix(
    seqs_a: list[np.ndarray], seqs_b: list[np.ndarray]
) -> np.ndarray:
    """Normalized OSA (restricted Damerau-Levenshtein) similarity,
    vectorized across pairs — the :func:`token_levenshtein_matrix` lockstep
    DP plus the adjacent-transposition term (``prev2`` row)."""
    n = len(seqs_a)
    out = np.ones(n, dtype=np.float64)
    if n == 0:
        return out
    len_a = np.array([len(s) for s in seqs_a], dtype=np.int64)
    len_b = np.array([len(s) for s in seqs_b], dtype=np.int64)
    denom = np.maximum(len_a, len_b)
    lo = np.minimum(len_a, len_b)
    nontrivial = denom > 0
    out[nontrivial & (lo == 0)] = 0.0
    run = nontrivial & (lo > 0)
    if not run.any():
        return out
    ridx = np.flatnonzero(run)
    order = np.argsort(denom[ridx], kind="stable")
    ridx = ridx[order]
    for c0 in range(0, len(ridx), 512):
        cidx = ridx[c0 : c0 + 512]
        _osa_chunk(seqs_a, seqs_b, cidx, len_a, len_b, denom, out)
    return out


def _osa_chunk(
    seqs_a: list[np.ndarray],
    seqs_b: list[np.ndarray],
    ridx: np.ndarray,
    len_a: np.ndarray,
    len_b: np.ndarray,
    denom: np.ndarray,
    out: np.ndarray,
) -> None:
    """Lockstep OSA DP over one similarly-sized chunk of pairs."""
    la = len_a[ridx]
    lb = len_b[ridx]
    m = len(ridx)
    ta = int(la.max())
    tb = int(lb.max())
    A = np.full((m, ta), -1, dtype=np.int32)
    B = np.full((m, tb), -2, dtype=np.int32)
    for r, i in enumerate(ridx):
        s = seqs_a[i]
        A[r, : len(s)] = s
        s = seqs_b[i]
        B[r, : len(s)] = s
    cell = np.int16 if ta + tb + 1 < 32000 else np.int32
    big = cell(ta + tb + 1)
    col_idx = np.arange(tb + 1, dtype=cell)[None, :]
    prev = np.where(col_idx <= lb[:, None], col_idx, big).astype(cell)
    prev2 = None
    arange_row = col_idx[0]
    one = cell(1)
    for r in range(1, ta + 1):
        active = r <= la
        sub_cost = (A[:, r - 1][:, None] != B).astype(cell)
        cand = np.minimum(prev[:, :-1] + sub_cost, prev[:, 1:] + one)  # (N, Tb)
        if r >= 2 and tb >= 2:
            # transposition: a[r-1]==b[j-2] and a[r-2]==b[j-1] -> prev2[j-2]+1
            tr_ok = (A[:, r - 1][:, None] == B[:, :-1]) & (
                A[:, r - 2][:, None] == B[:, 1:]
            )  # (N, Tb-1), covers j=2..Tb
            tr_val = np.where(tr_ok, prev2[:, :-2] + one, big)
            cand[:, 1:] = np.minimum(cand[:, 1:], tr_val)
        first = np.full((m, 1), r, dtype=cell)
        cand = np.concatenate([first, cand], axis=1)  # (N, Tb+1)
        shifted = cand - arange_row[None, :]
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        cur = shifted + arange_row[None, :]
        cur = np.where(active[:, None], cur, prev)
        prev2 = prev
        prev = cur
    dist = prev[np.arange(m), lb].astype(np.float64)
    out[ridx] = 1.0 - dist / denom[ridx]


def hamming_batch(strs_a: list[str], strs_b: list[str]) -> np.ndarray:
    """Normalized Hamming similarity vectorized across pairs (length
    difference contributes, matching :func:`hamming`)."""
    n = len(strs_a)
    out = np.ones(n, dtype=np.float64)
    if n == 0:
        return out
    M1, l1 = encode_strings(strs_a)
    M2, l2 = encode_strings(strs_b)
    w = min(M1.shape[1], M2.shape[1])
    # latin-1 byte values equal Unicode code points below 256, so a uint8
    # matrix compares correctly against a uint32 one
    valid = np.arange(w)[None, :] < np.minimum(l1, l2)[:, None]
    diff = ((M1[:, :w].astype(np.uint32) != M2[:, :w].astype(np.uint32)) & valid).sum(
        axis=1
    ) + np.abs(l1 - l2)
    denom = np.maximum(np.maximum(l1, l2), 1)
    both_empty = (l1 == 0) & (l2 == 0)
    out = 1.0 - diff / denom
    out[both_empty] = 1.0
    return out


def dl_matrix(
    seqs_a: list[np.ndarray], seqs_b: list[np.ndarray]
) -> np.ndarray:
    """Normalized unrestricted Damerau-Levenshtein similarity, vectorized
    across pairs.

    Unlike ``lv``/``osa`` the recurrence reaches arbitrarily far back
    (``d[k][l]`` with the alphabet last-occurrence table), so each chunk
    keeps the FULL DP history plus a per-chunk symbol-coded last-row table
    and resolves the transposition term with one 2-D gather per row.
    Chunks are sized so the history stays within a fixed cell budget.
    """
    n = len(seqs_a)
    out = np.ones(n, dtype=np.float64)
    if n == 0:
        return out
    len_a = np.array([len(s) for s in seqs_a], dtype=np.int64)
    len_b = np.array([len(s) for s in seqs_b], dtype=np.int64)
    denom = np.maximum(len_a, len_b)
    lo = np.minimum(len_a, len_b)
    nontrivial = denom > 0
    out[nontrivial & (lo == 0)] = 0.0
    run = nontrivial & (lo > 0)
    if not run.any():
        return out
    ridx = np.flatnonzero(run)
    order = np.argsort(denom[ridx], kind="stable")
    ridx = ridx[order]
    cell_budget = 8_000_000  # ~32 MB of int32 history per chunk
    start = 0
    while start < len(ridx):
        ta = tb = 1
        end = start
        while end < len(ridx):
            i = ridx[end]
            nta = max(ta, int(len_a[i]))
            ntb = max(tb, int(len_b[i]))
            if (end - start + 1) * (nta + 2) * (ntb + 2) > cell_budget and (
                end > start
            ):
                break
            ta, tb = nta, ntb
            end += 1
        _dl_chunk(seqs_a, seqs_b, ridx[start:end], len_a, len_b, denom, out)
        start = end
    return out


def _dl_chunk(
    seqs_a: list[np.ndarray],
    seqs_b: list[np.ndarray],
    ridx: np.ndarray,
    len_a: np.ndarray,
    len_b: np.ndarray,
    denom: np.ndarray,
    out: np.ndarray,
) -> None:
    """Full-history DL DP over one chunk (layout: D[r, i, j] = scalar
    ``d[i][j]`` of :func:`damerau_levenshtein`, cell (ci, cj) at
    ``d[ci+1][cj+1]``)."""
    la = len_a[ridx].astype(np.int64)
    lb = len_b[ridx].astype(np.int64)
    m = len(ridx)
    ta = int(la.max())
    tb = int(lb.max())
    # per-chunk joint symbol codes; distinct pad codes so pads never match
    chunk_syms = np.concatenate(
        [seqs_a[i] for i in ridx] + [seqs_b[i] for i in ridx]
    )
    uniq = np.unique(chunk_syms)
    S = len(uniq)
    A = np.full((m, ta), S, dtype=np.int64)
    B = np.full((m, tb), S + 1, dtype=np.int64)
    for r, i in enumerate(ridx):
        A[r, : len(seqs_a[i])] = np.searchsorted(uniq, seqs_a[i])
        B[r, : len(seqs_b[i])] = np.searchsorted(uniq, seqs_b[i])
    big = np.int32(ta + tb + 1)
    D = np.full((m, ta + 2, tb + 2), big, dtype=np.int32)
    D[:, 1, 1:] = np.arange(tb + 1, dtype=np.int32)[None, :]
    lastrow = np.zeros((m, S + 2), dtype=np.int32)
    rows = np.arange(m)
    col1 = np.arange(1, tb + 1, dtype=np.int32)[None, :]
    arange_t = np.arange(tb + 1, dtype=np.int32)
    one = np.int32(1)
    for i in range(1, ta + 1):
        prev = D[:, i, :]
        match = A[:, i - 1][:, None] == B  # (m, tb)
        # l = db: last matching column strictly before j (0 if none)
        pos = np.where(match, col1, np.int32(0))
        lvec = np.maximum.accumulate(pos, axis=1)
        lvec = np.concatenate(
            [np.zeros((m, 1), dtype=np.int32), lvec[:, :-1]], axis=1
        )
        # k = da[s2[j-1]]: last row with that symbol, before this row's update
        kvec = lastrow[rows[:, None], B]
        dkl = D[rows[:, None], kvec, lvec]
        trans = dkl + (np.int32(i) - kvec - one) + (col1 - lvec - one) + one
        cost = (~match).astype(np.int32)
        cand = np.minimum(prev[:, 1 : tb + 1] + cost, prev[:, 2 : tb + 2] + one)
        cand = np.minimum(cand, trans)
        # left-insertion closure via the shifted prefix-min trick
        vals = np.concatenate(
            [np.full((m, 1), i, dtype=np.int32), cand], axis=1
        )
        shifted = vals - arange_t[None, :]
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        D[:, i + 1, 1:] = shifted + arange_t[None, :]
        lastrow[rows, A[:, i - 1]] = i
    dist = D[rows, la + 1, lb + 1].astype(np.float64)
    out[ridx] = 1.0 - dist / denom[ridx]


def _enc_chars(s: str) -> np.ndarray:
    """Unicode code points as an int32 vector (chars as 1-char tokens)."""
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int32
    )


# Methods with an across-pairs vectorized kernel; each takes (strs_a,
# strs_b, w) so long fields never fall back to the per-pair Python DP.
# `lv` runs char-level Levenshtein through the SAME lockstep DP as the
# token comparator; `osa` adds the transposition row to it.
_BATCH_METHODS = {
    "jw": lambda ua, ub, w: jaro_winkler_batch(ua, ub, p=w),
    "lv": lambda ua, ub, w: token_levenshtein_matrix(
        [_enc_chars(s) for s in ua], [_enc_chars(s) for s in ub]
    ),
    "osa": lambda ua, ub, w: osa_matrix(
        [_enc_chars(s) for s in ua], [_enc_chars(s) for s in ub]
    ),
    "dl": lambda ua, ub, w: dl_matrix(
        [_enc_chars(s) for s in ua], [_enc_chars(s) for s in ub]
    ),
    "hamming": lambda ua, ub, w: hamming_batch(ua, ub),
    # exact, grouped-by-b seq2-index reuse (no lockstep form exists for the
    # gestalt recursion) — see ratcliff_obershelp_batch
    "ro": lambda ua, ub, w: ratcliff_obershelp_batch(ua, ub),
    "me": lambda ua, ub, w: monge_elkan_batch(ua, ub, p=w),
}


def token_levenshtein_matrix(
    seqs_a: list[np.ndarray],
    seqs_b: list[np.ndarray],
    skip_below: float | None = None,
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
    lo = np.minimum(len_a, len_b)
    nontrivial = denom > 0
    # prescreen: dist >= max - min, so sim <= min/max; and empty-vs-nonempty
    # resolves without the DP.  low_bound callers (the gamma kernel) round
    # before thresholding, so the exact value max-min is used here.
    with np.errstate(invalid="ignore", divide="ignore"):
        out[nontrivial & (lo == 0)] = 0.0
    run = nontrivial & (lo > 0)
    if skip_below is not None:
        bound = np.zeros(n)
        bound[nontrivial] = lo[nontrivial] / denom[nontrivial]
        skipped = run & (bound < skip_below)
        out[skipped] = bound[skipped]  # an upper bound, below every cut
        run &= ~skipped
    if not run.any():
        return out
    ridx = np.flatnonzero(run)
    # bucket pairs by size so each chunk pads to its *own* maxima — without
    # this, one 64-token pair inflates the whole batch's DP area
    order = np.argsort(denom[ridx], kind="stable")
    ridx = ridx[order]
    # 512-pair chunks keep the per-proc DP working set inside shared cache
    # (measured +10% aggregate at 24 procs vs 2048)
    chunk = 512
    for c0 in range(0, len(ridx), chunk):
        cidx = ridx[c0 : c0 + chunk]
        _token_dp_chunk(seqs_a, seqs_b, cidx, len_a, len_b, denom, out)
    return out


def _token_dp_chunk(
    seqs_a: list[np.ndarray],
    seqs_b: list[np.ndarray],
    ridx: np.ndarray,
    len_a: np.ndarray,
    len_b: np.ndarray,
    denom: np.ndarray,
    out: np.ndarray,
) -> None:
    """Lockstep Levenshtein DP over one similarly-sized chunk of pairs."""
    la = len_a[ridx]
    lb = len_b[ridx]
    m = len(ridx)
    ta = int(la.max())
    tb = int(lb.max())
    # pad into (N, T) int32 matrices; pads -1/-2 never match real tokens
    A = np.full((m, ta), -1, dtype=np.int32)
    B = np.full((m, tb), -2, dtype=np.int32)
    for r, i in enumerate(ridx):
        s = seqs_a[i]
        A[r, : len(s)] = s
        s = seqs_b[i]
        B[r, : len(s)] = s
    # int16 cells while distances (bounded by ta+tb+1) fit; int32 for the
    # rare very-long-string chunk (lv char mode has no length cap)
    cell = np.int16 if ta + tb + 1 < 32000 else np.int32
    big = cell(ta + tb + 1)
    # prev[i, j] = D[row, j] with out-of-range (j > len_b) masked to big
    col_idx = np.arange(tb + 1, dtype=cell)[None, :]  # (1, Tb+1)
    prev = np.where(col_idx <= lb[:, None], col_idx, big).astype(cell)
    arange_row = col_idx[0]  # 0..tb
    one = cell(1)
    for r in range(1, ta + 1):
        active = r <= la  # pairs whose row r exists
        sub_cost = (A[:, r - 1][:, None] != B).astype(cell)  # (N, Tb)
        # substitution / deletion candidates (no intra-row dependency)
        cand = np.minimum(prev[:, :-1] + sub_cost, prev[:, 1:] + one)
        # first column of the new row is r (all-insertions)
        first = np.full((m, 1), r, dtype=cell)
        cand = np.concatenate([first, cand], axis=1)  # (N, Tb+1)
        # insertion recurrence cur[j] = min(cand[j], cur[j-1] + 1):
        # prefix-scan via min-accumulate of (cand - j) + j
        shifted = cand - arange_row[None, :]
        np.minimum.accumulate(shifted, axis=1, out=shifted)
        cur = shifted + arange_row[None, :]
        prev = np.where(active[:, None], cur, prev)
    dist = prev[np.arange(m), lb].astype(np.float64)
    out[ridx] = (denom[ridx] - dist) / denom[ridx]
