"""Property tests: batch kernels must equal their scalar references
elementwise — including the length-chunked paths and the non-latin-1
encoding fallback."""

import numpy as np
import pytest

from raylink.functions.strdist import (
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein,
    token_levenshtein_matrix,
)

ALPHABETS = [
    "abcdefgh ",                     # latin-1 path
    "abcéü ",              # accented latin-1
    "日本語дa ",    # CJK + cyrillic -> utf-32 fallback
]


def _rand_strings(rng, alphabet, n, max_len):
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, max_len + 1))
        out.append("".join(rng.choice(list(alphabet), ln)))
    return out


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_jw_batch_equals_scalar(alphabet):
    rng = np.random.default_rng(hash(alphabet) % (2**32))
    # mixed lengths straddle several chunks; include identical + empty pairs
    a = _rand_strings(rng, alphabet, 3000, 40)
    b = _rand_strings(rng, alphabet, 3000, 40)
    a[5] = b[5]
    a[6] = ""
    b[7] = ""
    got = jaro_winkler_batch(a, b, p=0.1)
    exp = np.array([jaro_winkler(x, y, p=0.1) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, exp, atol=1e-12)


@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_ro_batch_equals_scalar(alphabet):
    from raylink.functions.strdist import (
        ratcliff_obershelp,
        ratcliff_obershelp_batch,
    )

    rng = np.random.default_rng(hash(("ro", alphabet)) % (2**32))
    a = _rand_strings(rng, alphabet, 1500, 30)
    # repeat b values so the grouped set_seq2 reuse path is exercised
    b_pool = _rand_strings(rng, alphabet, 80, 30)
    b = [b_pool[int(i)] for i in rng.integers(0, len(b_pool), 1500)]
    a[5] = b[5]
    a[6] = ""
    b[7] = ""
    got = ratcliff_obershelp_batch(a, b)
    exp = np.array([ratcliff_obershelp(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, exp, atol=0)


def test_token_lv_matrix_equals_scalar_dp():
    rng = np.random.default_rng(99)
    seqs_a, seqs_b = [], []
    for _ in range(2000):
        la = int(rng.integers(0, 64))
        lb = int(rng.integers(0, 64))
        seqs_a.append(rng.integers(0, 30, la).astype(np.int64))
        seqs_b.append(rng.integers(0, 30, lb).astype(np.int64))
    got = token_levenshtein_matrix(seqs_a, seqs_b)  # no skip: exact everywhere
    for i in (0, 1, 17, 500, 1234, 1999):
        sa = "".join(chr(65 + t) for t in seqs_a[i])
        sb = "".join(chr(65 + t) for t in seqs_b[i])
        denom = max(len(sa), len(sb))
        exp = 1.0 if denom == 0 else (denom - levenshtein(sa, sb)) / denom
        assert got[i] == pytest.approx(exp, abs=1e-12), i


@pytest.mark.parametrize("method", ["osa", "hamming", "lv", "dl"])
@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_batched_methods_equal_scalar(method, alphabet):
    from raylink.functions.strdist import similarity, similarity_pairs

    rng = np.random.default_rng((hash((method, alphabet))) % (2**32))
    a = _rand_strings(rng, alphabet, 800, 24)
    b = _rand_strings(rng, alphabet, 800, 24)
    a += ["", "abc", "", "ab", "abcd"]
    b += ["", "", "xyz", "ba", "acbd"]  # empties + pure transposition
    a_arr = np.array(a, dtype=object)
    b_arr = np.array(b, dtype=object)
    exp = np.array([similarity(method, x, y) for x, y in zip(a, b)])
    got = similarity_pairs(a_arr, b_arr, method=method)
    np.testing.assert_allclose(got, exp, atol=1e-12)
    cache = {}
    similarity_pairs(a_arr, b_arr, method=method, cache=cache)
    got_cached = similarity_pairs(a_arr, b_arr, method=method, cache=cache)
    np.testing.assert_allclose(got_cached, exp, atol=1e-12)
