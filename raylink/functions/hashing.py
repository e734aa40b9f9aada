"""Deterministic, vectorized 64-bit hashing utilities.

Every key in the pipeline (blocking keys, salts, minhash seeds, node labels
for connected components) must hash identically across processes, nodes and
runs — Python's builtin ``hash`` is salted per process, so we standardize on
``pandas.util.hash_array`` (SipHash with a fixed key, C-vectorized) for bulk
column hashing and ``blake2b`` for scalars.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

__all__ = ["hash64_array", "hash64_scalar", "combine_hashes", "stable_row_ids"]


def hash64_array(values, seed: int = 0, hash_key: str | None = None) -> np.ndarray:
    """Stable uint64 hash of an array of strings / numbers (vectorized).

    ``seed`` derives DEPENDENT hash families (used by minhash and
    salting) by mixing a seed-dependent constant into the SipHash
    output: two values whose base hashes collide collide in every seed
    family.  ``hash_key`` (exactly 16 characters) instead re-keys the
    underlying SipHash, giving a genuinely INDEPENDENT family — use it
    where a base-hash collision must not propagate (e.g. the span-
    removal check hash)."""
    arr = np.asarray(values, dtype=object)
    if hash_key is not None:
        h = pd.util.hash_array(arr, categorize=True, hash_key=hash_key)
    else:
        h = pd.util.hash_array(arr, categorize=True)
    if seed:
        with np.errstate(over="ignore"):  # intended modular wraparound
            mix = np.uint64(0x9E3779B97F4A7C15) * np.uint64(seed + 1)
        h = combine_hashes(h, mix)
    return h


def combine_hashes(a, b) -> np.ndarray:
    """Order-dependent mix of two uint64 hash arrays (boost::hash_combine)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return a ^ (
            b
            + np.uint64(0x9E3779B97F4A7C15)
            + (a << np.uint64(6))
            + (a >> np.uint64(2))
        )


def hash64_scalar(value: str, seed: int = 0) -> int:
    """Stable uint64 hash of one string."""
    d = hashlib.blake2b(
        value.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(d, "little")


def stable_row_ids(*columns) -> np.ndarray:
    """Stable uint64 row ids from one or more key columns.

    Plays the role of the reference's caller-side ``hash.(eachrow(df))`` id
    synthesis (/root/reference/test/runtests.jl:20-21) but is deterministic
    across processes.
    """
    h = hash64_array(columns[0])
    for col in columns[1:]:
        h = combine_hashes(h, hash64_array(col))
    return h


def scan_key63(columns) -> np.ndarray:
    """Non-negative int64 composite key from one or more value arrays —
    the canonical sorted-scan bucket key (Ray sort keys must be int64;
    the 63-bit mask keeps them non-negative).  The ONE place the
    scan-key arithmetic lives: bucketed dedup, char-jaccard, and the
    band join all key their scans through it, so a future key-scheme
    change lands everywhere at once."""
    h = None
    for col in columns:
        hk = hash64_array(np.asarray(col))
        h = hk if h is None else combine_hashes(h, hk)
    return (
        np.asarray(h, dtype=np.uint64) & np.uint64(0x7FFF_FFFF_FFFF_FFFF)
    ).astype(np.int64)
