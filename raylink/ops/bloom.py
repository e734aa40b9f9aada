"""Bloom-filter membership: constant-size broadcast decontamination.

:func:`raylink.ops.text.mark_contaminated_ngrams` broadcasts the exact
probe n-gram set — right when the probe corpus (an eval benchmark) is
small.  When the "do not train on this" side is itself huge (a held-out
corpus, a licensing denylist), shipping the exact set to every worker
stops scaling; a Bloom filter caps the broadcast at a fixed ``m_bits/8``
bytes regardless of probe-corpus size, at the cost of a bounded
false-positive rate (never false negatives — a true probe window is
always flagged, so decontamination stays sound; the FPR only drops some
extra clean documents).

Scale design (100 TB): the filter builds distributed — each probe block
sets bits in a LOCAL bitmap and emits it once; the driver ORs the
per-block bitmaps as they stream in (``m_bits/8`` bytes each, never the
grams).  Probing is map-only over the document corpus with the filter
broadcast once via ``ray.put``.  Bit positions use double hashing
(Kirsch-Mitzenmacher): ``pos_i = (h1 + i*h2) mod m``, where ``h2`` is a
DERIVED deterministic mix of the same base SipHash as ``h1`` (not an
independent family) — two grams whose base 64-bit hashes collide share
the whole probe sequence, a negligible extra FPR term (~2^-64 per pair)
at the documented sizing.  ``n_hashes`` probes cost one hash pass.

The reference engine has no corpus-decontamination layer; this module is
part of the training-data surface the Ray engine adds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import hash64_array
from .text import token_ngram_windows

__all__ = ["bloom_from_ngrams", "mark_contaminated_bloom", "bloom_fpr"]


def _positions(grams: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(len(grams), n_hashes) uint64 bit positions via double hashing."""
    h1 = hash64_array(grams, seed=0)
    h2 = hash64_array(grams, seed=1) | np.uint64(1)  # odd: full-period step
    i = np.arange(n_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):  # intended modular wraparound
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words,
        (pos >> np.uint64(6)).astype(np.int64).ravel(),
        np.uint64(1) << (pos & np.uint64(63)).ravel(),
    )


def bloom_fpr(n_items: int, m_bits: int, n_hashes: int) -> float:
    """Theoretical false-positive rate ``(1 - e^(-kn/m))^k``."""
    return float(
        (1.0 - np.exp(-n_hashes * n_items / m_bits)) ** n_hashes
    )


def bloom_from_ngrams(
    probe_ds: ray.data.Dataset,
    n: int,
    text_col: str = "text",
    m_bits: int = 1 << 26,
    n_hashes: int = 4,
) -> np.ndarray:
    """Build a Bloom filter of every token ``n``-gram in ``probe_ds``.

    Returns the filter as a ``m_bits/64``-long uint64 word array
    (``m_bits`` must be a multiple of 64).  Per-block bitmaps are OR-ed
    on the driver as they stream in — the grams themselves never move.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")

    def block_bitmap(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        _, grams, _ = token_ngram_windows(texts, n)
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        if len(grams):
            _set_bits(words, _positions(grams, m_bits, n_hashes))
        return pa.Table.from_pydict({"words": [words.tobytes()]})

    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    parts = probe_ds.select_columns([text_col]).map_batches(
        block_bitmap, batch_format="pyarrow"
    )
    for b in parts.iter_batches(batch_size=4, batch_format="pyarrow"):
        for buf in b.column("words"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return acc


def mark_contaminated_bloom(
    ds: ray.data.Dataset,
    bloom_words: np.ndarray,
    n: int,
    text_col: str = "text",
    out_col: str = "contaminated",
    n_hashes: int = 4,
) -> ray.data.Dataset:
    """Flag documents with ANY token ``n``-gram window in the filter.

    A superset of the exact probe-set scan: every truly contaminated
    document is flagged (no false negatives); a clean document is flagged
    with probability ~``bloom_fpr`` per window.  Map-only; the filter is
    broadcast once.
    """
    m_bits = len(bloom_words) * 64
    words_ref = ray.put(np.ascontiguousarray(bloom_words, dtype=np.uint64))

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        doc_pos, grams, _ = token_ngram_windows(texts, n)
        flagged = np.zeros(len(batch), dtype=bool)
        if len(grams):
            words = ray.get(words_ref)
            pos = _positions(grams, m_bits, n_hashes)
            bits = (
                words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))
            ) & np.uint64(1)
            hit = bits.all(axis=1)
            flagged[np.unique(doc_pos[hit])] = True
        return batch.append_column(out_col, pa.array(flagged))

    return ds.map_batches(fn, batch_format="pyarrow")
