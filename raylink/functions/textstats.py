"""Text-analysis kernels for training-data pipelines.

Vectorized (numpy / pandas.str) implementations of the text ops a 100 TB
corpus pipeline needs: token counting, language ID (stopword n-gram
heuristic), quality scoring, and document fingerprinting (rolling hash /
winnowing).  All are per-batch pure functions — used through
``map_batches`` in :mod:`raylink.ops.text`.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd

__all__ = [
    "token_counts",
    "language_id",
    "quality_scores",
    "doc_fingerprint",
    "winnowing_fingerprints",
]

_TOKEN_RE = re.compile(r"\s+")
_FNV_PRIME = np.uint64(1099511628211)

# small stopword inventories for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "with", "on", "as", "are"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "qui", "au", "pas"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "des", "ein", "eine", "zu", "im", "für", "auf"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una", "es", "por", "con", "para", "del"},
}


def token_counts(texts) -> np.ndarray:
    """Whitespace-token counts (regex ``\\s+`` split), vectorized."""
    s = pd.Series(texts, dtype="object")
    return s.fillna("").str.count(r"\S+").to_numpy(np.int64)


def cjk_dominant(s: pd.Series) -> np.ndarray:
    """True where >20% of a document's codepoints are CJK (Hiragana /
    Katakana / CJK Unified) — the shared script-detection gate of BOTH
    language-ID methods (this stopword vote and
    :mod:`raylink.functions.langprofiles`): the Latin-script models
    can't see CJK text, so it short-circuits to 'zh'."""
    cjk = s.str.count("[\\u3040-\\u30ff\\u3400-\\u9fff]").to_numpy(np.int64)
    n_chars = s.str.len().to_numpy(np.int64)
    return cjk * 5 > np.maximum(n_chars, 1)


def language_id(texts, default: str = "und") -> np.ndarray:
    """Language guess among {en, fr, de, es, zh}; ``default`` if no signal.

    Script detection first (CJK-dominant text is 'zh' — the stopword lists
    are Latin-script and can't see it), then the stopword-hit vote, fully
    vectorized: one explode of the token stream plus one ``isin`` per
    language; ties keep the first language in ``_STOPWORDS`` order.

    ``default`` is what a document with tokens but ZERO stopword hits
    gets.  'und' (the BCP-47 undetermined tag) is the honest answer;
    production LID models instead back off to the prior-most language —
    pass ``default="en"`` for that convention.  Empty/null documents are
    always 'und': there is nothing to identify.
    """
    s = pd.Series(texts, dtype="object").fillna("")
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=object)
    is_zh = cjk_dominant(s)
    ex = s.str.lower().str.split().explode()
    ex = ex[ex.notna()]
    doc_idx = ex.index.to_numpy(np.int64)
    toks = pd.Series(ex.to_numpy(), copy=False)
    hits = np.zeros((n, len(_STOPWORDS)), dtype=np.int64)
    for j, sw in enumerate(_STOPWORDS.values()):
        np.add.at(hits[:, j], doc_idx[toks.isin(sw).to_numpy()], 1)
    best = hits.argmax(axis=1)
    best_hits = hits[np.arange(n), best]
    langs = np.array(list(_STOPWORDS), dtype=object)
    has_tokens = np.zeros(n, dtype=bool)
    has_tokens[np.unique(doc_idx)] = True
    fallback = np.where(has_tokens, default, "und").astype(object)
    out = np.where(best_hits > 0, langs[best], fallback).astype(object)
    out[is_zh] = "zh"
    return out


def quality_scores(texts) -> dict[str, np.ndarray]:
    """Heuristic quality signals: length, punct/stopword ratios, token stats.

    Returns columns ``n_chars``, ``n_tokens``, ``punct_ratio``,
    ``stopword_ratio``, ``mean_token_len``, ``quality`` (composite in [0,1]).
    """
    s = pd.Series(texts, dtype="object").fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    n_tokens = s.str.count(r"\S+").to_numpy(np.int64)
    n_punct = s.str.count(r"[.,!?;:]").to_numpy(np.int64)
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy(np.int64)
    safe_chars = np.maximum(n_chars, 1)
    safe_toks = np.maximum(n_tokens, 1)
    punct_ratio = n_punct / safe_chars
    mean_token_len = (n_chars - (n_tokens - 1).clip(min=0)) / safe_toks
    sw_en = _STOPWORDS["en"]
    # vectorized explode+isin (same shape as language_id above) — the
    # per-doc Python tokenizer loop this replaces dominated batch cost;
    # \s+-split semantics are identical (boundary empties miss the isin)
    exq = s.str.lower().str.split(_TOKEN_RE.pattern, regex=True).explode()
    exq = exq[exq.notna()]
    stop_hits = np.zeros(len(s), dtype=np.int64)
    if len(exq):
        didx = exq.index.to_numpy(np.int64)
        mask = pd.Series(exq.to_numpy(), copy=False).isin(sw_en).to_numpy()
        np.add.at(stop_hits, didx[mask], 1)
    stopword_ratio = stop_hits / safe_toks
    # composite: reward natural-language-looking docs
    length_score = np.clip(n_tokens / 50.0, 0, 1)
    alpha_score = n_alpha / safe_chars
    punct_score = 1.0 - np.clip(punct_ratio * 5, 0, 1)
    quality = 0.35 * length_score + 0.35 * alpha_score + 0.15 * punct_score + 0.15 * np.clip(
        stopword_ratio * 4, 0, 1
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "stop_hits": stop_hits,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stopword_ratio,
        "mean_token_len": mean_token_len,
        "quality": quality,
    }


def doc_fingerprint(texts) -> np.ndarray:
    """Stable int64 content fingerprint of the exact text bytes (crc64-ish)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        # two independent crc32s -> 64 bits, cheap and stable
        hi = zlib.crc32(b)
        lo = zlib.crc32(b, 0xDEADBEEF)
        out[i] = np.int64(np.uint64((hi << 32) | lo).astype(np.int64))
    return out


def winnowing_fingerprints(
    text: str, k: int = 8, window: int = 4
) -> np.ndarray:
    """Winnowing (local-min sampling of rolling k-gram hashes) fingerprints.

    Standard document-fingerprinting scheme (Schleimer et al., SIGMOD 2003):
    hash every k-gram, then keep the minimum hash of each sliding window —
    guarantees shared substrings of length >= k + window - 1 share a
    fingerprint.  Returns sorted unique int64 fingerprints.
    """
    b = (text or "").encode("utf-8")
    if len(b) < k:
        return np.empty(0, dtype=np.int64)
    # k-gram hashes in one vectorized pass: polynomial hash over the byte
    # window (uint64 wraparound arithmetic), not a Python loop per gram
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
    pw = _FNV_PRIME ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(arr, k)
    hashes = (win * pw[None, :]).sum(axis=1, dtype=np.uint64).view(np.int64)
    n = len(hashes)
    if n <= window:
        return np.unique(hashes.min(keepdims=True))
    # sliding-window minimum via stride trick
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    return np.unique(sw.min(axis=1))
