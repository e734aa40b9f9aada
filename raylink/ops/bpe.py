"""Byte-pair-encoding tokenizer TRAINING and encoding over a corpus.

The missing half of a training-data pipeline's tokenizer story (the
repo already counts GPT-2-pretokenized tokens —
:func:`raylink.ops.text.with_bpe_token_counts`): learn the merge table
itself from the corpus, then encode documents with it.

Public-knowledge algorithm (Sennrich, Haddow & Birch 2016, "Neural
Machine Translation of Rare Words with Subword Units"): start from
characters, repeatedly merge the most frequent adjacent symbol pair.

Scale shape (100 TB): BPE statistics are a function of the WORD
HISTOGRAM, not the raw token stream — so the corpus is scanned once
into per-block (word, count) partials, merged distributed, and only the
top ``max_vocab`` (word, count) rows ever reach the driver, where the
classic merge loop runs over that bounded dict.  This is exactly how
production tokenizers are trained on web-scale corpora (frequency
tables, not raw text).  Encoding streams: merges broadcast in the task
closure, each batch encodes its UNIQUE words once through a per-process
cache (Zipf makes the cache hit rate ~99% past the first blocks).

Determinism: pair ties break lexicographically, so the same corpus
yields the same merge table at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["BPEModel", "word_histogram", "train_bpe", "encode_bpe"]

_EOW = "</w>"


@dataclass
class BPEModel:
    """Learned merge table: ``merges[i]`` is the pair merged at rank i."""

    merges: list[tuple[str, str]] = field(default_factory=list)

    def to_frame(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rank": np.arange(len(self.merges), dtype=np.int64),
                "left": [m[0] for m in self.merges],
                "right": [m[1] for m in self.merges],
            }
        )


def word_histogram(
    ds: ray.data.Dataset,
    text_col: str = "text",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Distributed whitespace-word histogram ``(word, cnt)`` — per-block
    ``np.unique`` combine, then one partial-count shuffle; raw tokens
    never leave their block."""

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(
            t.column(text_col).to_numpy(zero_copy_only=False), dtype="object"
        ).fillna("")
        toks = s.str.split().explode()
        toks = toks[toks.notna()]
        uniq, cnt = np.unique(toks.to_numpy(dtype=object), return_counts=True)
        return pa.table(
            {
                "word": pa.array(uniq.astype(str), type=pa.string()),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    schema = pa.schema([("word", pa.string()), ("cnt", pa.int64())])

    def merge(group: dict[str, np.ndarray]) -> dict:
        return {
            "word": np.asarray(group["word"])[:1],
            "cnt": np.array(
                [np.asarray(group["cnt"]).sum()], dtype=np.int64
            ),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "word": np.asarray(batch["word"])[:0],
            "cnt": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        ds.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        "word",
        merge,
        empty,
        num_partitions=num_partitions,
        out_schema=schema,
    )


def _train_on_histogram(
    freqs: dict[str, int], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Classic Sennrich merge loop over a word-frequency dict.

    Incremental pair-count maintenance: each merge touches only the
    words containing the merged pair (indexed), so a merge costs
    O(words containing the pair), not O(vocab)."""
    symbols: dict[str, list[str]] = {
        w: [*w, _EOW] for w in freqs if w
    }
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, syms in symbols.items():
        f = freqs[w]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic argmax: count desc, then lexicographic pair asc
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        for w in list(pair_words.get(best, ())):
            syms = symbols[w]
            f = freqs[w]
            i = 0
            out: list[str] = []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            # decrement old pairs, increment new
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= f
                if pair_counts[pair] <= 0:
                    pair_counts.pop(pair, None)
                s = pair_words.get(pair)
                if s is not None:
                    s.discard(w)
            for pair in zip(out, out[1:]):
                pair_counts[pair] = pair_counts.get(pair, 0) + f
                pair_words.setdefault(pair, set()).add(w)
            symbols[w] = out
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    text_col: str = "text",
    num_merges: int = 200,
    max_vocab: int = 200_000,
    min_pair_count: int = 2,
    num_partitions: int = 32,
) -> BPEModel:
    """Learn a BPE merge table from the corpus.

    One distributed word-histogram pass; only the ``max_vocab`` most
    frequent ``(word, cnt)`` rows reach the driver (ties broken by word
    for determinism), where the merge loop runs.  Truncation to
    ``max_vocab`` is the standard web-scale practice — tail singletons
    cannot change early merges."""
    hist = word_histogram(ds, text_col, num_partitions=num_partitions)
    top = (
        hist.sort(["cnt", "word"], descending=[True, False])
        .limit(max_vocab)
        .to_pandas()
    )
    freqs = dict(zip(top["word"], top["cnt"].astype(int)))
    return BPEModel(
        merges=_train_on_histogram(freqs, num_merges, min_pair_count)
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = [*word, _EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    ds: ray.data.Dataset,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    encoded_col: str | None = None,
) -> ray.data.Dataset:
    """Encode documents with a trained merge table: append the BPE token
    count (and, when ``encoded_col`` is set, the space-joined subword
    string).  Map-only; each batch encodes its UNIQUE words once through
    a per-process cache."""
    ranks = {m: i for i, m in enumerate(model.merges)}
    cache: dict[str, list[str]] = {}

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        toks = s.str.split()
        counts = np.zeros(len(s), dtype=np.int64)
        encoded: list[str] | None = [] if encoded_col else None
        for i, words in enumerate(toks):
            total = 0
            parts: list[str] = []
            for w in words:
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                total += len(enc)
                if encoded is not None:
                    parts.extend(enc)
            counts[i] = total
            if encoded is not None:
                encoded.append(" ".join(parts))
        out = batch.append_column(out_col, pa.array(counts, type=pa.int64()))
        if encoded is not None:
            out = out.append_column(
                encoded_col, pa.array(encoded, type=pa.string())
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
