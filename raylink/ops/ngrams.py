"""Corpus token n-gram frequencies: the vocabulary-of-phrases table
behind contamination probes, boilerplate detection, and collocation
analysis (which exact 3-grams dominate the corpus?).

Same combiner-first shape as the wordcount: each block builds its own
n-grams (one vectorized shift-and-join over the exploded token stream —
an n-gram never crosses a document boundary) and combines them with
``np.unique``, so one row per distinct n-gram per block is all that
shuffles; a sorted-run scan merges partials, and the final top-``k`` is
a tiny global sort/limit (deterministic: count desc, n-gram asc).

Tokenization parity with the rest of the text family: whitespace
``\\s+`` split dropping empties, n-grams joined with a single space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["ngram_counts"]


def ngram_counts(
    docs: ray.data.Dataset,
    text_col: str = "text",
    n: int = 2,
    top_k: int | None = 100,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Count whitespace-token ``n``-grams across the corpus.

    Output: (ngram string, cnt int64); with ``top_k`` set, the ``top_k``
    most frequent (count desc, n-gram asc — deterministic), else the
    full table.  Documents shorter than ``n`` tokens contribute nothing.
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(
            t.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        toks = s.str.split().explode()
        toks = toks[toks.notna()]
        doc_idx = toks.index.to_numpy(dtype=np.int64)
        tok = toks.to_numpy(dtype=object)
        if len(tok) < n:
            return pa.table(
                {
                    "ngram": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        # windows [i, i+n) fully inside one document
        ok = doc_idx[: len(tok) - n + 1] == doc_idx[n - 1 :]
        parts = [tok[j : len(tok) - n + 1 + j] for j in range(n)]
        joined = parts[0].astype(object)
        for p in parts[1:]:
            joined = joined + " " + p
        grams = joined[ok]
        uniq, cnt = np.unique(grams.astype(str), return_counts=True)
        return pa.table(
            {
                "ngram": pa.array(uniq, type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(group: dict[str, np.ndarray]) -> dict:
        return {
            "ngram": np.asarray(group["ngram"])[:1],
            "cnt": np.asarray([np.sum(group["n"])], dtype=np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "ngram": np.asarray(batch["ngram"])[:0],
            "cnt": np.empty(0, dtype=np.int64),
        }

    partials = docs.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    counts = sorted_group_scan(partials, "ngram", merge, empty,
                               num_partitions)
    if top_k is None:
        return counts
    return counts.sort(["cnt", "ngram"], descending=[True, False]).limit(
        top_k
    )
