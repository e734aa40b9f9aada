"""Dataset-level text-analysis operators (map_batches over pyarrow)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import textstats

__all__ = [
    "with_token_counts",
    "with_language_id",
    "with_quality_scores",
    "with_fingerprints",
    "chunk_documents",
    "mark_contaminated",
]


def with_token_counts(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "n_tokens"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(textstats.token_counts(t), type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def with_language_id(
    ds: ray.data.Dataset, text_col: str = "text", out_col: str = "lang_pred"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            out_col, pa.array(textstats.language_id(t), type=pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def with_quality_scores(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        cols = textstats.quality_scores(t)
        out = batch
        for name, arr in cols.items():
            if name in batch.column_names:
                continue
            out = out.append_column(name, pa.array(arr))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def with_fingerprints(
    ds: ray.data.Dataset,
    text_col: str = "text",
    winnow: bool = False,
    k: int = 8,
    window: int = 4,
) -> ray.data.Dataset:
    """Add ``fingerprint`` (whole-doc rolling hash); optionally
    ``winnow_fps`` (packed int64 winnowing fingerprints)."""

    def fn(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col).to_numpy(zero_copy_only=False)
        out = batch.append_column(
            "fingerprint",
            pa.array(textstats.doc_fingerprint(t), type=pa.int64()),
        )
        if winnow:
            blobs = [
                textstats.winnowing_fingerprints(x or "", k=k, window=window).tobytes()
                for x in t
            ]
            out = out.append_column("winnow_fps", pa.array(blobs, type=pa.binary()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_documents(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
    overlap: int = 16,
) -> ray.data.Dataset:
    """Split documents into overlapping fixed-token-window chunks (the
    standard LLM-training prep step): chunk ``i`` covers whitespace tokens
    ``[i*stride, i*stride + max_tokens)`` with ``stride = max_tokens -
    overlap``; the last chunk is the first one reaching the end.  Every
    doc yields >= 1 chunk (empty text -> one empty chunk), so no document
    is silently dropped.

    A flat_map-shaped batch transform: output rows ~= input rows x
    (n_tokens / stride), each batch expanded locally — no shuffle at all.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        toks = texts.str.findall(r"\S+")
        n = toks.str.len().to_numpy(np.int64)
        n_chunks = np.where(
            n <= max_tokens, 1, -(-(n - overlap) // stride)
        ).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n)), n_chunks)
        chunk_idx = np.arange(len(doc_idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks
        )
        starts = chunk_idx * stride
        ends = np.minimum(starts + max_tokens, n[doc_idx])
        tok_lists = toks.to_numpy()
        chunk_text = [
            " ".join(tok_lists[d][s:e])
            for d, s, e in zip(doc_idx, starts, ends)
        ]
        return pa.table(
            {
                id_col: pa.array(ids[doc_idx]),
                "chunk_idx": pa.array(chunk_idx),
                "chunk_text": pa.array(chunk_text, type=pa.string()),
                "n_tokens": pa.array(ends - starts),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def mark_contaminated(
    ds: ray.data.Dataset,
    probes: list[str],
    text_col: str = "text",
    out_col: str = "contaminated",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag documents containing ANY probe as an
    exact substring (the standard test-set leakage check).

    The probe set is the SMALL side: shipped once inside the transform
    closure (Ray serializes it per task graph, not per batch) and scanned
    with one vectorized ``str.contains(regex alternation)`` pass per batch
    — never a join, never a shuffle.  For probe sets beyond closure size,
    move them to ``ray.put`` and resolve in ``__init__`` of an actor-pool
    stage (same pattern as the multimodal decoders).
    """
    import re as _re

    if not probes:
        raise ValueError("probes must be non-empty")
    pat = "|".join(_re.escape(p) for p in probes)

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            batch.column(text_col).to_numpy(zero_copy_only=False),
            dtype="object",
        ).fillna("")
        hit = s.str.contains(pat, regex=True).to_numpy()
        return batch.append_column(out_col, pa.array(hit, type=pa.bool_()))

    return ds.map_batches(fn, batch_format="pyarrow")
