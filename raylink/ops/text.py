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
