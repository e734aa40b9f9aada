"""Keyword search: BM25 top-k scoring over a document corpus.

Complements the embedding-space ANN operators (``raylink/ops/ann.py``)
with the lexical half of a retrieval stack — the standard Okapi BM25
ranking function with the Lucene/ES idf variant::

    idf(t)  = ln( (N - df_t + 0.5) / (df_t + 0.5) + 1 )
    s(d, q) = sum_t idf(t) * tf_td * (k1 + 1)
                     / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

The reference engine (jw2249a/FastLink.jl) has no text-retrieval layer;
this is part of the training-data/curation surface the Ray engine adds.

Scale design (100 TB): two streaming passes, no shuffle of the corpus.
Pass 1 reduces the corpus to one tiny stats row per block (N, total
doc length, per-query-term document frequencies — bounded by the query
vocabulary, not the corpus).  Pass 2 broadcasts the fitted stats and
scores each block vectorized (explode + per-term counts), pruning to
the block-local top-k before the global ``sort().limit(k)`` — only
``k × num_blocks`` candidate rows ever reach the final sort.  Scores
are emitted in e4 fixed point (round-half-up, computed once in float64
then floored) so reruns at any parallelism are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = ["bm25_topk"]


def _doc_lengths_and_tfs(texts, terms: list[str]):
    """Vectorized per-doc token counts: returns (dl, tf) where ``dl`` is
    the whitespace-token count per doc and ``tf`` is an (n_docs, n_terms)
    int64 matrix of query-term frequencies."""
    import pandas as pd

    s = pd.Series(texts, dtype="object").fillna("").astype(str)
    s = s.reset_index(drop=True)
    e = s.str.split().explode()
    e = e[e.notna()]
    flat = e.to_numpy(dtype=object)
    doc_pos = e.index.to_numpy()
    dl = np.zeros(len(s), dtype=np.int64)
    if len(doc_pos):
        np.add.at(dl, doc_pos, 1)
    tf = np.zeros((len(s), len(terms)), dtype=np.int64)
    for j, t in enumerate(terms):
        hit = flat == t
        if hit.any():
            np.add.at(tf[:, j], doc_pos[hit], 1)
    return dl, tf


def bm25_topk(
    ds: ray.data.Dataset,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> ray.data.Dataset:
    """Top-``k`` documents by BM25 score for the given bag of query terms.

    Output columns: ``(id_col, score_e4)`` — the ``k`` highest-scoring
    documents with a strictly positive score, ties broken by ascending
    id.  ``score_e4 = floor(score * 1e4 + 0.5)`` (round half up, matching
    the repo-wide SQL ``round()`` convention).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    from .lag import _arrow_schema

    # pin the id type once: an all-pruned block would otherwise emit a
    # null-typed id column and break schema unification downstream
    id_type = _arrow_schema(ds).field(id_col).type
    src = ds.select_columns([id_col, text_col])

    # pass 1: corpus statistics — one bounded row per block
    def stats_partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        dl, tf = _doc_lengths_and_tfs(texts, terms)
        row = {
            "n_docs": [len(dl)],
            "sum_dl": [int(dl.sum())],
        }
        dfs = (tf > 0).sum(axis=0)
        for j in range(len(terms)):
            row[f"df_{j}"] = [int(dfs[j])]
        return pa.Table.from_pydict(row)

    stats = src.map_batches(
        stats_partial, batch_format="pyarrow"
    ).to_pandas()
    n_docs = int(stats["n_docs"].sum())
    sum_dl = int(stats["sum_dl"].sum())
    if n_docs == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict({id_col: [], "score_e4": []}).cast(
                pa.schema([(id_col, id_type), ("score_e4", pa.int64())])
            )
        )
    avgdl = sum_dl / n_docs
    df = np.array(
        [int(stats[f"df_{j}"].sum()) for j in range(len(terms))],
        dtype=np.float64,
    )
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # pass 2: score each block, prune to the block-local top-k
    def score_block(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        dl, tf = _doc_lengths_and_tfs(texts, terms)
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * (dl[:, None] / avgdl))
        with np.errstate(invalid="ignore"):
            per_term = np.where(tff > 0, tff * (k1 + 1.0) / denom, 0.0)
        score = per_term @ idf
        score_e4 = np.floor(score * 1e4 + 0.5).astype(np.int64)
        keep = np.flatnonzero(score_e4 > 0)
        if len(keep) > k:
            # block-local prune: top-k by (score desc, id asc)
            order = np.lexsort((ids[keep], -score_e4[keep]))
            keep = keep[order[:k]]
        return pa.Table.from_arrays(
            [
                pa.array(ids[keep], type=id_type, from_pandas=True),
                pa.array(score_e4[keep], type=pa.int64()),
            ],
            names=[id_col, "score_e4"],
        )

    candidates = src.map_batches(score_block, batch_format="pyarrow")
    return candidates.sort(
        ["score_e4", id_col], descending=[True, False]
    ).limit(k)
