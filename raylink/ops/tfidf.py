"""TF-IDF top terms per document: the classic salient-term extractor
(doc keywords, dedup-explainability, topic drift monitoring).

Two streaming passes over the corpus, no row-level shuffle:

1. **Document frequencies.** Each block explodes its texts to unique
   (doc, token) pairs and emits per-block partials ``(token, df_n)`` —
   one row per distinct token per block (the combiner), so only
   vocabulary-sized partials ever shuffle (``sorted_group_scan`` merge).
   The merged ``(token, df)`` table is pulled to the driver under
   ``broadcast_limit`` and shipped once via ``ray.put`` as a sorted
   token array + idf vector.  Above the limit (web-scale vocabularies)
   the plan switches automatically to a hash-partitioned token join of
   per-(doc, token) tf rows against the df Dataset, finished by one
   doc-id sorted-run scan — two token-stream-sized exchanges instead of
   one broadcast.
2. **Scoring.** Texts stream map-only: per batch, explode tokens with
   their doc position, count tf per (doc, token) (vectorized pandas
   groupby), look up idf by ``np.searchsorted`` against the broadcast
   vocab, and keep each doc's top-``k`` terms by ``tf * ln(N / df)``
   (ties broken by token ascending) with one ``np.lexsort`` — no
   per-row Python.

Semantics match the SQL formulation exactly (whitespace ``\\s+``
tokenization dropping empties, ``N`` = total document count including
empty docs, natural log): see the ``tfidf_top_terms`` oracle in
``__ray_entry__.py``.  Scores are emitted as half-up e4 fixed point
(``floor(score * 1e4 + 0.5)``) so the DuckDB oracle hash-matches; the
raw double differs only in the last ulp across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["tfidf_top_terms", "unigram_logprob"]


def _explode_tokens(texts: pa.ChunkedArray) -> pd.Series:
    """Whitespace-split tokens, exploded with the row position as index
    (pandas ``.str.split()`` drops empty tokens — identical to SQL
    ``regexp_split_to_array(text, '\\s+')`` + ``token <> ''``)."""
    s = pd.Series(
        texts.to_numpy(zero_copy_only=False), dtype="object"
    ).fillna("")
    toks = s.str.split().explode()
    return toks[toks.notna()]


def tfidf_top_terms(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Top-``k`` tokens per document by ``tf * ln(N / df)``.

    Output columns: ``id_col`` (passthrough type), ``token`` (string),
    ``tf`` (int64), ``tfidf_e4`` (int64, half-up e4 fixed point).
    Documents with no tokens emit no rows (SQL group-by semantics).
    """
    proj = docs.select_columns([id_col, text_col])

    # ---- pass 1: df partials (one row per distinct token per block) ----
    def df_partial(t: pa.Table) -> pa.Table:
        toks = _explode_tokens(t.column(text_col))
        # unique (doc, token): count each token once per document
        pairs = toks.groupby([toks.index, toks.values]).size()
        tok_vals = pairs.index.get_level_values(1).to_numpy()
        uniq, cnt = np.unique(tok_vals, return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq, type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(group: dict[str, np.ndarray]) -> dict:
        return {
            "token": np.asarray(group["token"])[:1],
            "df": np.asarray([np.sum(group["n"])], dtype=np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "token": np.asarray(batch["token"])[:0],
            "df": np.empty(0, dtype=np.int64),
        }

    partials = proj.map_batches(df_partial, batch_format="pyarrow")
    df_tbl = sorted_group_scan(partials, "token", merge, empty,
                               num_partitions)
    dfp = df_tbl.limit(broadcast_limit + 1).to_pandas()
    n_docs = proj.count()
    if len(dfp) > broadcast_limit:
        # web-scale vocabularies don't broadcast: hash-join the
        # per-(doc, token) tf rows against the df Dataset instead (the
        # same above-limit plan stages/tf.py uses), then finish the
        # per-doc top-k in one sorted-run scan over doc id
        return _tfidf_via_join(proj, df_tbl, id_col, text_col, k,
                               n_docs, num_partitions)

    vocab = dfp["token"].to_numpy(dtype=object)
    order = np.argsort(vocab)
    vocab_sorted = vocab[order]
    idf_sorted = np.log(
        float(n_docs) / dfp["df"].to_numpy(dtype=np.float64)[order]
    )
    vocab_ref = ray.put((vocab_sorted, idf_sorted))

    # ---- pass 2: map-only scoring + per-doc top-k ----
    def score(t: pa.Table) -> pa.Table:
        vocab_s, idf_s = ray.get(vocab_ref)
        toks = _explode_tokens(t.column(text_col))
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: t.column(id_col).slice(0, 0),
                    "token": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                    "tfidf_e4": pa.array([], type=pa.int64()),
                }
            )
        tf = toks.groupby([toks.index, toks.values]).size()
        doc_idx = tf.index.get_level_values(0).to_numpy(dtype=np.int64)
        tok = tf.index.get_level_values(1).to_numpy(dtype=object)
        tf_n = tf.to_numpy(dtype=np.int64)
        pos = np.searchsorted(vocab_s, tok)
        pos = np.clip(pos, 0, len(vocab_s) - 1)
        known = vocab_s[pos] == tok  # tolerate unseen tokens (incremental)
        doc_idx, tok, tf_n, pos = (
            doc_idx[known], tok[known], tf_n[known], pos[known]
        )
        sc = tf_n * idf_s[pos]
        # per-doc top-k: order by (doc, score desc, token asc)
        o = np.lexsort((tok, -sc, doc_idx))
        d_sorted = doc_idx[o]
        starts = np.concatenate(
            ([0], np.flatnonzero(d_sorted[1:] != d_sorted[:-1]) + 1)
        )
        start_of = np.repeat(starts, np.diff(np.append(starts,
                                                       len(d_sorted))))
        rank = np.arange(len(d_sorted)) - start_of
        keep = o[rank < k]
        keep.sort()  # stable output order: (doc position, token)
        ids = t.column(id_col).take(pa.array(doc_idx[keep]))
        return pa.table(
            {
                id_col: ids,
                "token": pa.array(tok[keep].astype(str),
                                  type=pa.string()),
                "tf": pa.array(tf_n[keep]),
                "tfidf_e4": pa.array(
                    np.floor(sc[keep] * 10000 + 0.5).astype(np.int64)
                ),
            }
        )

    return proj.map_batches(score, batch_format="pyarrow")


def _tf_rows(
    proj: ray.data.Dataset, id_col: str, text_col: str
) -> ray.data.Dataset:
    """Explode documents to per-(doc, token) term-frequency rows —
    the join-side input when the vocabulary is too big to broadcast."""

    def expand(t: pa.Table) -> pa.Table:
        toks = _explode_tokens(t.column(text_col))
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: t.column(id_col).slice(0, 0),
                    "token": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        tf = toks.groupby([toks.index, toks.values]).size()
        doc_idx = tf.index.get_level_values(0).to_numpy(dtype=np.int64)
        tok = tf.index.get_level_values(1).to_numpy(dtype=object)
        return pa.table(
            {
                id_col: t.column(id_col).take(pa.array(doc_idx)),
                "token": pa.array(tok.astype(str), type=pa.string()),
                "tf": pa.array(tf.to_numpy(dtype=np.int64)),
            }
        )

    return proj.map_batches(expand, batch_format="pyarrow")


def _logprob_via_join(
    proj: ray.data.Dataset,
    cnt_tbl: ray.data.Dataset,
    id_col: str,
    text_col: str,
    total: float,
    num_partitions: int,
) -> ray.data.Dataset:
    """Over-broadcast-limit plan for :func:`unigram_logprob` — tf rows ⋈
    counts by token, per-doc mean finished in one doc-id sorted-run scan.
    Accumulates ``tf·ln p`` per distinct (doc, token) instead of per
    occurrence, so the mean can differ from the broadcast path in the
    last float ulps (both match the oracle at e4)."""
    import ray as _ray

    nparts = max(16, int(_ray.cluster_resources().get("CPU", 8)))
    joined = _tf_rows(proj, id_col, text_col).join(
        cnt_tbl,
        join_type="inner",
        num_partitions=nparts,
        on=("token",),
    )

    def per_doc(group: dict[str, np.ndarray]) -> dict:
        tf_n = np.asarray(group["tf"], dtype=np.int64)
        cnt = np.asarray(group["cnt"], dtype=np.float64)
        s = float(np.sum(tf_n * np.log(cnt / total)))
        n = int(np.sum(tf_n))
        return {
            id_col: np.asarray(group[id_col])[:1],
            "n_tokens": np.asarray([n], dtype=np.int64),
            "logprob_e4": np.asarray(
                [np.floor(s / n * 10000 + 0.5)], dtype=np.int64
            ),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "n_tokens": np.empty(0, dtype=np.int64),
            "logprob_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(joined, id_col, per_doc, empty,
                             num_partitions)


def _tfidf_via_join(
    proj: ray.data.Dataset,
    df_tbl: ray.data.Dataset,
    id_col: str,
    text_col: str,
    k: int,
    n_docs: int,
    num_partitions: int,
) -> ray.data.Dataset:
    """Over-broadcast-limit plan: tf rows ⋈ df by token (hash-shuffle
    join — both sides partition by token), then one doc-id sorted-run
    scan finishes the per-doc top-k.  Two exchanges of token-stream-sized
    data instead of one broadcast — the honest cost of a vocabulary that
    doesn't fit an object-store copy per node."""
    import ray as _ray

    nparts = max(16, int(_ray.cluster_resources().get("CPU", 8)))
    joined = _tf_rows(proj, id_col, text_col).join(
        df_tbl,
        join_type="inner",
        num_partitions=nparts,
        on=("token",),
    )

    def per_doc(group: dict[str, np.ndarray]) -> dict:
        tok = np.asarray(group["token"])
        tf_n = np.asarray(group["tf"], dtype=np.int64)
        dfn = np.asarray(group["df"], dtype=np.float64)
        sc = tf_n * np.log(float(n_docs) / dfn)
        o = np.lexsort((tok, -sc))[:k]
        return {
            id_col: np.asarray(group[id_col])[o],
            "token": tok[o],
            "tf": tf_n[o],
            "tfidf_e4": np.floor(sc[o] * 10000 + 0.5).astype(np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "token": np.asarray(batch["token"])[:0],
            "tf": np.empty(0, dtype=np.int64),
            "tfidf_e4": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(joined, id_col, per_doc, empty,
                             num_partitions)


def unigram_logprob(
    docs: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the CCNet-style statistical quality filter
    (gibberish and boilerplate score far from the corpus mode; no model
    needed).

    ``score(d) = sum_w tf(d,w) * ln(cnt(w) / T) / n_tokens(d)`` with
    ``cnt`` the corpus token count and ``T`` the corpus token total.

    Same two-pass shape as :func:`tfidf_top_terms`: block-local token
    count partials merge at vocabulary size, the log-prob vector
    broadcasts once, scoring is a map-only pass (``searchsorted`` lookup
    + one segment-sum per batch).  Documents with no tokens emit no rows
    (SQL GROUP BY semantics).  Output: (id, n_tokens int64,
    logprob_e4 int64 — half-up e4 of the mean, always negative).
    """
    proj = docs.select_columns([id_col, text_col])

    def cnt_partial(t: pa.Table) -> pa.Table:
        toks = _explode_tokens(t.column(text_col))
        uniq, cnt = np.unique(toks.to_numpy(dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq.astype(str), type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(group: dict[str, np.ndarray]) -> dict:
        return {
            "token": np.asarray(group["token"])[:1],
            "cnt": np.asarray([np.sum(group["n"])], dtype=np.int64),
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            "token": np.asarray(batch["token"])[:0],
            "cnt": np.empty(0, dtype=np.int64),
        }

    partials = proj.map_batches(cnt_partial, batch_format="pyarrow")
    cnt_tbl = sorted_group_scan(partials, "token", merge, empty,
                                num_partitions)
    cp = cnt_tbl.limit(broadcast_limit + 1).to_pandas()
    if len(cp) > broadcast_limit:
        # over-limit vocabulary: hash-join tf rows against the count
        # Dataset (same plan as _tfidf_via_join); the corpus total is a
        # one-number aggregate
        total_f = float(cnt_tbl.sum("cnt") or 0)
        return _logprob_via_join(proj, cnt_tbl, id_col, text_col,
                                 total_f, num_partitions)
    total = float(cp["cnt"].sum())
    vocab = cp["token"].to_numpy(dtype=object)
    order = np.argsort(vocab)
    vocab_sorted = vocab[order]
    logp_sorted = np.log(
        cp["cnt"].to_numpy(dtype=np.float64)[order] / total
    )
    vocab_ref = ray.put((vocab_sorted, logp_sorted))

    def score(t: pa.Table) -> pa.Table:
        vocab_s, logp_s = ray.get(vocab_ref)
        toks = _explode_tokens(t.column(text_col))
        if len(toks) == 0:
            return pa.table(
                {
                    id_col: t.column(id_col).slice(0, 0),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "logprob_e4": pa.array([], type=pa.int64()),
                }
            )
        doc_idx = toks.index.to_numpy(dtype=np.int64)
        tok = toks.to_numpy(dtype=object)
        pos = np.searchsorted(vocab_s, tok)
        pos = np.clip(pos, 0, len(vocab_s) - 1)
        known = vocab_s[pos] == tok  # tolerate unseen (incremental use)
        doc_idx, pos = doc_idx[known], pos[known]
        lp = logp_s[pos]
        # segment sum per doc (doc_idx is nondecreasing: explode order)
        starts = np.concatenate(
            ([0], np.flatnonzero(doc_idx[1:] != doc_idx[:-1]) + 1)
        )
        sums = np.add.reduceat(lp, starts)
        n_tok = np.diff(np.append(starts, len(doc_idx))).astype(np.int64)
        ids = t.column(id_col).take(pa.array(doc_idx[starts]))
        mean = sums / n_tok
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n_tok),
                "logprob_e4": pa.array(
                    np.floor(mean * 10000 + 0.5).astype(np.int64)
                ),
            }
        )

    return proj.map_batches(score, batch_format="pyarrow")
