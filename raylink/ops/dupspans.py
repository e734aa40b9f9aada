"""Within-corpus duplicated-substring statistics (token n-gram level).

The exact-substring dedup signal of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better"): a window of ``n``
consecutive tokens is *duplicated* when the identical n-gram occurs at
least ``min_count`` times anywhere in the corpus (including elsewhere in
the same document).  Per document we report the total window count, the
duplicated window count, and the duplicated fraction — the curation
signal used to drop or trim boilerplate-heavy documents.

The reference engine (jw2249a/FastLink.jl) has no corpus-dedup layer at
all; this module is part of the training-data-pipeline surface that the
Ray engine adds on top of the reference's record-linkage operators.

Scale design (100 TB): Lee et al. build a monolithic suffix array; here
the corpus instead streams through three bounded exchanges —
(1) every token window emits one (gram-hash, doc-id) row and the gram
table sorts ONCE (`sorted_group_scan`), (2) duplicated-window rows
pre-count per block before their tiny per-doc partials shuffle
(`count_by_key`), (3) per-doc totals and dup counts union and merge in
one final scan keyed by doc id.  No stage holds more than a block in
memory; the gram hash is 63-bit (SipHash fold), so at ~1e12 windows a
few birthday collisions may overcount duplicated windows — the same
accepted trade every hash-based dedup in this repo documents.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..stages.sortedrun import count_by_key, sorted_group_scan

__all__ = ["duplicate_ngram_stats", "remove_duplicate_spans"]


def _ngram_rows(texts, ids, n: int):
    """(doc-id, gram-key) row per valid in-document token window —
    the shared hashed-window kernel
    (:func:`raylink.ops.text.token_window_hashes`), folded to the
    repo-wide non-negative int63 scan-key domain."""
    from .text import token_window_hashes

    doc_pos, h, tok_counts = token_window_hashes(texts, n)
    n_windows = np.maximum(tok_counts - n + 1, 0)
    if len(h):
        gkeys = (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        gram_ids = np.asarray(ids)[doc_pos]
    else:
        gkeys = np.empty(0, dtype=np.int64)
        gram_ids = np.asarray(ids)[:0]
    return gram_ids, gkeys, n_windows


def duplicate_ngram_stats(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-document duplicated token-n-gram statistics.

    Output columns: ``(id_col, n_windows, dup_windows, dup_frac_e4)`` —
    one row per input document (documents shorter than ``n`` tokens get
    ``n_windows = 0`` and fraction 0).  ``dup_frac_e4`` is the round-half-up
    fixed-point fraction ``round(dup_windows / n_windows * 1e4)`` computed
    in pure int64 arithmetic so any parallelism yields bit-identical
    output.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 marks every window)")

    from .lag import _arrow_schema

    id_type = _arrow_schema(ds).field(id_col).type

    src = ds.select_columns([id_col, text_col])

    def emit_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        gram_ids, gkeys, _ = _ngram_rows(texts, ids, n)
        return pa.Table.from_arrays(
            [
                pa.array(gram_ids, type=id_type, from_pandas=True),
                pa.array(gkeys, type=pa.int64()),
            ],
            names=[id_col, "gkey"],
        )

    def emit_totals(batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        # totals need only token counts — skip the n-gram string
        # construction (it would double the corpus's most expensive
        # CPU stage just to throw the grams away)
        s = pd.Series(texts, dtype="object").fillna("").astype(str)
        tok_counts = s.str.split().str.len().to_numpy(dtype=np.int64)
        n_windows = np.maximum(tok_counts - n + 1, 0)
        return pa.Table.from_arrays(
            [
                pa.array(ids, type=id_type, from_pandas=True),
                pa.array(n_windows, type=pa.int64()),
                pa.array(np.zeros(len(ids), dtype=np.int64)),
            ],
            names=[id_col, "n_windows", "dup_windows"],
        )

    grams = src.map_batches(emit_grams, batch_format="pyarrow")

    # pass 1: one row per window occurrence of an at-least-min_count gram
    def dup_group(group: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(group[id_col])
        if len(ids) < min_count:
            ids = ids[:0]
        return {id_col: ids}

    def dup_empty(batch: dict[str, np.ndarray]) -> dict:
        return {id_col: np.asarray(batch[id_col])[:0]}

    dup_rows = sorted_group_scan(
        grams,
        "gkey",
        dup_group,
        dup_empty,
        num_partitions=num_partitions,
        out_schema=pa.schema([(id_col, id_type)]),
    )

    # pass 2: per-doc duplicated-window counts (block partials shuffle,
    # never the window rows)
    dup_counts = count_by_key(dup_rows, id_col, num_partitions=num_partitions)

    def as_dup(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        cnt = batch.column("count()").cast(pa.int64())
        zeros = pa.array(np.zeros(len(batch), dtype=np.int64))
        return pa.Table.from_arrays(
            [ids.cast(id_type), zeros, cnt],
            names=[id_col, "n_windows", "dup_windows"],
        )

    dup_tbl = dup_counts.map_batches(as_dup, batch_format="pyarrow")
    totals = src.map_batches(emit_totals, batch_format="pyarrow")

    # pass 3: merge totals + dup counts per doc, fixed-point fraction
    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("n_windows", pa.int64()),
            ("dup_windows", pa.int64()),
            ("dup_frac_e4", pa.int64()),
        ]
    )

    def merge_group(group: dict[str, np.ndarray]) -> dict:
        nw = int(np.asarray(group["n_windows"]).sum())
        dw = int(np.asarray(group["dup_windows"]).sum())
        frac = (dw * 20000 + nw) // (2 * nw) if nw > 0 else 0
        return {
            id_col: np.asarray(group[id_col])[:1],
            "n_windows": np.array([nw], dtype=np.int64),
            "dup_windows": np.array([dw], dtype=np.int64),
            "dup_frac_e4": np.array([frac], dtype=np.int64),
        }

    def merge_empty(batch: dict[str, np.ndarray]) -> dict:
        z = np.empty(0, dtype=np.int64)
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "n_windows": z,
            "dup_windows": z,
            "dup_frac_e4": z,
        }

    return sorted_group_scan(
        totals.union(dup_tbl),
        id_col,
        merge_group,
        merge_empty,
        num_partitions=max(8, num_partitions // 4),
        out_schema=out_schema,
    )


def remove_duplicate_spans(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """The REMOVAL half of Lee et al. 2022 exact-substring dedup (the
    sibling of :func:`duplicate_ngram_stats`, which only reports the
    fractions): rewrite every document with each duplicated token window
    deleted.  A window of ``n`` consecutive tokens is duplicated when the
    identical n-gram occurs at least ``min_count`` times anywhere in the
    corpus; every token covered by ANY duplicated window is removed, and
    the survivors re-join with single spaces.

    Output: ``(id_col, text_clean, n_tokens, removed_tokens)`` — one row
    per input document (short/empty documents pass through unchanged
    with ``removed_tokens = 0``).

    Scale shape (100 TB): the window rows carry ``(gram-hash, doc-id,
    win-start)`` plus an INDEPENDENT second window hash (re-keyed
    SipHash) that subdivides each gram-hash group, so a false "duplicate"
    needs a simultaneous ~127-bit collision — the stats sibling tolerates
    the single-family rate, a destructive rewrite must not; the rows
    sort ONCE to find duplicated grams; the surviving
    (doc-id, win-start) rows of duplicated windows — a small fraction of
    the corpus — union with the raw documents and co-group in one more
    sorted scan that rebuilds each text locally.  The projected source
    is materialized (object store, not driver) exactly once because two
    branches consume it — gram emission and text tagging — so the
    upstream read never re-executes.  Nothing quadratic, no driver
    materialization, two exchanges total.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if min_count < 2:
        raise ValueError("min_count must be >= 2 (1 marks every window)")

    from .lag import _arrow_schema
    from .text import token_window_hash_starts

    id_type = _arrow_schema(ds).field(id_col).type
    # materialized ONCE: the projected source feeds both the gram
    # emission and the text-tagging branch below — without pinning it,
    # the upstream read + projection would execute twice
    src = ds.select_columns([id_col, text_col]).materialize()

    def emit_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_numpy(zero_copy_only=False)
        # the independent check hash (h2) makes the effective gram key
        # ~127 bits: a 63-bit key alone would, at ~1e11 windows, delete
        # clean text on birthday collisions — tolerable for the stats
        # sibling, not for a destructive rewrite
        doc_pos, win_start, h, _, h2 = token_window_hash_starts(
            texts, n, check_hash=True
        )
        gkeys = (h & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(ids)[doc_pos], type=id_type,
                         from_pandas=True),
                pa.array(win_start, type=pa.int64()),
                pa.array(gkeys, type=pa.int64()),
                pa.array(h2.view(np.int64), type=pa.int64()),
            ],
            names=[id_col, "win_start", "gkey", "h2"],
        )

    grams = src.map_batches(emit_grams, batch_format="pyarrow")

    dup_schema = pa.schema([(id_col, id_type), ("win_start", pa.int64())])

    def dup_group(group: dict[str, np.ndarray]) -> dict:
        ids = np.asarray(group[id_col])
        ws = np.asarray(group["win_start"])
        if len(ids) < min_count:
            ids = ids[:0]
            ws = ws[:0]
        elif len(np.unique(np.asarray(group["h2"]))) > 1:
            # gkey collision: subdivide by the independent check hash,
            # keep only (gkey, h2) subgroups that reach min_count
            h2 = np.asarray(group["h2"])
            order = np.argsort(h2, kind="stable")
            hs = h2[order]
            starts = np.flatnonzero(
                np.concatenate(([True], hs[1:] != hs[:-1]))
            )
            counts = np.diff(np.append(starts, len(hs)))
            sel = order[np.repeat(counts >= min_count, counts)]
            ids, ws = ids[sel], ws[sel]
        return {id_col: ids, "win_start": ws}

    def dup_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "win_start": np.empty(0, dtype=np.int64),
        }

    dup_wins = sorted_group_scan(
        grams, "gkey", dup_group, dup_empty,
        num_partitions=num_partitions, out_schema=dup_schema,
    )

    # union documents (win_start = -1 tags the text row) with the
    # duplicated-window coordinates, then rebuild per doc in one scan
    union_schema = pa.schema(
        [
            (id_col, id_type),
            ("win_start", pa.int64()),
            (text_col, pa.string()),
        ]
    )

    def tag_text(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(id_col).cast(id_type),
                pa.array(np.full(len(batch), -1, dtype=np.int64)),
                batch.column(text_col).cast(pa.string()),
            ],
            schema=union_schema,
        )

    def tag_wins(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(id_col).cast(id_type),
                batch.column("win_start").cast(pa.int64()),
                pa.nulls(len(batch), type=pa.string()),
            ],
            schema=union_schema,
        )

    tagged = src.map_batches(tag_text, batch_format="pyarrow").union(
        dup_wins.map_batches(tag_wins, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("text_clean", pa.string()),
            ("n_tokens", pa.int64()),
            ("removed_tokens", pa.int64()),
        ]
    )

    def rebuild(group: dict[str, np.ndarray]) -> dict:
        starts = np.asarray(group["win_start"], dtype=np.int64)
        texts = np.asarray(group[text_col], dtype=object)
        text_rows = np.flatnonzero(starts == -1)
        if len(text_rows) == 0:
            # duplicated-window rows whose document sits in another
            # partition cannot happen: the scan co-groups by id
            raise ValueError("window rows without a document row")
        text = texts[text_rows[0]]
        toks = (text or "").split()
        nt = len(toks)
        wstarts = starts[starts >= 0]
        if len(wstarts) == 0 or nt == 0:
            clean, removed = " ".join(toks), 0
        else:
            covered = np.zeros(nt + 1, dtype=np.int64)
            lo = np.minimum(wstarts, nt)
            hi = np.minimum(wstarts + n, nt)
            np.add.at(covered, lo, 1)
            np.add.at(covered, hi, -1)
            keep = np.cumsum(covered[:-1]) == 0
            removed = int(nt - keep.sum())
            clean = " ".join(np.asarray(toks, dtype=object)[keep])
        return {
            id_col: np.asarray(group[id_col])[:1],
            "text_clean": np.array([clean], dtype=object),
            "n_tokens": np.array([nt], dtype=np.int64),
            "removed_tokens": np.array([removed], dtype=np.int64),
        }

    def rebuild_empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_col: np.asarray(batch[id_col])[:0],
            "text_clean": np.empty(0, dtype=object),
            "n_tokens": np.empty(0, dtype=np.int64),
            "removed_tokens": np.empty(0, dtype=np.int64),
        }

    return sorted_group_scan(
        tagged,
        id_col,
        rebuild,
        rebuild_empty,
        num_partitions=max(8, num_partitions // 4),
        out_schema=out_schema,
    )
