"""Pointwise-mutual-information collocations: the which-token-pairs
stick-together table behind phrase mining, tokenizer-merge audits, and
boilerplate discovery (reference has no corpus-statistics layer; this
extends the repo's n-gram family — `raylink/ops/ngrams.py` — with the
classic PMI ranking of Church & Hanks 1990).

Distributed shape: unigram and bigram count tables come from the same
combiner-first ``ngram_counts`` plan (one distinct row per block
shuffles, never raw tokens); the bigram table prunes to
``cnt >= min_count`` BEFORE any join, then picks up each side's unigram
count through two hash-shuffle equi-joins (`ops/joins.py::hash_join` —
honest big-big plan; the pruned bigram side is usually small, but
vocabulary tables at 100 TB are not broadcastable, so nothing here
assumes driver-side fit).  The two scalar totals (token count, window
count) are tiny aggregate actions over the already-merged count tables.

PMI is computed as one float64 expression shaped EXACTLY like the SQL
oracle's (left-associated products, cast order pinned) so both engines
round the same double to e4 fixed point:

    pmi = ln( (c_xy * N_tok * N_tok) / (N_big * c_x * c_y) )
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .joins import hash_join
from .ngrams import ngram_counts

__all__ = ["pmi_collocations"]


def pmi_collocations(
    docs: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int | None = 100,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Rank within-document adjacent token pairs by PMI.

    Output: ``(w1, w2, cnt, pmi_e4)`` — pair tokens, bigram count, and
    PMI in e4 fixed point — the ``top_k`` highest-PMI pairs with
    ``cnt >= min_count`` (order: pmi desc, w1, w2; deterministic), or
    the full pruned table when ``top_k`` is None.

    Tokenization parity with the text family: whitespace split dropping
    empties; a bigram never crosses a document boundary.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    docs = docs.select_columns([text_col])
    # both count tables are consumed twice (scalar total + join side):
    # materialize so the distributed count plan runs once — the tables
    # are bounded by vocabulary, not rows
    unigrams = ngram_counts(
        docs, text_col, n=1, top_k=None, num_partitions=num_partitions
    ).materialize()
    bigrams = ngram_counts(
        docs, text_col, n=2, top_k=None, num_partitions=num_partitions
    ).materialize()
    # Tiny scalar actions over the merged (one-row-per-distinct) tables.
    n_tok = float(unigrams.sum("cnt") or 0)
    n_big = float(bigrams.sum("cnt") or 0)
    if n_big == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], type=pa.string()),
                    "w2": pa.array([], type=pa.string()),
                    "cnt": pa.array([], type=pa.int64()),
                    "pmi_e4": pa.array([], type=pa.int64()),
                }
            )
        )

    def split_pair(t: pa.Table) -> pa.Table:
        # tokens cannot contain whitespace (they came from a \s+ split),
        # so the single joining space is an unambiguous separator
        parts = pc.split_pattern(t.column("ngram"), " ", max_splits=1)
        return pa.table(
            {
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "cnt": t.column("cnt"),
            }
        )

    pruned = bigrams.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count)),
        batch_format="pyarrow",
    ).map_batches(split_pair, batch_format="pyarrow")

    def rename(col: str, cnt: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([col, cnt])

        return fn

    uni1 = unigrams.map_batches(rename("w1", "c1"), batch_format="pyarrow")
    uni2 = unigrams.map_batches(rename("w2", "c2"), batch_format="pyarrow")
    joined = hash_join(
        pruned, uni1, on="w1", num_partitions=num_partitions
    )
    joined = hash_join(
        joined, uni2, on="w2", num_partitions=num_partitions
    )

    def score(t: pa.Table) -> pa.Table:
        cxy = t.column("cnt").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cx = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        cy = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        # expression shape pinned to the SQL oracle's (left-assoc, cast
        # order): ln((cnt*Ntok*Ntok) / (Nbig*c1*c2))
        num = cxy * n_tok * n_tok
        den = n_big * cx * cy
        pmi = np.log(num / den)
        e4 = np.floor(pmi * 10000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "cnt": t.column("cnt"),
                "pmi_e4": pa.array(e4, type=pa.int64()),
            }
        )

    out = joined.map_batches(score, batch_format="pyarrow")
    if top_k is None:
        return out
    return out.sort(
        ["pmi_e4", "w1", "w2"], descending=[True, False, False]
    ).limit(top_k)
