"""Sequence packing: concat-and-chunk layout for LLM pretraining.

The standard pretraining data layout concatenates every document's
tokens in one deterministic global order and cuts the stream into
fixed-budget training sequences (GPT-style "packing"); a document that
straddles a boundary contributes a slice to each sequence it touches.
The operator therefore has to answer, for every document, "at which
global token offset do you start?" — a distributed exclusive prefix
sum — and then emit one row per (document, sequence) overlap.

Scale design: the offset comes from
:func:`raylink.ops.offsets.global_prefix_sum` (per-block bucket
partials + a tiny driver scan + one range exchange — input rows shuffle
once).  The overlap expansion is pure per-batch arithmetic: a document
at exclusive offset ``o`` with ``n`` tokens spans sequences
``o // B .. (o+n-1) // B``; the expansion is one ``np.repeat`` over the
span counts, no per-row Python.  Nothing ever materializes the token
stream itself — the output is the *layout* (doc id, sequence id, start
slot inside the sequence, slice length), which a writer joins with the
tokenized payload shard-locally.

Determinism: the layout is a pure function of (id order, token counts,
budget), so it is identical under resume, resharding, and any cluster
size — and exactly SQL-expressible (window running sum +
generate_series), which is how the ``pack_docs`` oracle states it.

Every full sequence has exactly ``budget`` occupied slots by
construction; only the final sequence of the corpus can be short.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .offsets import global_prefix_sum

__all__ = ["pack_sequences"]

_OFF = "__pack_off"


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Pack documents (rows with an int64 unique ``id_col`` and a token
    count ``tokens_col``) into fixed-``budget`` sequences in ``id_col``
    order.  Returns one row per (document, sequence) overlap:
    ``id_col``, ``seq_id``, ``seq_start`` (slot within the sequence
    where the document's slice begins), ``n_tok`` (slice length).
    Zero-token documents occupy no slots and are dropped."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    ds = ds.filter(expr=f"{tokens_col} > 0")
    with_off = global_prefix_sum(
        ds, id_col, tokens_col, out_col=_OFF, num_partitions=num_partitions
    )

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("seq_id", pa.int64()),
            ("seq_start", pa.int64()),
            ("n_tok", pa.int64()),
        ]
    )

    def expand(batch: dict[str, np.ndarray]) -> pa.Table:
        off = np.asarray(batch[_OFF], dtype=np.int64)
        n = np.asarray(batch[tokens_col], dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        first = off // budget
        last = (off + n - 1) // budget
        spans = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), spans)
        # position of each output row within its document's span
        starts = np.concatenate(([0], np.cumsum(spans)[:-1]))
        step = np.arange(spans.sum(), dtype=np.int64) - np.repeat(starts, spans)
        seq = first[idx] + step
        lo = np.maximum(off[idx], seq * budget)
        hi = np.minimum((seq + 1) * budget, off[idx] + n[idx])
        return pa.Table.from_arrays(
            [
                pa.array(ids[idx]),
                pa.array(seq),
                pa.array(lo - seq * budget),
                pa.array(hi - lo),
            ],
            schema=out_schema,
        )

    return with_off.map_batches(expand, batch_format="numpy")
