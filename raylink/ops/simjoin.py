"""Similarity self-join: fuzzy matching as a one-call public op.

"Which records have a near-identical name?" is the entry-point question
of every dedup/linkage workflow; this op packages the repo's blocked
pair machinery (`raylink.stages.blocking` salt planning +
`stages.pairs` within-block pair expansion) and the pooled
unique-pair string kernels (`functions.strdist.similarity_pairs`) into
a single call: block → pair → score → threshold.

Output is integer fixed point (``sim_e4 = floor(sim * 10^4 + 0.5)``), so
the emitted similarity — and therefore the join result — is exactly
comparable against a SQL engine's ``jaro_winkler_similarity`` at the
same fixed point.

Scale design: identical to the linkage pipeline's pair stage — hot
blocks are salted into triangle cells by the same plan (``cap`` sizes
the cells), pairs never materialize outside the streaming scorer, and
each unique string pair is scored once per batch (pool economy,
gammaCKpar.jl:99-106's trick).  A single block larger than
``cap * max_salts`` would still yield oversized cells when clamped, so
both joins take ``drop_oversized`` (default True): such mega-blocks are
dropped from the pair space — with their keys reported via a loud log —
rather than silently producing unbounded cells; pass
``drop_oversized=False`` to clamp instead (the pre-round-3 behavior).
An empty ``block_cols`` (a full cross join) is refused outright.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..config import BlockingConfig
from ..functions.strdist import similarity_pairs
from ..stages import blocking as bs
from ..stages.pairs import generate_pairs_dedupe, generate_pairs_link

__all__ = ["similarity_self_join", "similarity_link_join"]


def similarity_self_join(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float,
    method: str = "jw",
    w: float = 0.1,
    cap: int = 100_000,
    drop_oversized: bool = True,
) -> ray.data.Dataset:
    """All within-block pairs (``id_a < id_b``) whose ``method``
    similarity on ``text_col`` reaches ``threshold``; emits
    ``(id_a, id_b, sim_e4)`` with the threshold applied in integer
    fixed point (``sim_e4 >= floor(threshold * 10^4 + 0.5)``)."""
    if not block_cols:
        raise ValueError(
            "block_cols must be non-empty: an unblocked similarity join "
            "is a full cross join"
        )
    thr_e4 = int(np.floor(threshold * 10_000 + 0.5))
    keyed = bs.derive_block_keys(
        ds.select_columns([id_col, *block_cols, text_col]), block_cols
    )
    plan, counters = bs.plan_salts(
        keyed, BlockingConfig(cap=cap, drop_oversized=drop_oversized)
    )
    dropped = set(counters.notes.get("dropped_block_keys", []))
    _warn_dropped(counters, "similarity_self_join")
    exp = bs.expand_pair_groups(keyed, plan, id_col, side=None, dropped=dropped)
    pairs = generate_pairs_dedupe(exp, [text_col], id_col=id_col)

    return pairs.map_batches(
        _make_scorer(text_col, thr_e4, method, w), batch_format="pyarrow"
    )


def _warn_dropped(counters, op: str) -> None:
    """Loudly report mega-blocks the salt planner refused (no silent caps)."""
    if counters.n_dropped_blocks:
        import logging

        logging.getLogger("raylink").warning(
            "%s: dropped %d oversized block(s) covering %d rows "
            "(> cap * max_salts); their pairs are NOT in the result — "
            "tighten block_cols or raise cap for coverage",
            op,
            counters.n_dropped_blocks,
            counters.dropped_rows,
        )


def _make_scorer(text_col: str, thr_e4: int, method: str, w: float):
    def score(batch: pa.Table) -> pa.Table:
        a = batch.column(f"{text_col}_a").to_numpy(zero_copy_only=False)
        b = batch.column(f"{text_col}_b").to_numpy(zero_copy_only=False)
        sims = similarity_pairs(a, b, method=method, w=w)
        with np.errstate(invalid="ignore"):
            e4 = np.floor(sims * 10_000 + 0.5)
        keep = ~np.isnan(sims) & (e4 >= thr_e4)
        mask = pa.array(keep)
        # ids keep their source type (string conv_ids are as valid as
        # integer keys); only normalize small ints up to int64
        def _id(col: pa.ChunkedArray) -> pa.ChunkedArray:
            filtered = col.filter(mask)
            if pa.types.is_integer(filtered.type):
                return filtered.cast(pa.int64())
            return filtered

        return pa.table(
            {
                "id_a": _id(batch.column("id_a")),
                "id_b": _id(batch.column("id_b")),
                "sim_e4": pa.array(
                    e4[keep].astype(np.int64), type=pa.int64()
                ),
            }
        )

    return score


def similarity_link_join(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    id_col_a: str,
    id_col_b: str,
    text_col: str,
    block_cols: list[str],
    threshold: float,
    method: str = "jw",
    w: float = 0.1,
    cap: int = 100_000,
    drop_oversized: bool = True,
) -> ray.data.Dataset:
    """Two-table (A×B) variant: all within-block cross pairs whose
    similarity on ``text_col`` reaches ``threshold`` — the reference's
    core linking shape (fastLink dfA×dfB) as one call.  Both tables
    must carry ``block_cols`` and ``text_col``; the salt plan sees the
    COMBINED block populations so a block hot on either side is split.
    Emits ``(id_a, id_b, sim_e4)`` (A-side id first)."""
    if not block_cols:
        raise ValueError(
            "block_cols must be non-empty: an unblocked similarity join "
            "is a full cross join"
        )
    thr_e4 = int(np.floor(threshold * 10_000 + 0.5))
    ka = bs.derive_block_keys(
        ds_a.select_columns([id_col_a, *block_cols, text_col]), block_cols
    )
    kb = bs.derive_block_keys(
        ds_b.select_columns([id_col_b, *block_cols, text_col]), block_cols
    )
    both = ka.select_columns(["block_key"]).union(
        kb.select_columns(["block_key"])
    )
    plan, counters = bs.plan_salts(
        both, BlockingConfig(cap=cap, drop_oversized=drop_oversized)
    )
    dropped = set(counters.notes.get("dropped_block_keys", []))
    _warn_dropped(counters, "similarity_link_join")

    def tag(side: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("_side", pa.array([side] * len(b)))

        return fn

    def rename_to(old: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [("_pair_id" if c == old else c) for c in b.column_names]
            )

        return fn

    ea = bs.expand_pair_groups(
        ka.map_batches(tag("a"), batch_format="pyarrow"),
        plan, id_col_a, side="a", dropped=dropped,
    ).map_batches(rename_to(id_col_a), batch_format="pyarrow")
    eb = bs.expand_pair_groups(
        kb.map_batches(tag("b"), batch_format="pyarrow"),
        plan, id_col_b, side="b", dropped=dropped,
    ).map_batches(rename_to(id_col_b), batch_format="pyarrow")
    pairs = generate_pairs_link(ea.union(eb), [text_col], id_col="_pair_id")
    return pairs.map_batches(
        _make_scorer(text_col, thr_e4, method, w), batch_format="pyarrow"
    )
