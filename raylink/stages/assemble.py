"""Conversation assembly: turn-level transcripts -> one record per conversation.

The linkage "record" for the transcript payload is a conversation
(SURVEY.md §1.4): turns are grouped by ``conv_id``, sorted by ``turn_idx``
(the stable-ordering invariant from BASELINE.json ``input_hint``), and
collapsed into derived comparison fields that play the role of the
reference's firstname/lastname/... columns:

- ``first_text``       raw text of turn 0 (byte-identical round-trip)
- ``first_text_norm``  uppercased, whitespace-collapsed turn-0 text
                       (the jw comparison field and blocking signal)
- ``tool_sig``         ','-joined tool names in turn order (blocking signal)
- ``full_text``        all turn texts joined by '\\n' in turn order
- ``tok_blob``         first ``max_tokens`` stable token hashes of full_text,
                       packed int64 little-endian into one binary value (the
                       token-level-Levenshtein field; pair rows carry this
                       instead of the full text so multi-MB transcripts never
                       enter the pair shuffle — SURVEY.md §7 "Very wide
                       records" — and binary flows through Arrow shuffles
                       without tensor-extension round-trips)
- ``n_turns``, ``n_tokens``, ``ts_min``, ``ts_span``

Execution: ``groupby().map_groups`` pays ~300us of per-group conversion
machinery, which dwarfs the ~25us of real work per conversation at scale.
Assembly therefore runs as a **sorted-run scan**: one global
``sort(conv_id, turn_idx)`` (range partition), then each block assembles all
its *interior* conversations in a single vectorized pass, while the at-most-2
*boundary* conversations per block (those that may straddle a block edge)
are emitted as ordered fragments and merged in a second, tiny pass.
"""

from __future__ import annotations

import itertools
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["assemble_conversations", "ASSEMBLED_SCHEMA"]

_WS = re.compile(r"\s+")
_TOKEN_SPLIT = re.compile(r"\s+")

ASSEMBLED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("first_text", pa.string()),
        ("first_text_norm", pa.string()),
        ("tool_sig", pa.string()),
        ("full_text", pa.string()),
        ("tok_blob", pa.binary()),
        ("n_turns", pa.int32()),
        ("n_tokens", pa.int32()),
        ("ts_min", pa.int64()),
        ("ts_span", pa.int64()),
    ]
)


def _token_hashes(text: str, max_tokens: int) -> np.ndarray:
    """Stable int64 hashes of the first ``max_tokens`` whitespace tokens.

    Hash identity only feeds the token-level Levenshtein comparison, so
    any stable injective-enough hash works; ``pd.util.hash_array``
    (SipHash, C speed, vectorizable over a whole block's tokens at
    once) is what the interior fast path uses, and this scalar form —
    the boundary-merge path — MUST match it hash-for-hash so a
    conversation straddling a block edge compares identically.
    """
    toks = _TOKEN_SPLIT.split(text.strip())
    if toks == [""]:
        return np.empty(0, dtype=np.int64)
    toks = toks[:max_tokens]
    return pd.util.hash_array(
        np.asarray(toks, dtype=object), categorize=False
    ).astype(np.int64)


def normalize_text(s: str) -> str:
    return _WS.sub(" ", s.strip()).upper()


def _record_from_parts(
    conv_id: str,
    texts: list,
    tools: list,
    ts_min: int,
    ts_max: int,
    n_turns: int,
    max_tokens: int,
    include_full_text: bool,
    out: dict[str, list],
) -> None:
    """Append one assembled record to the output column lists.

    ``texts``/``tools`` are already in turn order.
    """
    first = str(texts[0]) if texts else ""
    full = "\n".join(str(t) for t in texts)
    out["conv_id"].append(conv_id)
    out["first_text"].append(first)
    out["first_text_norm"].append(normalize_text(first))
    out["tool_sig"].append(
        ",".join(str(t) for t in tools if t is not None and t == t)
    )
    out["full_text"].append(full if include_full_text else "")
    out["tok_blob"].append(_token_hashes(full, max_tokens).tobytes())
    out["n_turns"].append(np.int32(n_turns))
    stripped = full.strip()
    out["n_tokens"].append(
        np.int32(len(_TOKEN_SPLIT.split(stripped)) if stripped else 0)
    )
    out["ts_min"].append(np.int64(ts_min))
    out["ts_span"].append(np.int64(ts_max - ts_min))


def _empty_out() -> dict[str, list]:
    return {name: [] for name in ASSEMBLED_SCHEMA.names}


_FRAG_COLS = [
    "conv_id",
    "frag_min_turn",
    "text_concat",
    "first_text",
    "has_turn0",
    "tool_sig",
    "n_turns",
    "ts_min",
    "ts_max",
]


def _block_groups(batch: dict[str, np.ndarray]):
    """Yield (conv_id, slice, is_boundary) for a (conv_id, turn_idx)-sorted
    block; boundary = the block's first or last conv_id value."""
    conv = np.asarray(batch["conv_id"])
    n = len(conv)
    if n == 0:
        return conv, []
    uniq, starts = np.unique(conv, return_index=True)
    order = np.argsort(starts)
    starts = starts[order]
    uniq = uniq[order]
    ends = np.append(starts[1:], n)
    first_val, last_val = conv[0], conv[-1]
    groups = [
        (str(uniq[g]), slice(int(starts[g]), int(ends[g])),
         uniq[g] == first_val or uniq[g] == last_val)
        for g in range(len(uniq))
    ]
    return conv, groups


def make_interior_fn(max_tokens: int, include_full_text: bool):
    """Whole-block pass: assemble every non-boundary conversation.

    Vectorized per BLOCK, not per conversation: group bounds come from
    one ``np.unique``, ts min/max from two ``reduceat``s, first-text
    normalization from one pandas str pipeline, and token counting +
    hashing from ONE split and ONE ``pd.util.hash_array`` over the
    block's concatenated token stream (the per-conversation
    split-twice-hash-per-token loop was ~23 of the ~27 us/conversation
    that made assembly 53% of the capacity-run wall).  Output is
    field-for-field identical to the scalar ``_record_from_parts`` path
    (pinned by ``test_assemble.py``), which the boundary-merge pass
    still uses.
    """

    def fn(batch: dict[str, np.ndarray]) -> dict:
        out = _empty_out()
        conv = np.asarray(batch["conv_id"])
        n = len(conv)
        if n == 0:
            return out
        uniq, starts = np.unique(conv, return_index=True)
        order = np.argsort(starts)
        starts, uniq = starts[order], uniq[order]
        ends = np.append(starts[1:], n)
        keep = (uniq != conv[0]) & (uniq != conv[-1])
        if not keep.any():
            return out
        ts = np.asarray(batch["ts"]).astype("datetime64[us]").astype(np.int64)
        tmin = np.minimum.reduceat(ts, starts)[keep]
        tmax = np.maximum.reduceat(ts, starts)[keep]
        s_, e_ = starts[keep], ends[keep]
        # str() mapping for None/NaN matches the scalar path exactly
        text_str = (
            pd.Series(np.asarray(batch["text"], dtype=object))
            .astype(str)
            .to_numpy(dtype=object)
        )
        tools = np.asarray(batch["tool"], dtype=object)
        fulls = ["\n".join(text_str[a:b]) for a, b in zip(s_, e_)]
        firsts = text_str[s_]
        norm = (
            pd.Series(firsts, dtype=object)
            .str.strip()
            .str.replace(_WS, " ", regex=True)
            .str.upper()
            .to_numpy(dtype=object)
        )
        tok_lists = (
            pd.Series(fulls, dtype=object)
            .str.strip()
            .str.split()
            .to_numpy(dtype=object)
        )
        n_tok = np.fromiter(
            (len(t) for t in tok_lists), np.int64, count=len(tok_lists)
        )
        clipped = [t[:max_tokens] for t in tok_lists]
        counts = np.minimum(n_tok, max_tokens)
        flat = np.array(
            list(itertools.chain.from_iterable(clipped)), dtype=object
        )
        hashes = (
            pd.util.hash_array(flat, categorize=False).astype(np.int64)
            if len(flat)
            else np.empty(0, dtype=np.int64)
        )
        bounds = np.concatenate(([0], np.cumsum(counts)))
        out["conv_id"] = [str(u) for u in uniq[keep]]
        out["first_text"] = list(firsts)
        out["first_text_norm"] = list(norm)
        out["tool_sig"] = [
            ",".join(str(t) for t in tools[a:b] if t is not None and t == t)
            for a, b in zip(s_, e_)
        ]
        out["full_text"] = fulls if include_full_text else [""] * len(fulls)
        out["tok_blob"] = [
            hashes[bounds[i] : bounds[i + 1]].tobytes()
            for i in range(len(clipped))
        ]
        out["n_turns"] = (e_ - s_).astype(np.int32)
        out["n_tokens"] = n_tok.astype(np.int32)
        out["ts_min"] = tmin
        out["ts_span"] = tmax - tmin
        return out

    return fn


def make_boundary_fn():
    """Whole-block pass: emit ordered fragments for boundary conversations."""

    def fn(batch: dict[str, np.ndarray]) -> dict[str, list]:
        out: dict[str, list] = {c: [] for c in _FRAG_COLS}
        _, groups = _block_groups(batch)
        texts = batch["text"]
        tools = batch["tool"]
        turn_idx = np.asarray(batch["turn_idx"])
        ts = np.asarray(batch["ts"]).astype("datetime64[us]").astype(np.int64)
        for conv_id, sl, boundary in groups:
            if not boundary:
                continue
            t = ts[sl]
            tt = turn_idx[sl]
            out["conv_id"].append(conv_id)
            out["frag_min_turn"].append(np.int64(int(tt.min())))
            out["text_concat"].append("\n".join(str(x) for x in texts[sl]))
            out["first_text"].append(str(texts[sl][0]))
            out["has_turn0"].append(bool(tt.min() == 0))
            out["tool_sig"].append(
                ",".join(str(x) for x in tools[sl] if x is not None and x == x)
            )
            out["n_turns"].append(np.int64(sl.stop - sl.start))
            out["ts_min"].append(np.int64(int(t.min())))
            out["ts_max"].append(np.int64(int(t.max())))
        return out

    return fn


def make_merge_fn(max_tokens: int, include_full_text: bool):
    """Merge one conversation's fragments (ordered by frag_min_turn)."""

    def fn(group: dict[str, np.ndarray]) -> dict[str, list]:
        out = _empty_out()
        order = np.argsort(np.asarray(group["frag_min_turn"]), kind="stable")
        texts = [str(group["text_concat"][i]) for i in order]
        # fragment texts are already '\n'-joined runs in turn order
        merged_parts = "\n".join(texts).split("\n") if texts else []
        sigs = [str(group["tool_sig"][i]) for i in order if str(group["tool_sig"][i])]
        ts_min = int(np.asarray(group["ts_min"]).min())
        ts_max = int(np.asarray(group["ts_max"]).max())
        n_turns = int(np.asarray(group["n_turns"]).sum())
        first = ""
        for i in order:
            if group["has_turn0"][i]:
                first = str(group["first_text"][i])
                break
        conv_id = str(np.asarray(group["conv_id"])[0])
        full_parts = merged_parts
        out["conv_id"].append(conv_id)
        full = "\n".join(full_parts)
        out["first_text"].append(first)
        out["first_text_norm"].append(normalize_text(first))
        out["tool_sig"].append(",".join(sigs))
        out["full_text"].append(full if include_full_text else "")
        out["tok_blob"].append(_token_hashes(full, max_tokens).tobytes())
        out["n_turns"].append(np.int32(n_turns))
        stripped = full.strip()
        out["n_tokens"].append(
            np.int32(len(_TOKEN_SPLIT.split(stripped)) if stripped else 0)
        )
        out["ts_min"].append(np.int64(ts_min))
        out["ts_span"].append(np.int64(ts_max - ts_min))
        return out

    return fn


def _default_partitions() -> int:
    import ray

    return max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))


def assemble_conversations(
    turns: ray.data.Dataset,
    max_tokens: int = 64,
    include_full_text: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Assemble conversation records (one range-partitioned sort shuffle).

    Rows arrive in any order; the global ``sort(conv_id, turn_idx)`` restores
    the stable ordering, interior conversations assemble vectorized per
    block, and the <= 2 boundary conversations per block merge from ordered
    fragments in a tiny second pass.
    """
    n = num_partitions or _default_partitions()
    needed = ["conv_id", "turn_idx", "text", "tool", "ts"]
    have = turns.schema().names
    if set(have) - set(needed):
        turns = turns.select_columns([c for c in needed if c in have])

    sorted_turns = (
        turns.repartition(n).sort(["conv_id", "turn_idx"]).materialize()
    )
    interior = sorted_turns.map_batches(
        make_interior_fn(max_tokens, include_full_text),
        batch_format="numpy",
        batch_size=None,
    )
    frags = sorted_turns.map_batches(
        make_boundary_fn(), batch_format="numpy", batch_size=None
    )
    merged = frags.groupby("conv_id").map_groups(
        make_merge_fn(max_tokens, include_full_text), batch_format="numpy"
    )
    return interior.union(merged)
