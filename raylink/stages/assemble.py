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

This is one ``groupby(conv_id)`` shuffle.  The per-group UDF works on numpy
batches (no per-group pandas construction) and does only O(turns) work.
"""

from __future__ import annotations

import re

import numpy as np
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

    crc32 (zlib, C speed) is plenty for token identity in the Levenshtein
    comparison — a 2^-32 collision chance per token pair cannot move a
    similarity across the rounded cut boundaries.
    """
    import zlib

    toks = _TOKEN_SPLIT.split(text.strip())
    if toks == [""]:
        return np.empty(0, dtype=np.int64)
    toks = toks[:max_tokens]
    return np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks),
        dtype=np.int64,
        count=len(toks),
    )


def normalize_text(s: str) -> str:
    return _WS.sub(" ", s.strip()).upper()


def make_assemble_fn(max_tokens: int = 64, include_full_text: bool = True):
    """Build the per-group assembly UDF (numpy batch in/out)."""

    def assemble(group: dict[str, np.ndarray]) -> dict[str, list]:
        turn_idx = np.asarray(group["turn_idx"])
        order = np.argsort(turn_idx, kind="stable")
        texts = np.asarray(group["text"], dtype=object)[order]
        tools = np.asarray(group["tool"], dtype=object)[order]
        ts = np.asarray(group["ts"])
        ts_i = ts.astype("datetime64[us]").astype(np.int64)
        first = str(texts[0]) if len(texts) else ""
        full = "\n".join(str(t) for t in texts)
        toks = _token_hashes(full, max_tokens)
        tool_sig = ",".join(str(t) for t in tools if t is not None and t == t)
        return {
            "conv_id": [str(np.asarray(group["conv_id"])[0])],
            "first_text": [first],
            "first_text_norm": [normalize_text(first)],
            "tool_sig": [tool_sig],
            "full_text": [full if include_full_text else ""],
            "tok_blob": [toks.tobytes()],
            "n_turns": [np.int32(len(texts))],
            "n_tokens": [np.int32(len(_TOKEN_SPLIT.split(full.strip())) if full.strip() else 0)],
            "ts_min": [np.int64(ts_i.min()) if len(ts_i) else np.int64(0)],
            "ts_span": [np.int64(ts_i.max() - ts_i.min()) if len(ts_i) else np.int64(0)],
        }

    return assemble


def _default_partitions() -> int:
    import ray

    return max(32, 2 * int(ray.cluster_resources().get("CPU", 8)))


def assemble_conversations(
    turns: ray.data.Dataset,
    max_tokens: int = 64,
    include_full_text: bool = True,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Group turns by conv_id and assemble conversation records.

    One hash shuffle on ``conv_id``.  Rows arrive in any order; the UDF
    restores the stable ``(conv_id, turn_idx)`` ordering per group.  The
    groupby's reduce-partition count follows the input block count, so the
    input is repartitioned first — otherwise a handful of input blocks
    serializes millions of groups through a few reduce tasks.
    """
    n = num_partitions or _default_partitions()
    return turns.repartition(n).groupby("conv_id").map_groups(
        make_assemble_fn(max_tokens=max_tokens, include_full_text=include_full_text),
        batch_format="numpy",
    )
