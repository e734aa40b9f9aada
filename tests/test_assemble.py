"""Conversation assembly tests (stable-ordering invariant)."""

import numpy as np
import pandas as pd
import ray

from raylink.sources.synth import make_transcripts
from raylink.stages.assemble import assemble_conversations


def test_assembly_round_trip_and_ordering():
    turns, truth = make_transcripts(n_entities=40, seed=11)
    ds = ray.data.from_pandas(turns)
    recs = assemble_conversations(ds).to_pandas()

    assert len(recs) == truth["conv_id"].nunique()
    # per-turn text equality under stable (conv_id, turn_idx) ordering:
    # full_text must round-trip the turn texts byte-identically
    expected = (
        turns.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["text"]
        .agg("\n".join)
    )
    got = recs.set_index("conv_id")["full_text"]
    pd.testing.assert_series_equal(
        got.sort_index(), expected.sort_index(), check_names=False
    )
    # first_text is the turn_idx==0 text, raw
    first = turns[turns["turn_idx"] == 0].set_index("conv_id")["text"]
    assert (recs.set_index("conv_id")["first_text"].sort_index() == first.sort_index()).all()
    # derived fields sane
    r0 = recs.iloc[0]
    assert r0["n_turns"] >= 3
    assert r0["ts_span"] >= 0
    assert r0["first_text_norm"] == " ".join(r0["first_text"].upper().split())


def test_assembly_tool_signature_order():
    rows = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "turn_idx": np.array([3, 0, 2, 1], dtype=np.int32),
            "role": ["tool", "user", "tool", "assistant"],
            "text": ["t3", "hello", "t2", "ok"],
            "tool": ["terminal", None, "search", None],
            "ts": pd.to_datetime([4, 1, 3, 2], unit="s").astype("datetime64[us]"),
        }
    )
    recs = assemble_conversations(ray.data.from_pandas(rows)).to_pandas()
    assert recs.loc[0, "tool_sig"] == "search,terminal"  # turn order, not row order
    assert recs.loc[0, "ts_min"] == 1_000_000
    assert recs.loc[0, "ts_span"] == 3_000_000
