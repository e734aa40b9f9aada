"""Markov transition counts over per-group ordered event streams.

The session-flow analytic: for every group (user, conversation), order
its events and count adjacent state pairs — SQL
``lag(state) OVER (PARTITION BY group ORDER BY order_cols)`` followed by
``GROUP BY (prev, state)``.  The result is the corpus's transition
matrix (state x state), the input to funnel analysis, dialogue-role
validation (user->assistant alternation), and Markov-chain session
models.

Scale design: one ``sort(group)`` exchange via ``sorted_group_scan``;
inside each group the shift is a vectorized slice pair emitting RAW
pairs (per-group aggregation costs ~200µs/group — measured 40s at 200k
groups), and each downstream task collapses its whole block's pairs
with ONE pandas groupby, so what leaves is at most |states|^2 rows per
block —
the driver merge is |states|^2 x blocks, tiny for any bounded state
alphabet (the op is for categorical states, not unbounded ids; an
unbounded state column belongs in a groupby/wordcount plan instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["transition_counts"]


def transition_counts(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    state_col: str,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Counts of adjacent ``(from_state, to_state)`` pairs within each
    group, ordered by ``order_cols`` (pass a unique tiebreaker for a
    total order).  Each group's first event has no predecessor and
    contributes no pair.  Returns a pandas DataFrame
    ``(from_state, to_state, n)`` sorted by the two states."""

    def group_fn(batch: dict[str, np.ndarray]) -> dict:
        # emit RAW adjacent pairs: a per-group pandas groupby here costs
        # ~200µs per group (measured: 40s at 200k groups); the counting
        # happens once per BLOCK in block_partial instead
        idx = np.lexsort(
            tuple(np.asarray(batch[c]) for c in reversed(order_cols))
        )
        s = np.asarray(batch[state_col], dtype=object)[idx]
        if len(s) < 2:
            return {
                "from_state": np.empty(0, dtype=object),
                "to_state": np.empty(0, dtype=object),
                "n": np.empty(0, dtype=np.int64),
            }
        return {
            "from_state": s[:-1],
            "to_state": s[1:],
            "n": np.ones(len(s) - 1, dtype=np.int64),
        }

    def empty_fn(batch: dict[str, np.ndarray]) -> dict:
        return {
            "from_state": np.empty(0, dtype=object),
            "to_state": np.empty(0, dtype=object),
            "n": np.empty(0, dtype=np.int64),
        }

    partials = sorted_group_scan(
        ds, group_col, group_fn, empty_fn, num_partitions
    )

    def block_partial(b: dict[str, np.ndarray]) -> dict:
        df = pd.DataFrame(
            {
                "from_state": np.asarray(b["from_state"], dtype=object),
                "to_state": np.asarray(b["to_state"], dtype=object),
                "n": np.asarray(b["n"], dtype=np.int64),
            }
        )
        g = df.groupby(["from_state", "to_state"], sort=False, dropna=False)["n"].sum()
        out = g.reset_index()
        return {
            "from_state": out["from_state"].to_numpy(dtype=object),
            "to_state": out["to_state"].to_numpy(dtype=object),
            "n": out["n"].to_numpy(dtype=np.int64),
        }

    parts = partials.map_batches(
        block_partial, batch_format="numpy"
    ).to_pandas()
    if parts.empty:
        # an all-empty dataset's to_pandas has no columns at all
        return pd.DataFrame(
            {
                "from_state": pd.array([], dtype="object"),
                "to_state": pd.array([], dtype="object"),
                "n": pd.array([], dtype="int64"),
            }
        )
    merged = (
        parts.groupby(["from_state", "to_state"], sort=True, dropna=False)["n"]
        .sum()
        .reset_index()
    )
    merged["n"] = merged["n"].astype(np.int64)
    return merged.sort_values(["from_state", "to_state"]).reset_index(
        drop=True
    )
