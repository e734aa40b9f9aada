"""Evaluation helpers: pairwise precision/recall/F1 vs planted truth.

The grading criterion (BASELINE.json ``metric``) is pairwise F1 >= 0.99
against labeled pairs *at the same blocking key* — i.e. both the predicted
and the truth pair sets are restricted to pairs co-located under the
evaluation blocking key, which makes the comparison fair under blocking
(SURVEY.md §7 "Residual-pattern accounting").
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

__all__ = ["PairScores", "truth_pairs_from_entities", "pairwise_scores"]


@dataclass
class PairScores:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_truth: int
    n_hit: int


def truth_pairs_from_entities(
    truth: pd.DataFrame,
    id_col: str = "conv_id",
    entity_col: str = "entity_id",
    block_of: dict | None = None,
) -> set[tuple]:
    """All within-entity pairs (id_a < id_b); optionally only co-blocked ones."""
    out: set[tuple] = set()
    for _, grp in truth.groupby(entity_col):
        ids = sorted(grp[id_col])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if block_of is not None:
                    ba, bb = block_of.get(a), block_of.get(b)
                    # an id absent from block_of never reached blocking:
                    # the pipeline cannot predict its pairs, so they do
                    # not belong in the co-blocked truth denominator
                    # (None == None must NOT count as co-blocked); NaN
                    # keys compare unequal on their own
                    if ba is None or bb is None or ba != bb:
                        continue
                out.add((a, b))
    return out


def pairwise_scores(pred: set[tuple], truth: set[tuple]) -> PairScores:
    hit = len(pred & truth)
    p = hit / len(pred) if pred else 1.0
    r = hit / len(truth) if truth else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return PairScores(p, r, f1, len(pred), len(truth), hit)
