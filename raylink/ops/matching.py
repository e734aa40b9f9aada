"""One-to-one match assignment: mutual best pairs.

Fuzzy joins and probabilistic linkage emit many-to-many candidate pairs;
downstream merge logic usually wants an ASSIGNMENT — at most one partner
per record.  The standard practical assignment is the mutual-best (aka
stable-first-choice / symmetric-greedy) rule: keep a pair iff it is
simultaneously the best-scoring pair for BOTH of its endpoints.  This is
a pure two-pass plan (no iterative auction), deterministic, and
order-free — exactly the subset a Hungarian assignment would also keep
for mutually-best pairs.

Plan: two independent per-endpoint argmax passes (each one sorted-run
scan over an id — the winner tables are entity-sized, never pair-sized),
intersected by one more sorted-run scan on the composite (id_a, id_b)
pair key (a pair kept iff BOTH winner tables emitted it).  Ties break
deterministically: score descending, partner id ascending.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..stages.sortedrun import sorted_group_scan

__all__ = ["mutual_best_pairs"]


def _best_per(
    pairs: ray.data.Dataset,
    key: str,
    partner: str,
    score_col: str,
    num_partitions: int,
) -> ray.data.Dataset:
    """One row per ``key``: its best pair by (score desc, partner asc)."""

    def pick(group: dict[str, np.ndarray]) -> dict:
        sc = np.asarray(group[score_col])
        # unsigned scores wrap under negation (0 would become the best)
        if sc.dtype.kind == "u":
            sc = sc.astype(np.float64)
        pt = np.asarray(group[partner])
        w = int(np.lexsort((pt, -sc))[0])
        return {c: np.asarray(group[c])[w : w + 1] for c in group}

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {c: np.asarray(batch[c])[:0] for c in batch}

    return sorted_group_scan(pairs, key, pick, empty, num_partitions)


def mutual_best_pairs(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str = "sim_e4",
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Pairs that are the argmax for BOTH endpoints — a deterministic
    1:1 assignment (every surviving ``id_a`` and ``id_b`` appears at most
    once).  Output: (id_a, id_b, score_col)."""
    # PIN the projection: the two per-endpoint argmax passes each sort
    # this dataset, and without materialization each sort would
    # re-execute the whole upstream (e.g. the fuzzy join that produced
    # the candidates) — the lazy-recompute trap the multiblock ops hit
    proj = pairs.select_columns([id_a, id_b, score_col]).materialize()
    best_a = _best_per(proj, id_a, id_b, score_col, num_partitions)
    best_b = _best_per(proj, id_b, id_a, score_col, num_partitions)

    def keyed(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype("U")
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype("U")
        # length-prefix the first id so string ids containing the
        # separator cannot collide ('x' + 'y|z' vs 'x|y' + 'z')
        lens = np.char.str_len(a).astype("U")
        pk = np.char.add(
            np.char.add(np.char.add(lens, ":"), a),
            np.char.add("|", b),
        ).astype(object)
        return t.append_column("pk", pa.array(pk, type=pa.string()))

    keyed_a = best_a.map_batches(keyed, batch_format="pyarrow")
    keyed_b = best_b.map_batches(keyed, batch_format="pyarrow")
    tagged = keyed_a.union(keyed_b)

    # a mutual pair appears exactly twice under its pair key (once per
    # winner table); anything else appears once
    def both(group: dict[str, np.ndarray]) -> dict:
        n = len(np.asarray(group["pk"]))
        take = slice(0, 1) if n == 2 else slice(0, 0)
        return {
            id_a: np.asarray(group[id_a])[take],
            id_b: np.asarray(group[id_b])[take],
            score_col: np.asarray(group[score_col])[take],
        }

    def empty(batch: dict[str, np.ndarray]) -> dict:
        return {
            id_a: np.asarray(batch[id_a])[:0],
            id_b: np.asarray(batch[id_b])[:0],
            score_col: np.asarray(batch[score_col])[:0],
        }

    return sorted_group_scan(tagged, "pk", both, empty, num_partitions)
