"""Match extraction: posterior thresholding of scored pairs.

Mirrors ``getMatches`` (/root/reference/src/getMatches.jl:6-14): a pattern
matches when its EM posterior ``zeta_j >= threshold_match``; the matched
pairs are everything carrying a matched ``pattern_key``.  Because pairs keep
their pattern key, re-thresholding is a cheap filter — no re-run, exactly the
reference's re-threshold affordance (SURVEY.md §2.10).

The matched-pattern table is tiny, so it's broadcast into the filter batches
(no shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .em import EMResult

__all__ = ["get_matches"]


def get_matches(
    scored_pairs: ray.data.Dataset,
    em: EMResult,
    threshold: float | None = None,
) -> ray.data.Dataset:
    """Filter scored pairs to matched patterns; attach zeta_j and weights."""
    t = em.threshold_match if threshold is None else threshold
    pw = em.patterns_w
    # zeta threshold AND the weights upper bound (emlink.jl:168 ``u_b``).
    # The bound compares the UNCLAMPED weight (the reference compares its
    # BigFloat value directly); the +-500-clamped column is only for
    # sigmoid arithmetic and could never trip a u_b in (500, 1e10).
    w_bound = pw["weights_raw"] if "weights_raw" in pw.columns else pw["weights"]
    matched = pw[(pw["zeta_j"] >= t) & (w_bound <= getattr(em, "u_b", 1e10))]
    keys = matched["pattern_key"].to_numpy(np.int64)
    zeta = matched["zeta_j"].to_numpy(np.float64)
    weights = matched["weights"].to_numpy(np.float64)
    order = np.argsort(keys)
    keys_s, zeta_s, weights_s = keys[order], zeta[order], weights[order]

    def filt(batch: pa.Table) -> pa.Table:
        pk = batch.column("pattern_key").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys_s, pk)
        pos_c = np.clip(pos, 0, max(len(keys_s) - 1, 0))
        hit = (
            (keys_s[pos_c] == pk) if len(keys_s) else np.zeros(len(pk), dtype=bool)
        )
        sub = batch.take(pa.array(np.flatnonzero(hit)))
        sub_pos = pos_c[hit]
        sub = sub.append_column("zeta_j", pa.array(zeta_s[sub_pos], type=pa.float64()))
        sub = sub.append_column(
            "weights", pa.array(weights_s[sub_pos], type=pa.float64())
        )
        return sub

    return scored_pairs.map_batches(filt, batch_format="pyarrow")
