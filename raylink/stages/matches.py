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

from ..constants import MISSING
from .em import EMResult

__all__ = ["apply_em", "get_matches"]


def apply_em(
    scored_pairs: ray.data.Dataset,
    em: EMResult,
    threshold: float | None = None,
) -> ray.data.Dataset:
    """Apply a FITTED EM to scored pairs — no refit, no pattern lookup.

    :func:`get_matches` joins pairs onto the training run's per-pattern
    posterior table, so a pattern never seen during the fit silently
    drops.  This computes the posterior from the model PARAMETERS
    (``p_m``/``p_u`` priors + per-variable ``pgamma_km``/``pgamma_ku``,
    the same E-step arithmetic as ``em_fit``, emlink.jl:129-136), so any
    gamma pattern scores — the apply-side of incremental linkage: fit
    once on a corpus, then match new record batches against it.

    A gamma VALUE the fit never observed for a variable (no entry in
    ``uvals_gamma_jk``) is treated as missing-at-random, like
    ``MISSING`` itself — the principled fallback under the MAR fit.
    Output schema matches :func:`get_matches` (pairs + ``zeta_j`` +
    ``weights``); the same ``u_b`` raw-weight bound applies.
    """
    t = em.threshold_match if threshold is None else threshold
    log_pm = float(np.log(em.p_m))
    log_pu = float(np.log(em.p_u))
    uvals = [np.asarray(u, dtype=np.int64) for u in em.uvals_gamma_jk]
    kms = [np.asarray(p, dtype=np.float64) for p in em.pgamma_km]
    kus = [np.asarray(p, dtype=np.float64) for p in em.pgamma_ku]
    varnames = list(em.varnames)
    u_b = float(getattr(em, "u_b", 1e10))

    def filt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        log_m = np.full(n, log_pm)
        log_u = np.full(n, log_pu)
        raw = np.zeros(n)  # floored weights, the u_b comparand
        for k, vn in enumerate(varnames):
            g = batch.column(f"gamma_{vn}").to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            obs = uvals[k]
            if len(obs) == 0:
                continue
            pos = np.clip(np.searchsorted(obs, g), 0, len(obs) - 1)
            hit = (obs[pos] == g) & (g != MISSING)
            idx = pos[hit]
            with np.errstate(divide="ignore"):  # log(0) -> -inf, as in fit
                log_m[hit] += np.log(kms[k][idx])
                log_u[hit] += np.log(kus[k][idx])
            raw[hit] += np.log(np.maximum(kms[k][idx], 2.2e-308)) - np.log(
                np.maximum(kus[k][idx], 2.2e-308)
            )
        zeta = np.exp(log_m - np.logaddexp(log_m, log_u))
        keep = (zeta >= t) & (raw <= u_b)
        sub = batch.take(pa.array(np.flatnonzero(keep)))
        sub = sub.append_column(
            "zeta_j", pa.array(zeta[keep], type=pa.float64())
        )
        return sub.append_column(
            "weights",
            pa.array(np.clip(raw[keep], -500.0, 500.0), type=pa.float64()),
        )

    return scored_pairs.map_batches(filt, batch_format="pyarrow")


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
