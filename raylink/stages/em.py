"""Fellegi–Sunter EM over the agreement-pattern histogram.

Faithful reimplementation of the reference's ``emlinkMARmov``
(/root/reference/src/emlink.jl:37-182) in log-space float64 numpy, with two
deliberate deviations documented in SURVEY.md §4/§7:

- **Deterministic init.** The reference draws its starting probabilities from
  ``Dirichlet(1, 51, 101, ...)`` with the global RNG (emlink.jl:116-122); we
  draw the identical distribution from a seeded ``numpy`` generator so runs
  are reproducible.  The sort constraints (m-probs ascending over gamma
  levels, u-probs descending, emlink.jl:140-151) do the basin selection, so
  the converged optimum matches.
- **float64 instead of BigFloat.** The reference runs at 16 *decimal* digits
  (emlink.jl:44-46); float64's ~15.9 digits reproduce zeta_j far beyond the
  0.85 threshold granularity.

The histogram is tiny (<= product of per-variable level counts; 26 patterns in
the reference's own test, runtests.jl:73), so EM runs on the driver.  The
*distributed* part at scale is building the histogram — see
:mod:`raylink.stages.patterns` (per-partition partial counts aggregated by a
``groupby.sum``, the "per-partition sufficient statistics" of the north star).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..constants import MISSING

__all__ = ["EMResult", "em_fit"]


@dataclass
class EMResult:
    """Converged EM state + per-pattern posterior table.

    ``patterns_w`` columns mirror the reference's ``patterns_w`` DataFrame
    (emlink.jl:161-181): ``gamma_<var>`` (pandas nullable Int64, NA where the
    pattern has gamma==MISSING for that variable), ``counts``, ``weights``
    (natural-log Bayes factor per pattern), ``p_gamma_jm``, ``p_gamma_ju``
    (normalized pattern likelihoods), ``zeta_j`` (posterior match
    probability), plus our ``pattern_key`` passthrough for joining back onto
    the pair Dataset.
    """

    p_m: float
    p_u: float
    number_of_comparisons: int
    number_of_unique_patterns: int
    iter_converge: int
    converged: bool
    threshold_match: float
    u_b: float
    varnames: list[str]
    patterns_w: pd.DataFrame
    pgamma_km: list[np.ndarray]
    pgamma_ku: list[np.ndarray]
    uvals_gamma_jk: list[np.ndarray]

    def to_json(self) -> str:
        """Serialize the fitted model (for apply-mode linkage across
        processes: fit once, persist, ``link_records(em=...)`` per
        ingest batch).  Float64-exact: arrays round-trip through
        ``float().hex()``."""
        import json

        def harr(a) -> list[str]:
            return [float(x).hex() for x in np.asarray(a, dtype=np.float64)]

        pw = self.patterns_w.copy()
        pw_cols = {}
        for c in pw.columns:
            col = pw[c]
            if col.dtype == "Int64":  # nullable gammas: None-preserving
                pw_cols[c] = [None if pd.isna(x) else int(x) for x in col]
            elif np.issubdtype(col.dtype, np.floating):
                pw_cols[c] = harr(col.to_numpy())
            else:
                pw_cols[c] = [int(x) for x in col]
        return json.dumps(
            {
                "p_m": float(self.p_m).hex(),
                "p_u": float(self.p_u).hex(),
                "number_of_comparisons": int(self.number_of_comparisons),
                "number_of_unique_patterns": int(
                    self.number_of_unique_patterns
                ),
                "iter_converge": int(self.iter_converge),
                "converged": bool(self.converged),
                "threshold_match": float(self.threshold_match),
                "u_b": float(self.u_b),
                "varnames": list(self.varnames),
                "patterns_w": pw_cols,
                "pw_int64_cols": [
                    c for c in pw.columns if pw[c].dtype == "Int64"
                ],
                "pgamma_km": [harr(a) for a in self.pgamma_km],
                "pgamma_ku": [harr(a) for a in self.pgamma_ku],
                "uvals_gamma_jk": [
                    [int(x) for x in a] for a in self.uvals_gamma_jk
                ],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "EMResult":
        import json

        d = json.loads(s)

        def uarr(xs) -> np.ndarray:
            return np.array([float.fromhex(x) for x in xs], dtype=np.float64)

        pw_cols = {}
        for c, vals in d["patterns_w"].items():
            if c in d["pw_int64_cols"]:
                pw_cols[c] = pd.array(
                    [None if x is None else int(x) for x in vals],
                    dtype="Int64",
                )
            elif vals and isinstance(vals[0], str):
                pw_cols[c] = uarr(vals)
            else:
                pw_cols[c] = np.array(vals, dtype=np.int64)
        return cls(
            p_m=float.fromhex(d["p_m"]),
            p_u=float.fromhex(d["p_u"]),
            number_of_comparisons=d["number_of_comparisons"],
            number_of_unique_patterns=d["number_of_unique_patterns"],
            iter_converge=d["iter_converge"],
            converged=d["converged"],
            threshold_match=d["threshold_match"],
            u_b=d["u_b"],
            varnames=d["varnames"],
            patterns_w=pd.DataFrame(pw_cols),
            pgamma_km=[uarr(a) for a in d["pgamma_km"]],
            pgamma_ku=[uarr(a) for a in d["pgamma_ku"]],
            uvals_gamma_jk=[
                np.array(a, dtype=np.int64) for a in d["uvals_gamma_jk"]
            ],
        )

    def matched_keys(self, threshold: float | None = None) -> np.ndarray:
        """Pattern keys with zeta_j >= threshold (getMatches.jl:6-14)."""
        t = self.threshold_match if threshold is None else threshold
        pw = self.patterns_w
        # the u_b bound compares the UNCLAMPED weight (emlink.jl:168); the
        # clamped column saturates at 500 and could never trip a u_b in
        # (500, 1e10)
        w = pw["weights_raw"] if "weights_raw" in pw.columns else pw["weights"]
        mask = (pw["zeta_j"] >= t) & (w <= self.u_b)
        return pw.loc[mask, "pattern_key"].to_numpy(np.int64)


def em_fit(
    patterns: np.ndarray,
    counts: np.ndarray,
    dims: tuple[int, int] | int,
    varnames: list[str],
    pattern_keys: np.ndarray | None = None,
    p_m: float = 0.1,
    iter_max: int = 5000,
    tol: float = 1e-5,
    prior_lambda: float = 0.0,
    w_lambda: float = 0.0,
    prior_pi: float = 0.0,
    w_pi: float = 0.0,
    address_field: list[bool] | None = None,
    threshold_match: float = 0.85,
    u_b: float = 1e10,
    seed: int = 1234,
) -> EMResult:
    """Fit m/u probabilities over a pattern histogram.

    Parameters
    ----------
    patterns : (P, K) uint8 matrix of gamma codes (MISSING==3 allowed).
    counts : (P,) pair counts per pattern (the blocking residual must already
        be folded into the all-NONMATCH pattern so that ``sum(counts)`` equals
        the reference's ``number_of_comparisons`` conservation,
        runtests.jl:75).
    dims : (N_A, N_B) for a link, or the total comparison count for a dedupe
        (the reference only implements two-table link, fastlink.jl:20).
    """
    patterns = np.asarray(patterns, dtype=np.uint8)
    n_j = np.asarray(counts, dtype=np.float64)
    P, K = patterns.shape
    assert len(varnames) == K
    n_comparisons = int(dims[0] * dims[1]) if isinstance(dims, tuple) else int(dims)

    # --- prior hyperparameters (emlink.jl:60-101) -------------------------
    if prior_lambda == 0:
        psi = 1.0
        mu = 1.0
    else:
        if w_lambda == 0:
            raise ValueError("lambda prior requires w_lambda")
        if not (0 <= w_lambda <= 1):
            raise ValueError("w_lambda must be in [0, 1]")
        if w_lambda == 1:
            w_lambda = 1 - 1e-5
        c_lambda = w_lambda / (1 - w_lambda)
        mu = prior_lambda * c_lambda * n_comparisons + 1
        psi = (1 - prior_lambda) * mu / prior_lambda

    if prior_pi == 0:
        alpha0 = 1.0
        alpha1 = 1.0
        address_field = [False] * K
    else:
        if prior_lambda == 0:
            raise ValueError("pi prior requires a lambda prior")
        if w_pi == 0:
            raise ValueError("pi prior requires w_pi")
        if w_pi == 1:
            w_pi = 1 - 1e-5
        c_pi = w_pi / (1 - w_pi)
        exp_match = prior_lambda * n_comparisons
        alpha0 = c_pi * prior_pi * exp_match + 1
        alpha1 = alpha0 * (1 - prior_pi) / prior_pi
    if address_field is None:
        address_field = [False] * K

    # --- per-variable observed gamma levels & init (emlink.jl:111-122) ----
    missing_mask = patterns == MISSING  # (P, K)
    vals = patterns.astype(np.float64)
    vals[missing_mask] = np.nan
    uvals: list[np.ndarray] = []
    val_index = np.full((P, K), -1, dtype=np.int64)  # index into uvals[k]
    rng = np.random.default_rng(seed)
    p_km: list[np.ndarray] = []
    p_ku: list[np.ndarray] = []
    for k in range(K):
        observed = np.unique(vals[~missing_mask[:, k], k]).astype(np.int64)
        uvals.append(observed)
        lut = {v: i for i, v in enumerate(observed)}
        rows = ~missing_mask[:, k]
        val_index[rows, k] = [lut[int(v)] for v in vals[rows, k]]
        conc = np.arange(1, len(observed) * 50, 50, dtype=np.float64)
        p_km.append(np.sort(rng.dirichlet(conc)))
        p_ku.append(np.sort(rng.dirichlet(conc))[::-1].copy())

    p_m_cur = float(p_m)
    p_u_cur = 1.0 - p_m_cur
    sum_n = float(n_j.sum())

    def flatten(pm: float, pu: float, km: list, ku: list) -> np.ndarray:
        return np.concatenate([[pm, pu], *km, *ku])

    p_gamma_jm = np.zeros(P)
    p_gamma_ju = np.zeros(P)
    zeta = np.zeros(P)
    delta = 1.0
    it = 1
    converged = True
    while abs(delta) >= tol:
        p_old = flatten(p_m_cur, p_u_cur, p_km, p_ku)
        # E-step: per-pattern log-likelihoods, skipping missing (MAR)
        p_gamma_jm.fill(0.0)
        p_gamma_ju.fill(0.0)
        with np.errstate(divide="ignore"):  # log(0) -> -inf, as in BigFloat
            for k in range(K):
                rows = val_index[:, k] >= 0
                idx = val_index[rows, k]
                p_gamma_jm[rows] += np.log(p_km[k][idx])
                p_gamma_ju[rows] += np.log(p_ku[k][idx])
        log_m = p_gamma_jm + np.log(p_m_cur)
        log_u = p_gamma_ju + np.log(p_u_cur)
        zeta = np.exp(log_m - np.logaddexp(log_m, log_u))
        num_prod = n_j * zeta
        p_m_cur = (num_prod.sum() + mu - 1) / (psi - mu + sum_n)
        p_u_cur = 1.0 - p_m_cur
        # M-step per variable (emlink.jl:138-151): m-sums sorted ascending
        # BEFORE the address prior and normalization; u-probs normalized then
        # sorted descending.
        for k in range(K):
            nvals = len(uvals[k])
            m_sums = np.zeros(nvals)
            u_sums = np.zeros(nvals)
            rows = val_index[:, k] >= 0
            np.add.at(m_sums, val_index[rows, k], num_prod[rows])
            np.add.at(u_sums, val_index[rows, k], (n_j - num_prod)[rows])
            m_sums = np.sort(m_sums)
            if address_field[k]:
                m_sums = m_sums + np.concatenate(
                    [[alpha0], np.full(nvals - 1, alpha1)]
                )
            p_km[k] = m_sums / m_sums.sum()
            p_ku[k] = np.sort(u_sums / u_sums.sum())[::-1].copy()
        delta = np.max(np.abs(flatten(p_m_cur, p_u_cur, p_km, p_ku) - p_old))
        it += 1
        if it > iter_max:
            converged = False
            break

    # final weights from the last E-step values (emlink.jl:161-181).
    # float64 underflow can make a pattern likelihood exactly 0 (log -> -inf)
    # where the reference's BigFloat stays tiny-but-finite.  Two views:
    #
    # - ``weights_raw``: recomputed with per-variable probabilities floored
    #   at the float64 min-normal, so it is finite-but-huge exactly where
    #   BigFloat would be — this is what the reference's ``u_b`` bound
    #   compares against (emlink.jl:168), so the match filter uses it.
    # - ``weights``: clamped to +-500 for sigmoid / posterior arithmetic
    #   (sigmoid(500) == 1.0 to machine precision), avoiding inf/NaN in
    #   downstream exp().
    raw_jm = np.zeros(P)
    raw_ju = np.zeros(P)
    for k in range(K):
        rows = val_index[:, k] >= 0
        idx = val_index[rows, k]
        raw_jm[rows] += np.log(np.maximum(p_km[k][idx], 2.2e-308))
        raw_ju[rows] += np.log(np.maximum(p_ku[k][idx], 2.2e-308))
    weights_raw = raw_jm - raw_ju
    weights = np.clip(weights_raw, -500.0, 500.0)
    pj_m = np.exp(p_gamma_jm)
    pj_m = pj_m / pj_m.sum()
    pj_u = np.exp(p_gamma_ju)
    pj_u = pj_u / pj_u.sum()

    data = {}
    for k, vn in enumerate(varnames):
        col = pd.array(patterns[:, k].astype("int64"), dtype="Int64")
        col[missing_mask[:, k]] = pd.NA
        data[f"gamma_{vn}"] = col
    # counts stay float64: sampled-residual accounting yields fractional
    # pattern counts (the reference's are ints, runtests.jl:75 conservation
    # still holds on the sum)
    data["counts"] = n_j
    data["weights"] = weights
    data["weights_raw"] = weights_raw
    data["p_gamma_jm"] = pj_m
    data["p_gamma_ju"] = pj_u
    data["zeta_j"] = zeta
    pw = pd.DataFrame(data)
    if pattern_keys is not None:
        pw["pattern_key"] = np.asarray(pattern_keys, dtype=np.int64)

    return EMResult(
        p_m=float(p_m_cur),
        p_u=float(p_u_cur),
        number_of_comparisons=n_comparisons,
        number_of_unique_patterns=P,
        iter_converge=it,
        converged=converged,
        threshold_match=threshold_match,
        u_b=u_b,
        varnames=list(varnames),
        patterns_w=pw,
        pgamma_km=p_km,
        pgamma_ku=p_ku,
        uvals_gamma_jk=uvals,
    )
